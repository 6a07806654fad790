"""Int8 weight-only quantization tests."""

import numpy as np

import jax
import jax.numpy as jnp

from gen3c_tpu.models.dit import DiTConfig, dit_forward, init_dit_params
from gen3c_tpu.models.quantize import (
    quantize_dit_params,
    quantize_linear,
    quantized_bytes,
    weight,
)


def test_quantize_linear_roundtrip_accuracy():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(256, 128).astype(np.float32) * 0.02)
    q = quantize_linear(w)
    back = weight(q, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(w))
    # rounding error bounded by half a quantization step per column
    half_step = np.asarray(q["scale"])[0] / 2 + 1e-7
    assert (err <= half_step[None, :]).all()


def test_quantized_dit_output_close():
    cfg = DiTConfig(
        in_channels=81, model_channels=1024, num_blocks=1, num_heads=8,
        adaln_lora_dim=8, dtype=jnp.float32,
    )
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    # de-zero final layers so outputs are non-trivial
    params = jax.tree.map(
        lambda x: 0.02 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
        if x.ndim >= 2 and float(jnp.abs(x).sum()) == 0.0
        else x,
        params,
    )
    qparams = quantize_dit_params(params)
    assert quantized_bytes(qparams) < 0.5 * quantized_bytes(params)

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 81, 2, 8, 16), jnp.float32)
    t = jnp.asarray([0.5])
    ctx = jnp.asarray(rng.randn(1, 8, 1024), jnp.float32)
    ref = np.asarray(dit_forward(params, cfg, x, t, ctx))
    out = np.asarray(dit_forward(qparams, cfg, x, t, ctx))
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-8)
    assert rel < 0.05, rel


def test_w8a8_matmul_accuracy():
    from gen3c_tpu.models.quantize import w8a8_matmul

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 256).astype(np.float32))
    w = jnp.asarray(rng.randn(256, 128).astype(np.float32) * 0.02)
    entry = quantize_linear(w, act_quant=True)
    assert "q8" in entry and "q" not in entry
    ref = np.asarray(x @ w)
    got = np.asarray(w8a8_matmul(x, entry, jnp.float32))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.03, rel
    # non-q8 entries fall back to the dequantized matmul
    entry_w = quantize_linear(w, act_quant=False)
    got_w = np.asarray(w8a8_matmul(x, entry_w, jnp.float32))
    rel_w = np.linalg.norm(got_w - ref) / np.linalg.norm(ref)
    assert rel_w < 0.01, rel_w


def test_w8a8_dit_output_close():
    cfg = DiTConfig(
        in_channels=81, model_channels=1024, num_blocks=1, num_heads=8,
        adaln_lora_dim=8, dtype=jnp.float32,
    )
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: 0.02 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
        if x.ndim >= 2 and float(jnp.abs(x).sum()) == 0.0
        else x,
        params,
    )
    from gen3c_tpu.models.quantize import quantize_dit_params

    # quantize_dit_params only rewrites >=1M-element leaves; at 1024ch the
    # block linears qualify (fc1 is 1024x4096)
    qparams = jax.tree.map(lambda x: x, params)  # copy structure

    def mark(node):
        if isinstance(node, dict):
            if ("w" in node and len(node) == 1 and node["w"].ndim == 2
                    and node["w"].size >= (1 << 20)):
                return quantize_linear(node["w"], act_quant=True)
            return {k: mark(v) for k, v in node.items()}
        if isinstance(node, list):
            return [mark(v) for v in node]
        return node

    qparams = mark(qparams)
    assert "q8" in qparams["blocks"][0]["mlp"]["fc1"]

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 81, 2, 8, 16), jnp.float32)
    t = jnp.asarray([0.5])
    ctx = jnp.asarray(rng.randn(1, 8, 1024), jnp.float32)
    ref = np.asarray(dit_forward(params, cfg, x, t, ctx))
    out = np.asarray(dit_forward(qparams, cfg, x, t, ctx))
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-8)
    assert rel < 0.08, rel
