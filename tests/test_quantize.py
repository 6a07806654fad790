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


def test_quantize_ar_params_generate_close_and_runs():
    """Int8 weight-only AR quantization: quantized params generate
    deterministically, logits stay close to fp32, and the KV-cache
    decode path accepts the quantized tree."""
    import jax

    from gen3c_tpu.models.ar_transformer import (
        AR_TINY,
        ar_forward,
        generate,
        init_ar_params,
        rope_tables,
    )
    from gen3c_tpu.models.quantize import quantize_ar_params

    params = init_ar_params(jax.random.PRNGKey(0), AR_TINY, jnp.float32)
    # AR_TINY weights are below the _MIN_SIZE gate; force-quantize by
    # patching the gate through a large-vocab-ish check: quantize
    # manually at small scale instead
    import gen3c_tpu.models.quantize as qz

    orig = qz._MIN_SIZE
    qz._MIN_SIZE = 1
    try:
        qparams = quantize_ar_params(params)
    finally:
        qz._MIN_SIZE = orig

    # every projection + head + embedding got quantized
    assert "q" in qparams["layers"][0]["wq"]
    assert "q" in qparams["output"] and "q" in qparams["tok_embeddings"]
    assert "scale" in qparams["norm"] and hasattr(
        qparams["norm"]["scale"], "ndim"
    )  # norms untouched

    ids = jnp.asarray(
        np.random.RandomState(0).randint(0, 512, (1, 12)), jnp.int32
    )
    rope = rope_tables(AR_TINY)
    ref_logits, _ = ar_forward(params, AR_TINY, ids, rope)
    q_logits, _ = ar_forward(qparams, AR_TINY, ids, rope)
    # int8 weight-only: ~1% relative error per matmul
    rel = np.abs(np.asarray(q_logits) - np.asarray(ref_logits)).mean() / (
        np.abs(np.asarray(ref_logits)).mean() + 1e-8
    )
    assert rel < 0.15, rel

    out1 = np.asarray(generate(qparams, AR_TINY, ids, jax.random.PRNGKey(1),
                               max_new_tokens=6, temperature=0.0))
    out2 = np.asarray(generate(qparams, AR_TINY, ids, jax.random.PRNGKey(1),
                               max_new_tokens=6, temperature=0.0))
    np.testing.assert_array_equal(out1, out2)


def test_quantize_ar_w8a8_runs():
    import jax

    from gen3c_tpu.models.ar_transformer import (
        AR_TINY,
        generate,
        init_ar_params,
    )
    import gen3c_tpu.models.quantize as qz

    params = init_ar_params(jax.random.PRNGKey(0), AR_TINY, jnp.float32)
    orig = qz._MIN_SIZE
    qz._MIN_SIZE = 1
    try:
        qparams = qz.quantize_ar_params(params, act_quant=True)
    finally:
        qz._MIN_SIZE = orig
    assert "q8" in qparams["layers"][0]["w1"]
    assert "q" in qparams["tok_embeddings"]  # embeddings never W8A8
    ids = jnp.asarray(
        np.random.RandomState(1).randint(0, 512, (1, 8)), jnp.int32
    )
    out = np.asarray(generate(qparams, AR_TINY, ids, jax.random.PRNGKey(2),
                              max_new_tokens=4, temperature=0.0))
    assert out.shape == (1, 12)


def test_quantized_ar_tp_specs_and_forward_parity():
    """Quantized AR trees keep Megatron TP shardings (codes shard like
    the weights they replace; scales follow the output dim), and the
    TP-sharded quantized forward matches single-device."""
    import jax
    from jax.sharding import PartitionSpec as P

    from gen3c_tpu.models.ar_transformer import (
        AR_TINY,
        ar_forward,
        init_ar_params,
        rope_tables,
    )
    from gen3c_tpu.parallel.sharding import ar_param_pspecs, shard_ar_params
    from gen3c_tpu.parallel.mesh import make_mesh
    import gen3c_tpu.models.quantize as qz

    params = init_ar_params(jax.random.PRNGKey(0), AR_TINY, jnp.float32)
    orig = qz._MIN_SIZE
    qz._MIN_SIZE = 1
    try:
        qparams = qz.quantize_ar_params(params)
    finally:
        qz._MIN_SIZE = orig
    specs = ar_param_pspecs(qparams)
    l0 = specs["layers"][0]
    assert l0["wq"]["q"] == P(None, "tp")
    assert l0["wq"]["scale"] == P(None, "tp")
    assert l0["wo"]["q"] == P("tp", None)
    assert l0["wo"]["scale"] == P()
    assert specs["tok_embeddings"]["q"] == P("tp", None)
    assert specs["output"]["q"] == P(None, "tp")

    mesh = make_mesh(dp=1, cp=1, tp=2, devices=jax.devices()[:2])
    sharded = shard_ar_params(mesh, qparams)
    ids = jnp.asarray(
        np.random.RandomState(2).randint(0, 512, (1, 10)), jnp.int32
    )
    rope = rope_tables(AR_TINY)
    ref, _ = ar_forward(qparams, AR_TINY, ids, rope)
    got, _ = ar_forward(sharded, AR_TINY, ids, rope)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_quantize_ar_params_transfer_matches_direct(monkeypatch):
    """CPU-convert + transfer-quantize == direct quantize numerically,
    with all leaves landed on the target device."""
    import jax

    from gen3c_tpu.models.ar_transformer import AR_TINY, init_ar_params
    import gen3c_tpu.models.quantize as qz

    monkeypatch.setattr(qz, "_MIN_SIZE", 1)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = init_ar_params(jax.random.PRNGKey(0), AR_TINY, jnp.float32)
    moved = qz.quantize_ar_params_transfer(params, device=jax.devices()[0])
    direct = qz.quantize_ar_params(
        init_ar_params(jax.random.PRNGKey(0), AR_TINY, jnp.float32)
    )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(moved),
        jax.tree_util.tree_leaves_with_path(direct),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))
    dev = jax.devices()[0]
    assert all(
        next(iter(leaf.devices())) == dev
        for leaf in jax.tree.leaves(moved)
    )


def test_guardrail_env_quantize_wiring(tmp_path, monkeypatch):
    """GEN3C_QUANTIZE_LLM=1 loads LlamaGuard3 with an int8 tree and the
    verdict path still runs."""
    import torch
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import (
        LlamaConfig,
        LlamaForCausalLM,
        PreTrainedTokenizerFast,
    )

    from gen3c_tpu.aux.guardrail import LlamaGuard3
    import gen3c_tpu.models.quantize as qz

    path = tmp_path / "meta-llama" / "Llama-Guard-3-8B"
    path.mkdir(parents=True)
    vocab = {w: i for i, w in enumerate(
        ["<unk>", "hello", "world", "safe", "unsafe"]
    )}
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>")
    fast.chat_template = (
        "{% for m in messages %}{{ m['content'] }}{% endfor %}"
    )
    fast.save_pretrained(path)
    torch.manual_seed(0)
    LlamaForCausalLM(
        LlamaConfig(
            vocab_size=len(vocab), hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=1, max_position_embeddings=64,
            tie_word_embeddings=False,
        )
    ).save_pretrained(path)

    monkeypatch.setenv("GEN3C_QUANTIZE_LLM", "1")
    monkeypatch.setattr(qz, "_MIN_SIZE", 1)
    guard = LlamaGuard3(str(tmp_path), max_seq_len=64)
    assert "q" in guard.params["layers"][0]["wq"]
    safe, _ = guard.is_safe("hello world")
    assert isinstance(safe, bool)
