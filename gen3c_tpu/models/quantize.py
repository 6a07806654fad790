"""Int8 weight-only quantization for single-chip 7B serving.

The 7B DiT is 14.5 GB in bf16 — larger than one v5e's 16 GB HBM once
activations are counted. Weight-only int8 (per-output-channel absmax
scales) halves the footprint so the full model runs on a single chip;
dequantization happens per matmul inside the jit (XLA keeps one
materialized weight at a time). This is a TPU-native addition (the
reference has no quantized inference path).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Array = jax.Array

# param-tree entries larger than this (elements) get quantized
_MIN_SIZE = 1 << 20


def quantize_linear(w: Array, act_quant: bool = False) -> Dict[str, Array]:
    """Per-output-channel absmax int8 quantization of a (in, out) matrix.

    act_quant=True marks the entry (key "q8" instead of "q") for W8A8:
    matmuls against it dynamically quantize activations per-token and run
    on the int8 MXU path (394 TOPS on v5e, 2x the bf16 peak; measured
    1.52x on the GEN3C MLP shape — scripts/probe_int8.py). ~1% relative
    error per matmul; opt-in for serving.
    """
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {("q8" if act_quant else "q"): q, "scale": scale.astype(jnp.float32)}


def weight(entry: Dict[str, Array], dtype) -> Array:
    """Resolve a params entry {"w": ...} or quantized {"q"|"q8", "scale"}."""
    if "q" in entry or "q8" in entry:
        q = entry.get("q", entry.get("q8"))
        return q.astype(dtype) * entry["scale"].astype(dtype)
    return entry["w"].astype(dtype)


def w8a8_matmul(x: Array, entry: Dict[str, Array], out_dtype) -> Array:
    """(..., D) @ int8 (D, F) with per-token dynamic activation quant:
    absmax int8 activations x int8 weights -> int32 accumulate on the MXU
    -> rescale. Falls back to dequantized bf16 matmul for non-"q8" entries.
    """
    if "q8" not in entry:
        return x @ weight(entry, out_dtype)
    xf = x.astype(jnp.float32)
    xscale = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12
    )
    xq = jnp.clip(jnp.round(xf / xscale), -127, 127).astype(jnp.int8)
    nd = x.ndim
    acc = jax.lax.dot_general(
        xq,
        entry["q8"],
        dimension_numbers=(((nd - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * xscale * entry["scale"]).astype(
        out_dtype
    )


_AR_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w1", "w2", "w3",
                  "cwq", "cwk", "cwv", "cwo", "output", "tok_embeddings")


def quantize_ar_params(params: Any, act_quant: bool = False) -> Any:
    """Int8 weight-only (or W8A8) quantization of an ar_transformer
    param tree: the llama projections, the LM head and the token
    embedding table (per-channel scales; embeddings dequantize on
    lookup). Halves the weight footprint AND the per-token weight reads
    — decode at small batch is weight-read-bound, so this is both a
    capacity and a speed feature (the 8B guardrail/upsampler LLMs fit a
    16 GB chip at 8.5 GB). Norm scales stay fp32.
    """

    def visit(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (
                    k in _AR_QUANT_KEYS
                    and hasattr(v, "ndim")
                    and v.ndim == 2
                    and v.size >= _MIN_SIZE
                ):
                    # embeddings dequantize row-wise on lookup: scale
                    # per hidden channel works for both orientations
                    out[k] = quantize_linear(
                        v, act_quant=act_quant and k != "tok_embeddings"
                    )
                else:
                    out[k] = visit(v)
            return out
        if isinstance(node, list):
            return [visit(v) for v in node]
        return node

    return visit(params)


def quantize_ar_params_transfer(params: Any, act_quant: bool = False,
                                device=None) -> Any:
    """Quantize a HOST/CPU-resident AR tree and place the results on
    `device` (default: the first accelerator). For checkpoints too large
    to materialize unquantized in HBM (an 8B bf16 is 16 GB — the whole
    chip): convert under jax.default_device(cpu) first, then this
    transfers int8 codes + scales leaf by leaf (peak HBM = quantized
    size + one leaf)."""
    dev = device or jax.devices()[0]

    def put(x):
        return jax.device_put(x, dev)

    def visit(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (
                    k in _AR_QUANT_KEYS
                    and hasattr(v, "ndim")
                    and v.ndim == 2
                    and v.size >= _MIN_SIZE
                ):
                    e = quantize_linear(
                        v, act_quant=act_quant and k != "tok_embeddings"
                    )
                    out[k] = {kk: put(vv) for kk, vv in e.items()}
                    if hasattr(v, "delete"):
                        v.delete()
                else:
                    out[k] = visit(v)
            return out
        if isinstance(node, list):
            return [visit(v) for v in node]
        if hasattr(node, "ndim"):
            return put(node)
        return node

    return visit(params)


def maybe_quantized_convert(convert_fn, env_var: str = "GEN3C_QUANTIZE_LLM",
                            act_quant: bool = False):
    """Run a torch->JAX converter thunk with opt-in int8 quantization.

    When the env var is "1", the conversion runs under the CPU device
    and quantized leaves transfer to the accelerator individually (an
    unquantized 8B bf16 tree is 16 GB — the whole chip — so it must
    never materialize in HBM). Otherwise the thunk runs as-is. Shared by
    LlamaGuard3 / Aegis / the prompt upsamplers."""
    import os

    if os.environ.get(env_var, "0") != "1":
        return convert_fn()
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        cpu_params = convert_fn()
    return quantize_ar_params_transfer(cpu_params, act_quant=act_quant)


def quantize_dit_params(params: Any) -> Any:
    """Quantize every large {"w": (in, out)} entry in a DiT param tree."""

    def visit(node):
        if isinstance(node, dict):
            if (
                "w" in node
                and len(node) == 1
                and hasattr(node["w"], "ndim")
                and node["w"].ndim == 2
                and node["w"].size >= _MIN_SIZE
            ):
                return quantize_linear(node["w"])
            return {k: visit(v) for k, v in node.items()}
        if isinstance(node, list):
            return [visit(v) for v in node]
        return node

    return visit(params)


def quantize_dit_params_inplace(params: Any, act_quant: bool = False) -> Any:
    """Memory-frugal variant: quantize leaf-by-leaf, deleting each source
    buffer immediately (the 7B bf16 tree + its int8 copy don't fit in HBM
    together). act_quant=True marks entries for W8A8 (see quantize_linear)."""
    qfn = jax.jit(lambda w: quantize_linear(w, act_quant=act_quant))

    def visit(node):
        if isinstance(node, dict):
            if (
                "w" in node
                and len(node) == 1
                and hasattr(node["w"], "ndim")
                and node["w"].ndim == 2
                and node["w"].size >= _MIN_SIZE
            ):
                q = jax.block_until_ready(qfn(node["w"]))
                node["w"].delete()
                return q
            return {k: visit(v) for k, v in node.items()}
        if isinstance(node, list):
            return [visit(v) for v in node]
        return node

    return visit(params)


def quantize_dit_params_numpy(params: Any, act_quant: bool = False) -> Any:
    """HOST-side twin of quantize_dit_params_inplace (pure numpy, no
    device traffic): used by scripts/persist_quantized_dit.py to produce
    the pre-quantized native checkpoint once, offline — the serving
    build then uploads 7.6 GB of int8 instead of 14.5 GB of bf16 and
    skips the conversion + quantization math entirely."""
    import numpy as _np

    key = "q8" if act_quant else "q"

    def visit(node):
        if isinstance(node, dict):
            if (
                "w" in node
                and len(node) == 1
                and hasattr(node["w"], "ndim")
                and node["w"].ndim == 2
                and node["w"].size >= _MIN_SIZE
            ):
                wf = _np.asarray(node["w"], _np.float32)
                scale = _np.abs(wf).max(axis=0, keepdims=True) / 127.0
                scale = _np.maximum(scale, 1e-12)
                q = _np.clip(_np.round(wf / scale), -127, 127).astype(_np.int8)
                return {key: q, "scale": scale.astype(_np.float32)}
            return {k: visit(v) for k, v in node.items()}
        if isinstance(node, list):
            return [visit(v) for v in node]
        return node

    return visit(params)


def quantized_bytes(params: Any) -> int:
    return sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
    )
