"""Probe: int8 weight-only AR decode vs bf16 on the real chip.

Decode at small batch is weight-read-bound, so halving weight bytes
should approach 2x tokens/s. Two measurements:
  1. a ~3.5B-shape model that fits HBM in BOTH precisions -> speedup
     ratio;
  2. the full Llama-Guard-3-8B shape in int8 (8.5 GB) — which does not
     fit at all in bf16 (16 GB weights alone) -> absolute tok/s, the
     capacity claim.

Timing per CLAUDE.md: chain K decode steps inside one jit before a
single host read; subtract nothing (multi-second totals).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

from gen3c_tpu.models.ar_transformer import (
    ARConfig,
    generate,
    init_ar_params,
)
import gen3c_tpu.models.quantize as qz


def log(m):
    print(m, file=sys.stderr, flush=True)


def _init_int8_direct(cfg: ARConfig) -> dict:
    """Random int8 tree built WITHOUT a bf16 source (the 8B bf16 weights
    alone exceed HBM, so quantize-from-bf16 cannot run on device;
    real checkpoints quantize leaf-by-leaf from host RAM instead).
    Timing-equivalent to a converted tree."""
    key = jax.random.PRNGKey(0)

    def q(i, o):
        nonlocal key
        key, k1 = jax.random.split(key)
        return {
            "q": jax.random.randint(k1, (i, o), -127, 128, jnp.int8),
            "scale": jnp.full((1, o), 0.01, jnp.float32),
        }

    hd = cfg.head_dim
    layers = []
    for _ in range(cfg.n_layers):
        layers.append({
            "attention_norm": {"scale": jnp.ones((cfg.dim,), jnp.bfloat16)},
            "ffn_norm": {"scale": jnp.ones((cfg.dim,), jnp.bfloat16)},
            "wq": q(cfg.dim, cfg.n_heads * hd),
            "wk": q(cfg.dim, cfg.n_kv_heads * hd),
            "wv": q(cfg.dim, cfg.n_kv_heads * hd),
            "wo": q(cfg.n_heads * hd, cfg.dim),
            "w1": q(cfg.dim, cfg.ffn_hidden_size),
            "w2": q(cfg.ffn_hidden_size, cfg.dim),
            "w3": q(cfg.dim, cfg.ffn_hidden_size),
        })
    return {
        "tok_embeddings": q(cfg.vocab_size, cfg.dim),
        "layers": layers,
        "norm": {"scale": jnp.ones((cfg.dim,), jnp.bfloat16)},
        "output": q(cfg.dim, cfg.vocab_size),
    }


def bench(cfg: ARConfig, quantized: bool, steps: int = 64,
          B: int = 1, direct_int8: bool = False) -> float:
    if direct_int8:
        params = _init_int8_direct(cfg)
    else:
        params = init_ar_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
        if quantized:
            params = qz.quantize_ar_params(params)
    nbytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
    )
    log(f"  params: {nbytes/1e9:.2f} GB ({'int8' if quantized else 'bf16'})")
    ids = jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.vocab_size, (B, 32)),
        jnp.int32,
    )
    out = generate(params, cfg, ids, jax.random.PRNGKey(1),
                   max_new_tokens=steps, temperature=0.0)
    float(jnp.sum(out))  # compile + warm (host read: tunnel-safe)
    t0 = time.perf_counter()
    out = generate(params, cfg, ids, jax.random.PRNGKey(2),
                   max_new_tokens=steps, temperature=0.0)
    float(jnp.sum(out))
    dt = time.perf_counter() - t0
    ms = dt / steps * 1e3
    log(f"  {ms:.1f} ms/decode-step ({B * steps / dt:.1f} tok/s)")
    return ms


def main():
    log(f"backend: {jax.default_backend()}")
    # ~3.5B shape: fits HBM in bf16 (7 GB) AND int8 (3.6 GB)
    mid = ARConfig(
        dim=3072, n_layers=28, n_heads=24, n_kv_heads=8,
        vocab_size=64000, ffn_hidden_size=8192, max_seq_len=2048,
        use_qk_normalization=False, dtype=jnp.bfloat16,
    )
    log("3.5B shape, bf16:")
    t_bf16 = bench(mid, False)
    log("3.5B shape, int8 weight-only:")
    t_int8 = bench(mid, True)
    log(f"int8 weight-only decode speedup: {t_bf16 / t_int8:.2f}x")

    # Llama-Guard-3-8B shape: int8-only (bf16 weights alone are 16 GB)
    lg = ARConfig(
        dim=4096, n_layers=32, n_heads=32, n_kv_heads=8,
        vocab_size=128256, ffn_hidden_size=14336, max_seq_len=2048,
        use_qk_normalization=False, dtype=jnp.bfloat16,
    )
    log("8B (Llama-Guard-3) shape, int8 weight-only (bf16 does not fit):")
    bench(lg, True, direct_int8=True)


if __name__ == "__main__":
    main()
