"""Probe: int8 KV cache decode throughput vs bf16 on the real chip.

Measures steady-state single-token decode (the KV-bandwidth-bound
regime) for a llama-8B-shaped config at a long context, with the cache
pre-filled: tokens/s with a bf16 cache vs the int8 cache (scales folded
into attention — models/ar_transformer.py). Decode reads the whole
cache every step, so the expected ceiling is ~2x when decode is
KV-bound and ~1x when weight reads dominate.

NOTE: ~26 ms host-read floor (CLAUDE.md) — K decode steps are chained
inside one jitted lax.scan before the single host read.

Run: python scripts/probe_kv_int8.py [--layers 8] [--seq 8192]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8,
                    help="8 layers of 8B-shape ~ 2 GB weights: decode "
                         "stays KV-bound at long context")
    ap.add_argument("--seq", type=int, default=8192)
    ap.add_argument("--decode_tokens", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gen3c_tpu.models.ar_transformer import (
        ARConfig,
        ar_forward,
        init_ar_params,
        init_kv_cache,
        rope_tables,
    )

    cfg = ARConfig(
        dim=4096, n_layers=args.layers, n_heads=32, n_kv_heads=8,
        vocab_size=32000, ffn_hidden_size=14336,
        max_seq_len=args.seq, dtype=jnp.bfloat16,
    )
    params = init_ar_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    rope = rope_tables(cfg)
    # short prefill: decode attends over (and therefore reads) the FULL
    # max_seq cache buffer every step regardless of pos, which is the
    # bandwidth being measured; a long prefill would only OOM on the
    # naive causal score matrix
    prefill_len = 1024
    rng = np.random.RandomState(0)
    prompt = jnp.asarray(rng.randint(0, 32000, (1, prefill_len)), jnp.int32)

    kv_bytes = (2 * cfg.n_layers * args.seq * cfg.n_kv_heads
                * cfg.head_dim)

    def bench(quantized):
        cache = init_kv_cache(cfg, 1, dtype=cfg.dtype,
                              quantized=quantized)
        _, cache = ar_forward(params, cfg, prompt, rope, cache)

        @jax.jit
        def decode_n(cache, tok):
            def step(carry, _):
                cache, tok = carry
                logits, cache = ar_forward(params, cfg, tok, rope, cache)
                nxt = jnp.argmax(logits[:, -1], axis=-1)[:, None]
                return (cache, nxt.astype(jnp.int32)), ()

            (cache, tok), _ = jax.lax.scan(
                step, (cache, tok), None, length=args.decode_tokens
            )
            return tok

        tok0 = jnp.asarray([[1]], jnp.int32)
        float(jnp.sum(decode_n(cache, tok0)))  # compile + warm
        t0 = time.perf_counter()
        float(jnp.sum(decode_n(cache, tok0)))
        dt = time.perf_counter() - t0 - 0.026
        per_tok = dt / args.decode_tokens
        bytes_per_tok = kv_bytes * (1 if quantized else 2)
        eff_bw = bytes_per_tok / per_tok / 1e9
        tag = "int8" if quantized else "bf16"
        print(f"  {tag} cache: {per_tok*1e3:7.2f} ms/token "
              f"({1/per_tok:6.1f} tok/s, KV read ~{eff_bw:.0f} GB/s)",
              file=sys.stderr)
        return per_tok

    print(f"decode probe: {args.layers} layers x 8B shape, "
          f"seq {args.seq}, KV cache "
          f"{kv_bytes*2/1e9:.2f} GB bf16 / {kv_bytes/1e9:.2f} GB int8",
          file=sys.stderr)
    t_bf16 = bench(False)
    t_int8 = bench(True)
    import json

    print(json.dumps({
        "bf16_ms_per_token": round(t_bf16 * 1e3, 2),
        "int8_ms_per_token": round(t_int8 * 1e3, 2),
        "speedup": round(t_bf16 / t_int8, 3),
    }))


if __name__ == "__main__":
    main()
