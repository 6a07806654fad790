"""Probe: int8 KV cache decode throughput vs bf16 on the real chip.

Measures steady-state batched decode (the regime where KV reads rival or
exceed weight reads) for a llama-8B-shaped config: tokens/s with a bf16
cache vs the int8 cache (scales folded into attention —
models/ar_transformer.py). Every decode step reads all weights once and
every sequence's full KV buffer, so with W = weight bytes and K = bf16
KV bytes the expected wall-clock ratio is ~(W + K) / (W + K/2); the
probe prints that prediction next to the measurement. At B=1 (the
original probe shape) W dominates 13:1 and the expected win is ~4% —
int8 KV is then a *capacity* feature (2x context per chip), which is
why the default shape is batched.

NOTE: ~26 ms host-read floor (CLAUDE.md) — K decode steps are chained
inside one jitted lax.scan before the single host read. Kept small
(--layers 4, --decode_tokens 32) so the remote compile helper finishes;
the 8-layer variant timed out / broke the compile pipe twice 2026-08-16.

Run: python scripts/probe_kv_int8.py [--batch 16] [--layers 4] [--seq 8192]
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
    ap.add_argument("--batch", type=int, default=16,
                    help="decode batch: each sequence owns a full KV "
                         "buffer, so B scales KV reads but not weight "
                         "reads — B=8 makes the step KV-bound")
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--seq", type=int, default=8192)
    ap.add_argument("--decode_tokens", type=int, default=32)
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
    B = args.batch
    # short prefill: decode attends over (and therefore reads) the FULL
    # max_seq cache buffer every step regardless of pos, which is the
    # bandwidth being measured; a long prefill would only OOM on the
    # naive causal score matrix
    prefill_len = min(128, args.seq // 2)
    rng = np.random.RandomState(0)
    prompt = jnp.asarray(rng.randint(0, 32000, (B, prefill_len)), jnp.int32)

    kv_bytes_bf16 = (2 * B * cfg.n_layers * args.seq * cfg.n_kv_heads
                     * cfg.head_dim * 2)
    w_bytes = sum(
        np.prod(p.shape) * 2 for p in jax.tree.leaves(params)
    )
    pred = (w_bytes + kv_bytes_bf16) / (w_bytes + kv_bytes_bf16 / 2)

    def bench(quantized):
        cache = init_kv_cache(cfg, B, dtype=cfg.dtype,
                              quantized=quantized)
        _, cache = ar_forward(params, cfg, prompt, rope, cache)

        @jax.jit
        def decode_n(params, cache, tok):
            # params as an ARGUMENT: closure capture would bake 2.3 GB
            # of weights into the program as constants (slow compile)
            def step(carry, _):
                cache, tok = carry
                logits, cache = ar_forward(params, cfg, tok, rope, cache)
                nxt = jnp.argmax(logits[:, -1], axis=-1)[:, None]
                return (cache, nxt.astype(jnp.int32)), ()

            (cache, tok), _ = jax.lax.scan(
                step, (cache, tok), None, length=args.decode_tokens
            )
            return tok

        tok0 = jnp.ones((B, 1), jnp.int32)
        float(jnp.sum(decode_n(params, cache, tok0)))  # compile + warm
        t0 = time.perf_counter()
        float(jnp.sum(decode_n(params, cache, tok0)))
        dt = time.perf_counter() - t0 - 0.026
        per_tok = dt / args.decode_tokens
        bytes_per_tok = w_bytes + kv_bytes_bf16 // (2 if quantized else 1)
        eff_bw = bytes_per_tok / per_tok / 1e9
        tag = "int8" if quantized else "bf16"
        print(f"  {tag} cache: {per_tok*1e3:7.2f} ms/step "
              f"({B/per_tok:6.1f} tok/s, HBM read ~{eff_bw:.0f} GB/s)",
              file=sys.stderr)
        return per_tok

    print(f"decode probe: B={B}, {args.layers} layers x 8B shape, "
          f"seq {args.seq}: weights {w_bytes/1e9:.2f} GB, KV "
          f"{kv_bytes_bf16/1e9:.2f} GB bf16 / {kv_bytes_bf16/2e9:.2f} GB "
          f"int8; predicted bandwidth-bound speedup {pred:.2f}x",
          file=sys.stderr)
    t_bf16 = bench(False)
    t_int8 = bench(True)
    import json

    print(json.dumps({
        "bf16_ms_per_step": round(t_bf16 * 1e3, 2),
        "int8_ms_per_step": round(t_int8 * 1e3, 2),
        "speedup": round(t_bf16 / t_int8, 3),
        "predicted_speedup": round(pred, 3),
    }))


if __name__ == "__main__":
    main()
