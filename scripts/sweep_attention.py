"""Sweep splash-attention block configs at the GEN3C self-attention shape.

NOTE: timings include a ~26 ms host-read floor (CLAUDE.md); negligible
at the ~700 ms kernel times measured here.

Shape: B=2 (CFG), H=32, L=56,320 (16x88x160/4 latent tokens), D=128, bf16.
Finds the fastest (block_q, block_kv, block_kv_compute, layouts) combo on
the attached TPU. Results print incrementally to stderr; the best config
prints as one JSON line on stdout at the end.

Run:  python scripts/sweep_attention.py [--quick]
Each config costs one (possibly slow, remote) compile; the persistent
compilation cache makes re-runs cheap.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp

from jax.experimental.pallas.ops.tpu.splash_attention import (
    splash_attention_kernel as sk,
    splash_attention_mask as sm,
)

B, H, L, D = 2, 32, 56320, 128
FLOPS = 4.0 * B * H * L * L * D  # QK^T + PV


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def time_config(bq: int, bkv: int, bkvc: int, q_seq_minor: bool,
                kv_seq_minor: bool, iters: int = 2) -> float:
    lay = sk.QKVLayout.SEQ_MINOR
    hdm = sk.QKVLayout.HEAD_DIM_MINOR
    bs = sk.BlockSizes(
        block_q=bq, block_kv=bkv, block_kv_compute=bkvc,
        block_q_dkv=bq, block_kv_dkv=bkv, block_kv_dkv_compute=bkvc,
        block_q_dq=bq, block_kv_dq=bkv,
        q_layout=lay if q_seq_minor else hdm,
        k_layout=lay if kv_seq_minor else hdm,
        v_layout=lay if kv_seq_minor else hdm,
    )
    mmask = sm.MultiHeadMask([sm.FullMask((L, L))] * H)
    kernel = sk.make_splash_mha(mask=mmask, head_shards=1, q_seq_shards=1,
                                block_sizes=bs)
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, L, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, L, D), jnp.bfloat16)
    f = jax.jit(lambda q, k, v: jnp.sum(jax.vmap(kernel)(q, k, v)))
    float(f(q, k, v))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(q, k, v))  # host read: block_until_ready lies via the tunnel
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="block sizes only, default layouts")
    args = ap.parse_args()

    log(f"backend: {jax.default_backend()}")
    # (block_q, block_kv) candidates. VMEM per KV buffer ~ bkv*D*2B*2(k,v)
    # double-buffered; 2816 -> ~2.9 MB, safe in the ~16 MB scope.
    combos = [
        (1408, 1024),  # current production config (143 TF/s baseline)
        (1408, 2816),
        (2816, 1408),
        (2816, 2816),
        (1408, 1408),
        (2816, 1024),
        (1024, 2816),
        (3520, 1408),
        (1408, 704),
        (5120, 1024),
    ]
    kvc_fracs = [1, 2] if not args.quick else [1]
    layouts = [(False, False)]
    if not args.quick:
        layouts += [(True, False), (False, True), (True, True)]

    results = []
    for (bq, bkv), frac in itertools.product(combos, kvc_fracs):
        bkvc = bkv // frac
        if bkvc % 128:
            continue
        for (qs, ks) in (layouts if (bq, bkv) == (1408, 1024) else [(False, False)]):
            tag = f"bq={bq} bkv={bkv} bkvc={bkvc} qseq={qs} kvseq={ks}"
            try:
                dt = time_config(bq, bkv, bkvc, qs, ks)
                tf = FLOPS / dt / 1e12
                results.append((tf, dt, tag))
                log(f"  {tag}: {dt*1e3:.0f} ms = {tf:.1f} TF/s")
            except Exception as e:  # noqa: BLE001
                log(f"  {tag}: FAILED {type(e).__name__}: {str(e)[:200]}")
                jax.clear_caches()
    if not results:
        raise SystemExit("no config succeeded")
    results.sort(reverse=True)
    best_tf, best_dt, best_tag = results[0]
    log("\n== ranking ==")
    for tf, dt, tag in results:
        log(f"  {tf:7.1f} TF/s  {dt*1e3:6.0f} ms  {tag}")
    print(json.dumps({"best": best_tag, "tflops": round(best_tf, 1),
                      "ms": round(best_dt * 1e3, 1)}))


if __name__ == "__main__":
    main()
