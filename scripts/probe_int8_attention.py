"""Probe: raw MXU matmul rate, bf16 vs int8, as a function of the
contraction depth K — the go/no-go fact for a SageAttention-style int8
attention kernel on v5e.

Attention's QK^T contracts over head_dim = 128 (shallow); PV contracts
over the kv-block (deep). int8's nominal 2x over bf16 (394 vs 197 TOPS)
may require deep contractions to materialize. This measures pure MXU
rate with a Pallas kernel that keeps one (M,K)x(K,N) tile resident in
VMEM and re-issues the dot R times inside a fori_loop (a tiny
VPU add defeats loop-invariant hoisting), so HBM bandwidth and the
~26 ms host-read floor are out of the picture.

Run: python scripts/probe_int8_attention.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def log(m):
    print(m, file=sys.stderr, flush=True)


def _mm_loop_kernel(a_ref, b_ref, o_ref, *, reps, acc_dtype):
    M, N = a_ref.shape[0], b_ref.shape[1]

    def body(i, acc):
        # i-dependent VPU nudge so Mosaic can't hoist the dot out
        a = a_ref[:] + (i % 2).astype(a_ref.dtype)
        return acc + jnp.dot(a, b_ref[:], preferred_element_type=acc_dtype)

    acc = jnp.zeros((M, N), acc_dtype)
    o_ref[:] = jax.lax.fori_loop(0, reps, body, acc)


def mxu_rate(M, K, N, dtype, reps=20000):
    acc_dtype = jnp.int32 if dtype == jnp.int8 else jnp.float32
    key = jax.random.PRNGKey(0)
    if dtype == jnp.int8:
        a = jax.random.randint(key, (M, K), -100, 100, jnp.int8)
        b = jax.random.randint(jax.random.PRNGKey(1), (K, N), -100, 100,
                               jnp.int8)
    else:
        a = jax.random.normal(key, (M, K), dtype)
        b = jax.random.normal(jax.random.PRNGKey(1), (K, N), dtype)
    kern = pl.pallas_call(
        functools.partial(_mm_loop_kernel, reps=reps, acc_dtype=acc_dtype),
        out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
    )
    f = jax.jit(lambda a, b: jnp.sum(kern(a, b).astype(jnp.float32)))
    try:
        float(f(a, b))  # compile + warm
    except Exception as e:  # noqa: BLE001
        log(f"  M{M} K{K} N{N} {jnp.dtype(dtype).name:<5} FAILED: "
            f"{str(e)[:120]}")
        return None
    t0 = time.perf_counter()
    float(f(a, b))
    # subtract the host-read floor, clamped: a config faster than the
    # floor would otherwise report a negative/infinite rate
    dt = max(time.perf_counter() - t0 - 0.026, 1e-4)
    rate = 2 * M * K * N * reps / dt / 1e12
    log(f"  M{M:<5} K{K:<5} N{N:<5} {jnp.dtype(dtype).name:<5} "
        f"{dt*1e3:8.1f} ms  {rate:7.1f} T/s")
    return rate


def main():
    log(f"backend: {jax.default_backend()}")
    log("\nMXU rate vs contraction depth (M=N=512):")
    results = {}
    for K in (128, 256, 512, 1024):
        reps = max(2000, int(20000 * 128 / K))
        r16 = mxu_rate(512, K, 512, jnp.bfloat16, reps)
        r8 = mxu_rate(512, K, 512, jnp.int8, reps)
        if r16 and r8:
            results[K] = (r16, r8, r8 / r16)
            log(f"    -> int8/bf16 at K={K}: {r8 / r16:.2f}x")
    log("\nattention-block shapes:")
    # QK^T block: (1408,128)@(128,1024); PV block: (1408,1024)@(1024,128)
    for (M, K, N, tag) in ((1408, 128, 1024, "QK^T"), (1408, 1024, 128, "PV")):
        reps = max(1000, int(8000 * 128 / K))
        r16 = mxu_rate(M, K, N, jnp.bfloat16, reps)
        r8 = mxu_rate(M, K, N, jnp.int8, reps)
        if r16 and r8:
            log(f"    -> {tag}: int8/bf16 {r8 / r16:.2f}x")
    print("{}")


if __name__ == "__main__":
    main()
