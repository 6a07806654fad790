"""Probe: int4 weight-only on v5e — does jnp.int4 compile, and does it
beat int8 weight-only in the WEIGHT-READ-BOUND decode regime?

Two regimes:
  * decode (B=16, L=1): time ~ weight bytes / HBM bandwidth. int4 halves
    the weight read vs int8 -> up to ~2x vs bf16 if unpack is free.
  * prefill-ish (L large): MXU-bound, int4 upcast adds work.

Storage variants probed:
  a) jnp.int4 native dtype (XLA packs 2/byte?) -> astype(bf16) -> dot
  b) packed uint8 (two nibbles/byte), unpack w/ shifts -> bf16 -> dot

Timing: K invocations chained in one jit; single host read; 26 ms floor
subtracted once in ratio reasoning (CLAUDE.md).

Run: python scripts/probe_int4.py
"""

from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


D, F = 4096, 14336  # llama-8B MLP shape (weight-read-bound at decode)


def chain_time(name, step, x, reps=8, iters=3):
    """step: x -> y (same shape); chain reps inside one jit."""
    def body(x):
        def f(c, _):
            return step(c), None
        y, _ = jax.lax.scan(f, x, None, length=reps)
        return jnp.sum(y.astype(jnp.float32))
    g = jax.jit(body)
    try:
        float(g(x))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(g(x))
        dt = (time.perf_counter() - t0) / iters
        per = (dt - 0.026) / reps
        log(f"  {name:<40} {per*1e3:8.2f} ms/step")
        return per
    except Exception as e:  # noqa: BLE001
        log(f"  {name:<40} FAILED: {str(e)[:200]}")
        jax.clear_caches()
        return None


def main():
    log(f"backend: {jax.default_backend()}")
    rng = np.random.RandomState(0)
    B = 16
    x = jnp.asarray(rng.randn(B, D).astype(np.float32), jnp.bfloat16)

    w_f = rng.randn(D, F).astype(np.float32)
    scale = jnp.asarray(np.abs(w_f).max(axis=0, keepdims=True) / 7.0,
                        jnp.bfloat16)
    w_i4_np = np.clip(np.round(w_f / np.asarray(scale, np.float32)), -8, 7
                      ).astype(np.int8)

    w_bf = jnp.asarray(w_f, jnp.bfloat16)
    w_i8 = jnp.asarray(np.clip(np.round(w_f / (np.abs(w_f).max(axis=0,
                       keepdims=True) / 127.0)), -127, 127), jnp.int8)
    s_i8 = jnp.asarray(np.abs(w_f).max(axis=0, keepdims=True) / 127.0,
                       jnp.bfloat16)

    # a) native int4 dtype
    try:
        w_i4 = jnp.asarray(w_i4_np, jnp.int4)
        log(f"native int4 created: {w_i4.dtype}, nbytes={w_i4.nbytes}")
    except Exception as e:  # noqa: BLE001
        w_i4 = None
        log(f"native int4 creation FAILED: {str(e)[:200]}")

    # b) packed nibbles in uint8: low = col 2k, high = col 2k+1
    lo = (w_i4_np[:, 0::2] & 0xF).astype(np.uint8)
    hi = (w_i4_np[:, 1::2] & 0xF).astype(np.uint8)
    w_pk = jnp.asarray(lo | (hi << 4))  # (D, F//2) uint8

    def mm_bf16(x):
        return (x @ w_bf).astype(jnp.bfloat16)[:, :D]

    def mm_i8(x):
        y = jax.lax.dot_general(
            x, w_i8.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * s_i8.astype(jnp.float32)
        return y.astype(jnp.bfloat16)[:, :D]

    def mm_i4_native(x):
        y = jax.lax.dot_general(
            x, w_i4.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale.astype(jnp.float32)
        return y.astype(jnp.bfloat16)[:, :D]

    def mm_i4_packed(x):
        lo = (w_pk & 0xF).astype(jnp.int8)
        hi = (w_pk >> 4).astype(jnp.int8)
        # sign-extend nibbles: v>=8 -> v-16
        lo = jnp.where(lo >= 8, lo - 16, lo)
        hi = jnp.where(hi >= 8, hi - 16, hi)
        w = jnp.stack([lo, hi], axis=-1).reshape(D, F).astype(jnp.bfloat16)
        y = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale.astype(jnp.float32)
        return y.astype(jnp.bfloat16)[:, :D]

    log(f"decode regime: x ({B},{D}) @ W ({D},{F}) -> take [:, :D] to chain")
    chain_time("bf16", mm_bf16, x)
    chain_time("int8 weight-only (upcast)", mm_i8, x)
    if w_i4 is not None:
        chain_time("int4 native dtype (upcast)", mm_i4_native, x)
    chain_time("int4 packed-uint8 (unpack)", mm_i4_packed, x)

    # accuracy of int4 vs f32
    y_ref = np.asarray(x.astype(jnp.float32) @ jnp.asarray(w_f))
    y_i4 = np.asarray(jax.jit(mm_i4_packed)(x).astype(jnp.float32))
    # recompute full output for error (mm returns [:, :D] slice)
    def full_i4(x):
        lo = (w_pk & 0xF).astype(jnp.int8)
        hi = (w_pk >> 4).astype(jnp.int8)
        lo = jnp.where(lo >= 8, lo - 16, lo)
        hi = jnp.where(hi >= 8, hi - 16, hi)
        w = jnp.stack([lo, hi], axis=-1).reshape(D, F).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale.astype(jnp.float32)
    y_i4f = np.asarray(jax.jit(full_i4)(x))
    rel = np.abs(y_i4f - y_ref).mean() / (np.abs(y_ref).mean() + 1e-9)
    log(f"int4 packed rel err vs f32: {rel:.4f}")


if __name__ == "__main__":
    main()
