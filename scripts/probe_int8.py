"""Probe: can W8A8 int8 matmul beat bf16 on v5e at the GEN3C shapes?

NOTE: timings include a ~26 ms host-read floor (CLAUDE.md): the real
matmul speeds are higher than printed; RATIOS between configs only need
the floor subtracted once.

v5e peak: 394 TOPS int8 vs 197 TFLOPS bf16. Tests the full dynamic-quant
pipeline (per-token activation absmax -> int8 x int8 -> int32 -> rescale)
against the bf16 baseline, and checks numerical error.

Run: python scripts/probe_int8.py
"""

from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import jax
import jax.numpy as jnp

B, L, D = 2, 56320, 4096


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(name, f, *args, iters=3, tf=None):
    g = jax.jit(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))
    try:
        float(g(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(g(*args))
        dt = (time.perf_counter() - t0) / iters
        extra = f"  ({tf / dt / 1e12:.1f} T/s)" if tf else ""
        log(f"  {name:<34} {dt * 1e3:8.1f} ms{extra}")
        return dt
    except Exception as e:  # noqa: BLE001
        log(f"  {name:<34} FAILED: {str(e)[:150]}")
        jax.clear_caches()
        return None


def w8a8_matmul(x_bf16, wq, wscale):
    """per-token dynamic activation quant + int8 MXU matmul + rescale.
    x: (B, L, D) bf16; wq: (D, F) int8; wscale: (1, F) f32 per-out-channel.
    """
    xf = x_bf16.astype(jnp.float32)
    xscale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0  # (B,L,1)
    xq = jnp.clip(jnp.round(xf / xscale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (B, L, F) int32
    return (acc.astype(jnp.float32) * xscale * wscale).astype(jnp.bfloat16)


def main():
    log(f"backend: {jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, L, D), jnp.bfloat16)
    for F, tag in ((D, "DxD"), (4 * D, "Dx4D")):
        w = jax.random.normal(jax.random.PRNGKey(1), (D, F), jnp.float32) / 64
        wbf = w.astype(jnp.bfloat16)
        wscale = (jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0)
        wq = jnp.clip(jnp.round(w / wscale), -127, 127).astype(jnp.int8)
        flops = 2 * B * L * D * F
        timeit(f"{tag} bf16", lambda x, w=wbf: x @ w, x, tf=flops)
        timeit(f"{tag} w8a8 dynamic", lambda x, wq=wq, ws=wscale:
               w8a8_matmul(x, wq, ws), x, tf=flops)
        # pure int8 dot (no quant/rescale): upper bound
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 16), -127, 127
                      ).astype(jnp.int8)
        timeit(f"{tag} int8 dot only", lambda xq, wq=wq: jax.lax.dot_general(
            xq, wq, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32), xq, tf=flops)
        # numerical error of w8a8 vs f32 reference on a slice
        xs = x[:, :256].astype(jnp.float32)
        ref = xs @ w
        got = w8a8_matmul(x[:, :256], wq, wscale).astype(jnp.float32)
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        log(f"  {tag} w8a8 rel. error: {rel:.4f}")


if __name__ == "__main__":
    main()
