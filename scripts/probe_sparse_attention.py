"""Measure temporal-band sparse attention vs full splash attention on
the real chip at the GEN3C production shape (L=56320 = 16 frames x
3520 tokens, 32 heads, d=128, B=2 CFG).

Timing per CLAUDE.md: chain reps inside one jit, force a host read,
subtract the ~26 ms tunnel floor.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from gen3c_tpu.models.dit import attention_op

B, H, D = 2, 32, 128
T_FRAMES, HW = 16, 3520
L = T_FRAMES * HW
REPS = 4


def bench(temporal_band, label):
    @jax.jit
    def run(q, k, v):
        out = jnp.zeros_like(q)
        for _ in range(REPS):
            out = attention_op(q + out * 1e-9, k, v,
                               temporal_band=temporal_band)
        return out

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, L, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, L, H, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, L, H, D), jnp.bfloat16)
    float(jnp.sum(run(q, k, v)))  # compile + warm
    t0 = time.perf_counter()
    float(jnp.sum(run(q, k, v)))
    dt = (time.perf_counter() - t0 - 0.026) / REPS
    dt = max(dt, 1e-4)
    flops_full = 4.0 * B * H * L * L * D
    print(f"{label}: {dt*1e3:.1f} ms/op "
          f"({flops_full/dt/1e12:.1f} full-equiv TF/s)")
    return dt


if __name__ == "__main__":
    full = bench(None, "full attention")
    for win in (4, 2, 1):
        dt = bench((HW, win, 1), f"band window={win}")
        kv_frac = min(2 * win + 2, T_FRAMES) / T_FRAMES
        print(f"  speedup {full/dt:.2f}x (ideal ~{1/kv_frac:.2f}x)")
