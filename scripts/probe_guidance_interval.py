"""Guidance-interval speedup at the full 7B W8A8 production shape.

The limited-interval CFG (``--guidance_interval``, arXiv:2404.07724)
runs a condition-only forward (batch B) on the steps whose sigma lies
outside the interval, instead of the 2B [cond|uncond] pair. This probe
times both step programs on one chip and projects the denoise
wall-clock at common interval coverages.

Usage: python scripts/probe_guidance_interval.py [q ...]
  (q = fraction of the 35 steps that keep CFG; default 0.75 0.5)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from gen3c_tpu.models.dit import GEN3C_7B, dit_forward, init_dit_params
from gen3c_tpu.models.quantize import quantize_dit_params_inplace


def bench(qparams, B, label, cfg=None):
    cfg = cfg or GEN3C_7B
    x = jax.random.normal(
        jax.random.PRNGKey(1), (B, 81, 16, 88, 160), jnp.bfloat16)
    t = jnp.ones((B,), jnp.float32)
    ctx = jax.random.normal(
        jax.random.PRNGKey(2), (B, 512, 1024), jnp.bfloat16)
    f = jax.jit(
        lambda p, x, t, c: jnp.sum(
            dit_forward(p, cfg, x, t, c, fps=24.0)))
    float(f(qparams, x, t, ctx))
    t0 = time.perf_counter()
    for _ in range(3):
        float(f(qparams, x, t, ctx))
    dt = (time.perf_counter() - t0) / 3
    print(f"{label}: {dt:.2f}s/step", flush=True)
    return dt


if __name__ == "__main__":
    params = init_dit_params(jax.random.PRNGKey(0), GEN3C_7B, jnp.bfloat16)
    qparams = quantize_dit_params_inplace(params, act_quant=True)
    import dataclasses

    band = None
    if "--band" in sys.argv:
        band = int(sys.argv[sys.argv.index("--band") + 1])
    cfg = (dataclasses.replace(GEN3C_7B, attn_temporal_window=band)
           if band else GEN3C_7B)
    tag = f", band {band}" if band else ""
    cfg_step = bench(qparams, 2, f"CFG pair (2B batched, W8A8{tag})",
                     cfg)
    cond_step = bench(qparams, 1, f"cond-only (B, W8A8{tag})", cfg)
    print(f"  cond-only / CFG ratio: {cond_step / cfg_step:.3f}",
          flush=True)
    num_steps = 35
    argv = sys.argv[1:]
    if "--band" in argv:
        i = argv.index("--band")
        argv = argv[:i] + argv[i + 2:]
    qs = [float(a) for a in argv if not a.startswith("-")] or [
        0.75, 0.5,
    ]
    for q in qs:
        n_cfg = max(1, int(round(q * num_steps)))
        wall = n_cfg * cfg_step + (num_steps - n_cfg) * cond_step
        base = num_steps * cfg_step
        print(
            f"  q={q} ({n_cfg}/{num_steps} CFG steps): projected denoise "
            f"{wall/60:.1f} min = {base/wall:.2f}x vs full CFG",
            flush=True,
        )
