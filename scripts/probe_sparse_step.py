"""Full 7B W8A8 denoise step: temporal-band sparse attention vs full.

Measures the end-to-end 28-block step at the production shape with
cfg.attn_temporal_window set, on one chip.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from gen3c_tpu.models.dit import GEN3C_7B, dit_forward, init_dit_params
from gen3c_tpu.models.quantize import quantize_dit_params_inplace


def bench(cfg, qparams, label):
    B = 2
    x = jax.random.normal(
        jax.random.PRNGKey(1), (B, 81, 16, 88, 160), jnp.bfloat16)
    t = jnp.ones((B,), jnp.float32)
    ctx = jax.random.normal(
        jax.random.PRNGKey(2), (B, 512, 1024), jnp.bfloat16)
    f = jax.jit(
        lambda p, x, t, c: jnp.sum(dit_forward(p, cfg, x, t, c, fps=24.0)))
    float(f(qparams, x, t, ctx))
    t0 = time.perf_counter()
    for _ in range(3):
        float(f(qparams, x, t, ctx))
    dt = (time.perf_counter() - t0) / 3
    print(f"{label}: {dt:.2f}s/step", flush=True)
    return dt


def rel_delta(cfg_a, cfg_b, qparams):
    """Math-level output delta between two attention configs. NOTE:
    random 7B weights overflow bf16 activations (inf -> nan delta), so
    this is only meaningful with REAL converted weights — kept for when
    checkpoints are available; not called by default."""
    B = 1
    x = jax.random.normal(
        jax.random.PRNGKey(5), (B, 81, 16, 88, 160), jnp.bfloat16)
    t = jnp.ones((B,), jnp.float32)
    ctx = jax.random.normal(
        jax.random.PRNGKey(6), (B, 512, 1024), jnp.bfloat16)

    @jax.jit
    def both(p, x, t, c):
        a = dit_forward(p, cfg_a, x, t, c, fps=24.0).astype(jnp.float32)
        b = dit_forward(p, cfg_b, x, t, c, fps=24.0).astype(jnp.float32)
        num = jnp.sqrt(jnp.mean((a - b) ** 2))
        den = jnp.sqrt(jnp.mean(a ** 2))
        return num / den

    r = float(both(qparams, x, t, ctx))
    print(f"  rel output delta vs full (random weights): {r:.4f}",
          flush=True)
    return r


if __name__ == "__main__":
    params = init_dit_params(jax.random.PRNGKey(0), GEN3C_7B, jnp.bfloat16)
    qparams = quantize_dit_params_inplace(params, act_quant=True)
    full = bench(GEN3C_7B, qparams, "full attention (W8A8)")
    wins = [a for a in sys.argv[1:] if not a.startswith("-")] or ["2"]
    for win in (int(a) for a in wins):
        cfg = dataclasses.replace(GEN3C_7B, attn_temporal_window=win)
        dt = bench(cfg, qparams, f"band window={win} (W8A8)")
        print(f"  step speedup {full/dt:.2f}x", flush=True)
        if "--rel-delta" in sys.argv:  # real weights only (see rel_delta)
            rel_delta(GEN3C_7B, cfg, qparams)
