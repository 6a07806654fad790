"""Rank DiT blocks by contribution to pick a Delta-DiT cache span.

CorGi (arXiv:2512.24195) observes that blocks contribute unevenly to
the denoising trajectory, so the best blocks to cache (skip + replay
their residual) are the LOW-contribution ones. This script measures,
per block, the relative residual magnitude

    r_i = mean ||block_i(x) - x|| / mean ||x||

across a few denoise noise levels — via dit_forward's
return_block_residuals hook, so the measurement always matches the real
forward — then prints the contiguous span of a requested width with the
smallest total contribution: the recommended
`--step_cache_block_span LO HI`.

With real GEN3C weights (--checkpoint_dir) the ranking reflects the
production model; with random init the degenerate zero-init gates are
randomized first and the run only demonstrates the method.

Run: python scripts/rank_block_contributions.py [--span_width 14]
     [--preset gen3c_tiny] [--checkpoint_dir checkpoints]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="gen3c_tiny")
    ap.add_argument("--checkpoint_dir", default=None)
    ap.add_argument("--span_width", type=int, default=None,
                    help="default: half the blocks")
    ap.add_argument("--num_sigmas", type=int, default=4,
                    help="noise levels sampled across the EDM schedule")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gen3c_tpu.diffusion.scheduler import EDMEulerSchedule
    from gen3c_tpu.models.dit import (
        dit_forward,
        randomize_degenerate_inits,
    )
    from gen3c_tpu.pipelines.factory import build_gen3c_model

    model, preset = build_gen3c_model(
        args.preset, checkpoint_dir=args.checkpoint_dir, seed=args.seed
    )
    cfg = model.dit_cfg
    params = model.dit_params
    if args.checkpoint_dir is None:
        params = randomize_degenerate_inits(params)
    n = cfg.num_blocks
    width = args.span_width or n // 2

    C, Tl, Hl, Wl = preset.state_shape
    rng = np.random.RandomState(args.seed)
    sched = EDMEulerSchedule()
    sigmas = np.asarray(sched.sigmas(args.num_sigmas + 1))[:-1]
    ctx = jnp.zeros((1, 8, cfg.crossattn_emb_channels), jnp.float32)

    @jax.jit
    def residuals(x, t):
        _, rels = dit_forward(
            params, cfg, x, jnp.full((1,), t, jnp.float32), ctx,
            fps=24.0, return_block_residuals=True,
        )
        return rels

    total = np.zeros((n,), np.float64)
    for sigma in sigmas:
        x = jnp.asarray(
            rng.randn(1, cfg.in_channels, Tl, Hl, Wl) * float(sigma),
            jnp.float32,
        ) * float(sched.c_in(float(sigma)))
        t = float(np.log(sigma) / 4.0)
        rels = np.asarray(residuals(x, t), np.float64)
        total += rels
        print(f"sigma={float(sigma):9.3f}: "
              + " ".join(f"{v:.3f}" for v in rels), file=sys.stderr)

    total /= len(sigmas)
    print("\nper-block mean relative residual:", file=sys.stderr)
    for i, v in enumerate(total):
        print(f"  block {i:2d}: {v:.4f}", file=sys.stderr)

    best_lo, best_sum = 0, float("inf")
    for lo in range(0, n - width + 1):
        s = float(total[lo:lo + width].sum())
        if s < best_sum:
            best_lo, best_sum = lo, s
    print(f"\nrecommended --step_cache_block_span {best_lo} "
          f"{best_lo + width} (width {width}, total contribution "
          f"{best_sum:.4f})", file=sys.stderr)
    print(json.dumps({
        "span": [best_lo, best_lo + width],
        "per_block": [round(float(v), 5) for v in total],
    }))


if __name__ == "__main__":
    main()
