"""Quality/speed table for the three step-caching policies.

Runs the denoise loop uncached and under each caching policy on the
same inputs, reporting latent PSNR vs the uncached trajectory and the
number of network refreshes (= relative wall-clock). With real weights
(--checkpoint_dir) the PSNRs are the production quality deltas; with
random init the table still characterizes how much each policy perturbs
the trajectory.

Run: python scripts/cache_quality_gate.py [--preset gen3c_tiny]
     [--num_steps 35] [--checkpoint_dir checkpoints]
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


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    peak = float(np.max(np.abs(np.asarray(b)))) or 1.0
    return 10.0 * np.log10(peak * peak / mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="gen3c_tiny")
    ap.add_argument("--checkpoint_dir", default=None)
    ap.add_argument("--num_steps", type=int, default=35)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from gen3c_tpu.diffusion.sampler import generate_samples
    from gen3c_tpu.models.gen3c import (
        _dit_net_fn,
        _dit_net_fn_span_refresh,
        _dit_net_fn_span_skip,
    )
    from gen3c_tpu.pipelines.factory import build_gen3c_model

    model, preset = build_gen3c_model(
        args.preset, checkpoint_dir=args.checkpoint_dir, seed=args.seed
    )
    cfg = model.dit_cfg
    params = model.dit_params
    if args.checkpoint_dir is None:
        # fresh init has zero adaLN gates + zero final linear (blocks
        # are identity, output constant) -> every policy would trivially
        # match; randomize those so the trajectory is non-degenerate
        from gen3c_tpu.models.dit import randomize_degenerate_inits

        params = randomize_degenerate_inits(params, seed=99)
    C, Tl, Hl, Wl = preset.state_shape
    B = 1
    rng = np.random.RandomState(args.seed)
    n = args.num_steps

    common = dict(
        init_noise=jnp.asarray(rng.randn(B, C, Tl, Hl, Wl), jnp.float32),
        augment_noise=jnp.zeros((B, C, Tl, Hl, Wl)),
        crossattn_cond=jnp.asarray(
            rng.randn(B, 16, cfg.crossattn_emb_channels), jnp.float32
        ),
        crossattn_uncond=jnp.zeros((B, 16, cfg.crossattn_emb_channels)),
        gt_latent=jnp.zeros((B, C, Tl, Hl, Wl)),
        condition_video_indicator=jnp.zeros((1, 1, Tl, 1, 1))
        .at[:, :, :1].set(1.0),
        condition_video_input_mask=jnp.zeros((B, 1, Tl, Hl, Wl)),
        pose_latent_cond=jnp.asarray(
            rng.randn(B, 64, Tl, Hl, Wl), jnp.float32
        ),
        pose_latent_uncond=jnp.zeros((B, 64, Tl, Hl, Wl)),
        num_steps=n,
        guidance=1.0,
    )

    warmup, tail = 2, 2

    def fixed_refreshes(interval):
        return sum(
            1 for i in range(n)
            if i < warmup or i >= n - tail
            or (i - warmup) % interval == 0
        )

    ref = generate_samples(net_fn=_dit_net_fn, net_params=(params, cfg),
                           **common)
    rows = []

    for interval in (2, 3):
        out = generate_samples(
            net_fn=_dit_net_fn, net_params=(params, cfg),
            step_cache_interval=interval, **common,
        )
        r = fixed_refreshes(interval)
        rows.append({
            "policy": f"fixed interval={interval}",
            "psnr_vs_uncached": round(psnr(out, ref), 2),
            "relative_cost": round(r / n, 3),
        })

    for thr in (0.05, 0.15, 0.3):
        out = generate_samples(
            net_fn=_dit_net_fn, net_params=(params, cfg),
            step_cache_threshold=thr, **common,
        )
        rows.append({
            "policy": f"adaptive threshold={thr}",
            "psnr_vs_uncached": round(psnr(out, ref), 2),
            "relative_cost": None,  # data-dependent refresh count
        })

    nb = cfg.num_blocks
    span = (nb // 4, nb - nb // 4)
    cfg_span = dataclasses.replace(cfg, cache_block_span=span)
    for interval in (2, 3):
        out = generate_samples(
            net_fn=_dit_net_fn_span_refresh,
            net_fn_skip=_dit_net_fn_span_skip,
            net_params=(params, cfg_span),
            step_cache_interval=interval, **common,
        )
        r = fixed_refreshes(interval)
        frac = (span[1] - span[0]) / nb
        cost = (r + (n - r) * (1 - frac)) / n
        rows.append({
            "policy": f"span {span} interval={interval}",
            "psnr_vs_uncached": round(psnr(out, ref), 2),
            "relative_cost": round(cost, 3),
        })

    for row in rows:
        print(f"  {row['policy']:<28} PSNR {row['psnr_vs_uncached']:>7} dB"
              f"   cost {row['relative_cost']}", file=sys.stderr)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
