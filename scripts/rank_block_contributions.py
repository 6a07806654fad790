"""Rank DiT blocks by contribution to pick a Delta-DiT cache span.

CorGi (arXiv:2512.24195) observes that blocks contribute unevenly to
the denoising trajectory, so the best blocks to cache (skip + replay
their residual) are the LOW-contribution ones. This script measures,
per block, the relative residual magnitude

    r_i = mean ||block_i(x) - x|| / mean ||x||

across a few denoise steps, then prints the contiguous span of a
requested width with the smallest total contribution — the recommended
`--step_cache_block_span LO HI`.

With real GEN3C weights (--checkpoint_dir) the ranking reflects the
production model; with random init it only demonstrates the method.

Run: python scripts/rank_block_contributions.py [--span_width 14]
     [--preset gen3c_tiny] [--checkpoint_dir checkpoints]
"""

from __future__ import annotations

import argparse
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
        _adaln_modulation,
        _attn_block,
        _layer_norm,
        _mlp_block,
        _modulated_residual,
        build_extra_pos_emb,
        patchify,
        rope_3d_table,
        timestep_sincos,
        _rms_norm,
        _w,
    )
    from gen3c_tpu.pipelines.factory import build_gen3c_model

    model, preset = build_gen3c_model(
        args.preset, checkpoint_dir=args.checkpoint_dir, seed=args.seed
    )
    cfg = model.dit_cfg
    params = model.dit_params
    n = cfg.num_blocks
    width = args.span_width or n // 2

    C, Tl, Hl, Wl = preset.state_shape
    rng = np.random.RandomState(args.seed)
    sched = EDMEulerSchedule()
    sigmas = np.asarray(sched.sigmas(args.num_sigmas + 1))[:-1]

    def per_block_residuals(x, t_scalar):
        """Trace one forward, recording each block's relative residual."""
        x = x.astype(cfg.dtype)
        tokens = patchify(cfg, params, x, None)
        B, Tp, Hp, Wp, D = tokens.shape
        L = Tp * Hp * Wp
        tokens = tokens.reshape(B, L, D)
        rope = rope_3d_table(cfg, Tp, Hp, Wp, fps=24.0)
        extra = build_extra_pos_emb(params, Tp, Hp, Wp).astype(cfg.dtype)
        extra = extra.reshape(1, L, D)
        ts = jnp.full((B,), t_scalar, jnp.float32)
        sincos = timestep_sincos(ts, D)
        h = sincos @ _w(params["t_embedder"]["linear_1"], jnp.float32)
        h = jax.nn.silu(h)
        lora = h @ _w(params["t_embedder"]["linear_2"], jnp.float32)
        emb = _rms_norm(sincos, params["affline_norm"]["scale"])
        ctx = jnp.zeros((B, 8, cfg.crossattn_emb_channels), cfg.dtype)

        rels = []
        for blk in params["blocks"]:
            before = tokens
            tokens = tokens + extra
            tokens = _modulated_residual(
                tokens,
                lambda t: _attn_block(blk["fa"], t, None, cfg.num_heads,
                                      rope),
                blk["fa"], emb, lora,
            )
            tokens = _modulated_residual(
                tokens,
                lambda t: _attn_block(blk["ca"], t, ctx, cfg.num_heads,
                                      None),
                blk["ca"], emb, lora,
            )
            tokens = _modulated_residual(
                tokens, lambda t: _mlp_block(blk["mlp"], t), blk["mlp"],
                emb, lora,
            )
            rel = jnp.mean(
                jnp.abs(tokens.astype(jnp.float32)
                        - before.astype(jnp.float32))
            ) / (jnp.mean(jnp.abs(before.astype(jnp.float32))) + 1e-8)
            rels.append(rel)
        return jnp.stack(rels)

    fwd = jax.jit(per_block_residuals)
    total = np.zeros((n,), np.float64)
    for sigma in sigmas:
        x = jnp.asarray(
            rng.randn(1, cfg.in_channels, Tl, Hl, Wl) * float(sigma),
            jnp.float32,
        ) * float(sched.c_in(float(sigma)))
        t = float(np.log(sigma) / 4.0)
        rels = np.asarray(fwd(x, t), np.float64)
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
    import json

    print(json.dumps({
        "span": [best_lo, best_lo + width],
        "per_block": [round(float(v), 5) for v in total],
    }))


if __name__ == "__main__":
    main()
