"""Measure a real training step on the TPU chip (time / TF/s / MFU).

The serving path has measured perf rows (bench.py, docs/STATUS.md); this
probe adds the training hot path: one jitted train_step (EDM loss +
AdamW + EMA, per-block remat) on a sub-7B DiT sized to fit one 16 GB
v5e beside its fp32 optimizer+EMA state.

FLOP accounting: fwd + bwd ~= 3x forward matmul FLOPs; per-block remat
re-runs the forward inside the bwd => ~4x. MFU is against the 197 TF/s
v5e bf16 peak.

Usage: python scripts/probe_train_step.py [--channels 1536] [--blocks 12]
       [--lat 16 11 40 72] [--iters 3] [--no-remat]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

V5E_PEAK_BF16 = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=1536)
    ap.add_argument("--blocks", type=int, default=12)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--lat", type=int, nargs=4, default=[16, 11, 40, 72],
                    help="latent C T H W")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--no-remat", action="store_true")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from gen3c_tpu.models.dit import DiTConfig, init_dit_params
    from gen3c_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        train_step,
    )

    C, T, H, W = args.lat
    B = args.batch
    cfg = DiTConfig(
        in_channels=C + 1 + 64,
        out_channels=C,
        model_channels=args.channels,
        num_blocks=args.blocks,
        num_heads=args.heads,
        adaln_lora_dim=256,
        rope_t_extrapolation_ratio=2.0,
        dtype=jnp.bfloat16,
    )
    params = init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.0f}M ({args.channels}ch x "
          f"{args.blocks} blocks)", flush=True)

    optimizer = make_optimizer()
    state = init_train_state(params, optimizer)
    rng = jax.random.PRNGKey(1)
    batch = {
        "x0": jnp.asarray(
            np.random.RandomState(0).randn(B, C, T, H, W), jnp.float32
        ),
        "crossattn_emb": jnp.asarray(
            np.random.RandomState(1).randn(B, 128, 1024), jnp.float32
        ),
        "extra_channels": jnp.zeros((B, 1 + 64, T, H, W), jnp.float32),
    }

    remat = not args.no_remat
    step_fn = jax.jit(
        lambda s, b, r: train_step(s, b, r, cfg, optimizer, remat=remat,
                                   video_extend=True),
        donate_argnums=(0,),
    )
    print("compiling train step...", flush=True)
    state, metrics = step_fn(state, batch, rng)
    print(f"  warm loss={float(metrics['loss']):.4f}", flush=True)

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, i))
    _ = float(metrics["loss"])  # force host read (tunnel-safe sync)
    dt = (time.perf_counter() - t0) / args.iters

    # forward matmul FLOPs (2*M*N*K), same accounting as bench.step_flops
    D = cfg.model_channels
    ps, pt = cfg.patch_spatial, cfg.patch_temporal
    N = (T // pt) * (H // ps) * (W // ps)
    M = 128
    cin = cfg.in_channels + 1
    fwd = (
        2 * N * (cin * ps * ps * pt) * D
        + 2 * N * D * (C * ps * ps * pt)
        + cfg.num_blocks * (
            4 * 2 * N * D * D
            + 2 * 2 * N * D * D + 2 * 2 * M * 1024 * D
            + 2 * 2 * N * D * int(D * cfg.mlp_ratio)
            + 2 * 2 * N * N * D
            + 2 * 2 * N * M * D
        )
    ) * B
    mult = 4.0 if remat else 3.0
    flops = fwd * mult
    tf = flops / dt / 1e12
    print(
        f"train step ({'remat' if remat else 'no-remat'}): {dt:.3f}s, "
        f"{N*B} tokens, {flops/1e12:.1f} TFLOPs -> {tf:.0f} TF/s "
        f"= {tf*1e12/V5E_PEAK_BF16:.2f} MFU (fwd x{mult:.0f} accounting)"
    )


if __name__ == "__main__":
    main()
