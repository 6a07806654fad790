"""Tokenizer (video VAE) training losses + step.

Parity: cosmos_predict1/tokenizer/training/ (losses: reconstruction,
perceptual, flow/video temporal consistency). TPU-native functional
equivalents without torch-pretrained perceptual networks:

  * reconstruction: L1 + MSE mix
  * gradient (edge) loss as the dependency-free perceptual proxy
    (matches high-frequency detail the VGG perceptual term targets)
  * temporal-consistency: the reconstruction of frame differences must
    match the input's frame differences (the flow-loss objective without
    an external flow network)
  * latent regularization: small L2 on the latent (AE formulation —
    continuous_video uses IdentityDistribution, no KL)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from gen3c_tpu.models.vae import VAEConfig, vae_decode, vae_encode

Array = jax.Array


def _gradients(x: Array) -> Tuple[Array, Array]:
    dh = x[..., 1:, :] - x[..., :-1, :]
    dw = x[..., :, 1:] - x[..., :, :-1]
    return dh, dw


def piecewise_weight(iteration: Array, boundaries, values) -> Array:
    """Iteration-scheduled loss weight (continuous.py:63-74
    WeightScheduler): returns values[i] for the first boundary the
    iteration is below, else values[-1]. jit-friendly (iteration may be
    traced); len(values) == len(boundaries) + 1 or == len(boundaries)
    (reference zips and falls through to values[-1])."""
    b = jnp.asarray(list(boundaries))
    v = jnp.asarray(list(values) + [values[-1]], jnp.float32)
    idx = jnp.searchsorted(b, iteration, side="right")
    return v[jnp.minimum(idx, len(values))]


def video_consistency_windows(video: Array, num_frames: int,
                              step: int) -> Array:
    """Sliding windows along T (continuous.py:400-416 shuffle):
    (B,3,T,H,W) -> (B*num_windows, 3, num_frames, H, W)."""
    B, C, T, H, W = video.shape
    assert T >= num_frames, (T, num_frames)
    n_win = (T - num_frames) // step + 1
    wins = jnp.stack(
        [video[:, :, i * step : i * step + num_frames] for i in range(n_win)],
        axis=1,
    )  # (B, n_win, C, nf, H, W)
    return wins.reshape(B * n_win, C, num_frames, H, W)


def video_consistency_loss(
    params: Dict[str, Array],
    cfg: VAEConfig,
    video: Array,  # (B, 3, T, H, W)
    num_frames: int,
    step: int,
) -> Array:
    """Overlapped-window reconstruction consistency
    (continuous.py:391-440 VideoConsistencyLoss): each sliding window is
    tokenized INDEPENDENTLY; the L1 between the overlapping frames of
    consecutive windows' reconstructions penalizes chunk-boundary
    flicker (the artifact the 121-frame chunk policy hits)."""
    B = video.shape[0]
    wins = video_consistency_windows(video, num_frames, step)
    recon = vae_decode(params, cfg, vae_encode(params, cfg, wins))
    n_win = wins.shape[0] // B
    recon = recon.reshape(B, n_win, *recon.shape[1:]).astype(jnp.float32)
    return jnp.mean(
        jnp.abs(recon[:, :-1, :, step:] - recon[:, 1:, :, :-step])
    )


def tokenizer_loss(
    params: Dict[str, Array],
    cfg: VAEConfig,
    video: Array,  # (B, 3, T, H, W) in [-1, 1]
    w_l1: float = 1.0,
    w_mse: float = 1.0,
    w_grad: float = 0.5,
    w_temporal: float = 0.5,
    w_latent: float = 1e-4,
    w_consistency: float = 0.0,
    consistency_frames: int = 0,
    consistency_step: int = 1,
    iteration: Array | int = 0,
    schedules: Dict[str, Tuple] | None = None,
    lpips_params: Dict[str, Array] | None = None,
    w_perceptual: float = 1.0,
    w_gram: float = 0.0,
    w_flow: float = 0.0,
    flow_scale: int = 2,
    flow_fn=None,
) -> Tuple[Array, dict]:
    """schedules: optional {"l1"|"mse"|"grad"|"temporal"|"consistency":
    (boundaries, values)} iteration-dependent multipliers
    (WeightScheduler parity; applied ON TOP of the w_* base weight).

    lpips_params: VGG16 feature weights (training/lpips.py) -> adds the
    REFERENCE perceptual term (tokenizer/training/losses/lpips.py) with
    weight w_perceptual; without them the gradient (edge) proxy above
    remains the dependency-free stand-in."""
    def sched(name):
        if schedules and name in schedules:
            b, v = schedules[name]
            return piecewise_weight(iteration, b, v)
        return 1.0

    latent = vae_encode(params, cfg, video)
    recon = vae_decode(params, cfg, latent)
    vf = video.astype(jnp.float32)
    rf = recon.astype(jnp.float32)

    l1 = jnp.mean(jnp.abs(rf - vf))
    mse = jnp.mean((rf - vf) ** 2)
    gh_r, gw_r = _gradients(rf)
    gh_v, gw_v = _gradients(vf)
    grad_loss = jnp.mean(jnp.abs(gh_r - gh_v)) + jnp.mean(jnp.abs(gw_r - gw_v))
    dt_r = rf[:, :, 1:] - rf[:, :, :-1]
    dt_v = vf[:, :, 1:] - vf[:, :, :-1]
    temporal = jnp.mean(jnp.abs(dt_r - dt_v))
    latent_reg = jnp.mean(latent.astype(jnp.float32) ** 2)

    loss = (
        w_l1 * sched("l1") * l1
        + w_mse * sched("mse") * mse
        + w_grad * sched("grad") * grad_loss
        + w_temporal * sched("temporal") * temporal
        + w_latent * latent_reg
    )
    metrics = {
        "l1": l1,
        "mse": mse,
        "grad": grad_loss,
        "temporal": temporal,
    }
    if lpips_params is not None:
        from gen3c_tpu.training.lpips import perceptual_video

        # production PerceptualLoss semantics (layer-weighted masked L1
        # on raw VGG features + optional gram term, continuous.py:122-209)
        perceptual, gram = perceptual_video(
            lpips_params, vf, rf, gram=w_gram > 0.0
        )
        loss = loss + w_perceptual * sched("perceptual") * perceptual
        metrics["perceptual"] = perceptual
        if gram is not None:
            loss = loss + w_gram * sched("gram") * gram
            metrics["gram"] = gram
    if w_flow > 0.0 and video.shape[2] > 1:
        from gen3c_tpu.training.flow import flow_loss

        # reference FlowLoss semantics (continuous.py:218-383) with the
        # pluggable flow estimator (RAFT when checkpoint-loaded via
        # flow_fn — aux/raft.py; LK fallback otherwise)
        fl = flow_loss(vf, rf, flow_fn=flow_fn, scale=flow_scale)
        loss = loss + w_flow * sched("flow") * fl
        metrics["flow"] = fl
    if w_consistency > 0.0 and consistency_frames > 0:
        consistency = video_consistency_loss(
            params, cfg, video, consistency_frames, consistency_step
        )
        loss = loss + w_consistency * sched("consistency") * consistency
        metrics["consistency"] = consistency
    metrics["loss"] = loss
    return loss, metrics


def tokenizer_train_step(
    params: Any,
    opt_state: Any,
    video: Array,
    cfg: VAEConfig,
    optimizer: optax.GradientTransformation,
    iteration: Array | int = 0,
    **loss_kwargs,
) -> Tuple[Any, Any, dict]:
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: tokenizer_loss(p, cfg, video, iteration=iteration,
                                 **loss_kwargs),
        has_aux=True,
    )(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, metrics


def main(argv=None) -> None:
    """Tokenizer training CLI (tokenizer/training parity):

      python -m gen3c_tpu.training.tokenizer_train --synthetic \
          --max_iter 100 [--data_root clips/] [--save path.npz]

    Data: --data_root with video .npz clips (VideoClipDataset layout) or
    --synthetic random clips. Checkpoints save as native npz.
    """
    import argparse

    import numpy as np

    from gen3c_tpu.models import vae as jvae
    from gen3c_tpu.utils import log

    p = argparse.ArgumentParser()
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--frames", type=int, default=9)
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--max_iter", type=int, default=100)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--save", type=str, default=None)
    p.add_argument("--channels", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--w_consistency", type=float, default=0.0,
                   help="overlapped-window reconstruction consistency "
                        "weight (reference VideoConsistencyLoss)")
    p.add_argument("--consistency_frames", type=int, default=0,
                   help="sliding-window length (8k+1) for "
                        "--w_consistency")
    p.add_argument("--consistency_step", type=int, default=8)
    p.add_argument("--perceptual", choices=["none", "lpips"],
                   default="none",
                   help="lpips: the reference VGG16 perceptual loss "
                        "(training/lpips.py); needs --lpips_checkpoint "
                        "(torchvision vgg16 weights) — falls back to a "
                        "RANDOM VGG with a warning when absent so tiny "
                        "runs stay executable")
    p.add_argument("--lpips_checkpoint", type=str, default=None)
    p.add_argument("--w_perceptual", type=float, default=1.0)
    p.add_argument("--w_gram", type=float, default=0.0,
                   help="gram-matrix style term of the production "
                        "PerceptualLoss (continuous.py:189-208)")
    p.add_argument("--w_flow", type=float, default=0.0,
                   help="flow-consistency loss (reference FlowLoss "
                        "semantics, training/flow.py)")
    p.add_argument("--flow_estimator", choices=["lk", "raft"],
                   default="lk",
                   help="raft: the reference's RAFT-Large network "
                        "(aux/raft.py, torchvision topology; needs "
                        "--raft_checkpoint — falls back to a RANDOM "
                        "RAFT with a warning when absent so the graph "
                        "stays executable); lk: the dependency-free "
                        "Lucas-Kanade fallback")
    p.add_argument("--raft_checkpoint", type=str, default=None,
                   help="torchvision raft_large .pth or converted .npz")
    p.add_argument("--flow_iters", type=int, default=12,
                   help="RAFT GRU update iterations (reference default)")
    args = p.parse_args(argv)
    from gen3c_tpu.utils.jax_setup import setup_jax

    setup_jax()  # persistent compile cache across CLI runs

    cfg = jvae.VAEConfig(
        channels=args.channels, channels_mult=(2, 4, 4), num_res_blocks=1,
        attn_resolutions=(), resolution=args.resolution, patch_size=4,
        latent_channels=4, z_channels=4,
    )
    if (args.frames - 1) % 8:
        raise SystemExit(
            f"--frames {args.frames} must be 8k+1 (causal temporal "
            "compression of the CV8x8x8 topology)"
        )
    params = jvae.init_vae_params(jax.random.PRNGKey(args.seed), cfg)
    lpips_params = None
    if args.perceptual == "lpips":
        from gen3c_tpu.training import lpips as lpips_mod

        if args.lpips_checkpoint:
            lpips_params = lpips_mod.load_lpips_params(args.lpips_checkpoint)
            log.info(f"LPIPS VGG16 loaded from {args.lpips_checkpoint}")
        else:
            log.warning(
                "--perceptual lpips without --lpips_checkpoint: using a "
                "RANDOM VGG16 (structure-only; loss values are not the "
                "reference's)"
            )
            lpips_params = lpips_mod.init_vgg16_params(
                jax.random.PRNGKey(1234)
            )
    flow_fn = None
    if args.w_flow > 0.0 and args.flow_estimator == "raft":
        from gen3c_tpu.aux import raft as raft_mod

        if args.raft_checkpoint:
            raft_params = raft_mod.load_raft_params(args.raft_checkpoint)
            log.info(f"RAFT-Large loaded from {args.raft_checkpoint}")
        else:
            log.warning(
                "--flow_estimator raft without --raft_checkpoint: using "
                "a RANDOM RAFT (structure-only; flow values are noise — "
                "real runs need the torchvision raft_large weights)"
            )
            raft_params = raft_mod.init_raft_params(jax.random.PRNGKey(7))
        flow_fn = raft_mod.make_raft_flow_fn(
            raft_params, num_flow_updates=args.flow_iters)
    optimizer = optax.adamw(args.lr)
    opt_state = optimizer.init(params)
    step = jax.jit(
        lambda p, o, v, it: tokenizer_train_step(
            p, o, v, cfg, optimizer, iteration=it,
            w_consistency=args.w_consistency,
            consistency_frames=args.consistency_frames,
            consistency_step=args.consistency_step,
            lpips_params=lpips_params,
            w_perceptual=args.w_perceptual,
            w_gram=args.w_gram,
            w_flow=args.w_flow,
            flow_fn=flow_fn,
        )
    )

    rng = np.random.RandomState(args.seed)

    def batches():
        if args.data_root:
            import os

            from gen3c_tpu.training.datasets import _to_signed_range

            clips = sorted(
                os.path.join(args.data_root, f)
                for f in os.listdir(args.data_root)
                if f.endswith(".npz")
            )
            assert clips, f"no clips under {args.data_root}"

            def one_clip():
                path = clips[rng.randint(len(clips))]
                data = np.load(path)
                v = data["video"].astype(np.float32)
                if v.shape[-1] == 3:
                    v = v.transpose(0, 3, 1, 2)
                v = _to_signed_range(v, path)
                assert v.shape[0] >= args.frames, (
                    f"{path}: {v.shape[0]} frames < --frames {args.frames}"
                )
                start = rng.randint(0, v.shape[0] - args.frames + 1)
                return v[start : start + args.frames].transpose(1, 0, 2, 3)

            while True:
                yield jnp.asarray(
                    np.stack([one_clip() for _ in range(args.batch_size)])
                )
        else:
            while True:
                yield jnp.asarray(
                    rng.rand(
                        args.batch_size, 3, args.frames,
                        args.resolution, args.resolution
                    ).astype(np.float32) * 2 - 1
                )

    it = batches()
    for i in range(1, args.max_iter + 1):
        params, opt_state, metrics = step(
            params, opt_state, next(it), jnp.asarray(i)
        )
        if i % args.log_every == 0:
            log.info(
                f"tokenizer step {i}: loss {float(metrics['loss']):.4f} "
                f"(l1 {float(metrics['l1']):.4f}, "
                f"temporal {float(metrics['temporal']):.4f})"
            )
    if args.save:
        from gen3c_tpu.utils.checkpoint import save_params_npz

        save_params_npz(args.save, params)
        log.info(f"saved tokenizer params to {args.save}")


if __name__ == "__main__":
    main()
