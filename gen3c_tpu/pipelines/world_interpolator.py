"""World interpolator: generate the video between two key frames.

Parity: cosmos_predict1/diffusion/inference/world_interpolator.py +
model_world_interpolator.py — conditioning location "first_and_last_1":
the first and last latent frames are pinned to the two input images and
the sampler fills the middle.

Usage:
  python -m gen3c_tpu.pipelines.world_interpolator \
      --first_image a.png --last_image b.png [--model_preset cosmos_v2w_tiny]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax.numpy as jnp

from gen3c_tpu.diffusion.sampler import arch_invariant_randn, generate_samples
from gen3c_tpu.models.conditioner import (
    VideoExtendCondition,
    add_condition_video_indicator_and_input_mask,
)
from gen3c_tpu.models.gen3c import _dit_net_fn
from gen3c_tpu.pipelines.factory import build_gen3c_model
from gen3c_tpu.pipelines.text2world import T2W_PRESETS
from gen3c_tpu.utils import io as io_utils
from gen3c_tpu.utils import log


def create_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Cosmos world interpolator (TPU)")
    p.add_argument("--first_image", type=str, default=None)
    p.add_argument("--last_image", type=str, default=None)
    p.add_argument("--input_video", type=str, default=None,
                   help="interpolate between consecutive frame pairs of "
                        "this video (reference world_interpolator.py "
                        "video mode), chaining segments with a 1-frame "
                        "overlap")
    p.add_argument("--num_frame_pairs", type=int, default=None,
                   help="pairs to process (default: frames//stride - 1)")
    p.add_argument("--frame_stride", type=int, default=1,
                   help="stride between the frames of each pair "
                        "(reference --frame_stride)")
    p.add_argument("--model_preset", type=str, default="cosmos_v2w_7b",
                   choices=sorted(T2W_PRESETS))
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    p.add_argument("--prompt", type=str, default="")
    p.add_argument("--guidance", type=float, default=7.0)
    p.add_argument("--guidance_interval", type=float, nargs=2,
                   default=None, metavar=("SIGMA_LO", "SIGMA_HI"),
                   help="restrict CFG to steps with sigma in [LO, HI] "
                        "(arXiv:2404.07724); cond-only forwards "
                        "(~half cost) outside the interval")
    p.add_argument("--num_steps", type=int, default=35)
    p.add_argument("--solver", default="res2ab",
                   choices=("euler", "dpm2m", "res2ab"),
                   help="the reference interpolator samples with the "
                        "res_sampler's '2ab' exponential-integrator "
                        "multistep by default (res_sampler.py:127) — "
                        "res2ab is its parity; euler/dpm2m for ablation")
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--video_save_name", type=str, default="output")
    p.add_argument("--video_save_folder", type=str, default="outputs/")
    p.add_argument("--quantize_int8", action="store_true")
    p.add_argument("--quantize_w8a8", action="store_true")
    p.add_argument("--offload_diffusion_transformer", action="store_true",
                   help="stage DiT params host<->HBM per phase "
                        "(auto-enabled for 7B presets on one device)")
    return p


def demo(args) -> str:
    preset = T2W_PRESETS[args.model_preset]
    assert preset.dit.in_channels >= 17, "interpolation needs a v2w preset"
    offload = (args.offload_diffusion_transformer
               or args.model_preset.endswith("_7b"))
    if offload and not (args.quantize_int8 or args.quantize_w8a8):
        log.info(
            "unquantized model with offload: the DiT will run "
            "block-streamed at full bf16 precision"
        )
    model, preset = build_gen3c_model(
        preset, checkpoint_dir=args.checkpoint_dir, seed=args.seed,
        quantize="w8a8" if args.quantize_w8a8 else args.quantize_int8,
        offload_dit=offload, offload_tokenizer=offload,
    )
    h, w = preset.height, preset.width

    if args.input_video:
        # reference video mode (world_generation_pipeline.py:1300-1380):
        # interpolate each (i*stride, i*stride+stride) frame pair,
        # chain segments skipping the duplicated first frame
        video_in, _ = io_utils.read_video_bcthw(args.input_video, h, w)
        n_frames = video_in.shape[2]
        stride = args.frame_stride
        n_pairs = args.num_frame_pairs or max(n_frames // stride - 1, 1)
        segments = []
        for i in range(n_pairs):
            a, b = i * stride, i * stride + stride
            if b >= n_frames:
                break
            log.info(f"Processing frame pair {i + 1} / {n_pairs}...")
            seg = _interpolate_pair(
                model, preset,
                video_in[:, :, a : a + 1],
                video_in[:, :, b : b + 1],
                args, seed=args.seed + i,
            )
            segments.append(seg if not segments else seg[1:])
        video = np.concatenate(segments, axis=0)
    else:
        if not (args.first_image and args.last_image):
            raise SystemExit(
                "provide --input_video OR --first_image + --last_image")
        first = io_utils.read_image_bcthw(args.first_image, h, w)
        last = io_utils.read_image_bcthw(args.last_image, h, w)
        video = _interpolate_pair(model, preset, first, last, args,
                                  seed=args.seed)

    path = os.path.join(args.video_save_folder, f"{args.video_save_name}.mp4")
    path = io_utils.save_video(video, args.fps, path)
    log.info(f"Saved interpolated video to {path}")
    return path


def _interpolate_pair(model, preset, first, last, args, seed: int):
    """One first/last-conditioned chunk -> (T, H, W, 3) uint8."""
    C, T, Hl, Wl = preset.state_shape
    B = 1

    # encode each end into its own latent chunk (inference_utils.py:736-757
    # first_and_last_1 path: each end is zero-padded and encoded separately)
    lat_first = model.create_condition_latent_from_input_frames(
        jnp.asarray(first), 1
    )
    lat_last = model.create_condition_latent_from_input_frames(
        jnp.asarray(last), 1
    )
    gt = jnp.concatenate(
        [
            lat_first[:, :, :1],
            jnp.zeros((B, C, T - 2, Hl, Wl), lat_first.dtype),
            lat_last[:, :, :1],
        ],
        axis=2,
    )

    cond = VideoExtendCondition(
        crossattn_emb=jnp.zeros((B, 512, 1024), jnp.float32)
    )
    cond = add_condition_video_indicator_and_input_mask(
        gt, cond, num_condition_t=1, condition_location="first_and_last_1"
    )

    init_noise = np.random.RandomState(seed).standard_normal(
        (B, C, T, Hl, Wl)
    ).astype(np.float32)
    from gen3c_tpu.diffusion.sampler import generate_samples_auto

    samples = generate_samples_auto(
        net_fn=_dit_net_fn,
        net_params=(model.dit_params, model.dit_cfg),
        offload=getattr(model, "offload_dit", False),
        streaming_net=getattr(model, "streaming_net", None),
        init_noise=jnp.asarray(init_noise),
        augment_noise=jnp.asarray(
            arch_invariant_randn((B, C, T, Hl, Wl), seed)
        ),
        crossattn_cond=cond.crossattn_emb,
        crossattn_uncond=jnp.zeros_like(cond.crossattn_emb),
        gt_latent=cond.gt_latent,
        condition_video_indicator=cond.condition_video_indicator,
        condition_video_input_mask=cond.condition_video_input_mask,
        num_steps=args.num_steps,
        guidance=args.guidance,
        guidance_interval=(tuple(args.guidance_interval)
                           if args.guidance_interval else None),
        solver=args.solver,
    )
    video = model.decode(samples)
    from gen3c_tpu.pipelines.gen3c_pipeline import fetch_video_uint8

    return fetch_video_uint8(video)


if __name__ == "__main__":
    demo(create_parser().parse_args())
