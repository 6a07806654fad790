"""Dynamic-scene video-to-video generation (GEN3C), TPU-native CLI.

Parity: cosmos_predict1/diffusion/inference/gen3c_dynamic.py:
video + per-frame depth + poses (ViPE output or packaged data) ->
Cache4D (one cache frame per video frame, no cache update — depth is
known for all frames) -> generation along a preset or stored camera
trajectory, chunked 121*N-1 with 1-frame overlap.

Usage:
  python -m gen3c_tpu.pipelines.gen3c_dynamic \
      --vipe_path <vipe_root_or_mp4> | --input_video_path <dir_or_pt> \
      --trajectory left [--model_preset gen3c_tiny]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax.numpy as jnp

from gen3c_tpu.cache import Cache4D
from gen3c_tpu.ops.camera import (
    CAMERA_ROTATIONS,
    TRAJECTORY_TYPES,
    generate_camera_trajectory,
)
from gen3c_tpu.pipelines import data_loaders
from gen3c_tpu.pipelines.chunked import compose_buffer_video, run_chunked_generation
from gen3c_tpu.pipelines.factory import PRESETS, build_gen3c_model
from gen3c_tpu.pipelines.gen3c_pipeline import Gen3cPipeline
from gen3c_tpu.utils import io as io_utils
from gen3c_tpu.utils import log


def create_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="GEN3C dynamic video (TPU)")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    p.add_argument("--model_preset", type=str, default="gen3c_7b",
                   choices=sorted(PRESETS))
    p.add_argument("--prompt", type=str, default="")
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--vipe_path", type=str, default=None)
    p.add_argument("--vipe_starting_frame_idx", type=int, default=0)
    p.add_argument("--input_video_path", type=str, default=None,
                   help="distributed dir / packaged .pt or .npz")
    p.add_argument("--video_save_name", type=str, default="output")
    p.add_argument("--solver", default="euler",
                   choices=("euler", "dpm2m", "res2ab"),
                   help="denoise integration rule at equal network cost")
    p.add_argument("--video_save_folder", type=str, default="outputs/")
    p.add_argument("--guidance", type=float, default=1.0)
    p.add_argument("--num_steps", type=int, default=35)
    p.add_argument("--num_video_frames", type=int, default=121)
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--t5_backend", type=str, default="jax",
                   choices=["jax", "torch"],
                   help="T5 encoder stack: TPU-native JAX or host torch")
    p.add_argument("--disable_prompt_encoder", action="store_true",
                   default=True)
    p.add_argument("--enable_prompt_encoder", dest="disable_prompt_encoder",
                   action="store_false")
    p.add_argument("--trajectory", type=str, default="none",
                   choices=sorted(TRAJECTORY_TYPES))
    p.add_argument("--camera_rotation", type=str, default="center_facing",
                   choices=sorted(CAMERA_ROTATIONS))
    p.add_argument("--movement_distance", type=float, default=0.3)
    p.add_argument("--filter_points_threshold", type=float, default=0.05)
    p.add_argument("--foreground_masking", action="store_true")
    p.add_argument("--save_buffer", action="store_true")
    from gen3c_tpu.pipelines.factory import add_perf_flags

    add_perf_flags(p)
    return p


def demo(args) -> str:
    from gen3c_tpu.pipelines.factory import build_from_args

    model, preset = build_from_args(args)
    chunk = preset.chunk_size
    assert (args.num_video_frames - 1) % (chunk - 1) == 0

    text_encoder = None
    if not args.disable_prompt_encoder:
        from gen3c_tpu.models.t5 import make_t5_encoder

        text_encoder = make_t5_encoder(args.t5_backend)

    pipeline = Gen3cPipeline(
        model=model,
        text_encoder=text_encoder,
        guidance=args.guidance,
        guidance_interval=(tuple(args.guidance_interval)
                           if getattr(args, "guidance_interval", None)
                           else None),
        cfg_rescale=getattr(args, "cfg_rescale", 0.0),
        num_steps=args.num_steps,
        solver=args.solver,
        step_cache_interval=args.step_cache_interval,
        height=preset.height,
        width=preset.width,
        fps=args.fps,
        seed=args.seed,
    )

    if args.vipe_path is not None:
        image, depth, mask, w2c, k = data_loaders.load_vipe_data(
            args.vipe_path,
            starting_frame_idx=args.vipe_starting_frame_idx,
            resize_hw=(preset.height + 16, preset.width),
            crop_hw=(preset.height, preset.width),
            num_frames=args.num_video_frames,
        )
    else:
        assert args.input_video_path, "need --vipe_path or --input_video_path"
        image, depth, mask, w2c, k = data_loaders.load_data_auto_detect(
            args.input_video_path
        )

    n_frames = min(len(image), args.num_video_frames)
    cache = Cache4D(
        input_image=jnp.asarray(image[:n_frames]),
        input_depth=jnp.asarray(depth[:n_frames]),
        input_mask=jnp.asarray(mask[:n_frames]) if mask is not None else None,
        input_w2c=jnp.asarray(w2c[:n_frames]),
        input_intrinsics=jnp.asarray(k[:n_frames]),
        input_format=["F", "C", "H", "W"],
        filter_points_threshold=args.filter_points_threshold,
        foreground_masking=args.foreground_masking,
    )

    w2cs, ks = generate_camera_trajectory(
        trajectory_type=args.trajectory,
        initial_w2c=w2c[0],
        initial_intrinsics=k[0],
        num_frames=args.num_video_frames,
        movement_distance=args.movement_distance,
        camera_rotation=args.camera_rotation,
        center_depth=1.0,
    )

    seed_frames = image[0:1].astype(np.float32)[None].transpose(1, 2, 0, 3, 4)
    saver = io_utils.IncrementalVideoSaver(args.fps)
    video, all_warps = run_chunked_generation(
        pipeline,
        cache,
        w2cs,
        ks,
        seed_frames,
        prompt=args.prompt,
        negative_prompt=args.negative_prompt or None,
        update_cache_with_depth=None,  # depth known for all frames
        use_start_frame_idx=True,
        save_buffer=args.save_buffer,
        on_chunk=(
            None if args.save_buffer
            else lambda done, total, v: saver.update(v)
        ),
    )
    final = compose_buffer_video(video, all_warps, preset.height, preset.width)
    save_path = os.path.join(
        args.video_save_folder, f"{args.video_save_name}.mp4"
    )
    save_path = saver.save(final, save_path)
    log.info(f"Saved video to {save_path}")
    return save_path


if __name__ == "__main__":
    demo(create_parser().parse_args())
