"""Multiview sparse-image novel-view synthesis (GEN3C), TPU-native CLI.

Parity: cosmos_predict1/diffusion/inference/gen3c_multiview.py:
N posed RGBD key frames (npz) -> Cache3DBufferSelector (top-K buffer
selection by rendered-mask overlap per target) -> generation along the
stored trajectory (w2cs_all / Ks_all), chunked with 1-frame overlap.

Usage:
  python -m gen3c_tpu.pipelines.gen3c_multiview --npz_path data.npz
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax.numpy as jnp

from gen3c_tpu.cache import Cache3DBufferSelector
from gen3c_tpu.pipelines.chunked import compose_buffer_video, run_chunked_generation
from gen3c_tpu.pipelines.data_loaders import load_multiview_npz
from gen3c_tpu.pipelines.factory import PRESETS, build_gen3c_model
from gen3c_tpu.pipelines.gen3c_pipeline import Gen3cPipeline
from gen3c_tpu.utils import io as io_utils
from gen3c_tpu.utils import log


def create_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="GEN3C multiview NVS (TPU)")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    p.add_argument("--model_preset", type=str, default="gen3c_7b",
                   choices=sorted(PRESETS))
    p.add_argument("--npz_path", type=str, required=True)
    p.add_argument("--prompt", type=str, default="")
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--t5_backend", type=str, default="jax",
                   choices=["jax", "torch"],
                   help="T5 encoder stack: TPU-native JAX or host torch")
    p.add_argument("--disable_prompt_encoder", action="store_true",
                   default=True)
    p.add_argument("--enable_prompt_encoder", dest="disable_prompt_encoder",
                   action="store_false")
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
    p.add_argument("--frame_buffer_max", type=int, default=2)
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

    d = load_multiview_npz(args.npz_path)
    cache = Cache3DBufferSelector(
        frame_buffer_max=args.frame_buffer_max,
        input_image=jnp.asarray(d["images"][None]),  # (1, N, C, H, W)
        input_depth=jnp.asarray(d["depths"][None]),
        input_mask=(
            jnp.asarray(d["masks"][None]) if d["masks"] is not None else None
        ),
        input_w2c=jnp.asarray(d["w2cs"][None]),
        input_intrinsics=jnp.asarray(d["ks"][None]),
        input_format=["B", "N", "C", "H", "W"],
        filter_points_threshold=args.filter_points_threshold,
        foreground_masking=args.foreground_masking,
    )

    w2cs = jnp.asarray(d["w2cs_all"][: args.num_video_frames][None])
    if d["ks_all"] is not None:
        ks = jnp.asarray(d["ks_all"][: args.num_video_frames][None])
    else:
        last_k = np.repeat(d["ks"][-1][None], w2cs.shape[1], axis=0)
        ks = jnp.asarray(last_k[None])

    seed_frames = d["images"][0][None, :, None]  # (1, C, 1, H, W)
    saver = io_utils.IncrementalVideoSaver(args.fps)
    video, all_warps = run_chunked_generation(
        pipeline,
        cache,
        w2cs,
        ks,
        seed_frames.astype(np.float32),
        prompt=args.prompt,
        negative_prompt=args.negative_prompt or None,
        update_cache_with_depth=None,
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
