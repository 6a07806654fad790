"""Single image -> camera-controlled video (GEN3C), TPU-native CLI.

Parity: cosmos_predict1/diffusion/inference/gen3c_single_image.py:
image -> depth (MoGe or fallback) -> 3D cache -> preset trajectory ->
chunked autoregressive generation (121*N-1 frames, 1-frame overlap,
cache updated with re-estimated depth of each chunk's last frame) -> mp4.

Usage:
  python -m gen3c_tpu.pipelines.gen3c_single_image \
      --input_image_path image.png --trajectory left \
      --checkpoint_dir checkpoints [--model_preset gen3c_tiny]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax.numpy as jnp

from gen3c_tpu.cache import Cache3DBuffer
from gen3c_tpu.ops.camera import (
    CAMERA_ROTATIONS,
    TRAJECTORY_TYPES,
    generate_camera_trajectory,
)
from gen3c_tpu.pipelines.depth import make_depth_estimator
from gen3c_tpu.pipelines.factory import PRESETS, build_gen3c_model
from gen3c_tpu.pipelines.gen3c_pipeline import Gen3cPipeline
from gen3c_tpu.utils import io as io_utils
from gen3c_tpu.utils import log


def create_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="GEN3C single-image (TPU)")
    # common args (inference_utils.py:53-170 parity where meaningful on TPU)
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    p.add_argument("--model_preset", type=str, default="gen3c_7b",
                   choices=sorted(PRESETS))
    p.add_argument("--prompt", type=str, default="")
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--input_image_path", type=str, required=True)
    p.add_argument("--video_save_name", type=str, default="output")
    p.add_argument("--video_save_folder", type=str, default="outputs/")
    p.add_argument("--guidance", type=float, default=1.0)
    p.add_argument("--guidance_interval", type=float, nargs=2,
                   default=None, metavar=("SIGMA_LO", "SIGMA_HI"),
                   help="restrict CFG to steps whose sigma lies inside "
                        "[LO, HI] (Kynkaanniemi et al., arXiv:"
                        "2404.07724); outside the interval only the "
                        "conditioned forward runs (~half the step "
                        "cost). Default: CFG on every step "
                        "(reference behavior)")
    p.add_argument("--perf_preset", choices=["exact", "fast"],
                   default="exact",
                   help="'fast' = the measured single-chip fast config "
                        "(W8A8 + band 2 + cache 2 + guidance interval "
                        "q0.5; 8.5 min/121-frame chunk, docs/STATUS.md)"
                        " — explicit flags still win")
    p.add_argument("--cfg_rescale", type=float, default=0.0,
                   help="phi in [0,1]: rescale the CFG output std to "
                        "the cond branch's (arXiv:2305.08891; fixes "
                        "high-guidance oversaturation). 0 = reference "
                        "CFG")
    p.add_argument("--num_steps", type=int, default=35)
    p.add_argument("--solver", default="euler",
                   choices=("euler", "dpm2m", "res2ab"),
                   help="denoise integration rule at equal network cost "
                        "(multistep solvers improve accuracy per step; "
                        "reference res_sampler '2ab' family)")
    p.add_argument("--step_cache_interval", type=int, default=1,
                   help=">1: training-free DiT output caching across "
                        "denoise steps (Delta-DiT/SmoothCache family) — "
                        "the net runs every Nth step; ~N x faster denoise "
                        "at a small quality cost")
    p.add_argument("--step_cache_block_span", type=int, nargs=2,
                   default=None, metavar=("LO", "HI"),
                   help="with --step_cache_interval>1: Delta-DiT span "
                        "caching — skipped steps run only the blocks "
                        "outside [LO,HI), re-applying the span's cached "
                        "residual (higher fidelity than whole-output "
                        "reuse). The delta carry does NOT fit beside the "
                        "W8A8 7B on one 16 GB chip — use with cp>=2 "
                        "(delta sharded) or smaller models; whole-output "
                        "caching is the single-chip choice")
    p.add_argument("--step_cache_span_dtype", type=str, default="bf16",
                   choices=["bf16", "int8"],
                   help="span-delta carry dtype; int8 is 4x smaller "
                        "(needed to fit the 7B + span cache on one "
                        "chip's HBM, ~0.4%% rel. delta error)")
    p.add_argument("--step_cache_threshold", type=float, default=0.0,
                   help=">0: ADAPTIVE step caching (TeaCache family) — "
                        "the DiT refreshes when the accumulated relative "
                        "latent drift crosses the threshold (refreshes "
                        "concentrate where the trajectory bends); "
                        "overrides --step_cache_interval")
    p.add_argument("--attn_temporal_window", type=int, default=None,
                   help="OPT-IN sparse self-attention: each latent frame "
                        "attends to frames within +/-N plus the seed "
                        "frame (sliding-tile-attention family). Measured "
                        "1.5x/2.2x/3.1x on the attention op at window "
                        "4/2/1 (v5e, 56k tokens); small quality cost")
    p.add_argument("--cp_attn", type=str, default=None,
                   choices=["allgather", "ring", "ulysses"],
                   help="context-parallel attention strategy (default "
                        "allgather; ulysses/ring enable --attn_temporal_"
                        "window over multiple devices)")
    p.add_argument("--num_video_frames", type=int, default=121,
                   help="(N-1) %% (chunk-1) must be 0")
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--t5_backend", type=str, default="jax",
                   choices=["jax", "torch"],
                   help="T5 encoder stack: TPU-native JAX or host torch")
    p.add_argument("--disable_prompt_encoder", action="store_true",
                   default=True)
    p.add_argument("--enable_prompt_encoder", dest="disable_prompt_encoder",
                   action="store_false")
    # gen3c-specific args (gen3c_single_image.py:40-102 parity)
    p.add_argument("--trajectory", type=str, default="left",
                   choices=sorted(TRAJECTORY_TYPES))
    p.add_argument("--camera_rotation", type=str, default="center_facing",
                   choices=sorted(CAMERA_ROTATIONS))
    p.add_argument("--movement_distance", type=float, default=0.3)
    p.add_argument("--noise_aug_strength", type=float, default=0.0)
    p.add_argument("--frame_buffer_max", type=int, default=2)
    p.add_argument("--filter_points_threshold", type=float, default=0.05)
    p.add_argument("--foreground_masking", action="store_true")
    p.add_argument("--save_buffer", action="store_true")
    p.add_argument("--batch_input_path", type=str, default=None,
                   help="JSONL with one {\"prompt\",\"visual_input\"} per line")
    # TPU-rebuild extras
    p.add_argument("--depth_source", type=str, default="auto",
                   choices=["auto", "moge", "file", "heuristic"])
    p.add_argument("--depth_path", type=str, default=None)
    p.add_argument("--parallel", type=str, default="cp",
                   help="multi-device strategy: 'cp' (context-parallel, "
                        "seq sharded), 'tp' (tensor-parallel, params "
                        "sharded; bf16 7B fits on >=2 chips without "
                        "int8), or 'cpNtpM' for a 2D mesh (e.g. cp4tp2 "
                        "on 8 chips)")
    p.add_argument("--num_devices", "--num_gpus", type=int, default=1,
                   dest="num_devices",
                   help="context-parallel denoise over N devices "
                        "(torchrun --num_gpus parity)")
    # reference offload flags (inference_utils.py:53-170).
    # --offload_diffusion_transformer and --offload_tokenizer are REAL:
    # params rest in host RAM and are staged into HBM per phase
    # (utils/offload.py) — required for the 7B + full-res VAE on one
    # 16 GB chip (auto-enabled there). The text-encoder/upsampler/
    # guardrail variants are no-ops on TPU (those run host-side or are
    # checkpoint-gated).
    for flag in ("offload_diffusion_transformer", "offload_tokenizer",
                 "offload_text_encoder_model", "offload_prompt_upsampler",
                 "offload_guardrail_models", "disable_guardrail",
                 "disable_prompt_upsampler"):
        p.add_argument(f"--{flag}", action="store_true",
                       help="reference offload flag (DiT/tokenizer ones "
                            "are functional on TPU)")
    p.add_argument("--quantize_int8", action="store_true",
                   help="int8 weight-only DiT (fits the 7B on one chip)")
    p.add_argument("--quantize_w8a8", action="store_true",
                   help="int8 weights + dynamic int8 activations (fastest; "
                        "~1%% per-matmul error)")
    return p


def validate_args(args, chunk_size: int) -> None:
    assert args.num_video_frames >= chunk_size and (
        args.num_video_frames - 1
    ) % (chunk_size - 1) == 0, (
        f"num_video_frames must be {chunk_size} + k*{chunk_size - 1} "
        f"(got {args.num_video_frames})"
    )


def demo(args) -> str:
    from gen3c_tpu.pipelines.factory import apply_perf_preset

    apply_perf_preset(args)
    offload_dit = args.offload_diffusion_transformer
    offload_tok = args.offload_tokenizer
    if args.model_preset == "gen3c_7b" and args.num_devices == 1:
        # the 7B DiT and the full-res VAE phases fit a 16 GB chip alone
        # but not together (measured OOM, utils/offload.py) — stage each
        # out during the other's phase
        if not (offload_dit and offload_tok):
            log.info("single-chip 7B: enabling DiT + tokenizer offload "
                     "(--offload_diffusion_transformer --offload_tokenizer)")
        offload_dit = offload_tok = True
        if not (args.quantize_int8 or args.quantize_w8a8):
            log.info(
                "unquantized 7B on one chip: the DiT will run "
                "block-streamed at full bf16 precision "
                "(--quantize_w8a8 trades ~1% per-matmul error for "
                "resident-weight denoising)"
            )
    model, preset = build_gen3c_model(
        args.model_preset,
        checkpoint_dir=args.checkpoint_dir,
        seed=args.seed,
        num_devices=args.num_devices,
        parallel=args.parallel,
        offload_dit=offload_dit,
        offload_tokenizer=offload_tok,
        cache_block_span=(
            tuple(args.step_cache_block_span)
            if args.step_cache_block_span else None
        ),
        cache_span_dtype=args.step_cache_span_dtype,
        quantize="w8a8" if args.quantize_w8a8 else args.quantize_int8,
        attn_temporal_window=args.attn_temporal_window,
        cp_attn=args.cp_attn,
    )
    validate_args(args, preset.chunk_size)

    text_encoder = None
    if not args.disable_prompt_encoder:
        from gen3c_tpu.models.t5 import make_t5_encoder

        text_encoder = make_t5_encoder(args.t5_backend)

    pipeline = Gen3cPipeline(
        model=model,
        text_encoder=text_encoder,
        guidance=args.guidance,
        guidance_interval=(tuple(args.guidance_interval)
                           if args.guidance_interval else None),
        cfg_rescale=args.cfg_rescale,
        num_steps=args.num_steps,
        step_cache_interval=args.step_cache_interval,
        step_cache_threshold=args.step_cache_threshold,
        solver=args.solver,
        height=preset.height,
        width=preset.width,
        fps=args.fps,
        seed=args.seed,
    )

    # batch mode: one {"prompt", "visual_input"} JSON per line
    # (gen3c_single_image.py:291-310 parity)
    if args.batch_input_path:
        inputs = io_utils.read_prompts_from_file(args.batch_input_path)
    else:
        inputs = [
            {"prompt": args.prompt, "visual_input": args.input_image_path}
        ]
    save_path = ""
    for i, d in enumerate(inputs):
        name = str(i) if args.batch_input_path else args.video_save_name
        save_path = _generate_one(
            args, preset, pipeline,
            image_path=d.get("visual_input"),
            prompt=d.get("prompt", ""),
            save_name=name,
        )
    return save_path


def _generate_one(args, preset, pipeline, image_path, prompt, save_name) -> str:
    chunk = preset.chunk_size
    h, w = preset.height, preset.width
    # --- seed image + depth -> 3D cache (gen3c_single_image.py:312-334) ---
    image_b3thw = io_utils.read_image_bcthw(image_path, h, w)
    image_hwc01 = (image_b3thw[0, :, 0].transpose(1, 2, 0) + 1.0) / 2.0
    estimator = make_depth_estimator(
        args.depth_source, args.depth_path
    )
    depth, intrinsics, _ = estimator(image_hwc01)
    w2c0 = np.eye(4, dtype=np.float32)

    cache = Cache3DBuffer(
        frame_buffer_max=args.frame_buffer_max,
        noise_aug_strength=args.noise_aug_strength,
        seed=args.seed,
        input_image=jnp.asarray(image_b3thw[:, :, 0]),
        input_depth=jnp.asarray(depth[None, None]),
        input_w2c=jnp.asarray(w2c0[None]),
        input_intrinsics=jnp.asarray(intrinsics[None]),
        filter_points_threshold=args.filter_points_threshold,
        foreground_masking=args.foreground_masking,
    )

    w2cs, ks = generate_camera_trajectory(
        trajectory_type=args.trajectory,
        initial_w2c=w2c0,
        initial_intrinsics=intrinsics,
        num_frames=args.num_video_frames,
        movement_distance=args.movement_distance,
        camera_rotation=args.camera_rotation,
        center_depth=1.0,
    )

    # AR chunk loop (reference gen3c_single_image.py:378-419) — shared
    # with serving via pipelines/chunked.py (progress/cancel hooks
    # unused here)
    from gen3c_tpu.pipelines.chunked import (
        compose_buffer_video,
        run_chunked_generation,
    )

    # incremental save: JPEG-encode each finished chunk's frames under
    # the next chunk's denoise (no-op when ffmpeg writes mp4s instead);
    # useless when compose_buffer_video will rewrite every frame
    saver = io_utils.IncrementalVideoSaver(args.fps)
    on_chunk = (
        None if args.save_buffer
        else lambda done, total, v: saver.update(v)
    )
    video, all_warps = run_chunked_generation(
        pipeline,
        cache,
        w2cs,
        ks,
        seed_frames=image_b3thw[:, :, :1],
        prompt=prompt,
        negative_prompt=args.negative_prompt or None,
        update_cache_with_depth=estimator,
        save_buffer=args.save_buffer,
        on_chunk=on_chunk,
    )
    # side-by-side warp buffers | generated video (ref :425-456)
    final_video = compose_buffer_video(video, all_warps, h, w)

    save_path = os.path.join(args.video_save_folder, f"{save_name}.mp4")
    save_path = saver.save(final_video, save_path)
    log.info(f"Saved video to {save_path}")
    return save_path


if __name__ == "__main__":
    demo(create_parser().parse_args())
