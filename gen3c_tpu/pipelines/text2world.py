"""Text-to-world and video-to-world generation (Cosmos base capability).

Parity: cosmos_predict1/diffusion/inference/{text2world,video2world}.py —
the sibling Cosmos-Predict1 entry points GEN3C is built on:

  * text2world: prompt -> T5 -> 35-step EDM-Euler denoise (CFG, default
    guidance 7) -> VAE decode -> 121-frame video. Net in_channels = 16.
  * video2world: + seed image/video conditioning (condition latent,
    first-n latent frames replaced each step). Net in_channels = 17
    (16 + condition_video_input_mask).

Both reuse the GEN3C sampler with the pose-latent channels absent.

Usage:
  python -m gen3c_tpu.pipelines.text2world --prompt "..." \
      [--model_preset cosmos_t2w_tiny]
  python -m gen3c_tpu.pipelines.text2world --mode video2world \
      --input_image_path img.png --prompt "..."
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np

import jax.numpy as jnp

from gen3c_tpu.diffusion.sampler import arch_invariant_randn, generate_samples
from gen3c_tpu.models.dit import DiTConfig
from gen3c_tpu.models.gen3c import _dit_net_fn
from gen3c_tpu.pipelines.factory import (
    GEN3C_7B_PRESET,
    GEN3C_TINY_PRESET,
    Gen3CPreset,
    build_gen3c_model,
)
from gen3c_tpu.utils import io as io_utils
from gen3c_tpu.utils import log

# t2w: in = 16 latent ch; v2w: + 1 condition mask ch
COSMOS_T2W_7B = Gen3CPreset(
    name="cosmos_t2w_7b",
    dit=dataclasses.replace(GEN3C_7B_PRESET.dit, in_channels=16,
                            rope_t_extrapolation_ratio=1.0),
    vae=GEN3C_7B_PRESET.vae,
    height=704,
    width=1280,
    chunk_size=121,
)
COSMOS_V2W_7B = dataclasses.replace(
    COSMOS_T2W_7B,
    name="cosmos_v2w_7b",
    dit=dataclasses.replace(COSMOS_T2W_7B.dit, in_channels=17),
)
COSMOS_T2W_TINY = dataclasses.replace(
    COSMOS_T2W_7B,
    name="cosmos_t2w_tiny",
    dit=dataclasses.replace(GEN3C_TINY_PRESET.dit, in_channels=16,
                            rope_t_extrapolation_ratio=1.0),
    vae=GEN3C_TINY_PRESET.vae,
    height=96,
    width=160,
    chunk_size=9,
)
COSMOS_V2W_TINY = dataclasses.replace(
    COSMOS_T2W_TINY,
    name="cosmos_v2w_tiny",
    dit=dataclasses.replace(COSMOS_T2W_TINY.dit, in_channels=17),
)

T2W_PRESETS = {
    p.name: p
    for p in (COSMOS_T2W_7B, COSMOS_V2W_7B, COSMOS_T2W_TINY, COSMOS_V2W_TINY)
}


def generate_world(
    model,
    preset: Gen3CPreset,
    t5_embeddings: np.ndarray,
    guidance: float = 7.0,
    num_steps: int = 35,
    seed: int = 1,
    neg_t5_embeddings=None,
    condition_latent=None,  # video2world: (1, 16, T, H', W')
    num_condition_t: int = 0,
    step_cache_interval: int = 1,
    step_cache_threshold: float = 0.0,
    solver: str = "euler",
    guidance_interval=None,
) -> np.ndarray:
    """Run the t2w/v2w denoise + decode; returns (T, H, W, 3) uint8."""
    state_shape = preset.state_shape
    B = 1
    is_v2w = preset.dit.in_channels > 16

    C, T, Hl, Wl = state_shape
    if condition_latent is None:
        condition_latent = jnp.zeros((B, C, T, Hl, Wl), jnp.float32)
    elif condition_latent.shape[2] < T:
        pad = T - condition_latent.shape[2]
        condition_latent = jnp.concatenate(
            [
                condition_latent,
                jnp.zeros(
                    condition_latent.shape[:2] + (pad,)
                    + condition_latent.shape[3:],
                    condition_latent.dtype,
                ),
            ],
            axis=2,
        )

    indicator = jnp.zeros((1, 1, T, 1, 1), jnp.float32)
    if num_condition_t > 0:
        indicator = indicator.at[:, :, :num_condition_t].set(1.0)
    in_mask = (
        jnp.broadcast_to(indicator, (B, 1, T, Hl, Wl)) if is_v2w else None
    )

    init_noise = np.random.RandomState(seed).standard_normal(
        (B,) + state_shape
    ).astype(np.float32)
    sample_kwargs = dict(
        init_noise=jnp.asarray(init_noise),
        augment_noise=jnp.asarray(
            arch_invariant_randn((B,) + state_shape, seed)
        ),
        crossattn_cond=jnp.asarray(t5_embeddings),
        crossattn_uncond=jnp.asarray(
            neg_t5_embeddings
            if neg_t5_embeddings is not None
            else np.zeros_like(t5_embeddings)
        ),
        gt_latent=condition_latent,
        condition_video_indicator=indicator,
        condition_video_input_mask=in_mask,
        num_steps=num_steps,
        guidance=guidance,
        step_cache_interval=step_cache_interval,
        solver=solver,
        guidance_interval=(tuple(float(v) for v in guidance_interval)
                           if guidance_interval else None),
    )
    from gen3c_tpu.diffusion.sampler import generate_samples_auto

    samples = generate_samples_auto(
        net_fn=_dit_net_fn,
        net_params=(model.dit_params, model.dit_cfg),
        offload=getattr(model, "offload_dit", False),
        streaming_net=getattr(model, "streaming_net", None),
        step_cache_threshold=step_cache_threshold,
        **sample_kwargs,
    )
    video = model.decode(samples)
    from gen3c_tpu.pipelines.gen3c_pipeline import fetch_video_uint8

    return fetch_video_uint8(video)


def create_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Cosmos text2world / video2world")
    p.add_argument("--mode", choices=["text2world", "video2world"],
                   default="text2world")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    p.add_argument("--model_preset", type=str, default=None,
                   choices=sorted(T2W_PRESETS))
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--input_image_path", type=str, default=None)
    p.add_argument("--num_input_frames", type=int, default=1)
    p.add_argument("--solver", default="euler",
                   choices=("euler", "dpm2m", "res2ab"),
                   help="denoise integration rule at equal network cost")
    p.add_argument("--step_cache_interval", type=int, default=1,
                   help=">1: training-free DiT output caching "
                        "(Delta-DiT/SmoothCache family)")
    p.add_argument("--step_cache_threshold", type=float, default=0.0,
                   help=">0: adaptive (TeaCache-style) step caching; "
                        "overrides --step_cache_interval")
    p.add_argument("--guidance", type=float, default=7.0)
    p.add_argument("--num_steps", type=int, default=35)
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--disable_prompt_encoder", action="store_true",
                   default=True)
    p.add_argument("--video_save_name", type=str, default="output")
    p.add_argument("--video_save_folder", type=str, default="outputs/")
    p.add_argument("--quantize_int8", action="store_true",
                   help="int8 weight-only DiT (fits the 7B on one chip)")
    p.add_argument("--quantize_w8a8", action="store_true",
                   help="int8 weights + dynamic int8 activations")
    p.add_argument("--offload_diffusion_transformer", action="store_true",
                   help="stage DiT params host<->HBM per phase "
                        "(auto-enabled for 7B presets on one device)")
    p.add_argument("--offload_tokenizer", action="store_true")
    p.add_argument("--attn_temporal_window", type=int, default=None,
                   help="temporal-band sparse attention (opt-in; "
                        "measured 1.57x the 7B step at window 2)")
    return p


def demo(args) -> str:
    preset_name = args.model_preset or (
        "cosmos_t2w_7b" if args.mode == "text2world" else "cosmos_v2w_7b"
    )
    preset = T2W_PRESETS[preset_name]
    offload = (args.offload_diffusion_transformer
               or preset_name.endswith("_7b"))
    if offload and not args.offload_diffusion_transformer:
        log.info("single-chip 7B: enabling DiT + tokenizer offload")
        if not (args.quantize_int8 or args.quantize_w8a8):
            log.info(
                "unquantized 7B on one chip: the DiT will run "
                "block-streamed at full bf16 precision"
            )
    model, preset = build_gen3c_model(
        preset, checkpoint_dir=args.checkpoint_dir, seed=args.seed,
        quantize="w8a8" if args.quantize_w8a8 else args.quantize_int8,
        offload_dit=offload,
        offload_tokenizer=offload or args.offload_tokenizer,
        attn_temporal_window=args.attn_temporal_window,
    )

    if args.disable_prompt_encoder:
        from gen3c_tpu.models.t5 import DummyT5TextEncoder

        enc = DummyT5TextEncoder()
    else:
        from gen3c_tpu.models.t5 import make_t5_encoder

        enc = make_t5_encoder(getattr(args, "t5_backend", "jax"))
    emb, _ = enc.encode_prompts(args.prompt)
    neg = (
        enc.encode_prompts(args.negative_prompt)[0]
        if args.negative_prompt
        else None
    )

    condition_latent = None
    num_condition_t = 0
    if args.mode == "video2world":
        assert args.input_image_path, (
            "video2world needs --input_image_path (image or video)"
        )
        ext = args.input_image_path.rsplit(".", 1)[-1].lower()
        if ext in ("mp4", "mov", "avi", "gif", "webm"):
            frames, _ = io_utils.read_video_bcthw(
                args.input_image_path, preset.height, preset.width
            )
            frames = frames[:, :, -args.num_input_frames :]
        else:
            frames = io_utils.read_image_bcthw(
                args.input_image_path, preset.height, preset.width
            )
        condition_latent = model.create_condition_latent_from_input_frames(
            jnp.asarray(frames), num_frames_condition=frames.shape[2]
        )
        num_condition_t = model.compute_num_latent_frames(frames.shape[2])

    video = generate_world(
        model,
        preset,
        emb,
        guidance=args.guidance,
        guidance_interval=getattr(args, "guidance_interval", None),
        num_steps=args.num_steps,
        seed=args.seed,
        neg_t5_embeddings=neg,
        condition_latent=condition_latent,
        num_condition_t=num_condition_t,
        step_cache_interval=args.step_cache_interval,
        step_cache_threshold=args.step_cache_threshold,
        solver=args.solver,
    )
    path = os.path.join(args.video_save_folder, f"{args.video_save_name}.mp4")
    path = io_utils.save_video(video, args.fps, path)
    log.info(f"Saved video to {path}")
    return path


if __name__ == "__main__":
    demo(create_parser().parse_args())
