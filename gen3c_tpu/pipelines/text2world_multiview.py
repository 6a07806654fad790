"""Multiview text-to-world / video-to-world generation (Sample-AV).

Parity: cosmos_predict1/diffusion/inference/text2world_multiview.py +
video2world_multiview.py — the Sample-AV multiview Cosmos models: one
diffusion pass generates N synchronized camera views (views stacked on
the latent-T axis, per-view text prompts concatenated on the context
axis, per-view view-condition embedding, frame-repeat embedding used as
the CFG negative condition). video2world mode conditions the first
latent frame of EVERY view on a seed image.

Usage:
  python -m gen3c_tpu.pipelines.text2world_multiview \
      --prompt "..." --prompt_left "..." ... [--model_preset *_tiny]
  python -m gen3c_tpu.pipelines.text2world_multiview --mode video2world \
      --input_image_path img.png ...
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np

import jax
import jax.numpy as jnp

from gen3c_tpu.diffusion.sampler import arch_invariant_randn, generate_samples
from gen3c_tpu.models.dit_multiview import (
    FADITV2_MULTIVIEW_7B,
    MultiviewDiTConfig,
    init_multiview_dit_params,
    multiview_dit_forward,
)
from gen3c_tpu.models.vae import VAEConfig
from gen3c_tpu.pipelines.factory import GEN3C_7B_PRESET, GEN3C_TINY_PRESET
from gen3c_tpu.utils import io as io_utils
from gen3c_tpu.utils import log

VIEW_NAMES = ("front", "left", "right", "back", "back_left", "back_right")

DEFAULT_PROMPTS = {
    "front": "The video is captured from a camera mounted on a car. The "
             "camera is facing forward.",
    "left": "The video is captured from a camera mounted on a car. The "
            "camera is facing to the left.",
    "right": "The video is captured from a camera mounted on a car. The "
             "camera is facing to the right.",
    "back": "The video is captured from a camera mounted on a car. The "
            "camera is facing backwards.",
    "back_left": "The video is captured from a camera mounted on a car. "
                 "The camera is facing the rear left side.",
    "back_right": "The video is captured from a camera mounted on a car. "
                  "The camera is facing the rear right side.",
}


@dataclasses.dataclass(frozen=True)
class MultiviewPreset:
    name: str
    dit: MultiviewDiTConfig
    vae: VAEConfig
    height: int = 480
    width: int = 848
    num_video_frames: int = 57  # per view (reference default/only choice)

    @property
    def state_shape(self):
        """Latent (C, V*T, H', W') — views stacked on the frame axis
        (extend_model_multiview.py:43-45)."""
        lat_t = (self.num_video_frames - 1) // self.vae.temporal_compression + 1
        return (
            self.vae.latent_channels,
            self.dit.n_views * lat_t,
            self.height // self.vae.spatial_compression,
            self.width // self.vae.spatial_compression,
        )


MV_T2W_7B = MultiviewPreset(
    name="cosmos_t2w_mv_7b",
    dit=dataclasses.replace(FADITV2_MULTIVIEW_7B, in_channels=16),
    vae=GEN3C_7B_PRESET.vae,
)
MV_V2W_7B = dataclasses.replace(
    MV_T2W_7B,
    name="cosmos_v2w_mv_7b",
    dit=dataclasses.replace(MV_T2W_7B.dit, in_channels=17),
)
MV_T2W_TINY = MultiviewPreset(
    name="cosmos_t2w_mv_tiny",
    dit=MultiviewDiTConfig(
        in_channels=16,
        model_channels=64,
        num_blocks=1,
        num_heads=2,
        adaln_lora_dim=8,
        n_views=3,
        view_condition_dim=3,
        add_repeat_frame_embedding=True,
        dtype=jnp.float32,
    ),
    vae=GEN3C_TINY_PRESET.vae,
    height=32,
    width=48,
    num_video_frames=9,
)
MV_V2W_TINY = dataclasses.replace(
    MV_T2W_TINY,
    name="cosmos_v2w_mv_tiny",
    dit=dataclasses.replace(MV_T2W_TINY.dit, in_channels=17),
)

MV_PRESETS = {
    p.name: p for p in (MV_T2W_7B, MV_V2W_7B, MV_T2W_TINY, MV_V2W_TINY)
}


def _mv_net_fn(bundle, x, t, ctx):
    params, cfg, frame_repeat = bundle
    return multiview_dit_forward(
        params, cfg, x, t, ctx, fps=24.0, frame_repeat=frame_repeat
    )


def generate_multiview_world(
    params,
    vae,
    preset: MultiviewPreset,
    t5_embeddings: np.ndarray,  # (1, V*M, 1024) per-view concat
    guidance: float = 7.0,
    guidance_interval=None,
    num_steps: int = 35,
    seed: int = 1,
    frame_repeat_negative_condition: float = 10.0,
    condition_latent=None,  # v2w: (1, 16, T', H', W') per-view seed latent
    num_condition_t: int = 1,
    step_cache_interval: int = 1,
    step_cache_threshold: float = 0.0,
):
    """One multiview diffusion pass -> list of V videos (T, H, W, 3) u8."""
    cfg = preset.dit
    V = cfg.n_views
    Tl = (preset.num_video_frames - 1) // preset.vae.temporal_compression + 1
    Hl = preset.height // preset.vae.spatial_compression
    Wl = preset.width // preset.vae.spatial_compression
    state = (1, 16, V * Tl, Hl, Wl)

    is_v2w = cfg.in_channels > 16
    gt = jnp.zeros(state, jnp.float32)
    indicator = jnp.zeros((1, 1, V * Tl, 1, 1), jnp.float32)
    in_mask = None
    if is_v2w and condition_latent is not None:
        # condition the first num_condition_t latent frames of EVERY view
        # (video2world_multiview conditioning parity)
        for v in range(V):
            gt = jax.lax.dynamic_update_slice_in_dim(
                gt, condition_latent[:, :, :num_condition_t].astype(
                    jnp.float32
                ), v * Tl, axis=2,
            )
            indicator = jax.lax.dynamic_update_slice_in_dim(
                indicator,
                jnp.ones((1, 1, num_condition_t, 1, 1), jnp.float32),
                v * Tl,
                axis=2,
            )
        in_mask = jnp.broadcast_to(indicator, (1, 1, V * Tl, Hl, Wl))
    elif is_v2w:
        in_mask = jnp.broadcast_to(indicator, (1, 1, V * Tl, Hl, Wl))

    # frame-repeat as the negative condition: cond rows 0, uncond rows =
    # frame_repeat_negative_condition (text2world_multiview.py:85-91)
    # conditioner scales frame_repeat by /10.0 (config/base/conditioner
    # .py:79) before it reaches the net
    frame_repeat = jnp.concatenate(
        [
            jnp.zeros((1, V), jnp.float32),
            jnp.full((1, V), frame_repeat_negative_condition / 10.0,
                     jnp.float32),
        ],
        axis=0,
    )

    rng = np.random.RandomState(seed)
    init_noise = rng.standard_normal(state).astype(np.float32)
    samples = generate_samples(
        net_fn=_mv_net_fn,
        net_params=(params, cfg, frame_repeat),
        init_noise=jnp.asarray(init_noise),
        augment_noise=jnp.asarray(
            arch_invariant_randn(state, seed)
        ),
        crossattn_cond=jnp.asarray(t5_embeddings),
        crossattn_uncond=jnp.zeros_like(jnp.asarray(t5_embeddings)),
        gt_latent=gt,
        condition_video_indicator=indicator,
        condition_video_input_mask=in_mask,
        num_steps=num_steps,
        guidance=guidance,
        guidance_interval=(tuple(float(v) for v in guidance_interval)
                           if guidance_interval else None),
        step_cache_interval=step_cache_interval,
        step_cache_threshold=step_cache_threshold,
    )
    videos = []
    for v in range(V):
        lat = samples[:, :, v * Tl : (v + 1) * Tl]
        vid = vae(lat) if callable(vae) else vae.decode(lat)
        vid = np.asarray(vid[0]).transpose(1, 2, 3, 0)
        videos.append(((vid + 1) / 2 * 255).clip(0, 255).astype(np.uint8))
    return videos


def create_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Multiview text2world / video2world (Sample-AV parity)"
    )
    p.add_argument("--mode", choices=["text2world", "video2world"],
                   default="text2world")
    p.add_argument("--model_preset", type=str, default="cosmos_t2w_mv_7b",
                   choices=sorted(MV_PRESETS))
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    for name in VIEW_NAMES:
        flag = "--prompt" if name == "front" else f"--prompt_{name}"
        p.add_argument(flag, type=str, default=DEFAULT_PROMPTS[name])
    p.add_argument("--input_image_path", type=str, default=None,
                   help="video2world: seed image for every view's frame 0")
    p.add_argument("--guidance", type=float, default=7.0)
    p.add_argument("--guidance_interval", type=float, nargs=2,
                   default=None, metavar=("SIGMA_LO", "SIGMA_HI"),
                   help="restrict CFG to steps with sigma in [LO, HI] "
                        "(arXiv:2404.07724); cond-only forwards "
                        "(~half cost) outside the interval")
    p.add_argument("--num_steps", type=int, default=35)
    p.add_argument("--frame_repeat_negative_condition", type=float,
                   default=10.0)
    p.add_argument("--step_cache_interval", type=int, default=1)
    p.add_argument("--step_cache_threshold", type=float, default=0.0,
                   help=">0: adaptive (TeaCache-style) step caching; "
                        "overrides --step_cache_interval")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--disable_prompt_encoder", action="store_true",
                   default=True)
    p.add_argument("--enable_prompt_encoder", dest="disable_prompt_encoder",
                   action="store_false")
    p.add_argument("--video_save_folder", type=str, default="outputs/")
    p.add_argument("--video_save_name", type=str, default="multiview")
    p.add_argument("--fps", type=int, default=24)
    return p


def demo(args) -> list:
    preset = MV_PRESETS[args.model_preset]
    if args.mode == "video2world" and not preset.dit.in_channels > 16:
        preset = MV_PRESETS[preset.name.replace("t2w", "v2w")]
    cfg = preset.dit
    V = cfg.n_views

    from gen3c_tpu.pipelines.factory import build_tokenizer

    # only the tokenizer is needed from the GEN3C factory (loading the
    # full 7B GEN3C DiT just for its VAE would double the HBM footprint);
    # the multiview DiT params are preset-local
    gen3c_preset_name = (
        "gen3c_tiny" if "tiny" in preset.name else "gen3c_7b"
    )
    model, _ = build_tokenizer(
        gen3c_preset_name, checkpoint_dir=args.checkpoint_dir
    )
    params = init_multiview_dit_params(
        jax.random.PRNGKey(args.seed), cfg,
        jnp.float32 if cfg.dtype == jnp.float32 else jnp.bfloat16,
    )
    native = os.path.join(
        args.checkpoint_dir or "", "gen3c_tpu", f"{preset.name}.npz"
    )
    if args.checkpoint_dir and os.path.isfile(native):
        from gen3c_tpu.utils.checkpoint import load_params_npz

        params = load_params_npz(native, params)
        log.info(f"loaded multiview DiT weights from {native}")
    else:
        log.warning(
            "multiview DiT running with RANDOM-INIT weights (no "
            f"{native}; convert a Sample-AV checkpoint with "
            "scripts/convert_checkpoints.py) — output will be noise"
        )

    prompts = [
        getattr(args, "prompt" if n == "front" else f"prompt_{n}")
        for n in VIEW_NAMES[:V]
    ]
    if args.disable_prompt_encoder:
        t5 = np.zeros((1, V * 512, 1024), np.float32)
    else:
        from gen3c_tpu.models.t5 import make_t5_encoder

        enc = make_t5_encoder("jax")
        embs = [enc.encode_prompts(pr)[0] for pr in prompts]  # (1,512,1024)
        t5 = np.concatenate(embs, axis=1)

    condition_latent = None
    if args.mode == "video2world":
        assert args.input_image_path, "--input_image_path required for v2w"
        img = io_utils.read_image_bcthw(
            args.input_image_path, preset.height, preset.width
        )  # (1, 3, 1, H, W)
        pad = np.concatenate(
            [img] + [np.zeros_like(img)] * (preset.num_video_frames - 1),
            axis=2,
        )
        condition_latent = model.encode(jnp.asarray(pad))

    log.info(
        f"multiview {args.mode}: {V} views x {preset.num_video_frames} "
        f"frames @ {preset.width}x{preset.height}"
    )
    videos = generate_multiview_world(
        params,
        model.decode,
        preset,
        t5,
        guidance=args.guidance,
        guidance_interval=args.guidance_interval,
        num_steps=args.num_steps,
        seed=args.seed,
        frame_repeat_negative_condition=args.frame_repeat_negative_condition,
        condition_latent=condition_latent,
        step_cache_interval=args.step_cache_interval,
        step_cache_threshold=args.step_cache_threshold,
    )
    os.makedirs(args.video_save_folder, exist_ok=True)
    paths = []
    for name, vid in zip(VIEW_NAMES[:V], videos):
        out = os.path.join(
            args.video_save_folder, f"{args.video_save_name}_{name}"
        )
        paths.append(io_utils.save_video(vid, args.fps, out))
        log.info(f"saved {name} view -> {paths[-1]}")
    return paths


def main(argv=None) -> None:
    demo(create_parser().parse_args(argv))


if __name__ == "__main__":
    main()
