"""Autoregressive world-model inference (Cosmos AR stack), TPU-native CLI.

Parity: cosmos_predict1/autoregressive/inference/{base,video2world}.py +
inference/world_generation_pipeline.py — a video prompt is FSQ-tokenized
(DV tokenizer), the token prefix (the first latent frames, raster order
t-major) conditions a llama-style transformer that generates the
remaining video tokens, which are decoded back to pixels. video2world
adds T5 cross-attention context.

Usage:
  python -m gen3c_tpu.pipelines.autoregressive \
      --input_video in.mp4 --model_preset ar_tiny
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np

import jax
import jax.numpy as jnp

from gen3c_tpu.models.ar_transformer import (
    ARConfig,
    generate,
    init_ar_params,
)
from gen3c_tpu.models.fsq import (
    DiscreteVAEConfig,
    DiscreteVideoFSQTokenizer,
)
from gen3c_tpu.models import vae as jvae
from gen3c_tpu.utils import io as io_utils
from gen3c_tpu.utils import log

DV_TINY = DiscreteVAEConfig(
    channels=16,
    channels_mult=(2, 4, 4),
    num_res_blocks=1,
    attn_resolutions=(),
    resolution=256,
    patch_size=4,
    latent_channels=6,
    z_channels=6,
    spatial_compression=8,
    temporal_compression=8,
)

# latent grid for ar_tiny: 64x64 video, 9-frame chunks -> (2+2gen, 8, 8)
AR_TINY_VIDEO = ARConfig(
    dim=128,
    n_layers=2,
    n_heads=4,
    n_kv_heads=2,
    vocab_size=64000,
    ffn_hidden_size=256,
    max_seq_len=4 * 8 * 8,
    rope_dim="3D",
    latent_shape=(4, 8, 8),
    dtype=jnp.float32,
)

# Cosmos-4B-flavor config (autoregressive 4B: dim 4096 x 16 layers)
AR_4B_VIDEO = ARConfig(
    dim=4096,
    n_layers=16,
    n_heads=32,
    n_kv_heads=8,
    vocab_size=64000,
    ffn_hidden_size=14336,
    max_seq_len=12800,
    rope_dim="3D",
    latent_shape=(5, 40, 64),
    use_qk_normalization=True,
)

AR_PRESETS = {
    "ar_tiny": (AR_TINY_VIDEO, DV_TINY, 64, 64, 9),
    "ar_4b": (AR_4B_VIDEO, DiscreteVAEConfig(), 640, 1024, 33),
}


def create_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Cosmos AR world model (TPU)")
    p.add_argument("--input_video", type=str, required=True)
    p.add_argument("--model_preset", choices=sorted(AR_PRESETS),
                   default="ar_4b")
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--num_input_frames", type=int, default=None,
                   help="pixel frames used as the token prefix")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_p", type=float, default=0.8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--disable_diffusion_decoder", action="store_true",
                   help="decode tokens with the DV tokenizer directly "
                        "instead of the latent diffusion decoder "
                        "(reference inference/base.py flag parity)")
    p.add_argument("--diffusion_decoder_steps", type=int, default=15,
                   help="DD denoise steps (DiffusionDecoderSamplingConfig"
                        ".num_steps)")
    p.add_argument("--quantize_kv", action="store_true",
                   help="int8 KV cache (half the cache HBM/bandwidth, "
                        "~0.4%% rel. KV error)")
    p.add_argument("--video_save_name", type=str, default="output")
    p.add_argument("--video_save_folder", type=str, default="outputs/")
    p.add_argument("--fps", type=int, default=24)
    return p


def demo(args) -> str:
    from gen3c_tpu.utils.jax_setup import setup_jax

    setup_jax()  # persistent compile cache: the jitted scan-decode
    # program costs a multi-minute remote compile cold
    ar_cfg, vae_cfg, h, w, chunk = AR_PRESETS[args.model_preset]

    log.warning("AR model weights not provided; RANDOM init"
                if not args.checkpoint_dir else "loading AR weights")
    key = jax.random.PRNGKey(args.seed)
    ar_params = init_ar_params(key, ar_cfg, jnp.float32)
    vae_params = jvae.init_vae_params(jax.random.fold_in(key, 1), vae_cfg)
    tokenizer = DiscreteVideoFSQTokenizer(
        vae_params, vae_cfg, pixel_chunk_duration=chunk
    )

    video, fps = io_utils.read_video_bcthw(args.input_video, h, w)
    T = video.shape[2]
    assert T >= chunk, f"need >= {chunk} frames, got {T}"
    video = video[:, :, :chunk]

    log.info("Tokenizing input video...")
    _, indices = tokenizer.encode(jnp.asarray(video))  # (1, T', H', W')
    _, Tl, Hl, Wl = indices.shape
    total_latent_t = ar_cfg.latent_shape[0]
    n_prefix_t = max(1, Tl // 2)
    prefix = indices[:, :n_prefix_t].reshape(1, -1)

    n_new = (total_latent_t - n_prefix_t) * Hl * Wl
    log.info(
        f"AR generation: prefix {prefix.shape[1]} tokens, generating {n_new}"
    )
    tokens = generate(
        ar_params,
        ar_cfg,
        jnp.asarray(prefix, jnp.int32),
        jax.random.PRNGKey(args.seed),
        max_new_tokens=n_new,
        temperature=args.temperature,
        top_p=args.top_p,
        quantize_kv=args.quantize_kv,
    )
    tokens = jnp.clip(tokens, 0, vae_cfg.vocab_size - 1)
    grid = tokens.reshape(1, total_latent_t, Hl, Wl)

    dd = None
    if not args.disable_diffusion_decoder:
        # reference default: refine tokens through the latent diffusion
        # decoder (world_generation_pipeline.py:222-244 + the
        # diffusion_decoder_process_tokens flow); trimmed to the DV
        # decode length like the reference's [:T] (inference.py:108-111).
        # The full-size DD is checkpoint-gated — without its weights we
        # fall back to the plain DV decode instead of refining through
        # ~14 GB of random noise weights.
        from gen3c_tpu.pipelines.diffusion_decoder import build_dd_pipeline

        try:
            dd = build_dd_pipeline(
                args.model_preset, jax.random.fold_in(key, 9),
                checkpoint_dir=args.checkpoint_dir,
            )
        except FileNotFoundError as e:
            log.warning(f"diffusion decoder unavailable ({e}); "
                        "falling back to the DV tokenizer decode")
    if dd is not None:
        log.info("Refining generated tokens with the diffusion decoder...")
        dd.sampling.num_steps = args.diffusion_decoder_steps
        t_pixels = (
            total_latent_t // tokenizer.latent_chunk_duration * chunk
        )
        out = dd.refine(grid, seed=args.seed)[:, :, :t_pixels]
    else:
        log.info("Decoding generated tokens...")
        out = tokenizer.decode(grid)
    frames = np.asarray(out[0]).transpose(1, 2, 3, 0)
    frames = ((frames + 1) / 2 * 255).clip(0, 255).astype(np.uint8)
    path = os.path.join(args.video_save_folder, f"{args.video_save_name}.mp4")
    path = io_utils.save_video(frames, args.fps, path)
    log.info(f"Saved video to {path}")
    return path


if __name__ == "__main__":
    demo(create_parser().parse_args())
