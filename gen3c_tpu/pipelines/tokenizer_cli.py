"""Standalone video tokenizer encode/decode CLI.

Parity: cosmos_predict1/tokenizer/inference/{video_cli,video_lib}.py —
encode a video to latents (npz), decode latents back to video, or run a
reconstruction round-trip with a PSNR report.

Usage:
  python -m gen3c_tpu.pipelines.tokenizer_cli --mode roundtrip \
      --input video.mp4 --output recon.mp4 [--vae_preset tiny]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from gen3c_tpu.models import vae as jvae
from gen3c_tpu.utils import io as io_utils
from gen3c_tpu.utils import log

VAE_PRESETS = {
    "cv8x8x8": jvae.CV8x8x8,
    "tiny": jvae.VAEConfig(
        channels=16,
        channels_mult=(2, 4, 4),
        num_res_blocks=1,
        attn_resolutions=(),
        resolution=256,
        patch_size=4,
        latent_channels=16,
        z_channels=16,
    ),
}


def build_tokenizer(args) -> jvae.VideoTokenizer:
    cfg = VAE_PRESETS[args.vae_preset]
    params = None
    if args.checkpoint_dir:
        from gen3c_tpu.utils import checkpoint as ckpt

        vae_dir = os.path.join(
            args.checkpoint_dir, "Cosmos-Tokenize1-CV8x8x8-720p"
        )
        if os.path.isdir(vae_dir):
            params, mean, std = ckpt.load_torchscript_tokenizer(vae_dir)
            log.info(f"loaded tokenizer weights from {vae_dir}")
    if params is None:
        log.warning("no tokenizer checkpoint; RANDOM weights")
        params = jvae.init_vae_params(jax.random.PRNGKey(0), cfg)
    return jvae.VideoTokenizer(
        params, cfg, pixel_chunk_duration=args.chunk_duration
    )


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float(10 * np.log10(peak**2 / max(mse, 1e-12)))


def pad_video_bcthw(
    video: np.ndarray, temporal_align: int, spatial_align: int = 16,
    temporal_rule: str = "causal",
):
    """Pad (B, C, T, H, W) video so the tokenizer accepts it: zero-pad
    spatially to a multiple of spatial_align, EDGE-pad temporally (the
    causal encoder handles replicated frames better than zeros) so that
    (T - 1) % temporal_align == 0 (rule "causal", the raw causal
    network's requirement) or T % temporal_align == 0 (rule "multiple",
    the chunked wrapper's). Returns (padded, crop_region) with
    crop_region = (f1, y1, x1, f2, y2, x2), matching the reference
    tokenizer CLI (tokenizer/inference/utils.py:320-373
    pad_video_batch/unpad_video_batch semantics, BCTHW layout).
    """
    T, H, W = video.shape[-3:]
    hp = (-H) % spatial_align
    wp = (-W) % spatial_align
    if temporal_rule == "causal":
        fp = (temporal_align - (T - 1) % temporal_align) % temporal_align
    else:
        fp = (-T) % temporal_align
    crop = (fp >> 1, hp >> 1, wp >> 1, T + (fp >> 1), H + (hp >> 1),
            W + (wp >> 1))
    video = np.pad(
        video,
        ((0, 0), (0, 0), (0, 0), (hp >> 1, hp - (hp >> 1)),
         (wp >> 1, wp - (wp >> 1))),
        mode="constant",
    )
    video = np.pad(
        video,
        ((0, 0), (0, 0), (fp >> 1, fp - (fp >> 1)), (0, 0), (0, 0)),
        mode="edge",
    )
    return video, crop


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Cosmos video tokenizer (TPU)")
    p.add_argument("--mode", choices=["encode", "decode", "roundtrip"],
                   default="roundtrip")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--vae_preset", choices=sorted(VAE_PRESETS),
                   default="cv8x8x8")
    p.add_argument("--chunk_duration", type=int, default=121)
    p.add_argument("--fps", type=int, default=24)
    args = p.parse_args(argv)
    from gen3c_tpu.utils.jax_setup import setup_jax

    setup_jax()  # persistent compile cache across CLI runs

    crop = None
    if args.mode in ("encode", "roundtrip"):
        video, fps = io_utils.read_video_bcthw(args.input)
        T = video.shape[2]
        if T < args.chunk_duration:
            # shorter than one chunk: no chunking — run the whole
            # (causally padded) clip through the network in one piece,
            # like the reference standalone CLI (video_lib.py:138-143)
            tc = VAE_PRESETS[args.vae_preset].temporal_compression
            video, crop = pad_video_bcthw(video, tc)
            args.chunk_duration = video.shape[2]
        else:
            video, crop = pad_video_bcthw(
                video, args.chunk_duration, temporal_rule="multiple"
            )
        tok = build_tokenizer(args)
        latent = tok.encode(jnp.asarray(video))
        if args.mode == "encode":
            np.savez(args.output, latent=np.asarray(latent), fps=fps,
                     crop_region=np.asarray(crop))
            log.info(f"saved latent {latent.shape} to {args.output}")
            return
    else:
        data = np.load(args.input)
        latent = jnp.asarray(data["latent"])
        fps = float(data.get("fps", args.fps))
        crop = tuple(data["crop_region"]) if "crop_region" in data else None
        lc = latent.shape[2]
        tc = VAE_PRESETS[args.vae_preset].temporal_compression
        if args.chunk_duration > (lc - 1) * tc + 1:
            args.chunk_duration = (lc - 1) * tc + 1  # single-piece decode
        tok = build_tokenizer(args)

    recon = tok.decode(latent)
    if crop is not None:
        f1, y1, x1, f2, y2, x2 = crop
        recon = recon[:, :, f1:f2, y1:y2, x1:x2]
        if args.mode == "roundtrip":
            video = video[:, :, f1:f2, y1:y2, x1:x2]
    frames = np.asarray(recon[0]).transpose(1, 2, 3, 0)
    frames = ((frames + 1) / 2 * 255).clip(0, 255).astype(np.uint8)
    out_path = io_utils.save_video(frames, int(fps), args.output)
    log.info(f"saved reconstruction to {out_path}")

    if args.mode == "roundtrip":
        orig = ((np.asarray(video[0]).transpose(1, 2, 3, 0) + 1) / 2 * 255
                ).clip(0, 255).astype(np.uint8)
        # first frame is replicated by the causal patcher; score frames 1:
        score = psnr(orig[1:], frames[1:])
        log.info(f"roundtrip PSNR (frames 1:): {score:.2f} dB")
        print(f"PSNR: {score:.2f}")


if __name__ == "__main__":
    main()
