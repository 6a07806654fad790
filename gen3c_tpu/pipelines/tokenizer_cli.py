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

    tok = build_tokenizer(args)

    if args.mode in ("encode", "roundtrip"):
        video, fps = io_utils.read_video_bcthw(args.input)
        T = video.shape[2]
        keep = T // args.chunk_duration * args.chunk_duration
        assert keep > 0, (
            f"video too short: {T} < chunk {args.chunk_duration}"
        )
        video = video[:, :, :keep]
        latent = tok.encode(jnp.asarray(video))
        if args.mode == "encode":
            np.savez(args.output, latent=np.asarray(latent), fps=fps)
            log.info(f"saved latent {latent.shape} to {args.output}")
            return
    else:
        data = np.load(args.input)
        latent = jnp.asarray(data["latent"])
        fps = float(data.get("fps", args.fps))

    recon = tok.decode(latent)
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
