"""Fidelity gate: cache renders vs the reference torch-CPU pipeline.

Runs BASELINE config #1 (depth unproject + splat render of a real image
along a preset trajectory) through BOTH the reference implementation
(torch CPU, imported from /root/reference) and gen3c_tpu, and reports
per-frame PSNR. Gate: min PSNR >= --min_psnr (default 35 dB).

Usage:
  python scripts/fidelity_gate.py \
      [--image /root/reference/assets/diffusion/000000.png] \
      [--trajectory left] [--frames 9] [--scale 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument(
        "--image", default="/root/reference/assets/diffusion/000000.png"
    )
    p.add_argument("--trajectory", default="left")
    p.add_argument("--frames", type=int, default=9)
    p.add_argument("--scale", type=int, default=4,
                   help="downsample factor for speed")
    p.add_argument("--movement_distance", type=float, default=0.25)
    p.add_argument("--min_psnr", type=float, default=35.0)
    args = p.parse_args()

    import numpy as np
    import torch
    from PIL import Image

    import jax.numpy as jnp

    from gen3c_tpu.cache import Cache3DBuffer
    from gen3c_tpu.ops.camera import generate_camera_trajectory
    from gen3c_tpu.utils.metrics import per_frame_psnr
    from reference_oracle import load_reference_geometry

    fwu, cam_utils, cache_3d = load_reference_geometry()

    img = np.asarray(Image.open(args.image).convert("RGB"))
    img = img[: img.shape[0] // 8 * 8, : img.shape[1] // 8 * 8]
    img = img[:: args.scale, :: args.scale]
    h, w = img.shape[:2]
    image = (img.astype(np.float32) / 127.5 - 1).transpose(2, 0, 1)[None]
    yy, xx = np.meshgrid(
        np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij"
    )
    depth = (3.0 - 1.2 * yy + 0.3 * np.sin(4 * xx)).astype(np.float32)[
        None, None
    ]
    k = np.array(
        [[0.8 * w, 0, w / 2], [0, 0.8 * w, h / 2], [0, 0, 1]], np.float32
    )[None]
    w2c = np.eye(4, dtype=np.float32)[None]

    w2cs, ks = generate_camera_trajectory(
        args.trajectory, w2c[0], k[0], args.frames, args.movement_distance,
        "center_facing", 2.4,
    )

    ref_cache = cache_3d.Cache3D_Buffer(
        frame_buffer_max=2,
        noise_aug_strength=0.0,
        input_image=torch.from_numpy(image),
        input_depth=torch.from_numpy(depth),
        input_w2c=torch.from_numpy(w2c),
        input_intrinsics=torch.from_numpy(k),
        device="cpu",
        weight_dtype=torch.float32,
    )
    ref_px, ref_mask = ref_cache.render_cache(
        torch.from_numpy(np.asarray(w2cs)), torch.from_numpy(np.asarray(ks))
    )

    ours = Cache3DBuffer(
        frame_buffer_max=2,
        noise_aug_strength=0.0,
        input_image=jnp.asarray(image),
        input_depth=jnp.asarray(depth),
        input_w2c=jnp.asarray(w2c),
        input_intrinsics=jnp.asarray(k),
    )
    px, mask = ours.render_cache(w2cs, ks)

    scores = per_frame_psnr(np.asarray(px)[0, :, 0], ref_px.numpy()[0, :, 0])
    result = {
        "per_frame_psnr_db": [round(float(s), 2) for s in scores],
        "min_psnr_db": round(float(scores.min()), 2),
        "mean_psnr_db": round(float(scores.mean()), 2),
        "gate_db": args.min_psnr,
        "pass": bool(scores.min() >= args.min_psnr),
    }
    print(json.dumps(result))
    raise SystemExit(0 if result["pass"] else 1)


if __name__ == "__main__":
    main()
