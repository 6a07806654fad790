"""Media IO: video save/load, image reading.

Parity: cosmos_predict1/utils/io.py (save_video via imageio-ffmpeg,
quality=5) and inference_utils.read_video_or_image_into_frames_BCTHW
(inference_utils.py:598-664: RGBA -> white-composite, resize, [-1,1]).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np


def save_video(
    video: np.ndarray,
    fps: int,
    filepath: str,
    quality: int = 5,
) -> str:
    """Save (T, H, W, C) uint8 frames as an mp4 (io.py:53-89 parity).
    Returns the written path (the PNG-frame directory when ffmpeg is
    unavailable)."""
    import imageio

    os.makedirs(os.path.dirname(os.path.abspath(filepath)), exist_ok=True)
    kwargs = {
        "fps": fps,
        "quality": quality,
        "macro_block_size": 1,
        "ffmpeg_params": ["-s", f"{video.shape[2]}x{video.shape[1]}"],
        "output_params": ["-f", "mp4"],
    }
    try:
        imageio.mimsave(filepath, video, "FFMPEG", **kwargs)
        return filepath
    except Exception:
        pass
    # ffmpeg unavailable: write a REAL video anyway — pure-Python
    # MJPEG-in-AVI (utils/mjpeg_avi.py), playable everywhere
    try:
        from gen3c_tpu.utils.mjpeg_avi import write_mjpeg_avi

        avi_path = os.path.splitext(filepath)[0] + ".avi"
        # imageio-ffmpeg quality 0-10 -> JPEG quality
        write_mjpeg_avi(avi_path, video, fps=fps,
                        quality=min(95, 50 + 5 * quality))
        return avi_path
    except Exception:
        # last resort: per-frame PNGs next to the target
        base = os.path.splitext(filepath)[0]
        os.makedirs(base, exist_ok=True)
        from PIL import Image

        for i, frame in enumerate(video):
            Image.fromarray(frame).save(os.path.join(base, f"{i:05d}.png"))
        # sidecar so read_video_bcthw can restore the frame rate
        with open(os.path.join(base, "fps.txt"), "w") as f:
            f.write(str(fps))
        return base


def read_prompts_from_file(prompt_file: str) -> List[dict]:
    """One JSON dict per line with key "prompt" (io.py:27-50 parity)."""
    import json

    prompts = []
    with open(prompt_file, "r") as f:
        for line in f:
            line = line.strip()
            if line:
                prompts.append(json.loads(line))
    return prompts


def read_image_bcthw(
    path: str, h: Optional[int] = None, w: Optional[int] = None
) -> np.ndarray:
    """Read an image into float32 (1, C, 1, H, W) in [-1, 1]; RGBA is
    composited over white (inference_utils.py:620-640 parity)."""
    from PIL import Image

    img = Image.open(path)
    if img.mode == "RGBA":
        bg = Image.new("RGBA", img.size, (255, 255, 255, 255))
        img = Image.alpha_composite(bg, img)
    img = img.convert("RGB")
    if h is not None and w is not None and img.size != (w, h):
        img = img.resize((w, h), Image.BICUBIC)
    arr = np.asarray(img).astype(np.float32) / 127.5 - 1.0  # (H, W, 3)
    return arr.transpose(2, 0, 1)[None, :, None]


def read_video_bcthw(
    path: str, h: Optional[int] = None, w: Optional[int] = None
) -> Tuple[np.ndarray, float]:
    """Read a video into float32 (1, C, T, H, W) in [-1, 1] + fps.

    Accepts either a video file or a directory of frame images (the
    save_video PNG-frame-dir fallback written when no ffmpeg backend is
    available) so CLI outputs round-trip in every environment."""
    import imageio
    from PIL import Image as _Image

    if os.path.isdir(path):
        names = sorted(
            n for n in os.listdir(path)
            if n.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        if not names:
            raise FileNotFoundError(f"no frame images in directory {path}")
        frames = []
        for n in names:
            img = _Image.open(os.path.join(path, n)).convert("RGB")
            if h is not None and w is not None and img.size != (w, h):
                img = img.resize((w, h), _Image.BICUBIC)
            frames.append(np.asarray(img))
        video = np.stack(frames).astype(np.float32) / 127.5 - 1.0
        fps = 24.0
        fps_file = os.path.join(path, "fps.txt")
        if os.path.exists(fps_file):  # sidecar written by save_video
            with open(fps_file) as f:
                fps = float(f.read().strip())
        return video.transpose(3, 0, 1, 2)[None], fps

    with open(path, "rb") as f:
        magic = f.read(12)
    if magic[:4] == b"RIFF" and magic[8:12] == b"AVI ":
        # MJPEG-AVI (our ffmpeg-free writer, or any MJPEG avi)
        from gen3c_tpu.utils.mjpeg_avi import read_mjpeg_avi

        frames_u8, fps = read_mjpeg_avi(path)
        from PIL import Image as _I

        out = []
        for fr in frames_u8:
            img = _I.fromarray(fr)
            if h is not None and w is not None and img.size != (w, h):
                img = img.resize((w, h), _I.BICUBIC)
            out.append(np.asarray(img))
        video = np.stack(out).astype(np.float32) / 127.5 - 1.0
        return video.transpose(3, 0, 1, 2)[None], fps

    reader = imageio.get_reader(path)
    meta = reader.get_meta_data()
    fps = float(meta.get("fps", 24))
    frames = []
    from PIL import Image

    for frame in reader:
        img = Image.fromarray(frame).convert("RGB")
        if h is not None and w is not None and img.size != (w, h):
            img = img.resize((w, h), Image.BICUBIC)
        frames.append(np.asarray(img))
    reader.close()
    video = np.stack(frames).astype(np.float32) / 127.5 - 1.0  # (T,H,W,3)
    return video.transpose(3, 0, 1, 2)[None], fps
