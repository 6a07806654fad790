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


class IncrementalVideoSaver:
    """Hides the MJPEG-AVI save tail of AR runs under later chunks.

    save_video's ffmpeg-less fallback JPEG-encodes every frame at the
    END of the run (~12-25 s for a 121-frame 704x1280 chunk on this
    1-core host, fully serial with everything). AR chunk frames are
    final as soon as pipeline.generate returns, so the CLIs feed each
    completed chunk to update() — a single worker thread encodes the
    new frames while the NEXT chunk denoises (the denoise host loop is
    contention-proof: docs/STATUS.md round 3) — and save() assembles
    the container from the cache.

    Correctness does not depend on the caller's discipline: every
    cached JPEG is keyed by shape + dual 32-bit checksums of the frame
    bytes (_frame_key), and save() re-verifies each output frame
    against the cache, re-encoding on any mismatch (trimmed padding,
    compose_buffer_video, a guardrail edit).
    With ffmpeg available save_video writes real mp4s instead; update()
    is then a no-op and save() just delegates. Byte-identical output to
    a plain save_video call (same PIL encode: tests/test_easy_io.py).
    """

    def __init__(self, fps: int, quality: int = 5):
        self.fps = fps
        # same imageio(0-10) -> JPEG quality mapping as save_video
        self.jpeg_quality = min(95, 50 + 5 * quality)
        self.quality = quality
        self._cache: List[tuple] = []  # [(adler32, jpeg bytes)] in order
        self._scheduled = 0
        self._thread = None
        self._error: Optional[BaseException] = None
        self._enabled = (
            os.environ.get("GEN3C_INCREMENTAL_SAVE", "1") != "0"
            and not _ffmpeg_available()
        )

    def update(self, video_so_far: np.ndarray) -> None:
        """Schedule background JPEG encoding of frames beyond the last
        update() call. Non-blocking; thread-chained so cache order is
        append-only."""
        if not self._enabled or self._error is not None:
            return
        frames = np.asarray(video_so_far)[self._scheduled:]
        if frames.size == 0:
            return
        self._scheduled += len(frames)
        prev = self._thread

        def work():
            import zlib

            if prev is not None:
                prev.join()
            try:
                from gen3c_tpu.utils.mjpeg_avi import encode_jpeg_frame

                for fr in frames:
                    fr = np.ascontiguousarray(fr)
                    self._cache.append((
                        _frame_key(fr, zlib),
                        encode_jpeg_frame(fr, self.jpeg_quality),
                    ))
            except BaseException as e:  # noqa: BLE001 — save() falls back
                self._error = e

        import threading

        self._thread = threading.Thread(
            target=work, name="gen3c-jpeg-encode", daemon=True
        )
        self._thread.start()

    def save(self, video: np.ndarray, filepath: str) -> str:
        """save_video semantics (returns the path actually written),
        reusing the pre-encoded JPEGs for every frame whose bytes still
        match."""
        if self._thread is not None:
            self._thread.join()
        if not self._enabled or self._error is not None:
            return save_video(video, self.fps, filepath, self.quality)
        try:
            import zlib

            from gen3c_tpu.utils.mjpeg_avi import (
                encode_jpeg_frame,
                write_mjpeg_avi,
            )

            reused = 0
            jpegs = []
            for i, frame in enumerate(video):
                frame = np.ascontiguousarray(frame)
                c = _frame_key(frame, zlib)
                if i < len(self._cache) and self._cache[i][0] == c:
                    jpegs.append(self._cache[i][1])
                    reused += 1
                else:
                    jpegs.append(encode_jpeg_frame(frame, self.jpeg_quality))
            avi_path = os.path.splitext(filepath)[0] + ".avi"
            os.makedirs(
                os.path.dirname(os.path.abspath(avi_path)), exist_ok=True
            )
            write_mjpeg_avi(
                avi_path, None, fps=self.fps, jpegs=jpegs,
                frame_shape=(video.shape[1], video.shape[2]),
            )
            from gen3c_tpu.utils import log

            log.info(
                f"incremental save: reused {reused}/{len(video)} "
                "pre-encoded frames"
            )
            return avi_path
        except Exception as e:  # last-resort: save_video parity chain
            from gen3c_tpu.utils import log

            log.warning(f"incremental save failed ({e!r}); re-encoding")
            # don't leave a truncated .avi beside the fallback output
            try:
                avi_path = os.path.splitext(filepath)[0] + ".avi"
                if os.path.exists(avi_path):
                    os.remove(avi_path)
            except OSError:
                pass
            return save_video(video, self.fps, filepath, self.quality)


def _frame_key(frame: np.ndarray, zlib) -> tuple:
    """Cache key for one uint8 frame: shape + two independent 32-bit
    checksums (adler32 and crc32) of the bytes. A stale-frame reuse
    needs a simultaneous collision in both (~2^-64) — the guard is
    load-bearing for divergent callers (trims, guardrail edits), so a
    single 32-bit sum is not enough."""
    b = frame.tobytes()
    return (frame.shape, zlib.adler32(b), zlib.crc32(b))


def _ffmpeg_available() -> bool:
    # probes the binary's presence, not a full encode: a present-but-
    # broken ffmpeg disables the incremental path AND later fails
    # save_video's mp4 attempt, degrading to the serial end-of-run AVI
    # encode — correct output, just without the overlap (logged there).
    try:
        import imageio_ffmpeg

        imageio_ffmpeg.get_ffmpeg_exe()
        return True
    except Exception:
        return False


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
