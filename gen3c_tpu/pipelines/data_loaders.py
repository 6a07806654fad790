"""Input data loaders for dynamic-scene and multiview generation.

Parity targets:
  * distributed dir format (rgb.mp4 + depth.npz + mask.npz + camera.npz)
    and packaged .pt — data_loader_utils.py:100-193
  * ViPE SLAM output (rgb mp4 + depth EXR zip + pose/intrinsics npz +
    optional mask zip), resize 720x1280 -> center-crop 704x1280 with
    intrinsics adjustment — vipe_utils.py:17-270
  * multiview npz with keys images_key_frames, depth_key_frames,
    mask_key_frames, K_key_frames, w2cs_key_frames, w2cs_all, Ks_all —
    gen3c_multiview.py:179-231

All functions return numpy arrays:
  (image (F,3,H,W) in [-1,1], depth (F,1,H,W), mask (F,1,H,W) or None,
   w2c (F,4,4), intrinsics (F,3,3))
"""

from __future__ import annotations

import os
import zipfile
from pathlib import Path
from typing import Optional, Tuple

import numpy as np


def adjust_intrinsics_for_resize_and_crop(
    k: np.ndarray,
    src_hw: Tuple[int, int],
    resize_hw: Tuple[int, int],
    crop_hw: Tuple[int, int],
) -> np.ndarray:
    """Rescale fx/fy/cx/cy for a resize followed by a center crop
    (vipe_utils.py:17-41 parity)."""
    src_h, src_w = src_hw
    rh, rw = resize_hw
    ch, cw = crop_hw
    out = k.copy()
    sx, sy = rw / float(src_w), rh / float(src_h)
    out[0, 0] *= sx
    out[1, 1] *= sy
    out[0, 2] *= sx
    out[1, 2] *= sy
    out[0, 2] -= max((rw - cw) // 2, 0)
    out[1, 2] -= max((rh - ch) // 2, 0)
    return out


def _read_video_frames(path: str) -> np.ndarray:
    """(T, H, W, 3) uint8."""
    import imageio

    reader = imageio.get_reader(path)
    frames = [np.asarray(f)[..., :3] for f in reader]
    reader.close()
    return np.stack(frames)


def load_data_distributed_format(data_dir: str):
    """rgb.mp4 + depth.npz['depth'] + mask.npz['mask'] + camera.npz
    {'w2c','intrinsics'} (data_loader_utils.py:137-164 parity)."""
    p = Path(data_dir)
    frames = _read_video_frames(str(p / "rgb.mp4"))
    image = frames.astype(np.float32).transpose(0, 3, 1, 2) / 127.5 - 1.0
    depth = np.load(p / "depth.npz")["depth"].astype(np.float32)[:, None]
    mask = np.load(p / "mask.npz")["mask"].astype(np.float32)[:, None]
    cam = np.load(p / "camera.npz")
    w2c = cam["w2c"].astype(np.float32)
    k = cam["intrinsics"].astype(np.float32)
    return image, depth, mask, w2c, k


def load_data_packaged_format(path: str):
    """Packaged single-file format: .pt (torch tuple of 5 tensors,
    data_loader_utils.py:167-182) or the native .npz equivalent."""
    if path.endswith(".npz"):
        d = np.load(path)
        return (
            d["image"].astype(np.float32),
            d["depth"].astype(np.float32),
            d["mask"].astype(np.float32) if "mask" in d else None,
            d["w2c"].astype(np.float32),
            d["intrinsics"].astype(np.float32),
        )
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    if len(data) != 5:
        raise ValueError(f"Expected 5 tensors in pt file, got {len(data)}")
    return tuple(
        None if t is None else np.asarray(t, dtype=np.float32) for t in data
    )


def load_data_auto_detect(input_path: str):
    """data_loader_utils.py:185-193 parity (+ .npz support)."""
    p = Path(input_path)
    if p.is_file() and p.suffix in (".pt", ".npz"):
        return load_data_packaged_format(str(p))
    if p.is_dir():
        return load_data_distributed_format(str(p))
    raise ValueError(f"Invalid input path: {input_path}")


# ------------------------------- ViPE -------------------------------


def _read_depth_from_zip(zip_path: str, frame_idx: int) -> np.ndarray:
    """Read one depth EXR/npy from a ViPE depth zip
    (vipe_utils.py:85-100 parity: the reference reads the float16 'Z'
    channel via OpenEXR; here the pure-Python scanline codec in
    utils/exr.py reads real .exr entries directly — .npy entries are
    also accepted as a packaging convenience)."""
    with zipfile.ZipFile(zip_path) as zf:
        names = sorted(zf.namelist())
        name = names[frame_idx]
        data = zf.read(name)
    if name.endswith(".npy"):
        import io

        return np.load(io.BytesIO(data)).astype(np.float32)
    if name.endswith(".exr"):
        from gen3c_tpu.utils.exr import read_exr_depth

        return read_exr_depth(data)
    raise ValueError(f"Unsupported depth entry {name}")


def _load_indexed_npz(path: str, frame_idx: int) -> np.ndarray:
    """ViPE pose/intrinsics npz with 'inds' + 'data' arrays
    (vipe_utils.py:50-68 parity)."""
    d = np.load(path)
    inds, arr = d["inds"], d["data"]
    pos = int(np.searchsorted(inds, frame_idx))
    if not (0 <= pos < len(inds)) or int(inds[pos]) != int(frame_idx):
        raise FileNotFoundError(f"Frame {frame_idx} not found in {path}")
    return arr[pos]


def _resize_center_crop(img: np.ndarray, resize_hw, crop_hw) -> np.ndarray:
    """(H, W, C) or (H, W) -> resized + center-cropped."""
    from PIL import Image

    rh, rw = resize_hw
    ch, cw = crop_hw
    mode_img = Image.fromarray(
        img if img.dtype == np.uint8 else img.astype(np.float32)
    )
    resized = np.asarray(mode_img.resize((rw, rh), Image.BILINEAR))
    oy = max((rh - ch) // 2, 0)
    ox = max((rw - cw) // 2, 0)
    return resized[oy : oy + ch, ox : ox + cw]


def load_vipe_data(
    vipe_root_or_mp4: str,
    starting_frame_idx: int = 0,
    resize_hw: Tuple[int, int] = (720, 1280),
    crop_hw: Tuple[int, int] = (704, 1280),
    num_frames: int = 121,
):
    """Load a ViPE clip (vipe_utils.py:172-270 parity).

    Layout: <root>/rgb/<clip>.mp4, <root>/depth/<clip>.zip,
    <root>/pose/<clip>.npz, <root>/intrinsics/<clip>.npz.
    """
    root = Path(vipe_root_or_mp4)
    if root.suffix == ".mp4":
        clip = root.stem
        root = root.parent.parent
    else:
        rgb_dir = root / "rgb"
        clips = sorted(p.stem for p in rgb_dir.glob("*.mp4"))
        assert clips, f"no mp4 clips under {rgb_dir}"
        clip = clips[0]
    mp4 = root / "rgb" / f"{clip}.mp4"
    depth_zip = root / "depth" / f"{clip}.zip"
    pose_npz = root / "pose" / f"{clip}.npz"
    intr_npz = root / "intrinsics" / f"{clip}.npz"

    frames = _read_video_frames(str(mp4))
    total = len(frames)
    start = min(starting_frame_idx, max(0, total - 1))
    idxs = list(range(start, min(start + num_frames, total)))
    while len(idxs) < num_frames:
        idxs.append(total - 1)
    src_hw = frames.shape[1:3]

    images, depths, w2cs, ks = [], [], [], []
    for fi in idxs:
        img = _resize_center_crop(frames[fi], resize_hw, crop_hw)
        images.append(img.astype(np.float32) / 127.5 - 1.0)
        d = _read_depth_from_zip(str(depth_zip), fi)
        depths.append(_resize_center_crop(d, resize_hw, crop_hw))
        c2w = _load_indexed_npz(str(pose_npz), fi)
        if c2w.shape == (16,):
            c2w = c2w.reshape(4, 4)
        w2cs.append(np.linalg.inv(c2w).astype(np.float32))
        fxfycxcy = _load_indexed_npz(str(intr_npz), fi)
        k = np.array(
            [
                [fxfycxcy[0], 0, fxfycxcy[2]],
                [0, fxfycxcy[1], fxfycxcy[3]],
                [0, 0, 1],
            ],
            np.float32,
        )
        ks.append(
            adjust_intrinsics_for_resize_and_crop(k, src_hw, resize_hw, crop_hw)
        )

    image = np.stack(images).transpose(0, 3, 1, 2)
    depth = np.stack(depths)[:, None]
    mask = np.ones_like(depth)
    return image, depth, mask, np.stack(w2cs), np.stack(ks)


# ----------------------------- multiview -----------------------------


def load_multiview_npz(path: str):
    """Multiview keyframe npz (gen3c_multiview.py:179-231 parity).

    Returns dict with images/depths/masks/Ks/w2cs for the key frames and
    the full target trajectory (w2cs_all, Ks_all).
    """
    d = np.load(path)
    out = {
        "images": d["images_key_frames"].astype(np.float32),
        "depths": d["depth_key_frames"].astype(np.float32),
        "masks": (
            d["mask_key_frames"].astype(np.float32)
            if "mask_key_frames" in d
            else None
        ),
        "ks": d["K_key_frames"].astype(np.float32),
        "w2cs": d["w2cs_key_frames"].astype(np.float32),
        "w2cs_all": d["w2cs_all"].astype(np.float32),
        "ks_all": d["Ks_all"].astype(np.float32),
    }
    return out
