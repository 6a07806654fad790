"""Monocular depth estimation interface for cache seeding / AR updates.

The reference uses MoGe ("Ruicheng/moge-vitl", an external pip package)
at 720x1280 inference resolution, rescaling intrinsics to the target
resolution and setting masked-out depth to 1000
(reference: gen3c_single_image.py:114-217).

This module defines the estimator protocol plus four implementations:
  * MoGeJaxDepthEstimator — MoGe ViT-L in JAX (aux/moge.py): the
    TPU-native depth source, preferred by the auto selector when its
    converted checkpoint is available
  * MoGeDepthEstimator — the torch model via torch hub / the moge
    package when available on the host
  * FileDepthEstimator — load precomputed depth maps (npz/npy/EXR/png16)
  * HeuristicDepthEstimator — dependency-free fallback: smooth luminance/
    position-prior depth, for smoke tests and environments without MoGe
"""

from __future__ import annotations

import os
from typing import Optional, Protocol, Tuple

import numpy as np


class DepthEstimation(Protocol):
    def __call__(
        self, image: np.ndarray
    ) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray]:
        """image: (H, W, 3) uint8 or float in [0,1].

        Returns (depth (H, W) float32, intrinsics (3, 3) or None,
        mask (H, W) bool)."""
        ...


def default_intrinsics(h: int, w: int, fov_deg: float = 50.0) -> np.ndarray:
    f = 0.5 * w / np.tan(np.radians(fov_deg) / 2)
    return np.array(
        [[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32
    )


class MoGeDepthEstimator:
    """MoGe monocular depth (gen3c_single_image.py:114-200 parity).

    Runs at 720x1280 then resizes depth/mask to the target resolution and
    rescales intrinsics accordingly; masked-out depth is set to 1000.
    """

    MASKED_DEPTH = 1000.0

    def __init__(self, device: str = "cpu"):
        import torch
        from moge.model import MoGeModel  # external pip dependency

        self.torch = torch
        self.model = MoGeModel.from_pretrained("Ruicheng/moge-vitl").to(device)
        self.device = device

    def __call__(self, image: np.ndarray):
        torch = self.torch
        h, w = image.shape[:2]
        img = image.astype(np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        tens = torch.from_numpy(img).permute(2, 0, 1).to(self.device)
        out = self.model.infer(tens)
        depth = out["depth"].cpu().numpy().astype(np.float32)
        mask = out["mask"].cpu().numpy().astype(bool)
        intr = out["intrinsics"].cpu().numpy().astype(np.float32)
        # de-normalize intrinsics to pixels
        k = intr.copy()
        k[0] *= w
        k[1] *= h
        depth = np.where(mask, depth, self.MASKED_DEPTH)
        return depth, k, mask


class MoGeJaxDepthEstimator:
    """MoGe ViT-L in JAX (aux/moge.py) — the TPU-native depth source.

    Checkpoint-gated: construction needs a converted checkpoint
    (GEN3C_MOGE_CHECKPOINT env or <checkpoint_dir>/gen3c_tpu/moge.npz);
    absent -> FileNotFoundError and auto falls through. Inference runs
    at the reference's 720x1280-class budget, outputs resized to the
    input and masked-out depth set to 1000
    (gen3c_single_image.py:114-200 parity)."""

    MASKED_DEPTH = 1000.0

    def __init__(self, checkpoint: Optional[str] = None, cfg=None):
        import jax.numpy as jnp  # noqa: F401 — ensures jax is importable

        from gen3c_tpu.aux.moge import MOGE_VITL, convert_moge_state_dict

        if cfg is None:
            cfg = MOGE_VITL
        path = checkpoint or os.environ.get("GEN3C_MOGE_CHECKPOINT", "")
        if not path or not os.path.exists(path):
            raise FileNotFoundError(
                "MoGe JAX checkpoint not found (set GEN3C_MOGE_CHECKPOINT "
                "or pass checkpoint=); convert the 'Ruicheng/moge-vitl' "
                "torch weights with gen3c_tpu.aux.moge.convert_moge_state_dict"
            )
        self.cfg = cfg
        if path.endswith(".npz"):
            data = np.load(path)
            self.params = convert_moge_state_dict(
                {k: data[k] for k in data.files}, self.cfg
            )
        else:
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
            if isinstance(sd, dict) and "model" in sd:
                sd = sd["model"]
            self.params = convert_moge_state_dict(
                {k: v.numpy() for k, v in sd.items()}, self.cfg
            )
        self._jit = None

    def __call__(self, image: np.ndarray):
        import jax
        import jax.numpy as jnp

        from gen3c_tpu.aux.moge import moge_infer

        h, w = image.shape[:2]
        img = image.astype(np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        if self._jit is None:
            self._jit = jax.jit(
                lambda p, x: moge_infer(p, self.cfg, x)
            )
        depth, k, mask = self._jit(self.params, jnp.asarray(img))
        depth = np.asarray(depth).astype(np.float32)
        mask = np.asarray(mask).astype(bool)
        k = np.asarray(k).astype(np.float32)
        depth = np.where(
            mask & np.isfinite(depth), depth, self.MASKED_DEPTH
        )
        return depth, k, mask


class FileDepthEstimator:
    """Load depth from a file (npy/npz, .exr via the pure-Python codec
    in utils/exr.py, or 16-bit png in millimeters)."""

    def __init__(self, path: str, intrinsics: Optional[np.ndarray] = None):
        self.path = path
        self.intrinsics = intrinsics

    def __call__(self, image: np.ndarray):
        h, w = image.shape[:2]
        ext = os.path.splitext(self.path)[1].lower()
        if ext in (".npy",):
            depth = np.load(self.path).astype(np.float32)
        elif ext == ".npz":
            data = np.load(self.path)
            depth = data[list(data.keys())[0]].astype(np.float32)
        elif ext == ".exr":
            from gen3c_tpu.utils.exr import read_exr_depth

            with open(self.path, "rb") as f:
                depth = read_exr_depth(f.read())
        else:
            from PIL import Image

            arr = np.asarray(Image.open(self.path))
            depth = arr.astype(np.float32)
            if arr.dtype == np.uint16:
                depth = depth / 1000.0
        if depth.shape != (h, w):
            from PIL import Image

            depth = np.asarray(
                Image.fromarray(depth).resize((w, h), Image.BILINEAR)
            )
        mask = depth > 0
        k = self.intrinsics if self.intrinsics is not None else default_intrinsics(h, w)
        return depth, k, mask


class HeuristicDepthEstimator:
    """Dependency-free fallback: plausible smooth depth from a vertical
    position prior + blurred luminance. For smoke tests only."""

    def __init__(self, base_depth: float = 2.5):
        self.base_depth = base_depth

    def __call__(self, image: np.ndarray):
        h, w = image.shape[:2]
        img = image.astype(np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        lum = img.mean(axis=2)

        # separable box blur
        def box(a: np.ndarray, k: int, axis: int) -> np.ndarray:
            pad = k // 2
            spec = [(0, 0), (0, 0)]
            spec[axis] = (pad, pad)
            p = np.pad(a, spec, mode="edge")
            c = np.cumsum(p, axis=axis)
            zero = np.zeros(
                (1, c.shape[1]) if axis == 0 else (c.shape[0], 1), c.dtype
            )
            c = np.concatenate([zero, c], axis=axis)
            if axis == 0:
                return (c[k:] - c[:-k]) / k
            return (c[:, k:] - c[:, :-k]) / k

        k = max(h, w) // 16 * 2 + 1
        lum = box(box(lum, k, 0), k, 1)
        yy = np.linspace(0, 1, h)[:, None]
        depth = self.base_depth * (1.4 - 0.6 * yy) * (1.2 - 0.4 * lum)
        return (
            depth.astype(np.float32),
            default_intrinsics(h, w),
            np.ones((h, w), bool),
        )


def make_depth_estimator(
    source: str = "auto",
    depth_path: Optional[str] = None,
    intrinsics: Optional[np.ndarray] = None,
    device: str = "cpu",
) -> DepthEstimation:
    """source: 'moge_jax' | 'moge' (torch pip) | 'file' | 'heuristic' |
    'auto'. auto preference: file (when --depth_path) > moge_jax
    (checkpoint-gated TPU-native) > moge (external torch pip) >
    heuristic (last resort)."""
    if source == "file" or (source == "auto" and depth_path):
        assert depth_path, "--depth_path required for file depth source"
        return FileDepthEstimator(depth_path, intrinsics)
    if source in ("moge_jax", "auto"):
        try:
            return MoGeJaxDepthEstimator()
        except Exception as e:  # noqa: BLE001
            if source == "moge_jax":
                raise
            from gen3c_tpu.utils import log

            log.info(f"moge_jax unavailable ({e}); trying torch MoGe")
    if source in ("moge", "auto"):
        try:
            return MoGeDepthEstimator(device=device)
        except Exception as e:  # noqa: BLE001
            if source == "moge":
                raise
            from gen3c_tpu.utils import log

            log.warning(f"MoGe unavailable ({e}); using heuristic depth")
    return HeuristicDepthEstimator()
