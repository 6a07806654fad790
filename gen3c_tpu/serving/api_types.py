"""Inference-service API dataclasses.

Parity: gui/api/api_types.py:31-474 — RequestBase camera conventions
(cameras_to_world [B,3,4], absolute focal lengths [B,2], relative
principal points [B,2], resolutions [B,2] as (width,height)),
pad/trim frame logic, SeedingRequest/Result, InferenceRequest/Result.
Compression variants are provided via serialization-level zlib instead of
per-field jpg/exr codecs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


def pad_or_trim_array(arr: Optional[np.ndarray], n: int) -> Optional[np.ndarray]:
    """Repeat the last entry or drop from the end (api_types.py parity)."""
    if arr is None:
        return None
    cur = arr.shape[0]
    if cur == n:
        return arr
    if cur > n:
        return arr[:n]
    reps = np.repeat(arr[-1:], n - cur, axis=0)
    return np.concatenate([arr, reps], axis=0)


@dataclasses.dataclass(kw_only=True)
class RequestBase:
    request_id: str
    cameras_to_world: np.ndarray  # (B, 3, 4)
    focal_lengths: np.ndarray  # (B, 2) absolute pixels
    principal_points: np.ndarray  # (B, 2) relative
    resolutions: Optional[np.ndarray] = None  # (B, 2) (width, height)
    frame_count_without_padding: Optional[int] = None

    def __post_init__(self):
        images = getattr(self, "images", None)
        if images is not None:
            res = np.tile(
                [[images.shape[2], images.shape[1]]], (len(self), 1)
            )
            if self.resolutions is None:
                self.resolutions = res
        elif self.resolutions is None:
            raise ValueError("Missing value `resolutions`")
        n = len(self)
        assert self.cameras_to_world.shape == (n, 3, 4)
        assert self.focal_lengths.shape == (n, 2)
        assert self.principal_points.shape == (n, 2)

    def __len__(self) -> int:
        return self.cameras_to_world.shape[0]

    def world_to_cameras(self) -> np.ndarray:
        c2w = np.zeros((len(self), 4, 4), self.cameras_to_world.dtype)
        c2w[:, :3, :] = self.cameras_to_world
        c2w[:, 3, 3] = 1.0
        return np.linalg.inv(c2w)

    def intrinsics_matrix(
        self, for_resolutions: Optional[np.ndarray] = None
    ) -> np.ndarray:
        """Batched (B, 3, 3) K matrices (api_types.py:77-96 parity)."""
        k = np.zeros((len(self), 3, 3))
        k[:, 0, 0] = self.focal_lengths[:, 0]
        k[:, 1, 1] = self.focal_lengths[:, 1]
        k[:, 0, 2] = self.principal_points[:, 0] * self.resolutions[:, 0]
        k[:, 1, 2] = self.principal_points[:, 1] * self.resolutions[:, 1]
        k[:, 2, 2] = 1.0
        if for_resolutions is not None:
            k[:, 0, :] *= (
                for_resolutions[:, 0, None] / self.resolutions[:, 0, None]
            )
            k[:, 1, :] *= (
                for_resolutions[:, 1, None] / self.resolutions[:, 1, None]
            )
        return k

    def resolution(self):
        return int(self.resolutions[0, 0]), int(self.resolutions[0, 1])

    def _array_fields(self):
        return [
            "cameras_to_world", "focal_lengths", "principal_points",
            "resolutions",
        ]

    def pad_to_frame_count(self, n_frames: int) -> None:
        self.frame_count_without_padding = len(self)
        self._adjust_frame_count(n_frames)

    def trim_to_original_frame_count(
        self, override_frame_count: Optional[int] = None
    ) -> None:
        n = override_frame_count or self.frame_count_without_padding
        if n is None:
            return
        self._adjust_frame_count(n)

    def _adjust_frame_count(self, n_frames: int) -> None:
        for f in self._array_fields():
            setattr(self, f, pad_or_trim_array(getattr(self, f), n_frames))


@dataclasses.dataclass(kw_only=True)
class SeedingRequest(RequestBase):
    """Seed the 3D cache from posed images (+ optional depths)."""

    images: np.ndarray = None  # (B, H, W, 3) uint8 or float
    depths: Optional[np.ndarray] = None  # (B, H, W)
    # validity masks for multi-frame (v2v) seeding, (B, H, W) bool/float
    # (gui/api/api_types.py:160-169)
    masks: Optional[np.ndarray] = None

    def _array_fields(self):
        return super()._array_fields() + ["images", "depths", "masks"]


@dataclasses.dataclass(kw_only=True)
class SeedingResult(RequestBase):
    """Estimated depths for the seeding images (api_types.py:254-293)."""

    depths: Optional[np.ndarray] = None  # (B, H, W)

    def __post_init__(self):
        super().__post_init__()
        if self.depths is not None and self.depths.ndim == 4:
            self.depths = self.depths.squeeze(1)

    @staticmethod
    def from_request(
        req: SeedingRequest, fallback_depths: Optional[np.ndarray]
    ) -> "SeedingResult":
        resolutions = req.resolutions.copy()
        if fallback_depths is not None:
            resolutions[:, 0] = fallback_depths.shape[2]
            resolutions[:, 1] = fallback_depths.shape[1]
        return SeedingResult(
            request_id=req.request_id,
            cameras_to_world=req.cameras_to_world,
            focal_lengths=req.focal_lengths,
            principal_points=req.principal_points,
            resolutions=resolutions,
            depths=None if req.depths is not None else fallback_depths,
        )


@dataclasses.dataclass(kw_only=True)
class InferenceRequest(RequestBase):
    """Generate frames along a camera path (api_types.py:298-332)."""

    timestamps: Optional[np.ndarray] = None  # (B,)
    framerate: float = 24.0
    return_depths: bool = False
    prompt: str = ""

    def _array_fields(self):
        return super()._array_fields() + ["timestamps"]


@dataclasses.dataclass(kw_only=True)
class InferenceResult(RequestBase):
    """Generated frames (+ optional depths) (api_types.py:334-374)."""

    images: np.ndarray = None  # (B, H, W, 3) uint8
    depths: Optional[np.ndarray] = None  # (B, H, W)
    runtime_ms: float = 0.0

    def _array_fields(self):
        return super()._array_fields() + ["images", "depths"]

    def save_images(self, directory: str) -> None:
        import os

        from PIL import Image

        os.makedirs(directory, exist_ok=True)
        for i, img in enumerate(self.images):
            Image.fromarray(img).save(f"{directory}/{i:05d}.png")
