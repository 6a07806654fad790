"""Fidelity metrics: PSNR / MAE / masked variants for parity gates.

The driver's BASELINE gates are per-frame PSNR of cache renders and
generated latents vs the reference pipeline (BASELINE.md). These helpers
are used by tests/ and scripts/fidelity_gate.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 2.0,
         mask: Optional[np.ndarray] = None) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if mask is not None:
        m = np.broadcast_to(np.asarray(mask, bool), a.shape)
        if not m.any():
            return float("inf")
        mse = np.mean((a[m] - b[m]) ** 2)
    else:
        mse = np.mean((a - b) ** 2)
    return float(10 * np.log10(peak**2 / max(mse, 1e-12)))


def per_frame_psnr(a: np.ndarray, b: np.ndarray, peak: float = 2.0):
    """PSNR per leading-axis frame."""
    return np.array([psnr(x, y, peak) for x, y in zip(a, b)])


def mae(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean(np.abs(np.asarray(a, np.float64) - b)))
