"""Optical-flow consistency loss for tokenizer training.

Parity target: cosmos_predict1/tokenizer/training/losses/continuous.py
FlowLoss (:218-385) — the RECONSTRUCTION's motion field must match the
INPUT's: bidirectional flow is computed on a `scale`-downsampled version
of both videos, and the L1 between the two flow fields is the loss
(forward flow over (t, t+1) pairs concatenated with backward flow,
trilinearly rescaled back to full resolution, :327-362, :364-383).

The reference estimates flow with torchvision's pretrained RAFT-Large
(monkeypatched for bf16/GPU, :236-296). The estimator here is PLUGGABLE:

  * `flow_fn=`: any (frames1 (N,C,H,W), frames2 (N,C,H,W)) ->
    (N, 2, H, W) callable. The reference-parity estimator is the JAX
    RAFT-Large port (aux/raft.py, torchvision topology + the
    monkeypatched index_pyramid semantics), checkpoint-gated on the
    torchvision raft_large weights: `make_raft_flow_fn(params)`;
  * default (no flow_fn): a differentiable multi-scale Lucas-Kanade
    estimator in pure JAX (coarse-to-fine pyramid, iterated linearized
    LK with bilinear warping) — a dependency-free fallback with the
    same contract, adequate for the loss's OBJECTIVE (penalize
    motion-field mismatch) when no RAFT weights are available.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _gray(x: Array) -> Array:
    """(N, C, H, W) -> (N, H, W) luminance."""
    if x.shape[1] == 1:
        return x[:, 0]
    w = jnp.asarray([0.299, 0.587, 0.114], x.dtype)[: x.shape[1]]
    w = w / w.sum()
    return jnp.einsum("nchw,c->nhw", x, w)


def _avg_pool2(x: Array) -> Array:
    """(N, H, W) -> (N, H/2, W/2)."""
    N, H, W = x.shape
    return x[:, : H // 2 * 2, : W // 2 * 2].reshape(
        N, H // 2, 2, W // 2, 2
    ).mean(axis=(2, 4))


def _bilinear_sample(img: Array, yy: Array, xx: Array) -> Array:
    """img (H, W), coords (H, W) -> sampled (H, W), edge-clamped."""
    H, W = img.shape
    y0 = jnp.clip(jnp.floor(yy), 0, H - 2)
    x0 = jnp.clip(jnp.floor(xx), 0, W - 2)
    wy = jnp.clip(yy - y0, 0.0, 1.0)
    wx = jnp.clip(xx - x0, 0.0, 1.0)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    p00 = img[y0i, x0i]
    p01 = img[y0i, x0i + 1]
    p10 = img[y0i + 1, x0i]
    p11 = img[y0i + 1, x0i + 1]
    return (
        p00 * (1 - wy) * (1 - wx)
        + p01 * (1 - wy) * wx
        + p10 * wy * (1 - wx)
        + p11 * wy * wx
    )


def _lk_refine(a: Array, b: Array, flow: Array, window: int,
               iters: int) -> Array:
    """One pyramid level of iterated Lucas-Kanade on (H, W) pair."""
    H, W = a.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=a.dtype), jnp.arange(W, dtype=a.dtype),
        indexing="ij",
    )
    # spatial gradients of the TARGET (central differences)
    gy, gx = jnp.gradient(b)

    k = window
    ones = jnp.ones((1, 1, k, k), a.dtype) / (k * k)

    def box(z):
        return jax.lax.conv_general_dilated(
            z[None, None], ones, (1, 1),
            padding=((k // 2, k // 2), (k // 2, k // 2)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[0, 0]

    def step(flow, _):
        u, v = flow[0], flow[1]
        bw = _bilinear_sample(b, yy + v, xx + u)
        gxw = _bilinear_sample(gx, yy + v, xx + u)
        gyw = _bilinear_sample(gy, yy + v, xx + u)
        it = bw - a  # temporal difference at current estimate
        # windowed normal equations  [Σgx² Σgxgy; Σgxgy Σgy²] d = -[Σgx·it; Σgy·it]
        sxx = box(gxw * gxw) + 1e-3
        syy = box(gyw * gyw) + 1e-3
        sxy = box(gxw * gyw)
        bx = -box(gxw * it)
        by = -box(gyw * it)
        det = sxx * syy - sxy * sxy
        du = (syy * bx - sxy * by) / jnp.maximum(det, 1e-6)
        dv = (sxx * by - sxy * bx) / jnp.maximum(det, 1e-6)
        du = jnp.clip(du, -2.0, 2.0)
        dv = jnp.clip(dv, -2.0, 2.0)
        return jnp.stack([u + du, v + dv]), None

    flow, _ = jax.lax.scan(step, flow, None, length=iters)
    return flow


def lucas_kanade_flow(
    frames1: Array,  # (N, C, H, W) in [-1, 1] or [0, 1]
    frames2: Array,
    levels: int = 3,
    window: int = 7,
    iters: int = 3,
) -> Array:
    """Coarse-to-fine Lucas-Kanade: flow (N, 2, H, W) mapping frames1 ->
    frames2 (u = x-displacement, v = y-displacement, pixels)."""
    a = _gray(frames1.astype(jnp.float32))
    b = _gray(frames2.astype(jnp.float32))
    H, W = a.shape[-2:]
    import math

    levels = max(
        1,
        min(levels,
            int(math.log2(min(H, W) // 8)) + 1 if min(H, W) >= 16 else 1),
    )
    pyr_a, pyr_b = [a], [b]
    for _ in range(levels - 1):
        pyr_a.append(_avg_pool2(pyr_a[-1]))
        pyr_b.append(_avg_pool2(pyr_b[-1]))

    def flow_one(a_levels, b_levels):
        flow = jnp.zeros((2,) + a_levels[-1].shape, jnp.float32)
        for lvl in range(levels - 1, -1, -1):
            if lvl < levels - 1:
                # upsample flow x2 (and scale displacement)
                flow = 2.0 * jax.image.resize(
                    flow, (2,) + a_levels[lvl].shape, method="bilinear"
                )
            flow = _lk_refine(a_levels[lvl], b_levels[lvl], flow,
                              window, iters)
        return flow

    flows = jax.vmap(
        lambda *xs: flow_one(xs[:levels], xs[levels:])
    )(*pyr_a, *pyr_b)
    return flows  # (N, 2, H, W)


def bidirectional_flow(
    video: Array,  # (B, T, C, H, W)  (reference layout, :327)
    flow_fn: Callable[[Array, Array], Array],
    scale: int = 2,
) -> Array:
    """FlowLoss._bidirectional_flow parity (:327-362): flow on the
    scale-downsampled video, forward (T-1) + backward (T-1) concatenated
    on the temporal axis, rescaled (and displacement-scaled) back."""
    B, T, C, H, W = video.shape
    hs, ws = H // scale, W // scale
    small = jax.image.resize(
        video, (B, T, C, hs, ws), method="bilinear"
    )

    def fwd(frames):  # (T, C, h, w) -> (T-1, 2, h, w)
        return flow_fn(frames[:-1], frames[1:])

    fwd_flow = jax.vmap(fwd)(small)  # (B, T-1, 2, h, w)
    bwd_flow = jax.vmap(fwd)(small[:, ::-1])[:, ::-1]
    flow = jnp.concatenate([fwd_flow, bwd_flow], axis=1)  # (B, 2(T-1), 2, h, w)
    flow = flow.transpose(0, 2, 1, 3, 4)  # (B, 2, 2(T-1), h, w)
    # reference uses trilinear over (2(T-1), H, W) with T unchanged —
    # equivalent to linear interpolation over the spatial dims here
    out = jax.image.resize(flow, flow.shape[:3] + (H, W), method="linear")
    return scale * out


def flow_loss(
    video: Array,  # (B, 3, T, H, W) input, [-1, 1]
    recon: Array,  # (B, 3, T, H, W) reconstruction
    flow_fn: Optional[Callable[[Array, Array], Array]] = None,
    scale: int = 2,
) -> Array:
    """FlowLoss.forward parity (:364-383): scalar mean L1 between the
    input's and the reconstruction's bidirectional flow fields."""
    if video.shape[2] <= 1:
        return jnp.zeros((), jnp.float32)
    if flow_fn is None:
        flow_fn = partial(lucas_kanade_flow)
    v = video.transpose(0, 2, 1, 3, 4)  # (B, T, C, H, W)
    r = recon.transpose(0, 2, 1, 3, 4)
    fi = bidirectional_flow(v, flow_fn, scale)
    fr = bidirectional_flow(r, flow_fn, scale)
    return jnp.mean(jnp.abs(fi - fr))
