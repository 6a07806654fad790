"""Point-cloud geometry + forward-splat rendering, TPU-native.

Functional JAX re-design of the reference geometry engine
(reference: cosmos_predict1/diffusion/inference/forward_warp_utils_pytorch.py).
Behavioral parity targets (reference file:line):

  * ``create_grid``                 — forward_warp_utils_pytorch.py:697-703
  * ``compute_transformed_points``  — :523-573
  * ``project_points``              — :462-486
  * ``unproject_points``            — :410-460 (dense masked variant)
  * ``bilinear_splatting``          — :576-695 (log-depth softmax-style
    weights :636-652, scatter-add :659-675)
  * ``forward_warp``                — :171-336
  * ``reliable_depth_mask``         — :338-353

Unlike the reference (chunk-of-2 CPU<->GPU staging + index_put_), everything
here is pure-functional, static-shape and jit-friendly: the splat is one
batched XLA scatter-add over linearized pixel indices, and the whole
render loop stays resident in HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# Safe maximum exponent used when clamping the splat depth-weight exponent
# (reference get_max_exponent_for_dtype: 80 for fp32/bf16).
_MAX_EXPONENT = 80.0


def _inv44(m: Array) -> Array:
    """float32 4x4 (or 3x3) batched inverse, cast back to input dtype."""
    return jnp.linalg.inv(m.astype(jnp.float32)).astype(m.dtype)


def create_grid(h: int, w: int, dtype=jnp.float32) -> Array:
    """Dense (2, h, w) grid of (x, y) pixel coordinates."""
    x = jnp.broadcast_to(jnp.arange(w, dtype=dtype)[None, :], (h, w))
    y = jnp.broadcast_to(jnp.arange(h, dtype=dtype)[:, None], (h, w))
    return jnp.stack([x, y], axis=0)


def pixel_rays(h: int, w: int, intrinsic: Array) -> Array:
    """Unit-norm camera rays for every pixel. intrinsic: (b,3,3) -> (b,h,w,3).

    Parity: get_camera_rays (forward_warp_utils_pytorch.py:151-168).
    """
    dtype = intrinsic.dtype
    grid = create_grid(h, w, dtype)  # (2,h,w)
    pos = jnp.stack([grid[0], grid[1], jnp.ones((h, w), dtype)], axis=-1)  # (h,w,3)
    k_inv = _inv44(intrinsic)  # (b,3,3)
    unnorm = jnp.einsum("bij,hwj->bhwi", k_inv, pos, precision=jax.lax.Precision.HIGHEST)
    norm = jnp.linalg.norm(unnorm, axis=-1, keepdims=True)
    norm = jnp.where(norm == 0, jnp.ones_like(norm), norm)
    return unnorm / norm


def unproject_points(
    depth: Array,
    w2c: Array,
    intrinsic: Array,
    is_depth: bool = True,
    mask: Optional[Array] = None,
) -> Array:
    """Unproject a depth map into world-space points.

    Args:
      depth: (b, 1, h, w)
      w2c: (b, 4, 4) world-to-camera
      intrinsic: (b, 3, 3)
      is_depth: True => z-depth; False => distance along ray
      mask: optional (b, 1, h, w) or (b, h, w); points outside are zeroed.

    Returns:
      (b, h, w, 3) world points, zero where masked out / depth <= 0.

    Parity: unproject_points (forward_warp_utils_pytorch.py:410-460). The
    reference gathers only masked pixels; we compute densely and zero-fill,
    which is identical in value and static-shape for XLA.
    """
    b, _, h, w = depth.shape
    dtype = depth.dtype
    if mask is None:
        mask = depth > 0
    if mask.ndim == 4:
        mask = mask[:, 0]
    mask = mask.astype(bool)

    grid = create_grid(h, w, dtype)
    pos = jnp.stack([grid[0], grid[1], jnp.ones((h, w), dtype)], axis=-1)  # (h,w,3)
    k_inv = _inv44(intrinsic)
    unnorm = jnp.einsum("bij,hwj->bhwi", k_inv, pos, precision=jax.lax.Precision.HIGHEST)  # (b,h,w,3)
    if is_depth:
        cam = depth[:, 0, :, :, None] * unnorm
    else:
        norm = jnp.linalg.norm(unnorm, axis=-1, keepdims=True)
        cam = depth[:, 0, :, :, None] * (unnorm / (norm + 1e-8))
    c2w = _inv44(w2c)
    world = jnp.einsum("bij,bhwj->bhwi", c2w[:, :3, :3], cam, precision=jax.lax.Precision.HIGHEST) + c2w[:, None, None, :3, 3]
    return jnp.where(mask[..., None], world, jnp.zeros_like(world))


def project_points(
    world_points: Array, w2c: Array, intrinsic: Array
) -> Tuple[Array, Array]:
    """Project world points to homogeneous pixel coords.

    Args:
      world_points: (b, h, w, 3)
      w2c: (b, 4, 4)
      intrinsic: (b, 3, 3)

    Returns:
      (projected (b,h,w,3) = K @ cam, cam_points (b,h,w,3))

    Parity: project_points (forward_warp_utils_pytorch.py:462-486).
    """
    cam = (
        jnp.einsum("bij,bhwj->bhwi", w2c[:, :3, :3], world_points, precision=jax.lax.Precision.HIGHEST)
        + w2c[:, None, None, :3, 3]
    )
    proj = jnp.einsum("bij,bhwj->bhwi", intrinsic, cam, precision=jax.lax.Precision.HIGHEST)
    return proj, cam


def compute_transformed_points(
    depth: Array,
    transformation1: Array,
    transformation2: Array,
    intrinsic1: Array,
    is_depth: bool = True,
    intrinsic2: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Transformed homogeneous pixel positions for each source pixel.

    Parity: compute_transformed_points (forward_warp_utils_pytorch.py:523-573).
    Returns (trans_norm_points (b,h,w,3), cam_points (b,h,w,3)).
    """
    b, _, h, w = depth.shape
    dtype = depth.dtype
    if intrinsic2 is None:
        intrinsic2 = intrinsic1
    transformation = jnp.einsum(
        "bij,bjk->bik",
        transformation2,
        _inv44(transformation1),
        precision=jax.lax.Precision.HIGHEST,
    )
    grid = create_grid(h, w, dtype)
    pos = jnp.stack([grid[0], grid[1], jnp.ones((h, w), dtype)], axis=-1)
    k_inv = _inv44(intrinsic1)
    unnorm = jnp.einsum("bij,hwj->bhwi", k_inv, pos, precision=jax.lax.Precision.HIGHEST)
    if is_depth:
        cam1 = depth[:, 0, :, :, None] * unnorm
    else:
        norm = jnp.linalg.norm(unnorm, axis=-1, keepdims=True)
        cam1 = depth[:, 0, :, :, None] * (unnorm / norm)
    cam2 = (
        jnp.einsum("bij,bhwj->bhwi", transformation[:, :3, :3], cam1, precision=jax.lax.Precision.HIGHEST)
        + transformation[:, None, None, :3, 3]
    )
    proj = jnp.einsum("bij,bhwj->bhwi", intrinsic2, cam2, precision=jax.lax.Precision.HIGHEST)
    return proj, cam2


def _sorted_segment_accumulate(idx: Array, rows: Array, n_out: int) -> Array:
    """Scatter-add replacement for TPU: sort rows by target index, run an
    inclusive distance-doubling segmented sum (additions never cross
    segment boundaries, so magnitudes stay per-pixel — no cancellation),
    then read each segment's last entry via one searchsorted + gather.

    idx: (M,) int32 targets in [0, n_out); rows: (M, C). Returns
    (n_out, C) with exact (order-independent up to fp) per-target sums.
    """
    m, c = rows.shape
    srt = jax.lax.sort((idx,) + tuple(rows[:, j] for j in range(c)),
                       num_keys=1)
    idx_s = srt[0]
    vals_s = jnp.stack(srt[1:], axis=1)

    d = 1
    while d < m:
        shifted = jnp.concatenate(
            [jnp.zeros((d, c), vals_s.dtype), vals_s[:-d]], axis=0
        )
        same = jnp.concatenate(
            [jnp.zeros((d,), bool), idx_s[d:] == idx_s[:-d]]
        )
        vals_s = jnp.where(same[:, None], vals_s + shifted, vals_s)
        d *= 2

    targets = jnp.arange(n_out, dtype=idx_s.dtype)
    right = jnp.searchsorted(idx_s, targets, side="right", method="sort")
    pos = jnp.maximum(right - 1, 0)
    present = (right > 0) & (idx_s[pos] == targets)
    return jnp.where(present[:, None], vals_s[pos], 0.0)


def bilinear_splatting(
    frame1: Array,
    mask1: Optional[Array],
    depth1: Array,
    flow12: Array,
    flow12_mask: Optional[Array] = None,
    is_image: bool = False,
    depth_weight_scale: float = 50.0,
) -> Tuple[Array, Array]:
    """Bilinear forward splatting with log-depth soft z-weights.

    Args:
      frame1: (b, c, h, w) values to splat
      mask1: (b, 1, h, w) or None
      depth1: (b, 1, h, w) z-depth in target camera (for occlusion weighting)
      flow12: (b, 2, h, w) target_pixel - source_pixel
      flow12_mask: (b, 1, h, w) or None
      is_image: clip output to [-1, 1], fill unknown with -1

    Returns:
      (warped (b,c,h,w), mask2 (b,1,h,w))

    Parity: bilinear_splatting (forward_warp_utils_pytorch.py:576-695).
    The four index_put_(accumulate=True) calls become one batched XLA
    scatter-add over linearized (y*(w+2)+x) indices.
    """
    b, c, h, w = frame1.shape
    dtype = frame1.dtype
    if mask1 is None:
        mask1 = jnp.ones((b, 1, h, w), dtype)
    if flow12_mask is None:
        flow12_mask = jnp.ones((b, 1, h, w), dtype)
    grid = create_grid(h, w, dtype)[None]  # (1,2,h,w)
    trans_pos = flow12 + grid

    tp_off = trans_pos + 1.0
    tp_floor = jnp.floor(tp_off).astype(jnp.int32)
    tp_ceil = jnp.ceil(tp_off).astype(jnp.int32)
    clampx = lambda a: jnp.clip(a, 0, w + 1)
    clampy = lambda a: jnp.clip(a, 0, h + 1)
    off_x, off_y = clampx(tp_off[:, 0]), clampy(tp_off[:, 1])
    fl_x, fl_y = clampx(tp_floor[:, 0]), clampy(tp_floor[:, 1])
    ce_x, ce_y = clampx(tp_ceil[:, 0]), clampy(tp_ceil[:, 1])

    fl_xf, fl_yf = fl_x.astype(dtype), fl_y.astype(dtype)
    ce_xf, ce_yf = ce_x.astype(dtype), ce_y.astype(dtype)
    prox_nw = (1 - (off_y - fl_yf)) * (1 - (off_x - fl_xf))
    prox_sw = (1 - (ce_yf - off_y)) * (1 - (off_x - fl_xf))
    prox_ne = (1 - (off_y - fl_yf)) * (1 - (ce_xf - off_x))
    prox_se = (1 - (ce_yf - off_y)) * (1 - (ce_xf - off_x))

    # log-depth softmax-style occlusion weights (ref :636-652); note the
    # max is GLOBAL over the whole depth tensor, as in the reference.
    clamped_depth = jnp.maximum(depth1, 0.0)
    log_depth = jnp.log1p(clamped_depth)
    exponent = log_depth / (jnp.max(log_depth) + 1e-7) * depth_weight_scale
    depth_weights = jnp.exp(jnp.minimum(exponent, _MAX_EXPONENT)) + 1e-7

    base = mask1 * flow12_mask / depth_weights  # (b,1,h,w)
    w_nw = (prox_nw[:, None] * base)[:, 0]  # (b,h,w)
    w_sw = (prox_sw[:, None] * base)[:, 0]
    w_ne = (prox_ne[:, None] * base)[:, 0]
    w_se = (prox_se[:, None] * base)[:, 0]

    W2 = w + 2
    n_pix = (h + 2) * W2

    def corner_idx(y, x):  # (b,h,w) int32 linear index into (h+2)*(w+2)
        return (y * W2 + x).reshape(b, h * w)

    idx = jnp.concatenate(
        [
            corner_idx(fl_y, fl_x),
            corner_idx(ce_y, fl_x),
            corner_idx(fl_y, ce_x),
            corner_idx(ce_y, ce_x),
        ],
        axis=1,
    )  # (b, 4*h*w)
    wts = jnp.concatenate(
        [x.reshape(b, h * w) for x in (w_nw, w_sw, w_ne, w_se)], axis=1
    )  # (b, 4*h*w)
    vals = frame1.reshape(b, c, h * w)  # (b,c,h*w)
    vals4 = jnp.tile(vals, (1, 1, 4)) * wts[:, None, :]  # (b,c,4hw)

    def scatter_one(v_c4, idx_b, wts_b):
        # one fused accumulation of (values | weight) rows: (4hw, c+1)
        rows = jnp.concatenate([v_c4.T, wts_b[:, None]], axis=1)
        if jax.default_backend() == "tpu":
            # XLA scatter-add serializes on TPU (~14M updates/s); the
            # sort + distance-doubling segmented-sum path is ~2.7x
            # faster and numerically exact (sums stay segment-local,
            # robust under --xla_allow_excess_precision).
            return _sorted_segment_accumulate(idx_b, rows, n_pix)
        buf = jnp.zeros((n_pix, c + 1), dtype)
        return buf.at[idx_b].add(rows)

    flat = jax.vmap(scatter_one)(vals4, idx, wts)
    warped = flat[..., :c].reshape(b, h + 2, W2, c)
    weights = flat[..., c:].reshape(b, h + 2, W2, 1)

    cropped = jnp.moveaxis(warped, 3, 1)[:, :, 1:-1, 1:-1]
    cropped_w = jnp.moveaxis(weights, 3, 1)[:, :, 1:-1, 1:-1]
    cropped_w = jnp.nan_to_num(cropped_w, nan=1000.0)

    known = cropped_w > 0
    zero_value = jnp.asarray(-1.0 if is_image else 0.0, dtype)
    out = jnp.where(known, cropped / jnp.where(known, cropped_w, 1.0), zero_value)
    mask2 = known.astype(dtype)
    if is_image:
        out = jnp.clip(out, -1.0, 1.0)
    return out, mask2


def double_forward_warp(
    frame1: Array,
    mask1: Optional[Array],
    depth1: Array,
    intrinsic1: Array,
    double_proj_w2cs: Array,
) -> Tuple[Array, Array, Array, Array]:
    """Warp to a target view and back (cycle-consistency probe).

    Parity: double_forward_warp (forward_warp_utils_pytorch.py:355-407):
    warp frame1 to double_proj_w2cs, splat the flow field itself, warp the
    intermediate back with the negated splatted flow. Returns
    (twice_warped_frame1, twice_warped_mask1, warped_frame2, mask2).
    """
    b, c, h, w = frame1.shape
    dtype = frame1.dtype
    if mask1 is None:
        mask1 = jnp.ones((b, 1, h, w), dtype)
    identity = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (b, 4, 4))
    trans_points, _ = compute_transformed_points(
        depth1, identity, double_proj_w2cs, intrinsic1, True, intrinsic1
    )
    trans_coords = trans_points[..., :2] / (trans_points[..., 2:3] + 1e-7)
    trans_depth = trans_points[..., 2][:, None]
    grid = create_grid(h, w, dtype)[None]
    flow12 = jnp.moveaxis(trans_coords, 3, 1) - grid

    warped_frame2, mask2 = bilinear_splatting(
        frame1, mask1, trans_depth, flow12, None, is_image=True
    )
    warped_flow, _ = bilinear_splatting(
        flow12, mask1, trans_depth, flow12, None, is_image=False
    )
    twice_warped, twice_mask = bilinear_splatting(
        warped_frame2, mask2, depth1, -warped_flow, None, is_image=True
    )
    return twice_warped, twice_mask, warped_frame2, mask2


def reliable_depth_mask(
    depth: Array, window_size: int = 5, ratio_thresh: float = 0.05, eps: float = 1e-6
) -> Array:
    """Depth-discontinuity reliability mask.

    Args:
      depth: (b, h, w) or (b, 1, h, w)
    Returns:
      (b, 1, h, w) bool — True where local (max-min)/mean < ratio_thresh.

    Parity: reliable_depth_mask_range_batch
    (forward_warp_utils_pytorch.py:338-353). Torch avg_pool2d uses
    count_include_pad=True, so the mean divides by the full window size.
    """
    assert window_size % 2 == 1
    if depth.ndim == 3:
        d = depth[:, None]
    else:
        d = depth
    pad = window_size // 2
    dims = (1, 1, window_size, window_size)
    strides = (1, 1, 1, 1)
    padding = ((0, 0), (0, 0), (pad, pad), (pad, pad))
    local_max = jax.lax.reduce_window(d, -jnp.inf, jax.lax.max, dims, strides, padding)
    local_min = jax.lax.reduce_window(d, jnp.inf, jax.lax.min, dims, strides, padding)
    local_sum = jax.lax.reduce_window(d, 0.0, jax.lax.add, dims, strides, padding)
    local_mean = local_sum / float(window_size * window_size)
    ratio = (local_max - local_min) / (local_mean + eps)
    return (ratio < ratio_thresh) & (d > 0)


def forward_warp(
    frame1: Array,
    mask1: Optional[Array],
    transformation2: Array,
    intrinsic2: Array,
    world_points1: Array,
    is_image: bool = True,
    render_depth: bool = False,
) -> Tuple[Array, Array, Optional[Array], Array]:
    """Warp frame1 (with known world points) into the target camera.

    This is the world-points path used by the 3D cache (cache_3d.py:197-214
    always calls forward_warp with depth1=None, world_points1=points).

    Args:
      frame1: (b, c, h, w) in [-1, 1] if is_image
      mask1: (b, 1, h, w) or None
      transformation2: (b, 4, 4) target w2c
      intrinsic2: (b, 3, 3)
      world_points1: (b, h, w, 3)
      render_depth: also splat the target-space z-depth

    Returns:
      (warped (b,c,h,w), mask2 (b,1,h,w), warped_depth (b,h,w) or None,
       flow12 (b,2,h,w))

    Parity: forward_warp (forward_warp_utils_pytorch.py:171-336), without
    the conditioned-normal filtering branch (unused by GEN3C CLIs).
    Foreground occlusion masking is applied separately via
    ``gen3c_tpu.ops.raycast.apply_foreground_masking``.
    """
    b, c, h, w = frame1.shape
    dtype = frame1.dtype
    if mask1 is None:
        mask1 = jnp.ones((b, 1, h, w), dtype)

    trans_points, cam_points = project_points(world_points1, transformation2, intrinsic2)
    mask1 = mask1 * (trans_points[:, :, :, 2] > 0)[:, None].astype(dtype)
    trans_coords = trans_points[..., :2] / (trans_points[..., 2:3] + 1e-7)  # (b,h,w,2)
    trans_coords = jnp.moveaxis(trans_coords, 3, 1)  # (b,2,h,w)
    trans_depth = trans_points[:, :, :, 2][:, None]  # (b,1,h,w)

    grid = create_grid(h, w, dtype)[None]
    flow12 = trans_coords - grid

    warped, mask2 = bilinear_splatting(
        frame1, mask1, trans_depth, flow12, None, is_image=is_image
    )
    warped_depth = None
    if render_depth:
        warped_depth = bilinear_splatting(
            trans_depth, mask1, trans_depth, flow12, None, is_image=False
        )[0][:, 0]
    return warped, mask2, warped_depth, flow12
