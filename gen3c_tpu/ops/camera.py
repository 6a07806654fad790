"""Camera trajectory generation and depth alignment.

Parity targets (reference: cosmos_predict1/diffusion/inference/camera_utils.py):
  * ``look_at_matrix``               — camera_utils.py:30-46
  * ``create_horizontal_trajectory`` — :48-88
  * ``create_spiral_trajectory``     — :91-139
  * ``generate_camera_trajectory``   — :142-222
  * ``align_depth`` (rigid lstsq)    — :225-286
  * ``align_depth`` (non-rigid)      — :288-345 (100-iter Adam on a
    per-pixel scale map; here one jit-compiled lax.scan + optax.adam)

Trajectory math is tiny and host-side; it's implemented with numpy and
returned as jnp arrays.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

Array = jax.Array

TRAJECTORY_TYPES = (
    "left",
    "right",
    "up",
    "down",
    "zoom_in",
    "zoom_out",
    "clockwise",
    "counterclockwise",
    "none",
)
CAMERA_ROTATIONS = ("center_facing", "no_rotation", "trajectory_aligned")


def look_at_matrix(camera_pos: np.ndarray, target: np.ndarray) -> np.ndarray:
    """4x4 look-at view matrix, Y-up convention (camera_utils.py:30-46)."""
    forward = (target - camera_pos).astype(np.float64)
    forward = forward / np.linalg.norm(forward)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, forward)
    right = right / np.linalg.norm(right)
    up = np.cross(forward, right)
    m = np.eye(4)
    m[0, :3] = right
    m[1, :3] = up
    m[2, :3] = forward
    m[:3, 3] = -camera_pos
    return m


def create_horizontal_trajectory(
    world_to_camera: np.ndarray,
    center_depth: float,
    positive: bool = True,
    n_steps: int = 13,
    distance: float = 0.1,
    axis: str = "x",
    camera_rotation: str = "center_facing",
) -> np.ndarray:
    """Linear camera move along one axis (camera_utils.py:48-88)."""
    look_at = np.array([0.0, 0.0, center_depth])
    sign = 1.0 if positive else -1.0
    mats = []
    for i in range(n_steps):
        step = i * distance * center_depth / n_steps * sign
        pos = np.zeros(3)
        pos["xyz".index(axis)] = step
        if camera_rotation == "trajectory_aligned":
            target = look_at + pos * 2
        elif camera_rotation == "center_facing":
            target = look_at
        elif camera_rotation == "no_rotation":
            target = look_at + pos
        else:
            raise ValueError(f"Unknown camera_rotation {camera_rotation}")
        mats.append(look_at_matrix(pos, target))
    traj = np.stack(mats)  # (n,4,4)
    return traj @ world_to_camera[None]


def create_spiral_trajectory(
    world_to_camera: np.ndarray,
    center_depth: float,
    radius_x: float = 0.03,
    radius_y: float = 0.02,
    radius_z: float = 0.0,
    positive: bool = True,
    camera_rotation: str = "center_facing",
    n_steps: int = 13,
    start_from_zero: bool = True,
    num_circles: int = 1,
) -> np.ndarray:
    """Spiral/orbit camera move (camera_utils.py:91-139)."""
    look_at = np.array([0.0, 0.0, center_depth])
    theta_max = 2 * math.pi * num_circles
    mats = []
    for i in range(n_steps):
        theta = theta_max * i / (n_steps - 1)
        if start_from_zero:
            x = radius_x * (math.cos(theta) - 1) * (1 if positive else -1) * center_depth
        else:
            x = radius_x * math.cos(theta) * center_depth
        y = radius_y * math.sin(theta) * center_depth
        z = radius_z * math.sin(theta) * center_depth
        pos = np.array([x, y, z])
        if camera_rotation == "center_facing":
            m = look_at_matrix(pos, look_at)
        elif camera_rotation == "trajectory_aligned":
            m = look_at_matrix(pos, look_at + pos * 2)
        elif camera_rotation == "no_rotation":
            m = look_at_matrix(pos, look_at + pos)
        else:
            raise ValueError(f"Unknown camera_rotation {camera_rotation}")
        mats.append(m)
    traj = np.stack(mats)
    return traj @ world_to_camera[None]


def generate_camera_trajectory(
    trajectory_type: str,
    initial_w2c: np.ndarray,
    initial_intrinsics: np.ndarray,
    num_frames: int,
    movement_distance: float,
    camera_rotation: str = "center_facing",
    center_depth: float = 1.0,
) -> Tuple[Array, Array]:
    """Generate (1, num_frames, 4, 4) w2cs and (1, num_frames, 3, 3) Ks.

    Parity: generate_camera_trajectory (camera_utils.py:142-222), plus a
    "none" static trajectory used by tests/benchmarks.
    """
    initial_w2c = np.asarray(initial_w2c, dtype=np.float64)
    if trajectory_type == "none":
        w2cs = np.repeat(initial_w2c[None], num_frames, axis=0)
    elif trajectory_type in ("clockwise", "counterclockwise"):
        w2cs = create_spiral_trajectory(
            world_to_camera=initial_w2c,
            center_depth=center_depth,
            n_steps=num_frames,
            positive=trajectory_type == "clockwise",
            camera_rotation=camera_rotation,
            radius_x=movement_distance,
            radius_y=movement_distance,
        )
    else:
        positive, axis = {
            "left": (False, "x"),
            "right": (True, "x"),
            "up": (False, "y"),
            "down": (True, "y"),
            "zoom_in": (True, "z"),
            "zoom_out": (False, "z"),
        }.get(trajectory_type, (None, None))
        if axis is None:
            raise ValueError(f"Unsupported trajectory type: {trajectory_type}")
        w2cs = create_horizontal_trajectory(
            world_to_camera=initial_w2c,
            center_depth=center_depth,
            n_steps=num_frames,
            positive=positive,
            axis=axis,
            distance=movement_distance,
            camera_rotation=camera_rotation,
        )
    w2cs = jnp.asarray(w2cs[None], dtype=jnp.float32)  # (1,F,4,4)
    initial_intrinsics = np.asarray(initial_intrinsics, dtype=np.float32)
    if initial_intrinsics.ndim == 2:
        ks = jnp.asarray(
            np.repeat(initial_intrinsics[None], num_frames, axis=0)[None]
        )
    else:
        ks = jnp.asarray(initial_intrinsics[None])
    return w2cs, ks


# --------------------------- depth alignment ---------------------------


def _align_inv_depth_to_depth(
    source_inv_depth: np.ndarray,
    target_depth: np.ndarray,
    target_mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Affine (scale+bias in inverse-depth) alignment via least squares.

    Parity: _align_inv_depth_to_depth (camera_utils.py:225-270): 10/90%
    quantile outlier rejection on both sides, then lstsq on masked pixels.
    Host-side numpy (runs once per AR chunk on small data).
    """
    with np.errstate(divide="ignore"):
        target_inv = 1.0 / target_depth  # inf where depth==0; masked below
    source_mask = source_inv_depth > 0
    tmask = target_depth > 0
    if target_mask is not None:
        tmask = np.logical_and(target_mask > 0, tmask)
    s_lo, s_hi = np.quantile(source_inv_depth[source_mask], [0.1, 0.9])
    t_lo, t_hi = np.quantile(target_inv[tmask], [0.1, 0.9])
    source_mask = (source_inv_depth > s_lo) & (source_inv_depth < s_hi)
    tmask = (target_inv > t_lo) & (target_inv < t_hi)
    mask = source_mask & tmask
    s = source_inv_depth[mask].reshape(-1, 1)
    t = target_inv[mask].reshape(-1, 1)
    a = np.concatenate([s, np.ones_like(s)], axis=1)
    sol, *_ = np.linalg.lstsq(a, t, rcond=None)
    scale, bias = sol[0, 0], sol[1, 0]
    return 1.0 / (source_inv_depth * scale + bias)


@jax.jit
def _nonrigid_scale_map(
    source_depth: Array,
    target_points: Array,
    target_mask: Array,
    k: Array,
    c2w: Array,
) -> Array:
    """Optimize a per-pixel scale map s.t. unprojected source matches target.

    Parity: align_depth non_rigid branch (camera_utils.py:288-345):
    Adam(lr=1e-3), 100 iters, L1 data term over masked pixels + 0.1 * ARAP
    smoothness (|boxfilter(s) - s| mean), 3x3 smoothing kernel. Implemented
    as one jit-compiled lax.scan.
    """
    from gen3c_tpu.ops.geometry import unproject_points

    h, w = source_depth.shape
    maskf = target_mask.astype(jnp.float32)
    n_masked = jnp.maximum(maskf.sum(), 1.0)
    kernel = jnp.ones((1, 1, 3, 3), jnp.float32) / 9.0

    def loss_fn(sc_map):
        scaled = (source_depth * sc_map)[None, None]
        src_pts = unproject_points(
            scaled, c2w[None], k[None], is_depth=True, mask=target_mask[None, None]
        )[0]
        diff = jnp.abs(src_pts - target_points) * maskf[..., None]
        data_loss = diff.sum() / (n_masked * 3.0)
        smoothed = jax.lax.conv_general_dilated(
            sc_map[None, None], kernel, (1, 1), [(1, 1), (1, 1)]
        )[0, 0]
        arap = jnp.abs(smoothed - sc_map).mean()
        return data_loss + 0.1 * arap

    opt = optax.adam(1e-3)
    sc0 = jnp.ones((h, w), jnp.float32)
    state0 = opt.init(sc0)

    def step(carry, _):
        sc, st = carry
        g = jax.grad(loss_fn)(sc)
        updates, st = opt.update(g, st, sc)
        return (optax.apply_updates(sc, updates), st), None

    (sc, _), _ = jax.lax.scan(step, (sc0, state0), None, length=100)
    return sc


def align_depth(
    source_depth: Array,
    target_depth: Array,
    target_mask: Array,
    k: Optional[Array] = None,
    c2w: Optional[Array] = None,
    alignment_method: str = "rigid",
) -> Array:
    """Align a new depth map to depth rendered from the 3D cache.

    Parity: align_depth (camera_utils.py:273-347). source/target: (H, W).
    """
    src = np.asarray(source_depth, dtype=np.float32)
    tgt = np.asarray(target_depth, dtype=np.float32)
    msk = np.asarray(target_mask).astype(bool)
    rigid = _align_inv_depth_to_depth(1.0 / src, tgt, msk)
    if alignment_method == "rigid":
        return jnp.asarray(rigid)
    if alignment_method != "non_rigid":
        raise ValueError(f"Unsupported alignment method: {alignment_method}")
    if k is None or c2w is None:
        raise ValueError("k and c2w are required for non-rigid alignment")
    from gen3c_tpu.ops.geometry import unproject_points

    rigid_j = jnp.asarray(rigid)
    mask_j = jnp.asarray(msk)
    target_pts = unproject_points(
        jnp.asarray(tgt)[None, None],
        jnp.asarray(c2w, jnp.float32)[None],
        jnp.asarray(k, jnp.float32)[None],
        is_depth=True,
        mask=mask_j[None, None],
    )[0]
    sc = _nonrigid_scale_map(
        rigid_j, target_pts, mask_j, jnp.asarray(k, jnp.float32), jnp.asarray(c2w, jnp.float32)
    )
    return rigid_j * sc
