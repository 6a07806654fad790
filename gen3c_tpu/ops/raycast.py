"""Foreground occlusion masking via ray-triangle intersection.

The reference culls splatted points that land behind a mesh built from
depth-discontinuity boundary pixels:

  * mesh construction from a point grid + boundary mask at 1/4 resolution
    (reference: forward_warp_utils_pytorch.py:49-132, points_to_mesh)
  * brute-force Möller-Trumbore over all rays x triangles with an
    NVIDIA-Warp CUDA kernel, epsilon=1e-8, no-hit => 0
    (reference: ray_triangle_intersection_warp.py:23-292)
  * culling: pixels whose mesh z-depth + 0.02 < splatted z-depth are
    masked out (reference: forward_warp_utils_pytorch.py:283-335)

TPU-native design: mesh extraction is data-dependent so it runs host-side
(numpy) and pads the triangle list to power-of-two buckets; the
intersection itself is a jit-compiled JAX kernel that tiles rays x
triangles and reduces with a running minimum — XLA maps this onto the VPU
without atomics (the min-reduction replaces the reference's atomic_min).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_EPS = 1e-8


def build_boundary_mesh(
    cam_points: np.ndarray,  # (H, W, 3) target-camera-space points
    boundary_mask: np.ndarray,  # (H, W) bool
    downsample: int = 4,
) -> Tuple[np.ndarray, np.ndarray]:
    """Triangulate the boundary region of a point grid at 1/downsample res.

    Returns (vertices (V, 3) float32, faces (T, 3) int32). Parity:
    points_to_mesh (forward_warp_utils_pytorch.py:49-132) with
    resolution=(H//4, W//4): bilinear point resize (align_corners=False),
    nearest mask resize, two triangles per 2x2 patch that touches the mask.
    """
    H, W = cam_points.shape[:2]
    new_h, new_w = H // downsample, W // downsample

    # Bilinear resize, align_corners=False (same sampling as F.interpolate).
    def _resize_bilinear(img):  # (H, W, C)
        ys = (np.arange(new_h) + 0.5) * (H / new_h) - 0.5
        xs = (np.arange(new_w) + 0.5) * (W / new_w) - 0.5
        ys = np.clip(ys, 0, H - 1)
        xs = np.clip(xs, 0, W - 1)
        y0 = np.clip(np.floor(ys).astype(np.int64), 0, H - 1)
        x0 = np.clip(np.floor(xs).astype(np.int64), 0, W - 1)
        y1 = np.clip(y0 + 1, 0, H - 1)
        x1 = np.clip(x0 + 1, 0, W - 1)
        wy = (ys - y0)[:, None, None]
        wx = (xs - x0)[None, :, None]
        a = img[y0][:, x0]
        b = img[y0][:, x1]
        c = img[y1][:, x0]
        d = img[y1][:, x1]
        return (
            a * (1 - wy) * (1 - wx)
            + b * (1 - wy) * wx
            + c * wy * (1 - wx)
            + d * wy * wx
        )

    def _resize_nearest(msk):
        ys = np.minimum((np.arange(new_h) * (H / new_h)).astype(np.int64), H - 1)
        xs = np.minimum((np.arange(new_w) * (W / new_w)).astype(np.int64), W - 1)
        return msk[ys][:, xs]

    pts = _resize_bilinear(cam_points.astype(np.float32))
    msk = _resize_nearest(boundary_mask.astype(bool))

    valid = msk[:-1, :-1] | msk[:-1, 1:] | msk[1:, :-1] | msk[1:, 1:]
    vh, vw = np.nonzero(valid)
    if len(vh) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    vidx = np.arange(new_h * new_w).reshape(new_h, new_w)
    tl = vidx[vh, vw]
    tr = vidx[vh, vw + 1]
    bl = vidx[vh + 1, vw]
    br = vidx[vh + 1, vw + 1]
    faces = np.concatenate(
        [np.stack([tl, tr, bl], 1), np.stack([tr, br, bl], 1)], axis=0
    ).astype(np.int32)
    vertices = pts.reshape(-1, 3).astype(np.float32)
    return vertices, faces


@partial(jax.jit, static_argnames=("ray_chunk",))
def ray_triangle_depth(
    ray_dirs: Array,  # (R, 3) — origins at 0 (camera frame)
    tri_v0: Array,  # (T, 3)
    tri_v1: Array,
    tri_v2: Array,
    tri_valid: Array,  # (T,) bool — padding mask
    ray_chunk: int = 8192,
) -> Array:
    """Min hit distance per ray (0.0 if no hit). Möller-Trumbore, tiled.

    Parity: ray_triangle_intersection_kernel
    (ray_triangle_intersection_warp.py:23-105) with epsilon=1e-8.
    """
    edge1 = tri_v1 - tri_v0  # (T,3)
    edge2 = tri_v2 - tri_v0

    def per_chunk(dirs):  # (c, 3)
        h = jnp.cross(dirs[:, None, :], edge2[None])  # (c,T,3)
        a = jnp.sum(edge1[None] * h, -1)  # (c,T)
        f = 1.0 / jnp.where(jnp.abs(a) < _EPS, 1.0, a)
        s = -tri_v0[None]  # origin - v0, origins are 0
        u = f * jnp.sum(s * h, -1)
        q = jnp.cross(s, edge1[None])  # (c,T,3)
        v = f * jnp.sum(dirs[:, None, :] * q, -1)
        t = f * jnp.sum(edge2[None] * q, -1)
        hit = (
            (jnp.abs(a) >= _EPS)
            & (u >= 0.0)
            & (u <= 1.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > _EPS)
            & tri_valid[None]
        )
        return jnp.min(jnp.where(hit, t, 1e10), axis=1)  # (c,)

    R = ray_dirs.shape[0]
    pad = (-R) % ray_chunk
    dirs = jnp.pad(ray_dirs, ((0, pad), (0, 0)))
    out = jax.lax.map(
        per_chunk, dirs.reshape(-1, ray_chunk, 3)
    ).reshape(-1)[:R]
    return jnp.where(out < 1e10, out, 0.0)


def _bucket(n: int, minimum: int = 256) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def mesh_depth_map(
    cam_points: np.ndarray,  # (H, W, 3)
    boundary_mask: np.ndarray,  # (H, W) bool
    intrinsic: np.ndarray,  # (3, 3)
) -> Optional[jnp.ndarray]:
    """Render the boundary mesh's z-depth from the target camera.

    Returns (H, W) z-depth (0 where no mesh), or None if the mesh is empty.
    Parity: the per-batch foreground-masking block of forward_warp
    (forward_warp_utils_pytorch.py:285-325) with ray_scale_factor=1,
    mesh_downsample_factor=4.
    """
    from gen3c_tpu.ops.geometry import pixel_rays

    H, W = cam_points.shape[:2]
    vertices, faces = build_boundary_mesh(cam_points, boundary_mask, downsample=4)
    if faces.shape[0] == 0:
        return None

    n_tri = faces.shape[0]
    bucket = _bucket(n_tri)
    v0 = np.zeros((bucket, 3), np.float32)
    v1 = np.zeros((bucket, 3), np.float32)
    v2 = np.zeros((bucket, 3), np.float32)
    valid = np.zeros((bucket,), bool)
    v0[:n_tri] = vertices[faces[:, 0]]
    v1[:n_tri] = vertices[faces[:, 1]]
    v2[:n_tri] = vertices[faces[:, 2]]
    valid[:n_tri] = True

    rays = pixel_rays(H, W, jnp.asarray(intrinsic, jnp.float32)[None])[0]  # (H,W,3)
    dist = ray_triangle_depth(
        rays.reshape(-1, 3),
        jnp.asarray(v0),
        jnp.asarray(v1),
        jnp.asarray(v2),
        jnp.asarray(valid),
    ).reshape(H, W)
    # distance along unit ray -> z-depth (ref :323-324)
    return dist * rays[:, :, 2]


def apply_foreground_masking(
    warped: Array,  # (M, C, H, W)
    mask2: Array,  # (M, 1, H, W)
    warped_depth: Array,  # (M, H, W)
    world_points: Array,  # (M, H, W, 3) source world points
    boundary_mask: Array,  # (M, H, W) bool
    w2cs: Array,  # (M, 4, 4)
    ks: Array,  # (M, 3, 3)
    depth_margin: float = 0.02,
) -> Tuple[Array, Array, Array]:
    """Cull splatted pixels occluded by the boundary mesh.

    Host-driven loop over items (mesh extraction is data-dependent), with
    the heavy intersection jit-compiled on device. Parity:
    forward_warp_utils_pytorch.py:285-335.
    """
    from gen3c_tpu.ops.geometry import project_points

    _, cam_points = project_points(world_points, w2cs, ks)
    cam_np = np.asarray(cam_points)
    bmask_np = np.asarray(boundary_mask).astype(bool)
    ks_np = np.asarray(ks)

    warped_list, mask_list, depth_list = [], [], []
    for i in range(warped.shape[0]):
        mesh_z = mesh_depth_map(cam_np[i], bmask_np[i], ks_np[i])
        if mesh_z is None:
            warped_list.append(warped[i])
            mask_list.append(mask2[i])
            depth_list.append(warped_depth[i])
            continue
        mesh_closer = ((mesh_z + depth_margin) < warped_depth[i]) & (mesh_z > 0)
        keep = (~mesh_closer).astype(warped.dtype)
        warped_list.append((warped[i] + 1) * keep[None] - 1)
        mask_list.append(mask2[i] * keep[None])
        depth_list.append(warped_depth[i] * keep)
    return (
        jnp.stack(warped_list),
        jnp.stack(mask_list),
        jnp.stack(depth_list),
    )
