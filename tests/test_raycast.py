"""Tests for the Möller-Trumbore foreground-masking kernel."""

import numpy as np

import jax.numpy as jnp

from gen3c_tpu.ops import raycast


def test_single_triangle_hit_distance():
    # triangle in the z=2 plane covering the image center
    v0 = jnp.asarray([[-1.0, -1.0, 2.0]])
    v1 = jnp.asarray([[1.0, -1.0, 2.0]])
    v2 = jnp.asarray([[0.0, 1.5, 2.0]])
    valid = jnp.asarray([True])
    # central ray hits at t=2 (unit z direction)
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    t = np.asarray(raycast.ray_triangle_depth(dirs, v0, v1, v2, valid))
    np.testing.assert_allclose(t[0], 2.0, rtol=1e-5)
    assert t[1] == 0.0  # behind camera
    assert t[2] == 0.0  # parallel miss


def test_nearest_of_two_triangles_wins():
    v0 = jnp.asarray([[-1.0, -1.0, 2.0], [-1.0, -1.0, 1.0]])
    v1 = jnp.asarray([[1.0, -1.0, 2.0], [1.0, -1.0, 1.0]])
    v2 = jnp.asarray([[0.0, 1.5, 2.0], [0.0, 1.5, 1.0]])
    valid = jnp.asarray([True, True])
    dirs = jnp.asarray([[0.0, 0.0, 1.0]])
    t = np.asarray(raycast.ray_triangle_depth(dirs, v0, v1, v2, valid))
    np.testing.assert_allclose(t[0], 1.0, rtol=1e-5)


def test_padding_triangles_ignored():
    v0 = jnp.zeros((4, 3))
    v1 = jnp.zeros((4, 3))
    v2 = jnp.zeros((4, 3))
    valid = jnp.asarray([False, False, False, False])
    dirs = jnp.asarray([[0.0, 0.0, 1.0]])
    t = np.asarray(raycast.ray_triangle_depth(dirs, v0, v1, v2, valid))
    assert t[0] == 0.0


def test_build_boundary_mesh_counts():
    h, w = 16, 16
    pts = np.random.RandomState(0).rand(h, w, 3).astype(np.float32)
    mask = np.zeros((h, w), bool)
    mask[4:8, 4:8] = True
    verts, faces = raycast.build_boundary_mesh(pts, mask, downsample=4)
    assert verts.shape == (16, 3)  # 4x4 grid
    assert faces.shape[0] > 0 and faces.shape[1] == 3
    assert faces.max() < verts.shape[0]


def test_mesh_depth_map_blocks_center():
    # a fronto-parallel plane patch at z=1 in the middle of the image;
    # its rendered z-depth must be ~1 in covered pixels, 0 elsewhere.
    h, w = 32, 32
    k = np.array([[32.0, 0, 16], [0, 32.0, 16], [0, 0, 1]], np.float32)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # camera-space points of a plane at depth 1 (full grid)
    pts = np.stack([(xx - 16) / 32.0, (yy - 16) / 32.0, np.ones_like(xx, np.float32)], -1)
    mask = np.zeros((h, w), bool)
    mask[12:20, 12:20] = True
    z = raycast.mesh_depth_map(pts.astype(np.float32), mask, k)
    z = np.asarray(z)
    assert abs(z[16, 16] - 1.0) < 1e-3
    assert z[0, 0] == 0.0
