"""Native (C++) point-cloud preview rasterizer tests."""

import numpy as np
import pytest

from gen3c_tpu.native import point_raster as pr

pytestmark = pytest.mark.skipif(
    not pr.available(), reason="native point_raster library unavailable"
)


def _identity_cam(h, w, f=100.0):
    w2c = np.eye(4, dtype=np.float32)
    k = np.array(
        [[f, 0, w / 2.0], [0, f, h / 2.0], [0, 0, 1]], np.float32
    )
    return w2c, k


def test_projection_and_zbuffer():
    """Two points on the same ray: the nearer one wins the pixel."""
    h, w = 32, 48
    w2c, k = _identity_cam(h, w)
    # both project to the principal point (x=y=0)
    points = np.array([[0, 0, 2.0], [0, 0, 1.0]], np.float32)
    colors = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    out = pr.raster_points(
        points, colors, w2c[None], k[None], h, w, point_radius=0.0
    )
    assert out.shape == (1, h, w, 3)
    center = out[0, h // 2, w // 2]
    np.testing.assert_array_equal(center, [0, 255, 0])  # nearer point
    # everything else is background
    assert (out.sum(axis=-1) > 0).sum() == 1


def test_offscreen_and_behind_camera_culled():
    h, w = 16, 16
    w2c, k = _identity_cam(h, w)
    points = np.array(
        [[0, 0, -1.0], [100.0, 0, 1.0], [0, 0, 0.0]], np.float32
    )
    colors = np.full((3, 3), 255, np.uint8)
    out = pr.raster_points(
        points, colors, w2c[None], k[None], h, w, point_radius=2.0
    )
    assert out.sum() == 0


def test_point_radius_spreads_square():
    h, w = 32, 32
    w2c, k = _identity_cam(h, w)
    points = np.array([[0, 0, 1.0]], np.float32)
    colors = np.array([[10, 20, 30]], np.uint8)
    out = pr.raster_points(
        points, colors, w2c[None], k[None], h, w, point_radius=2.0
    )
    lit = (out[0].sum(axis=-1) > 0)
    assert lit.sum() == 25  # (2*2+1)^2 square
    ys, xs = np.nonzero(lit)
    assert ys.min() == h // 2 - 2 and ys.max() == h // 2 + 2
    assert xs.min() == w // 2 - 2 and xs.max() == w // 2 + 2


def test_matches_jax_splat_at_seed_pose():
    """Rasterizing the unprojected pixel grid at the seed camera must
    reproduce the seed image exactly (radius 0: each point lands on its
    own pixel) — the same exact-reconstruction property the JAX splat
    path has (tests/test_preview.py)."""
    import jax.numpy as jnp

    from gen3c_tpu.cache import Cache3DBuffer

    h, w = 24, 36
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    image = (img.astype(np.float32) / 127.5 - 1).transpose(2, 0, 1)[None]
    yy = np.linspace(0, 1, h)[:, None]
    depth = (2.0 + yy * np.ones((h, w))).astype(np.float32)[None, None]
    k = np.array(
        [[0.9 * w, 0, w / 2], [0, 0.9 * w, h / 2], [0, 0, 1]], np.float32
    )[None]
    w2c = np.eye(4, dtype=np.float32)[None]
    cache = Cache3DBuffer(
        frame_buffer_max=1,
        input_image=jnp.asarray(image),
        input_depth=jnp.asarray(depth),
        input_w2c=jnp.asarray(w2c),
        input_intrinsics=jnp.asarray(k),
    )
    pts = np.asarray(cache.input_points[0]).reshape(-1, 3)
    cols = np.asarray(cache.input_image[0])
    cols = cols.transpose(0, 1, 2, 4, 5, 3).reshape(-1, 3)
    cols = ((cols * 0.5 + 0.5) * 255).clip(0, 255).astype(np.uint8)
    out = pr.raster_points(
        pts, cols, w2c, k, h, w, point_radius=0.0
    )
    # atol 1: the [-1,1] float round-trip truncates some channels by 1
    np.testing.assert_allclose(
        out[0].astype(np.int32), img.astype(np.int32), atol=1
    )


def test_serving_native_preview(monkeypatch):
    """GEN3C_PREVIEW_NATIVE=1 routes render_preview through the native
    rasterizer and still reproduces the seed image at the seed pose."""
    from gen3c_tpu.serving.api_types import InferenceRequest, SeedingRequest
    from gen3c_tpu.serving.models import Gen3cPersistentModel

    monkeypatch.setenv("GEN3C_PREVIEW_NATIVE", "1")
    monkeypatch.setenv("GEN3C_PREVIEW_POINT_RADIUS", "0.0")
    model = Gen3cPersistentModel(
        model_preset="gen3c_tiny",
        checkpoint_dir=None,
        num_steps=2,
        depth_source="heuristic",
    )
    h, w = model.preset.height, model.preset.width
    rng = np.random.RandomState(1)
    image = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    model.seed_model(
        SeedingRequest(
            request_id="s",
            images=image[None],
            cameras_to_world=np.eye(4, dtype=np.float32)[:3][None],
            focal_lengths=np.full((1, 2), 0.9 * w, np.float32),
            principal_points=np.full((1, 2), 0.5, np.float32),
        )
    )
    c2w = np.tile(np.eye(4, dtype=np.float32)[:3], (3, 1, 1))
    c2w[:, 0, 3] = np.linspace(0, 0.1, 3)
    req = InferenceRequest(
        request_id="p",
        cameras_to_world=c2w,
        focal_lengths=np.full((3, 2), 0.9 * w, np.float32),
        principal_points=np.full((3, 2), 0.5, np.float32),
        resolutions=np.tile([[w, h]], (3, 1)),
    )
    result = model.render_preview(req)
    assert result.images.shape == (3, h, w, 3)
    diff = np.abs(
        result.images[0].astype(np.float32) - image.astype(np.float32)
    )
    assert np.quantile(diff, 0.9) <= 2.0, np.quantile(diff, 0.9)
    # moved camera: some disocclusion background appears on one side
    assert (result.images[-1].sum(axis=-1) == 0).any()
