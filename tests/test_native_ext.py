"""gen3c_native CPython extension: parity vs the ctypes stack.

The extension (native/gen3c_native.cpp) and the ctypes bindings wrap
the SAME C++ cores, so every result must be bit-identical; the JSON
camera-path format must interop both ways (reference
gui/src/python_api.cu exposes the same trio through pybind11).
"""

import numpy as np
import pytest

from gen3c_tpu.native import camera_path as cp_ctypes
from gen3c_tpu.native import ext

pytestmark = pytest.mark.skipif(
    not ext.available(), reason="no C++ toolchain for gen3c_native"
)


def _random_path(cls, seed=0):
    rng = np.random.RandomState(seed)
    p = cls()
    for i in range(4):
        c2w = np.eye(4, dtype=np.float32)[:3]
        # small random rotation + translation
        th = rng.uniform(-0.3, 0.3)
        c2w[:3, :3] = np.array(
            [
                [np.cos(th), 0, np.sin(th)],
                [0, 1, 0],
                [-np.sin(th), 0, np.cos(th)],
            ],
            np.float32,
        )
        c2w[:, 3] = rng.uniform(-1, 1, 3).astype(np.float32)
        p.add_keyframe_from_c2w(c2w, fov=float(40 + 5 * i), timestamp=float(i))
    return p


def test_camera_path_parity_with_ctypes():
    pe = _random_path(ext.CameraPath)
    pc = _random_path(cp_ctypes.CameraPath)
    assert len(pe) == len(pc) == 4
    for t in (0.0, 0.33, 0.5, 0.77, 1.0):
        me, fe = pe.eval(t)
        mc, fc = pc.eval(t)
        np.testing.assert_array_equal(me, mc)
        assert fe == fc
    ce, fve = pe.sample(9)
    cc, fvc = pc.sample(9)
    np.testing.assert_array_equal(ce, cc)
    np.testing.assert_array_equal(fve, fvc)
    for i in range(4):
        me, fe, te = pe.get_keyframe(i)
        mc, fc, tc = pc.get_keyframe(i)
        np.testing.assert_array_equal(me, mc)
        assert (fe, te) == (fc, tc)


def test_camera_path_json_interop(tmp_path):
    """ext-saved JSON loads through ctypes and vice versa."""
    pe = _random_path(ext.CameraPath, seed=1)
    f1 = str(tmp_path / "ext.json")
    pe.save(f1)
    pc = cp_ctypes.CameraPath()
    pc.load(f1)
    assert len(pc) == len(pe)
    np.testing.assert_allclose(
        pc.sample(7)[0], pe.sample(7)[0], atol=1e-6
    )

    f2 = str(tmp_path / "ctypes.json")
    pc.save(f2)
    pe2 = ext.CameraPath()
    pe2.load(f2)
    np.testing.assert_allclose(
        pe2.sample(7)[0], pe.sample(7)[0], atol=1e-6
    )


def test_camera_path_errors():
    p = ext.CameraPath()
    with pytest.raises(ValueError):
        p.eval(0.5)  # empty path
    p.add_keyframe_from_c2w(np.eye(4, dtype=np.float32)[:3])
    with pytest.raises(IndexError):
        p.get_keyframe(3)
    p.clear()
    assert len(p) == 0
    p.play_time = 0.25
    assert abs(p.play_time - 0.25) < 1e-7


def test_render_buffer_parity_with_ctypes():
    from gen3c_tpu.native.render_buffer import RenderBuffer as RBc

    rng = np.random.RandomState(2)
    frames = [rng.rand(5, 7, 3).astype(np.float32) for _ in range(3)]
    rbe = ext.RenderBuffer(5, 7)
    rbc = RBc(5, 7)
    for f in frames:
        rbe.accumulate(f)
        rbc.accumulate(f)
    assert rbe.spp == rbc.spp == 3
    for exposure in (0.0, -1.0, 0.5):
        for srgb in (True, False):
            np.testing.assert_array_equal(
                rbe.readout(exposure, srgb), rbc.readout(exposure, srgb)
            )
    rbe.clear()
    assert rbe.spp == 0 and rbe.readout().max() == 0
    with pytest.raises(ValueError):
        rbe.accumulate(np.zeros((5, 7, 4), np.float32))


def test_raster_points_parity_with_ctypes():
    from gen3c_tpu.native.point_raster import raster_points as rp_ctypes

    rng = np.random.RandomState(3)
    n = 500
    points = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    points[:, 2] += 3.0
    colors = rng.randint(0, 256, (n, 3)).astype(np.uint8)
    w2cs = np.tile(np.eye(4, dtype=np.float32)[None], (2, 1, 1))
    w2cs[1, 0, 3] = 0.2
    ks = np.tile(
        np.array([[[40, 0, 24], [0, 40, 16], [0, 0, 1]]], np.float32),
        (2, 1, 1),
    )
    oe = ext.raster_points(points, colors, w2cs, ks, 32, 48, 1.0)
    oc = rp_ctypes(points, colors, w2cs, ks, 32, 48, 1.0)
    np.testing.assert_array_equal(oe, oc)
    with pytest.raises(ValueError):
        ext.raster_points(points[:, :2], colors, w2cs, ks, 32, 48)
