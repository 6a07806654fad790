"""Tests for the native (C++) camera-path spline engine."""

import numpy as np
import pytest

pytest.importorskip("ctypes")

from gen3c_tpu.native.camera_path import CameraPath


def _quat_identity():
    return np.array([1.0, 0, 0, 0], np.float32)


def test_keyframe_endpoints_exact():
    path = CameraPath()
    path.add_keyframe(_quat_identity(), np.array([0.0, 0, 0]), fov=40)
    path.add_keyframe(_quat_identity(), np.array([1.0, 2, 3]), fov=60)
    assert len(path) == 2
    c2w0, fov0 = path.eval(0.0)
    c2w1, fov1 = path.eval(1.0)
    np.testing.assert_allclose(c2w0[:, 3], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(c2w1[:, 3], [1, 2, 3], atol=1e-6)
    assert abs(fov0 - 40) < 1e-5 and abs(fov1 - 60) < 1e-5
    np.testing.assert_allclose(c2w0[:3, :3], np.eye(3), atol=1e-6)


def test_midpoint_interpolation_smooth():
    path = CameraPath()
    for i, x in enumerate([0.0, 1.0, 2.0, 3.0]):
        path.add_keyframe(_quat_identity(), np.array([x, 0, 0]),
                          fov=50, timestamp=i)
    c2w, _ = path.eval(0.5)
    np.testing.assert_allclose(c2w[0, 3], 1.5, atol=1e-4)
    # monotone along the path
    xs = [path.eval(t)[0][0, 3] for t in np.linspace(0, 1, 9)]
    assert all(b >= a - 1e-5 for a, b in zip(xs, xs[1:]))


def test_rotation_slerp_halfway():
    # 90 degrees about z at the end; halfway must be 45 degrees
    half = np.sqrt(0.5)
    path = CameraPath()
    path.add_keyframe(_quat_identity(), np.zeros(3))
    path.add_keyframe(np.array([half, 0, 0, half], np.float32), np.zeros(3))
    c2w, _ = path.eval(0.5)
    ang = np.arctan2(c2w[1, 0], c2w[0, 0])
    np.testing.assert_allclose(np.degrees(ang), 45.0, atol=0.5)


def test_json_save_load_roundtrip(tmp_path):
    path = CameraPath()
    rng = np.random.RandomState(0)
    for i in range(3):
        q = rng.randn(4).astype(np.float32)
        q /= np.linalg.norm(q)
        path.add_keyframe(q, rng.randn(3).astype(np.float32),
                          fov=45 + i, timestamp=float(i))
    path.play_time = 0.25
    f = str(tmp_path / "path.json")
    path.save(f)

    loaded = CameraPath()
    loaded.load(f)
    assert len(loaded) == 3
    assert abs(loaded.play_time - 0.25) < 1e-6
    for t in (0.0, 0.3, 0.7, 1.0):
        a, fa = path.eval(t)
        b, fb = loaded.eval(t)
        np.testing.assert_allclose(a, b, atol=1e-4)
        assert abs(fa - fb) < 1e-3


def test_c2w_keyframe_roundtrip():
    # add keyframe from a c2w matrix; eval at endpoint returns it
    th = 0.4
    rot = np.array(
        [
            [np.cos(th), -np.sin(th), 0],
            [np.sin(th), np.cos(th), 0],
            [0, 0, 1],
        ],
        np.float32,
    )
    c2w = np.concatenate([rot, np.array([[1], [2], [3]], np.float32)], axis=1)
    path = CameraPath()
    path.add_keyframe_from_c2w(c2w)
    out, _ = path.eval(0.0)
    np.testing.assert_allclose(out, c2w, atol=1e-5)


def test_sample_shapes():
    path = CameraPath()
    path.add_keyframe(_quat_identity(), np.zeros(3))
    path.add_keyframe(_quat_identity(), np.ones(3))
    c2ws, fovs = path.sample(13)
    assert c2ws.shape == (13, 3, 4) and fovs.shape == (13,)
    np.testing.assert_allclose(c2ws[-1][:, 3], [1, 1, 1], atol=1e-5)


def test_reference_gui_format_load():
    """A camera-path file in the reference GUI's schema
    (gui/src/camera_path.cu:124-167; quats [x,y,z,w] per tiny-cuda-nn
    vec_json.h) loads with correct rotation semantics: a 90-degree
    rotation about +z stored as [0, 0, 0.7071, 0.7071]."""
    import json
    import tempfile

    half = float(np.sqrt(0.5))
    doc = {
        "duration_seconds": 2.0,
        "loop": False,
        "path": [
            {"R": [0.0, 0.0, 0.0, 1.0], "T": [0.0, 0.0, 0.0],
             "fov": 50.0, "timestamp": 0.0},
            {"R": [0.0, 0.0, half, half], "T": [1.0, 0.0, 0.0],
             "fov": 50.0, "timestamp": 2.0},
        ],
        "spline_order": 3,
        "time": 0.0,
    }
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(doc, f)
        name = f.name
    path = CameraPath()
    path.load(name)
    assert len(path) == 2
    c2w, fov = path.eval(1.0)
    np.testing.assert_allclose(c2w[:, 3], [1, 0, 0], atol=1e-6)
    # 90 degrees about z: R @ [1,0,0] = [0,1,0]
    np.testing.assert_allclose(
        c2w[:3, :3] @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-5
    )
    assert abs(fov - 50.0) < 1e-5


def test_save_emits_reference_schema(tmp_path):
    """Saved files carry the reference GUI's field set with [x,y,z,w]
    quaternion order, so they load in the reference viewer."""
    import json

    half = float(np.sqrt(0.5))
    path = CameraPath()
    path.add_keyframe(np.array([half, 0, 0, half], np.float32),
                      np.array([3.0, 2, 1]), fov=42, timestamp=1.5)
    f = str(tmp_path / "ref.json")
    path.save(f)
    doc = json.load(open(f))
    assert set(doc) == {"duration_seconds", "loop", "path",
                        "spline_order", "time"}
    kf = doc["path"][0]
    # internal (w,x,y,z)=(h,0,0,h) -> file [x,y,z,w] = [0,0,h,h]
    np.testing.assert_allclose(kf["R"], [0, 0, half, half], atol=1e-6)
    np.testing.assert_allclose(kf["T"], [3, 2, 1], atol=1e-6)
    assert kf["fov"] == 42 and kf["timestamp"] == 1.5
    assert doc["duration_seconds"] == 1.5 and doc["spline_order"] == 3
