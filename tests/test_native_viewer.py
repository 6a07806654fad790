"""Interactive native viewer (viewer_main.cpp) driven over its REPL.

Covers the re-scoped duties of the reference's native viewer loop
(gui/src/testbed.cu:464+ seeding + display, gui/src/camera_path.cu:693
keyframe editor): seed a point cloud, orbit the camera, render frames
(incl. progressive AA through the native render buffer), edit keyframes,
save/load reference-GUI camera-path JSON, and render a spline path.
"""

import json
import os

import numpy as np
import pytest

from gen3c_tpu.native.viewer import (
    NativeViewer,
    available,
    read_ppm,
    write_pointcloud,
)

pytestmark = pytest.mark.skipif(
    not available(), reason="native toolchain unavailable"
)


@pytest.fixture()
def cloud(tmp_path):
    """A colored cube of points 2 units in front of the origin."""
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.5, 0.5, size=(5000, 3)).astype(np.float32)
    pts[:, 2] += 2.0
    cols = (np.clip(pts[:, :3] + 0.5, 0, 1) * 255).astype(np.uint8)
    path = tmp_path / "cloud.bin"
    write_pointcloud(str(path), pts, cols)
    return str(path)


def test_seed_orbit_render(cloud, tmp_path):
    with NativeViewer() as v:
        assert "5000 points" in v.send(f"load {cloud}")
        assert v.send("size 160 120").startswith("ok")
        out = tmp_path / "view.ppm"
        assert v.send(f"render {out}").startswith("ok")
        img = read_ppm(str(out))
        assert img.shape == (120, 160, 3)
        # the cube must actually be visible from the default orbit pose
        assert (img > 0).mean() > 0.02
        center = img[40:80, 53:107]
        assert center.max() > 64

        # orbiting changes the view
        v.send("orbit 0.8 0.3")
        out2 = tmp_path / "view2.ppm"
        v.send(f"render {out2}")
        img2 = read_ppm(str(out2))
        assert img2.shape == img.shape
        assert np.abs(img2.astype(int) - img.astype(int)).mean() > 1.0


def test_progressive_aa_accumulation(cloud, tmp_path):
    """spp>1 renders jittered samples through the native render buffer;
    the result differs from 1 spp (AA) but stays the same scene."""
    with NativeViewer() as v:
        v.send(f"load {cloud}")
        v.send("size 96 64")
        a, b = tmp_path / "a.ppm", tmp_path / "b.ppm"
        v.send(f"render {a} 1")
        v.send(f"render {b} 8")
        ia, ib = read_ppm(str(a)).astype(int), read_ppm(str(b)).astype(int)
        assert np.abs(ia - ib).mean() > 0.1  # AA changed edges
        # same scene: mean brightness within 20%
        assert abs(ia.mean() - ib.mean()) < 0.2 * max(ia.mean(), 1.0)


def test_keyframe_editing_and_reference_json(cloud, tmp_path):
    with NativeViewer() as v:
        v.send(f"load {cloud}")
        v.send("kf add")
        v.send("orbit 0.5 0.1")
        v.send("fov 45")
        v.send("kf add")
        v.send("orbit -0.5 -0.1")
        v.send("kf add")
        assert "3 keyframes" in v.send("kf list")

        # gizmo edits
        assert v.send("kf move 1 0.1 0 0").startswith("ok")
        assert v.send("kf fov 1 40").startswith("ok")
        assert v.send("kf time 1 0.5").startswith("ok")
        assert v.send("kf del 2").startswith("ok")
        assert "2 keyframes" in v.send("kf list")

        # reference-GUI camera-path JSON (camera_path.cu:124-133 schema)
        jpath = tmp_path / "path.json"
        assert v.send(f"kf save {jpath}").startswith("ok")
        doc = json.loads(jpath.read_text())
        assert len(doc["path"]) == 2
        assert {"R", "T", "fov"} <= set(doc["path"][0].keys())
        assert doc["path"][1]["fov"] == pytest.approx(40.0)

        # round-trip load
        assert v.send("kf del 0").startswith("ok")
        assert "2 keyframes" in v.send(f"kf load {jpath}")


def test_spline_path_render(cloud, tmp_path):
    with NativeViewer() as v:
        v.send(f"load {cloud}")
        v.send("size 80 60")
        v.send("kf add")
        v.send("orbit 0.7 0.0")
        v.send("kf add")
        outdir = tmp_path / "frames"
        os.makedirs(outdir)
        assert v.send(f"path render 5 {outdir}").startswith("ok")
        frames = sorted(os.listdir(outdir))
        assert frames == [f"frame_{i:04d}.ppm" for i in range(5)]
        f0 = read_ppm(str(outdir / frames[0])).astype(int)
        f4 = read_ppm(str(outdir / frames[-1])).astype(int)
        assert f0.shape == (60, 80, 3)
        assert np.abs(f0 - f4).mean() > 0.5  # camera actually moved


def test_error_paths(tmp_path):
    with NativeViewer() as v:
        assert v.send("load /nonexistent.bin").startswith("err")
        assert v.send("kf del 7").startswith("err")
        assert v.send("path render 5 /tmp/x").startswith("err")  # no kfs
        assert v.send("bogus").startswith("err")
        assert v.send("info").startswith("info")
