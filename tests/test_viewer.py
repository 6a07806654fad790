"""Web-viewer coverage (VERDICT r2 #5): the viewer.html critical path.

Two layers:
  * static contract checks — every endpoint the viewer's JS fetches must
    be routed by the server, and every DOM id the JS touches must exist
    in the page (catches viewer/server drift without a JS engine; none
    is installed in this environment);
  * behavioral coverage — ViewerSession (serving/client.py), the 1:1
    Python port of the viewer's JS critical path (orbit camera ->
    keyframes -> reference-format camera-path JSON export/import ->
    native spline -> inference), driven against the live debug-model
    server exactly as the reference's debug_api_check.py drives its GUI
    (gui/api/client.py:85-896).
"""

import json
import os
import re
import threading

import numpy as np
import pytest

from gen3c_tpu.serving.client import Gen3cClient, ViewerSession, orbit_c2w
from gen3c_tpu.serving.models import DebugInferenceModel
from gen3c_tpu.serving.server import serve

VIEWER = os.path.join(
    os.path.dirname(__file__), "..", "gen3c_tpu", "serving", "viewer.html"
)
SERVER = os.path.join(
    os.path.dirname(__file__), "..", "gen3c_tpu", "serving", "server.py"
)


@pytest.fixture(scope="module")
def debug_server():
    server, service = serve(
        host="127.0.0.1", port=0, model=DebugInferenceModel()
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


@pytest.fixture(scope="module")
def viewer_src():
    with open(VIEWER) as f:
        return f.read()


def test_viewer_endpoints_are_routed(viewer_src):
    """Every path the viewer fetches must exist in the server routes."""
    with open(SERVER) as f:
        server_src = f.read()
    routes = set(re.findall(r'url\.path == "(/[^"]*)"', server_src))
    routes |= set(re.findall(r'url\.path\.startswith\("(/[^"]*)"', server_src))
    called = set(re.findall(r'api\("(/[^"?]*)', viewer_src))
    called |= set(re.findall(r'fetch\("(/[^"?]*)', viewer_src))
    assert called, "no endpoints parsed out of viewer.html"
    for path in called:
        assert any(
            path == r or path.startswith(r) for r in routes
        ), f"viewer.html calls {path} but server.py has no such route"


def test_viewer_dom_ids_exist(viewer_src):
    """Every getElementById target must be a real element id."""
    used = set(re.findall(r'getElementById\("([^"]+)"\)', viewer_src))
    declared = set(re.findall(r'id="([^"]+)"', viewer_src))
    assert used, "no DOM ids parsed out of viewer.html"
    missing = used - declared
    assert not missing, f"viewer.html JS references missing ids: {missing}"


def test_orbit_c2w_matches_viewer_math():
    """orbit_c2w is the exact orbitC2W math (viewer.html:150-159)."""
    # identity orbit: eye at target - [0,0,dist], looking +z, y-down
    m = orbit_c2w([0, 0, 2], 3.0, 0.0, 0.0)
    np.testing.assert_allclose(m[:, 3], [0, 0, -1], atol=1e-7)
    np.testing.assert_allclose(m[:, 2], [0, 0, 1], atol=1e-7)  # forward
    np.testing.assert_allclose(m[:, 0], [1, 0, 0], atol=1e-7)  # right
    np.testing.assert_allclose(m[:, 1], [0, 1, 0], atol=1e-7)  # down
    # general orbit: rotation stays orthonormal, forward points at target
    m = orbit_c2w([0.5, -0.2, 2.0], 2.5, 0.8, -0.3)
    r = m[:, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    to_target = np.asarray([0.5, -0.2, 2.0]) - m[:, 3]
    np.testing.assert_allclose(
        to_target / np.linalg.norm(to_target), m[:, 2], atol=1e-6
    )
    np.testing.assert_allclose(np.linalg.norm(to_target), 2.5, atol=1e-6)


def test_viewer_session_end_to_end(debug_server):
    """The full viewer flow against the live debug server: seed, author
    2 keyframes, export reference-format JSON, re-import, build a spline
    path, run inference, receive frames."""
    client = Gen3cClient(debug_server, timeout=60.0)
    sess = ViewerSession(client)

    # seed (the viewer's image-upload flow posts /seed-model the same way)
    img = (np.random.RandomState(0).rand(32, 48, 3) * 255).astype(np.uint8)
    client.seed_from_image(img)

    # author two keyframes from different orbit poses
    sess.add_keyframe(fov=50.0)
    sess.cam["yaw"] = 0.6
    sess.cam["pitch"] = 0.2
    sess.add_keyframe(fov=45.0)
    assert len(sess.keyframes) == 2

    # export: reference-GUI camera-path JSON schema
    # (gui/src/camera_path.cu:124-133)
    exported = sess.export_camera_path()
    doc = json.loads(exported)
    assert "path" in doc and len(doc["path"]) == 2
    for kf in doc["path"]:
        assert {"R", "T", "fov"} <= set(kf.keys())
        assert len(kf["R"]) == 4  # quaternion [x,y,z,w]

    # import round-trips the keyframes
    sess.clear_keyframes()
    assert sess.import_camera_path(exported) == 2

    # native spline path
    c2ws = sess.build_spline_path(n=9)
    assert c2ws.shape == (9, 3, 4)
    # endpoints interpolate the authored keyframes' positions
    kf0 = np.asarray(sess.keyframes[0]["c2w"], np.float32).reshape(3, 4)
    np.testing.assert_allclose(c2ws[0][:, 3], kf0[:, 3], atol=1e-3)

    # inference through the same request construction the JS builds
    result = sess.request_inference(resolution=(48, 32), sync=True)
    assert result.images is not None
    assert result.images.shape[0] == 9


def test_viewer_playback_decodes_result_frames(debug_server):
    """The playback path's data contract: the inference result decodes
    to (T, H, W, 3) uint8 frames exactly as showFrames/drawFrame index
    them (viewer.html:471-497)."""
    client = Gen3cClient(debug_server, timeout=60.0)
    sess = ViewerSession(client)
    img = (np.random.RandomState(1).rand(32, 48, 3) * 255).astype(np.uint8)
    client.seed_from_image(img)
    sess.add_keyframe()
    sess.cam["yaw"] = -0.4
    sess.add_keyframe()
    sess.build_spline_path(n=5)
    result = sess.request_inference(resolution=(48, 32), sync=True)
    frames = np.asarray(result.images)
    T, H, W, C = frames.shape
    assert (T, H, W, C) == (5, 32, 48, 3)
    assert frames.dtype == np.uint8
    # drawFrame's flat indexing (off = i*H*W*3) matches the layout
    flat = frames.reshape(-1)
    i, p = 2, 5
    off = i * H * W * 3
    np.testing.assert_array_equal(
        flat[off + 3 * p: off + 3 * p + 3], frames[i].reshape(-1, 3)[p]
    )
