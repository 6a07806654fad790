"""API server integration tests against the debug + tiny real backends.

Mirrors the reference's debug_api_check.py pattern (gui/api/server_debug.py
+ debug_api_check.py): drive the real HTTP routes against a deterministic
fake model, then against the tiny GEN3C model.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from gen3c_tpu.serving.api_types import InferenceRequest, SeedingRequest
from gen3c_tpu.serving.models import DebugInferenceModel, Gen3cPersistentModel
from gen3c_tpu.serving.serialization import dumps_api_message, loads_api_message
from gen3c_tpu.serving.server import InferenceService, make_handler, serve


def _cameras(n, h, w):
    c2w = np.tile(np.eye(4, dtype=np.float32)[:3], (n, 1, 1))
    c2w[:, 0, 3] = np.linspace(0, 0.1, n)
    fl = np.full((n, 2), 0.8 * w, np.float32)
    pp = np.full((n, 2), 0.5, np.float32)
    res = np.tile([[w, h]], (n, 1))
    return c2w, fl, pp, res


@pytest.fixture(scope="module")
def debug_server():
    server, service = serve(host="127.0.0.1", port=0, model=DebugInferenceModel())
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    service.shutdown()


def _post(url, body):
    req = urllib.request.Request(url, data=body, method="POST")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def _get(url):
    try:
        with urllib.request.urlopen(url) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_metadata_endpoint(debug_server):
    status, body = _get(f"{debug_server}/metadata")
    assert status == 200
    meta = json.loads(body)
    assert meta["model"] == "DebugInferenceModel"


def test_seed_and_infer_roundtrip(debug_server):
    h, w = 32, 48
    c2w, fl, pp, res = _cameras(1, h, w)
    seed_req = SeedingRequest(
        request_id="seed-1",
        cameras_to_world=c2w,
        focal_lengths=fl,
        principal_points=pp,
        images=np.zeros((1, h, w, 3), np.uint8),
    )
    status, body = _post(
        f"{debug_server}/seed-model", dumps_api_message(seed_req)
    )
    assert status == 200
    result = loads_api_message(body)
    assert result.depths.shape == (1, h, w)

    c2w, fl, pp, res = _cameras(5, h, w)
    inf_req = InferenceRequest(
        request_id="job-1",
        cameras_to_world=c2w,
        focal_lengths=fl,
        principal_points=pp,
        resolutions=res,
    )
    status, _ = _post(
        f"{debug_server}/request-inference", dumps_api_message(inf_req)
    )
    assert status == 202

    import time

    for _ in range(100):
        status, body = _get(
            f"{debug_server}/inference-result?request_id=job-1"
        )
        if status == 200:
            break
        assert status == 503
        time.sleep(0.05)
    assert status == 200
    result = loads_api_message(body)
    assert result.images.shape == (5, h, w, 3)

    status, body = _get(f"{debug_server}/image?format=png")
    assert status == 200
    assert body[:4] == b"\x89PNG"


def test_sync_inference(debug_server):
    h, w = 32, 48
    c2w, fl, pp, res = _cameras(3, h, w)
    inf_req = InferenceRequest(
        request_id="job-sync",
        cameras_to_world=c2w,
        focal_lengths=fl,
        principal_points=pp,
        resolutions=res,
    )
    status, body = _post(
        f"{debug_server}/request-inference?sync=1", dumps_api_message(inf_req)
    )
    assert status == 200
    result = loads_api_message(body)
    assert result.images.shape == (3, h, w, 3)


def test_bad_message_rejected(debug_server):
    status, _ = _post(f"{debug_server}/seed-model", b"not json")
    assert status == 400
    status, _ = _post(
        f"{debug_server}/seed-model",
        json.dumps({"__type__": "EvilType"}).encode(),
    )
    assert status == 400


def test_persistent_model_end_to_end():
    """Seed + infer through Gen3cPersistentModel with the tiny preset."""
    model = Gen3cPersistentModel(
        model_preset="gen3c_tiny",
        checkpoint_dir=None,
        num_steps=2,
        depth_source="heuristic",
    )
    h, w = model.preset.height, model.preset.width
    c2w, fl, pp, res = _cameras(1, h, w)
    rng = np.random.RandomState(0)
    seed_req = SeedingRequest(
        request_id="s",
        cameras_to_world=c2w,
        focal_lengths=fl,
        principal_points=pp,
        images=(rng.rand(1, h, w, 3) * 255).astype(np.uint8),
    )
    seed_res = model.seed_model(seed_req)
    assert seed_res.depths.shape == (1, h, w)

    c2w, fl, pp, res = _cameras(5, h, w)
    inf_req = InferenceRequest(
        request_id="i",
        cameras_to_world=c2w,
        focal_lengths=fl,
        principal_points=pp,
        resolutions=res,
    )
    result = model.run_inference(inf_req)
    assert result.images.shape == (5, h, w, 3)  # trimmed from padded chunk
    assert result.images.dtype == np.uint8
    meta = model.metadata()
    assert meta["seeded"] and meta["chunk_size"] == 9
    # active performance configuration is observable (round-3 knobs)
    for key in ("step_cache_interval", "attn_temporal_window",
                "guidance_interval", "cfg_rescale", "solver"):
        assert key in meta["perf"], key


def test_seed_from_v2v_directory(tmp_path):
    """Multi-frame (v2v) seeding from a reference-format data directory
    (gui/api/v2v_utils.py:44-125): camera/depth/mask npz + rgb frames ->
    SeedingRequest with masks -> Cache4D with input_mask."""
    from PIL import Image as PILImage

    from gen3c_tpu.serving.client import load_seeding_directory

    n, h, w = 3, 40, 64
    rng = np.random.RandomState(0)
    depths = (1.5 + rng.rand(n, h, w)).astype(np.float16)
    masks = rng.rand(n, h, w) > 0.3
    intr = np.tile(
        np.array([[0.9 * w, 0, w / 2], [0, 0.9 * w, h / 2], [0, 0, 1]],
                 np.float32), (n, 1, 1))
    w2c = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    w2c[:, 0, 3] = np.linspace(0, 0.2, n)
    np.savez(tmp_path / "depth.npz", depth=depths)
    np.savez(tmp_path / "mask.npz", mask=masks)
    np.savez(tmp_path / "camera.npz", intrinsics=intr, w2c=w2c)
    rgb_dir = tmp_path / "rgb"
    rgb_dir.mkdir()
    for i in range(n):
        PILImage.fromarray(
            (rng.rand(h, w, 3) * 255).astype(np.uint8)
        ).save(rgb_dir / f"{i:03d}.png")

    req = load_seeding_directory(str(tmp_path))
    assert req.images.shape == (n, h, w, 3)
    assert req.depths.shape == (n, h, w)
    assert req.masks.shape == (n, h, w)
    assert req.cameras_to_world.shape == (n, 3, 4)
    # c2w is the inverse of w2c (translation negated here)
    np.testing.assert_allclose(
        req.cameras_to_world[:, 0, 3], -w2c[:, 0, 3], atol=1e-6
    )
    # round-trips through the wire format
    req2 = loads_api_message(dumps_api_message(req))
    np.testing.assert_array_equal(req2.masks, req.masks)

    # stride/max_frames selection
    req_s = load_seeding_directory(str(tmp_path), max_frames=1,
                                   frames_stride=2)
    assert len(req_s) == 1

    model = Gen3cPersistentModel(
        model_preset="gen3c_tiny",
        checkpoint_dir=None,
        num_steps=2,
        depth_source="heuristic",
    )
    model.seed_model(req)
    assert type(model.cache).__name__ == "Cache4D"
    assert model.cache.input_mask is not None
    ph, pw = model.preset.height, model.preset.width
    assert model.cache.input_image.shape[-2:] == (ph, pw)
    assert model.cache.input_mask.shape[-2:] == (ph, pw)


def test_persistent_model_seeds_at_native_resolution():
    """A client may seed at the image's NATIVE resolution (the GUI does):
    the server must resize to the preset's inference resolution with
    scaled intrinsics (gen3c_persistent.py:250-262). Regression: the
    2026-08-17 TPU serving smoke crashed in the sampler with
    (.., 90, 160) vs (.., 12, 20) latents because the seed was cached
    unresized."""
    model = Gen3cPersistentModel(
        model_preset="gen3c_tiny",
        checkpoint_dir=None,
        num_steps=2,
        depth_source="heuristic",
    )
    h, w = model.preset.height, model.preset.width
    nh, nw = 2 * h + 8, 2 * w + 16  # deliberately mismatched native res
    c2w, fl, pp, _ = _cameras(1, nh, nw)
    rng = np.random.RandomState(0)
    # provided depths exercise the depth-resize path too
    seed_res = model.seed_model(
        SeedingRequest(
            request_id="s",
            cameras_to_world=c2w,
            focal_lengths=fl,
            principal_points=pp,
            images=(rng.rand(1, nh, nw, 3) * 255).astype(np.uint8),
            depths=(1.5 + rng.rand(1, nh, nw)).astype(np.float32),
        )
    )
    # working resolution reported back is the model's, like the reference
    assert tuple(seed_res.resolutions[0]) == (w, h)
    assert model.cache.input_image.shape[-2:] == (h, w)

    c2w, fl, pp, res = _cameras(3, h, w)
    result = model.run_inference(
        InferenceRequest(
            request_id="i",
            cameras_to_world=c2w,
            focal_lengths=fl,
            principal_points=pp,
            resolutions=res,
        )
    )
    assert result.images.shape == (3, h, w, 3)


class _SlowChunkedModel(DebugInferenceModel):
    """Debug model that emits frames chunk-by-chunk with a delay —
    exercises progress / partial-result / cancellation plumbing."""

    def __init__(self, n_chunks=4, chunk_delay_s=0.15, **kw):
        super().__init__(**kw)
        self.n_chunks = n_chunks
        self.chunk_delay_s = chunk_delay_s

    def run_inference(self, req, on_chunk=None, cancel_event=None):
        import time as _time

        from gen3c_tpu.pipelines.chunked import GenerationCancelled

        result = super().run_inference(req)
        n = len(result.images)
        per = max(1, n // self.n_chunks)
        for c in range(self.n_chunks):
            if cancel_event is not None and cancel_event.is_set():
                raise GenerationCancelled()
            _time.sleep(self.chunk_delay_s)
            done = min(n, (c + 1) * per) if c < self.n_chunks - 1 else n
            if on_chunk is not None:
                on_chunk(c + 1, self.n_chunks, result.images[:done])
        return result


@pytest.fixture()
def slow_server():
    server, service = serve(
        host="127.0.0.1", port=0, model=_SlowChunkedModel()
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    service.shutdown()


def _submit(base, rid, n=8, h=32, w=48):
    c2w, fl, pp, res = _cameras(n, h, w)
    req = InferenceRequest(
        request_id=rid,
        cameras_to_world=c2w,
        focal_lengths=fl,
        principal_points=pp,
        resolutions=res,
    )
    status, _ = _post(f"{base}/request-inference", dumps_api_message(req))
    assert status == 202


def test_job_status_and_partial_results(slow_server):
    import time

    _submit(slow_server, "prog-1")
    saw_running = saw_partial = False
    for _ in range(200):
        status, body = _get(f"{slow_server}/job-status?request_id=prog-1")
        assert status == 200
        st = json.loads(body)
        if st["state"] == "running" and 0 < st["progress"] < 1:
            saw_running = True
            code, pbody = _get(
                f"{slow_server}/inference-result?request_id=prog-1&partial=1"
            )
            if code == 206:
                part = loads_api_message(pbody)
                assert 0 < len(part.images) <= 8
                assert len(part.cameras_to_world) == len(part.images)
                saw_partial = True
        if st["state"] == "done":
            break
        time.sleep(0.02)
    assert st["state"] == "done" and st["progress"] == 1.0
    assert saw_running and saw_partial
    code, body = _get(f"{slow_server}/inference-result?request_id=prog-1")
    assert code == 200
    assert len(loads_api_message(body).images) == 8


def test_cancel_running_job(slow_server):
    import time

    _submit(slow_server, "cancel-1")
    # wait until it is actually running, then cancel
    for _ in range(100):
        _, body = _get(f"{slow_server}/job-status?request_id=cancel-1")
        if json.loads(body)["state"] == "running":
            break
        time.sleep(0.02)
    code, _ = _post(f"{slow_server}/cancel-inference?request_id=cancel-1", b"")
    assert code == 200
    for _ in range(200):
        _, body = _get(f"{slow_server}/job-status?request_id=cancel-1")
        st = json.loads(body)
        if st["state"] == "cancelled":
            break
        time.sleep(0.02)
    assert st["state"] == "cancelled"
    code, _ = _get(f"{slow_server}/inference-result?request_id=cancel-1")
    assert code == 503  # no result was produced
    # cancelling a finished/unknown job reports 404
    code, _ = _post(f"{slow_server}/cancel-inference?request_id=cancel-1", b"")
    assert code == 404
    code, _ = _post(f"{slow_server}/cancel-inference?request_id=nope", b"")
    assert code == 404


def test_cancel_pending_job(slow_server):
    _submit(slow_server, "run-first")
    _submit(slow_server, "queued")  # sits behind run-first in the queue
    code, _ = _post(f"{slow_server}/cancel-inference?request_id=queued", b"")
    assert code == 200
    import time

    for _ in range(300):
        _, body = _get(f"{slow_server}/job-status?request_id=run-first")
        if json.loads(body)["state"] == "done":
            break
        time.sleep(0.02)
    _, body = _get(f"{slow_server}/job-status?request_id=queued")
    assert json.loads(body)["state"] == "cancelled"


def test_chunked_generation_cancel_event():
    """cancel_event stops run_chunked_generation at a chunk boundary."""
    import threading as _threading

    from gen3c_tpu.pipelines.chunked import (
        GenerationCancelled,
        run_chunked_generation,
    )

    model = Gen3cPersistentModel(
        model_preset="gen3c_tiny",
        checkpoint_dir=None,
        num_steps=2,
        depth_source="heuristic",
    )
    h, w = model.preset.height, model.preset.width
    c2w, fl, pp, res = _cameras(1, h, w)
    rng = np.random.RandomState(0)
    model.seed_model(
        SeedingRequest(
            request_id="s",
            cameras_to_world=c2w,
            focal_lengths=fl,
            principal_points=pp,
            images=(rng.rand(1, h, w, 3) * 255).astype(np.uint8),
        )
    )
    chunk = model.model.chunk_size
    n = 2 * (chunk - 1) + 1  # two AR chunks
    c2w, fl, pp, res = _cameras(n, h, w)
    req = InferenceRequest(
        request_id="i",
        cameras_to_world=c2w,
        focal_lengths=fl,
        principal_points=pp,
        resolutions=res,
    )
    progress = []
    ev = _threading.Event()

    def on_chunk(done, total, video):
        progress.append((done, total, len(video)))
        ev.set()  # cancel after the first chunk

    with pytest.raises(GenerationCancelled):
        model.run_inference(req, on_chunk=on_chunk, cancel_event=ev)
    assert progress[0][0] == 1 and progress[0][1] == 2


def test_overlapped_interchunk_matches_serial(monkeypatch):
    """The overlapped inter-chunk chain (depth+update+re-render kicked
    from pipeline.generate's on_last_frame callback, running under the
    chunk fetch — VERDICT r4 weak #1) is bit-identical to the serial
    path: the callback frame is the same on-device uint8 conversion the
    full fetch produces, and everything downstream is deterministic."""

    def _run():
        model = Gen3cPersistentModel(
            model_preset="gen3c_tiny",
            checkpoint_dir=None,
            num_steps=2,
            depth_source="heuristic",
        )
        h, w = model.preset.height, model.preset.width
        c2w, fl, pp, res = _cameras(1, h, w)
        rng = np.random.RandomState(7)
        model.seed_model(
            SeedingRequest(
                request_id="s",
                cameras_to_world=c2w,
                focal_lengths=fl,
                principal_points=pp,
                images=(rng.rand(1, h, w, 3) * 255).astype(np.uint8),
            )
        )
        chunk = model.model.chunk_size
        n = 3 * (chunk - 1) + 1  # three AR chunks -> two inter-chunk phases
        c2w, fl, pp, res = _cameras(n, h, w)
        req = InferenceRequest(
            request_id="i",
            cameras_to_world=c2w,
            focal_lengths=fl,
            principal_points=pp,
            resolutions=res,
        )
        return model.run_inference(req)

    monkeypatch.setenv("GEN3C_OVERLAP_INTERCHUNK", "0")
    serial = _run()
    monkeypatch.setenv("GEN3C_OVERLAP_INTERCHUNK", "1")
    overlapped = _run()
    np.testing.assert_array_equal(serial.images, overlapped.images)


def test_generate_skips_on_last_frame_under_video_guardrail():
    """generate() itself enforces the no-side-effects-on-blocked-chunk
    invariant (not just the one call site in chunked.py): when a video
    guardrail is active, the on_last_frame callback — which typically
    mutates the serving-owned 3D cache — must never fire, because the
    guardrail may refuse to deliver the chunk."""
    import jax.numpy as jnp

    model = Gen3cPersistentModel(
        model_preset="gen3c_tiny",
        checkpoint_dir=None,
        num_steps=2,
        depth_source="heuristic",
    )
    h, w = model.preset.height, model.preset.width
    c2w, fl, pp, res = _cameras(1, h, w)
    rng = np.random.RandomState(3)
    model.seed_model(
        SeedingRequest(
            request_id="s",
            cameras_to_world=c2w,
            focal_lengths=fl,
            principal_points=pp,
            images=(rng.rand(1, h, w, 3) * 255).astype(np.uint8),
        )
    )
    chunk = model.model.chunk_size
    c2w, fl, pp, res = _cameras(chunk, h, w)
    req = InferenceRequest(
        request_id="i",
        cameras_to_world=c2w,
        focal_lengths=fl,
        principal_points=pp,
        resolutions=res,
    )
    target_res = np.tile([[w, h]], (len(req), 1))
    w2cs = jnp.asarray(req.world_to_cameras().astype(np.float32))[None]
    ks = jnp.asarray(
        req.intrinsics_matrix(for_resolutions=target_res).astype(np.float32)
    )[None]
    warp_images, warp_masks = model.cache.render_cache(w2cs, ks)

    class _PassGuard:
        def run(self, video):
            return video

    model.pipeline.video_guardrail = _PassGuard()
    fired = []
    out = model.pipeline.generate(
        prompt="",
        image_frames=model._seed_frame,
        rendered_warp_images=warp_images,
        rendered_warp_masks=warp_masks,
        on_last_frame=fired.append,
    )
    assert out is not None  # the pass-through guardrail delivered the chunk
    assert fired == []  # but the callback must not have observed it


def test_viewer_and_geometry_endpoints(debug_server):
    # static viewer page
    code, body = _get(f"{debug_server}/viewer")
    assert code == 200 and b"GEN3C" in body and b"<html>" in body
    code, _ = _get(f"{debug_server}/")
    assert code == 200

    # point cloud (debug model serves a synthetic sphere)
    code, body = _get(f"{debug_server}/point-cloud?max_points=1000")
    assert code == 200
    from gen3c_tpu.serving.serialization import _decode_value

    pc = json.loads(body)
    pts = _decode_value(pc["points"])
    cols = _decode_value(pc["colors"])
    assert pts.shape == (1000, 3) and cols.shape == (1000, 3)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-5)

    # preset trajectory
    code, body = _get(f"{debug_server}/trajectory?type=left&n=9")
    assert code == 200
    t = json.loads(body)
    assert len(t["c2ws"]) == 9 and len(t["c2ws"][0]) == 3
    assert len(t["focal_lengths"]) == 9

    # keyframed spline via the native camera-path engine
    kfs = {
        "keyframes": [
            {"c2w": [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], "t": 0},
            {"c2w": [1, 0, 0, 1.0, 0, 1, 0, 0, 0, 0, 1, 0], "t": 1},
        ],
        "n": 5,
    }
    code, body = _post(
        f"{debug_server}/interpolate-path", json.dumps(kfs).encode()
    )
    assert code == 200
    out = json.loads(body)
    assert len(out["c2ws"]) == 5
    xs = [c[0][3] for c in out["c2ws"]]
    assert xs[0] <= xs[-1] and abs(xs[-1] - 1.0) < 0.3  # moves along +x

    code, _ = _post(f"{debug_server}/interpolate-path", b"garbage")
    assert code == 400


def test_persistent_model_multi_device_cp():
    """Serving model with GEN3C_NUM_DEVICES-style cp sharding: builds on
    the virtual mesh and serves an inference request (denoise runs
    through cp_generate_samples)."""
    import jax

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs >=2 devices")
    import numpy as np

    from gen3c_tpu.serving.api_types import InferenceRequest, SeedingRequest
    from gen3c_tpu.serving.models import Gen3cPersistentModel

    model = Gen3cPersistentModel(
        model_preset="gen3c_tiny",
        checkpoint_dir=None,
        num_steps=2,
        depth_source="heuristic",
        num_devices=2,
        parallel="cp",
    )
    h, w = model.preset.height, model.preset.width
    rng = np.random.RandomState(0)
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
    n = model.preset.chunk_size
    c2w = np.tile(np.eye(4, dtype=np.float32)[:3], (n, 1, 1))
    c2w[:, 0, 3] = np.linspace(0, 0.1, n)
    req = InferenceRequest(
        request_id="i",
        cameras_to_world=c2w,
        focal_lengths=np.full((n, 2), 0.9 * w, np.float32),
        principal_points=np.full((n, 2), 0.5, np.float32),
        resolutions=np.tile([[w, h]], (n, 1)),
    )
    result = model.run_inference(req)
    assert result.images.shape == (n, h, w, 3)
    assert np.isfinite(result.images.astype(np.float32)).all()


def test_parse_guidance_interval_env():
    import pytest

    from gen3c_tpu.serving.server import parse_guidance_interval_env

    assert parse_guidance_interval_env("") is None
    assert parse_guidance_interval_env("  ") is None
    assert parse_guidance_interval_env("1.75,81") == (1.75, 81.0)
    assert parse_guidance_interval_env(" 0.1 , 2.0 ") == (0.1, 2.0)
    with pytest.raises(ValueError, match="lo,hi"):
        parse_guidance_interval_env("1.75")
    with pytest.raises(ValueError, match="0 <= lo <= hi"):
        parse_guidance_interval_env("5,1")


def test_inference_result_avi_wire_format(debug_server):
    """?format=avi on /inference-result: the whole result video rides ONE
    MJPEG-AVI buffer (the reference MP4 wire role, gui/api/encoding.py:
    26-30). Round-trips through the standard API message + decompress,
    and the payload is much smaller than the per-frame PNG format."""
    import time

    from gen3c_tpu.serving.encoding import CompressionFormat

    h, w = 32, 48
    c2w, fl, pp, res = _cameras(1, h, w)
    seed_req = SeedingRequest(
        request_id="seed-avi",
        cameras_to_world=c2w,
        focal_lengths=fl,
        principal_points=pp,
        images=np.zeros((1, h, w, 3), np.uint8),
    )
    status, _ = _post(
        f"{debug_server}/seed-model", dumps_api_message(seed_req)
    )
    assert status == 200

    c2w, fl, pp, res = _cameras(8, h, w)
    inf_req = InferenceRequest(
        request_id="job-avi",
        cameras_to_world=c2w,
        focal_lengths=fl,
        principal_points=pp,
        resolutions=res,
    )
    status, _ = _post(
        f"{debug_server}/request-inference", dumps_api_message(inf_req)
    )
    assert status == 202
    for _ in range(100):
        status, raw_body = _get(
            f"{debug_server}/inference-result?request_id=job-avi"
        )
        if status == 200:
            break
        time.sleep(0.05)
    assert status == 200
    raw = loads_api_message(raw_body)

    status, avi_body = _get(
        f"{debug_server}/inference-result?request_id=job-avi&format=avi"
    )
    assert status == 200
    result = loads_api_message(avi_body)
    assert result.images_format == CompressionFormat.AVI
    assert len(result.images_compressed) == 1
    assert result.images_compressed[0][:4] == b"RIFF"
    result.decompress()
    assert result.images.shape == raw.images.shape
    # MJPEG q90 lossy bound vs the exact frames
    err = np.abs(
        result.images.astype(np.float32)
        - raw.images.astype(np.float32) / 255.0
    )
    assert err.mean() < 0.02, err.mean()

    status, png_body = _get(
        f"{debug_server}/inference-result?request_id=job-avi&format=png"
    )
    assert status == 200  # both formats served; size comparison on
    # natural content lives in test_avi_transfer_reduction (the debug
    # model's smooth synthetic gradient is a PNG-friendly special case)


def test_avi_compression_roundtrip_and_padtrim():
    from gen3c_tpu.serving.encoding import (
        CompressionFormat,
        compress_images,
        decompress_buffer,
        pad_or_trim_encoded_buffers,
    )

    rng = np.random.RandomState(0)
    yy = np.linspace(0, 1, 24)[None, :, None, None]
    frames = np.clip(
        0.5 + 0.4 * np.sin(np.arange(6)[:, None, None, None] + yy)
        + rng.rand(6, 24, 32, 3) * 0.02,
        0, 1,
    ).astype(np.float32)
    bufs = compress_images(frames, CompressionFormat.AVI)
    assert len(bufs) == 1
    back = decompress_buffer(bufs, CompressionFormat.AVI)
    assert back.shape == frames.shape
    assert np.abs(back - frames).mean() < 0.02

    trimmed = pad_or_trim_encoded_buffers(bufs, CompressionFormat.AVI, 4)
    assert decompress_buffer(trimmed, CompressionFormat.AVI).shape[0] == 4
    padded = pad_or_trim_encoded_buffers(bufs, CompressionFormat.AVI, 9)
    dp = decompress_buffer(padded, CompressionFormat.AVI)
    assert dp.shape[0] == 9
    # padding repeats the last frame
    assert np.abs(dp[8] - dp[5]).mean() < 0.02


def test_avi_transfer_reduction_on_natural_frames():
    """VERDICT r3 'next #7' measurement: on natural video content the
    single-buffer MJPEG-AVI is >=5x smaller than the per-frame PNG wire
    format (PNG only wins on low-entropy synthetic gradients)."""
    from PIL import Image

    from gen3c_tpu.serving.encoding import (
        CompressionFormat,
        compress_images,
    )

    img = np.asarray(
        Image.open("/root/reference/assets/diffusion/000000.png").convert(
            "RGB"
        )
    )[::2, ::2].astype(np.float32) / 255.0
    frames = np.stack(
        [np.roll(img, 3 * i, axis=1) for i in range(24)]
    )
    png = compress_images(frames, CompressionFormat.PNG)
    avi = compress_images(frames, CompressionFormat.AVI)
    png_bytes = sum(len(b) for b in png)
    avi_bytes = sum(len(b) for b in avi)
    assert avi_bytes * 5 <= png_bytes, (avi_bytes, png_bytes)
