"""Point-cloud preview (no-diffusion) serving path."""

import threading

import numpy as np
import pytest

from gen3c_tpu.serving.models import Gen3cPersistentModel
from gen3c_tpu.serving.api_types import InferenceRequest, SeedingRequest
from gen3c_tpu.serving.server import serve


@pytest.fixture(scope="module")
def tiny_server():
    model = Gen3cPersistentModel(
        model_preset="gen3c_tiny",
        checkpoint_dir=None,
        num_steps=2,
        depth_source="heuristic",
    )
    server, service = serve(host="127.0.0.1", port=0, model=model)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}", model
    server.shutdown()
    service.shutdown()


def test_render_preview_flow(tiny_server):
    url, model = tiny_server
    from gen3c_tpu.serving.client import Gen3cClient

    client = Gen3cClient(url)
    h, w = model.preset.height, model.preset.width
    rng = np.random.RandomState(0)
    image = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    client.seed_from_image(image)

    c2w = np.tile(np.eye(4, dtype=np.float32)[:3], (4, 1, 1))
    c2w[:, 0, 3] = np.linspace(0, 0.2, 4)
    result = client.render_preview(c2w, (w, h))
    assert result.images.shape == (4, h, w, 3)
    # frame 0 (identity pose) must closely reproduce the seed image
    diff = np.abs(
        result.images[0].astype(np.float32) - image.astype(np.float32)
    )
    assert np.quantile(diff, 0.9) <= 2.0, np.quantile(diff, 0.9)


def test_preview_requires_seeding(tiny_server):
    url, model = tiny_server
    model.clear_cache()
    import urllib.request

    from gen3c_tpu.serving.serialization import dumps_api_message

    c2w = np.tile(np.eye(4, dtype=np.float32)[:3], (2, 1, 1))
    req = InferenceRequest(
        request_id="p",
        cameras_to_world=c2w,
        focal_lengths=np.full((2, 2), 100.0, np.float32),
        principal_points=np.full((2, 2), 0.5, np.float32),
        resolutions=np.tile([[64, 48]], (2, 1)),
    )
    r = urllib.request.Request(
        f"{url}/render-preview", data=dumps_api_message(req), method="POST"
    )
    try:
        urllib.request.urlopen(r)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
