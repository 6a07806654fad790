"""Client <-> server integration (headless GUI-client parity flow)."""

import threading

import numpy as np
import pytest

from gen3c_tpu.serving.models import DebugInferenceModel
from gen3c_tpu.serving.server import serve


@pytest.fixture(scope="module")
def server_url():
    server, service = serve(
        host="127.0.0.1", port=0, model=DebugInferenceModel()
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    service.shutdown()


def test_full_client_flow(server_url, tmp_path):
    from gen3c_tpu.serving.client import (
        Gen3cClient,
        camera_path_from_trajectory,
    )

    client = Gen3cClient(server_url)
    assert client.metadata()["model"] == "DebugInferenceModel"

    rng = np.random.RandomState(0)
    image = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    seed_res = client.seed_from_image(image)
    assert seed_res.depths.shape == (1, 48, 64)

    c2ws = camera_path_from_trajectory("right", n_frames=7)
    assert c2ws.shape == (7, 3, 4)

    req_id = client.request_inference(c2ws, (64, 48), prompt="hi")
    result = client.wait_for_result(req_id, poll_s=0.05, timeout_s=30)
    assert result.images.shape == (7, 48, 64, 3)
    result.save_images(str(tmp_path / "frames"))
    import os

    assert len(os.listdir(tmp_path / "frames")) == 7

    latest = client.latest_image()
    assert latest is not None and latest.shape[2] >= 3

    # sync round-trip too
    result2 = client.request_inference(c2ws, (64, 48), sync=True)
    assert result2.images.shape == (7, 48, 64, 3)


def test_camera_path_cli_main(server_url, tmp_path):
    from PIL import Image

    from gen3c_tpu.serving import client as cli

    img = tmp_path / "seed.png"
    Image.fromarray(
        (np.random.RandomState(0).rand(48, 64, 3) * 255).astype(np.uint8)
    ).save(img)
    cli.main(
        [
            "--server", server_url,
            "--image", str(img),
            "--trajectory", "zoom_in",
            "--num_frames", "5",
            "--output", str(tmp_path / "out"),
        ]
    )
    import os

    assert len(os.listdir(tmp_path / "out")) == 5
