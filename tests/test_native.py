

def test_render_buffer_accumulate_and_tonemap():
    """Native render buffer (render_buffer.cu role): running-mean
    accumulation, exposure scaling, sRGB transfer."""
    import numpy as np
    import pytest

    from gen3c_tpu.native import render_buffer as rb

    if not rb.available():
        pytest.skip("no g++ on this host")

    buf = rb.RenderBuffer(4, 5)
    rng = np.random.RandomState(0)
    frames = [rng.rand(4, 5, 3).astype(np.float32) for _ in range(3)]
    for f in frames:
        buf.accumulate(f)
    assert buf.spp == 3

    mean = np.mean(frames, axis=0)

    def srgb(x):
        return np.where(x <= 0.0031308, 12.92 * x,
                        1.055 * np.maximum(x, 1e-9) ** (1 / 2.4) - 0.055)

    expect = (srgb(np.clip(mean, 0, 1)) * 255 + 0.5).clip(0, 255)
    np.testing.assert_allclose(
        buf.readout(), expect.astype(np.uint8), atol=1)

    # linear readout + exposure doubling
    lin = buf.readout(exposure=1.0, srgb_transfer=False)
    expect_lin = (np.clip(mean * 2, 0, 1) * 255 + 0.5).clip(0, 255)
    np.testing.assert_allclose(lin, expect_lin.astype(np.uint8), atol=1)

    buf.clear()
    assert buf.spp == 0 and buf.readout().max() == 0


def test_preview_spp_accumulation(monkeypatch, tmp_path):
    """GEN3C_PREVIEW_SPP>1 runs the native render-buffer accumulation
    path and still returns valid frames (spp=1 path unchanged)."""
    import numpy as np
    import pytest

    from gen3c_tpu.native import point_raster as pr
    from gen3c_tpu.native import render_buffer as rb

    if not (pr.available() and rb.available()):
        pytest.skip("no g++ on this host")

    from gen3c_tpu.serving.api_types import InferenceRequest, SeedingRequest
    from gen3c_tpu.serving.models import Gen3cPersistentModel

    model = Gen3cPersistentModel(
        model_preset="gen3c_tiny", checkpoint_dir=None, num_steps=2)
    rng = np.random.RandomState(0)
    h, w = model.preset.height, model.preset.width
    img = (rng.rand(1, h, w, 3) * 255).astype(np.uint8)
    c2w1 = np.eye(4, dtype=np.float32)[None, :3]
    model.seed_model(SeedingRequest(
        request_id="s1",
        images=img,
        cameras_to_world=c2w1,
        focal_lengths=np.full((1, 2), 0.8 * w, np.float32),
        principal_points=np.asarray([[w / 2, h / 2]], np.float32),
        resolutions=np.asarray([[w, h]]),
    ))

    c2w = np.tile(np.eye(4, dtype=np.float32)[None, :3], (3, 1, 1))
    req = InferenceRequest(
        request_id="r1",
        cameras_to_world=c2w,
        focal_lengths=np.full((3, 2), 0.8 * w, np.float32),
        principal_points=np.tile(
            np.asarray([[w / 2, h / 2]], np.float32), (3, 1)),
        resolutions=np.tile(np.asarray([[w, h]]), (3, 1)),
    )
    monkeypatch.setenv("GEN3C_PREVIEW_NATIVE", "1")
    res1 = model.render_preview(req)
    monkeypatch.setenv("GEN3C_PREVIEW_SPP", "4")
    res4 = model.render_preview(req)
    assert res1.images.shape == res4.images.shape
    assert res4.images.dtype == np.uint8
    # sub-pixel jitter changes edge pixels but not the scene
    assert np.mean(
        np.abs(res1.images.astype(int) - res4.images.astype(int))) < 30
