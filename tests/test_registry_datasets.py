"""Registry/instantiate + training-dataset tests."""

import numpy as np
import pytest

from gen3c_tpu.utils import registry


def test_registry_roundtrip():
    registry.register("test_group", "thing", {"a": 1})
    assert registry.get("test_group", "thing") == {"a": 1}
    assert "thing" in registry.names("test_group")
    with pytest.raises(KeyError):
        registry.get("test_group", "missing")


def test_builtin_experiments_registered():
    assert "GEN3C_Cosmos_7B" in registry.names("experiment")
    assert "gen3c_tiny" in registry.names("experiment")
    preset = registry.get("experiment", "GEN3C_Cosmos_7B")
    assert preset.chunk_size == 121
    assert preset.state_shape == (16, 16, 88, 160)


def test_instantiate_nested():
    cfg = {
        "_target_": "collections.OrderedDict",
        "items": [("a", {"_target_": "builtins.int", "x": "3"})],
    }
    # int(x="3") is invalid; use a simpler nested case
    cfg = {
        "_target_": "fractions.Fraction",
        "numerator": 3,
        "denominator": 4,
    }
    from fractions import Fraction

    assert registry.instantiate(cfg) == Fraction(3, 4)


def test_apply_overrides_dataclass():
    from gen3c_tpu.pipelines.factory import GEN3C_TINY_PRESET

    out = registry.apply_overrides(
        GEN3C_TINY_PRESET, ["chunk_size=17", "dit.num_blocks=3"]
    )
    assert out.chunk_size == 17
    assert out.dit.num_blocks == 3
    assert GEN3C_TINY_PRESET.chunk_size == 9  # original untouched


def test_gen3c_clip_dataset(tmp_path):
    from tests.test_pipeline_e2e import tiny_model  # noqa: F401
    from gen3c_tpu.pipelines.factory import build_gen3c_model
    from gen3c_tpu.training.datasets import Gen3CClipDataset

    model, preset = build_gen3c_model("gen3c_tiny", checkpoint_dir=None)
    h, w, chunk = preset.height, preset.width, preset.chunk_size
    rng = np.random.RandomState(0)
    yy = np.linspace(0, 1, h)[:, None]
    np.savez(
        tmp_path / "clip0.npz",
        image=(rng.rand(chunk, 3, h, w) * 2 - 1).astype(np.float32),
        depth=np.broadcast_to(
            (2.5 - yy).astype(np.float32), (chunk, 1, h, w)
        ).copy(),
        w2c=np.broadcast_to(np.eye(4, dtype=np.float32), (chunk, 4, 4)).copy(),
        intrinsics=np.broadcast_to(
            np.array([[0.8 * w, 0, w / 2], [0, 0.8 * w, h / 2], [0, 0, 1]],
                     np.float32),
            (chunk, 3, 3),
        ).copy(),
    )
    ds = Gen3CClipDataset(str(tmp_path), model, batch_size=1)
    batch = next(iter(ds))
    C, T, Hl, Wl = preset.state_shape
    assert batch["x0"].shape == (1, C, T, Hl, Wl)
    assert batch["extra_channels"].shape == (1, 65, T, Hl, Wl)
    assert batch["crossattn_emb"].shape == (1, 512, 1024)
    assert np.isfinite(np.asarray(batch["x0"])).all()


def test_video_clip_dataset(tmp_path):
    from gen3c_tpu.pipelines.factory import build_gen3c_model
    from gen3c_tpu.training.datasets import VideoClipDataset

    model, preset = build_gen3c_model("gen3c_tiny", checkpoint_dir=None)
    h, w, chunk = preset.height, preset.width, preset.chunk_size
    rng = np.random.RandomState(0)
    np.savez(
        tmp_path / "vid0.npz",
        video=(rng.rand(chunk + 3, 3, h, w) * 2 - 1).astype(np.float32),
    )
    np.save(tmp_path / "vid0.t5.npy",
            rng.rand(512, 1024).astype(np.float32))

    C, T, Hl, Wl = preset.state_shape
    # t2w: no condition channels
    ds = VideoClipDataset(str(tmp_path), model, batch_size=2)
    batch = next(iter(ds))
    assert batch["x0"].shape == (2, C, T, Hl, Wl)
    assert batch["extra_channels"].shape == (2, 0, T, Hl, Wl)
    assert np.abs(np.asarray(batch["crossattn_emb"])).sum() > 0

    # v2w: first-latent-frame condition mask channel
    ds = VideoClipDataset(str(tmp_path), model, num_condition_t=1)
    batch = next(iter(ds))
    extra = np.asarray(batch["extra_channels"])
    assert extra.shape == (1, 1, T, Hl, Wl)
    assert extra[:, :, 0].min() == 1.0 and extra[:, :, 1:].max() == 0.0


def test_multiview_clip_dataset(tmp_path):
    from gen3c_tpu.pipelines.factory import build_gen3c_model
    from gen3c_tpu.training.datasets import MultiviewClipDataset

    model, preset = build_gen3c_model("gen3c_tiny", checkpoint_dir=None)
    h, w, chunk = preset.height, preset.width, preset.chunk_size
    rng = np.random.RandomState(0)
    V = 2
    np.savez(
        tmp_path / "mv0.npz",
        videos=(rng.rand(V, chunk, 3, h, w) * 2 - 1).astype(np.float32),
    )
    ds = MultiviewClipDataset(str(tmp_path), model, n_views=V)
    batch = next(iter(ds))
    C, T, Hl, Wl = preset.state_shape
    assert batch["x0"].shape == (1, C, V * T, Hl, Wl)
    assert np.isfinite(np.asarray(batch["x0"])).all()
