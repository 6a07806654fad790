"""World interpolator CLI + profiling utility tests."""

import os
import time

import numpy as np


def test_world_interpolator_tiny(tmp_path):
    from PIL import Image

    from gen3c_tpu.pipelines import world_interpolator as cli

    rng = np.random.RandomState(0)
    a = tmp_path / "a.png"
    b = tmp_path / "b.png"
    Image.fromarray((rng.rand(96, 160, 3) * 255).astype(np.uint8)).save(a)
    Image.fromarray((rng.rand(96, 160, 3) * 255).astype(np.uint8)).save(b)
    args = cli.create_parser().parse_args(
        [
            "--first_image", str(a),
            "--last_image", str(b),
            "--model_preset", "cosmos_v2w_tiny",
            "--checkpoint_dir", str(tmp_path / "none"),
            "--num_steps", "2",
            "--video_save_folder", str(tmp_path / "out"),
        ]
    )
    path = cli.demo(args)
    assert os.path.exists(path) or os.path.isdir(os.path.splitext(path)[0])


def test_first_and_last_indicator():
    import jax.numpy as jnp

    from gen3c_tpu.models.conditioner import (
        VideoExtendCondition,
        add_condition_video_indicator_and_input_mask,
    )

    gt = jnp.zeros((1, 4, 6, 2, 2))
    cond = VideoExtendCondition(crossattn_emb=jnp.zeros((1, 2, 8)))
    cond = add_condition_video_indicator_and_input_mask(
        gt, cond, 1, condition_location="first_and_last_1"
    )
    ind = np.asarray(cond.condition_video_indicator)[0, 0, :, 0, 0]
    np.testing.assert_array_equal(ind, [1, 0, 0, 0, 0, 1])


def test_timer_and_training_timer(caplog):
    from gen3c_tpu.utils.profiling import TrainingTimer, timer

    with timer("unit-test-block"):
        time.sleep(0.01)

    tt = TrainingTimer()
    for _ in range(3):
        with tt("phase_a"):
            time.sleep(0.005)
    report = tt.report()
    assert report["phase_a"] >= 0.004


def test_device_memory_report_runs():
    from gen3c_tpu.utils.profiling import device_memory_report

    device_memory_report()  # may be None on CPU; must not raise


def test_world_interpolator_video_pairs(tmp_path):
    """Video mode: consecutive frame pairs chained with 1-frame overlap
    (reference world_generation_pipeline.py:1300-1380)."""
    import jax

    from PIL import Image

    from gen3c_tpu.pipelines import world_interpolator as cli

    rng = np.random.RandomState(1)
    frames_dir = tmp_path / "vid"
    os.makedirs(frames_dir)
    for i in range(3):
        Image.fromarray(
            (rng.rand(96, 160, 3) * 255).astype(np.uint8)
        ).save(frames_dir / f"{i:04d}.png")
    args = cli.create_parser().parse_args(
        [
            "--input_video", str(frames_dir),
            "--num_frame_pairs", "2",
            "--model_preset", "cosmos_v2w_tiny",
            "--checkpoint_dir", str(tmp_path / "none"),
            "--num_steps", "2",
            "--video_save_folder", str(tmp_path / "out"),
        ]
    )
    path = cli.demo(args)
    assert os.path.exists(path) or os.path.isdir(os.path.splitext(path)[0])
    # two chained chunks: T + (T - 1) frames
    from gen3c_tpu.pipelines.text2world import T2W_PRESETS

    T_pix = T2W_PRESETS["cosmos_v2w_tiny"].chunk_size
    from gen3c_tpu.utils.io import read_video_bcthw

    out, _ = read_video_bcthw(path)
    assert out.shape[2] == 2 * T_pix - 1
