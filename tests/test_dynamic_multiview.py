"""E2E tests for the dynamic (Cache4D) and multiview (BufferSelector) CLIs."""

import numpy as np
import pytest

from tests.test_pipeline_e2e import tiny_model  # fixture reuse  # noqa: F401


def _synthetic_scene(h, w, n_frames):
    rng = np.random.RandomState(0)
    yy = np.linspace(0, 1, h)[:, None]
    image = (rng.rand(n_frames, 3, h, w) * 2 - 1).astype(np.float32)
    depth = np.broadcast_to(
        (2.5 - yy).astype(np.float32), (n_frames, h, w)
    ).copy()[:, None]
    mask = np.ones_like(depth)
    w2c = np.broadcast_to(np.eye(4, dtype=np.float32), (n_frames, 4, 4)).copy()
    w2c[:, 0, 3] = np.linspace(0, 0.1, n_frames)
    k = np.broadcast_to(
        np.array([[0.8 * w, 0, w / 2], [0, 0.8 * w, h / 2], [0, 0, 1]],
                 np.float32),
        (n_frames, 3, 3),
    ).copy()
    return image, depth, mask, w2c, k


def test_dynamic_cli(tmp_path, tiny_model):  # noqa: F811
    from gen3c_tpu.pipelines import gen3c_dynamic as cli

    _, preset = tiny_model
    h, w = preset.height, preset.width
    image, depth, mask, w2c, k = _synthetic_scene(h, w, 9)
    np.savez(
        tmp_path / "clip.npz",
        image=image, depth=depth, mask=mask, w2c=w2c, intrinsics=k,
    )
    args = cli.create_parser().parse_args(
        [
            "--input_video_path", str(tmp_path / "clip.npz"),
            "--model_preset", "gen3c_tiny",
            "--checkpoint_dir", str(tmp_path / "none"),
            "--num_video_frames", "9",
            "--num_steps", "2",
            "--trajectory", "none",
            "--video_save_folder", str(tmp_path / "out"),
        ]
    )
    path = cli.demo(args)
    import os

    assert os.path.exists(path) or os.path.isdir(os.path.splitext(path)[0])


def test_multiview_cli(tmp_path, tiny_model):  # noqa: F811
    from gen3c_tpu.pipelines import gen3c_multiview as cli

    _, preset = tiny_model
    h, w = preset.height, preset.width
    image, depth, mask, w2c, k = _synthetic_scene(h, w, 3)  # 3 key frames
    traj_w2c, _, _, traj_poses, traj_k = _synthetic_scene(h, w, 9)[0:5]
    np.savez(
        tmp_path / "mv.npz",
        images_key_frames=image,
        depth_key_frames=depth,
        mask_key_frames=mask,
        K_key_frames=k,
        w2cs_key_frames=w2c,
        w2cs_all=traj_poses,
        Ks_all=traj_k,
    )
    args = cli.create_parser().parse_args(
        [
            "--npz_path", str(tmp_path / "mv.npz"),
            "--model_preset", "gen3c_tiny",
            "--checkpoint_dir", str(tmp_path / "none"),
            "--num_video_frames", "9",
            "--num_steps", "2",
            "--frame_buffer_max", "2",
            "--video_save_folder", str(tmp_path / "out"),
            "--save_buffer",
        ]
    )
    path = cli.demo(args)
    import os

    assert os.path.exists(path) or os.path.isdir(os.path.splitext(path)[0])


def test_vipe_intrinsics_adjustment():
    from gen3c_tpu.pipelines.data_loaders import (
        adjust_intrinsics_for_resize_and_crop,
    )

    k = np.array([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]], np.float32)
    out = adjust_intrinsics_for_resize_and_crop(
        k, src_hw=(80, 100), resize_hw=(720, 1280), crop_hw=(704, 1280)
    )
    np.testing.assert_allclose(out[0, 0], 100 * 1280 / 100)
    np.testing.assert_allclose(out[1, 1], 100 * 720 / 80)
    np.testing.assert_allclose(out[0, 2], 50 * 12.8 - 0)
    np.testing.assert_allclose(out[1, 2], 40 * 9.0 - 8)  # (720-704)//2
