"""Golden tests: camera trajectories + depth alignment vs reference."""

import numpy as np
import torch

import jax.numpy as jnp

from gen3c_tpu.ops import camera
from tests.reference_oracle import load_reference_geometry

_, cam_utils, _ = load_reference_geometry()


def _initial_pose():
    w2c = np.eye(4, dtype=np.float32)
    k = np.array([[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1]], np.float32)
    return w2c, k


def test_trajectories_match_reference():
    w2c, k = _initial_pose()
    for traj in ["left", "right", "up", "down", "zoom_in", "zoom_out",
                 "clockwise", "counterclockwise"]:
        for rot in ["center_facing", "no_rotation", "trajectory_aligned"]:
            ref_w2cs, ref_ks = cam_utils.generate_camera_trajectory(
                traj,
                torch.from_numpy(w2c),
                torch.from_numpy(k),
                num_frames=9,
                movement_distance=0.3,
                camera_rotation=rot,
                center_depth=2.0,
                device="cpu",
            )
            ours_w2cs, ours_ks = camera.generate_camera_trajectory(
                traj, w2c, k, num_frames=9, movement_distance=0.3,
                camera_rotation=rot, center_depth=2.0,
            )
            np.testing.assert_allclose(
                np.asarray(ours_w2cs), ref_w2cs.numpy(), rtol=1e-4, atol=1e-5,
                err_msg=f"{traj}/{rot}",
            )
            np.testing.assert_allclose(np.asarray(ours_ks), ref_ks.numpy())


def test_align_depth_rigid_matches_reference():
    rng = np.random.RandomState(0)
    h, w = 24, 32
    true = (2 + rng.rand(h, w)).astype(np.float32)
    source = true * 1.7 + 0.2  # mis-scaled depth
    mask = rng.rand(h, w) > 0.3
    ref = cam_utils.align_depth(
        torch.from_numpy(source),
        torch.from_numpy(true),
        torch.from_numpy(mask),
        alignment_method="rigid",
    ).numpy()
    ours = np.asarray(
        camera.align_depth(source, true, mask, alignment_method="rigid")
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_align_depth_nonrigid_matches_reference():
    rng = np.random.RandomState(1)
    h, w = 16, 20
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    true = (2 + 0.5 * np.sin(3 * xx) + 0.3 * yy).astype(np.float32)
    source = (true * (1.3 + 0.1 * xx) + 0.1).astype(np.float32)
    mask = np.ones((h, w), bool)
    mask[:2] = False
    k = np.array([[20.0, 0, 10], [0, 20.0, 8], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)

    ref = cam_utils.align_depth(
        torch.from_numpy(source),
        torch.from_numpy(true),
        torch.from_numpy(mask),
        k=torch.from_numpy(k),
        c2w=torch.from_numpy(c2w),
        alignment_method="non_rigid",
        num_iters=100,
        lambda_arap=0.1,
        smoothing_kernel_size=3,
    ).detach().numpy()
    ours = np.asarray(
        camera.align_depth(
            source, true, mask, k=k, c2w=c2w, alignment_method="non_rigid"
        )
    )
    # Two independent 100-step Adam runs; allow small drift, check masked fit.
    diff = np.abs(ours - ref)[mask]
    assert np.mean(diff) < 0.02, np.mean(diff)
    assert np.quantile(diff, 0.95) < 0.05


def test_look_at_matrix_matches_reference():
    pos = np.array([0.3, -0.2, 0.1])
    tgt = np.array([0.0, 0.0, 2.0])
    ref = cam_utils.look_at_matrix(
        torch.from_numpy(pos).float(), torch.from_numpy(tgt).float()
    ).numpy()
    ours = camera.look_at_matrix(pos, tgt)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
