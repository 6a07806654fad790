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
