"""Parity: reference training VideoExtendGeneralDIT with
add_augment_sigma_embedding=True (general_dit_lvg.py:132-202, torch CPU)
vs gen3c_tpu DiT with cfg.add_augment_sigma_embedding and converted
weights."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from gen3c_tpu.models.convert import convert_dit_state_dict
from gen3c_tpu.models.dit import DiTConfig, dit_forward, init_dit_params
from tests.reference_oracle import stub_cuda_stack

CH, HEADS, BLOCKS, LORA, XATTN = 96, 4, 2, 8, 32


def _make_ref_net():
    stub_cuda_stack()
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    import sys

    sys.path.insert(0, "/root/reference")
    from cosmos_predict1.diffusion.training.networks.general_dit_lvg import (
        VideoExtendGeneralDIT,
    )

    torch.manual_seed(0)
    net = VideoExtendGeneralDIT(
        max_img_h=16,
        max_img_w=16,
        max_frames=8,
        in_channels=16 + 1,
        out_channels=16,
        patch_spatial=2,
        patch_temporal=1,
        model_channels=CH,
        block_config="FA-CA-MLP",
        num_blocks=BLOCKS,
        num_heads=HEADS,
        concat_padding_mask=True,
        pos_emb_cls="rope3d",
        pos_emb_learnable=False,
        pos_emb_interpolation="crop",
        block_x_format="THWBD",
        affline_emb_norm=True,
        use_adaln_lora=True,
        adaln_lora_dim=LORA,
        crossattn_emb_channels=XATTN,
        rope_h_extrapolation_ratio=1.0,
        rope_w_extrapolation_ratio=1.0,
        rope_t_extrapolation_ratio=2.0,
        add_augment_sigma_embedding=True,
    )
    net.eval()
    with torch.no_grad():
        for name, p in net.named_parameters():
            if p.abs().sum() == 0:
                p.copy_(torch.randn_like(p) * 0.02)
    torch.Tensor.cuda = orig_cuda
    return net


@pytest.fixture(scope="module")
def ref_net():
    return _make_ref_net()


def _cfg():
    return DiTConfig(
        max_img_h=16,
        max_img_w=16,
        max_frames=8,
        in_channels=16 + 1,
        out_channels=16,
        model_channels=CH,
        num_blocks=BLOCKS,
        num_heads=HEADS,
        crossattn_emb_channels=XATTN,
        adaln_lora_dim=LORA,
        rope_t_extrapolation_ratio=2.0,
        add_augment_sigma_embedding=True,
        dtype=jnp.float32,
    )


def test_augment_sigma_dit_parity(ref_net):
    cfg = _cfg()
    B, T, H, W = 1, 4, 16, 16
    rng = np.random.RandomState(0)
    x = rng.randn(B, 16, T, H, W).astype(np.float32)
    mask = np.ones((B, 1, T, H, W), np.float32)
    t = np.asarray([0.7], np.float32)
    ctx = rng.randn(B, 6, XATTN).astype(np.float32)
    padding_mask = np.zeros((B, 1, H, W), np.float32)
    aug = np.asarray([0.3], np.float32)

    with torch.no_grad():
        ref_out = ref_net(
            x=torch.from_numpy(x),
            timesteps=torch.from_numpy(t),
            crossattn_emb=torch.from_numpy(ctx),
            fps=torch.tensor([24.0]),
            padding_mask=torch.from_numpy(padding_mask),
            condition_video_input_mask=torch.from_numpy(mask),
            condition_video_augment_sigma=torch.from_numpy(aug),
        ).numpy()

    params = convert_dit_state_dict(
        {k: v.numpy() for k, v in ref_net.state_dict().items()}, cfg,
        strict=True,
    )
    assert "augment_sigma_embedder" in params  # converter picked them up
    x_in = jnp.concatenate([jnp.asarray(x), jnp.asarray(mask)], axis=1)

    def run(aug_arr):
        return np.asarray(
            dit_forward(
                params, cfg, x_in, jnp.asarray(t), jnp.asarray(ctx),
                fps=24.0, padding_mask=jnp.asarray(padding_mask[:, 0]),
                augment_sigma=aug_arr,
            )
        )

    ours = run(jnp.asarray(aug))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=2e-3, atol=2e-3)

    # the augment sigma must actually change the output
    ours2 = run(jnp.asarray(aug + 10.0))
    assert np.abs(ours2 - ours).max() > 1e-4

    # None => zeros (the reference image-case fallback)
    with torch.no_grad():
        ref_zero = ref_net(
            x=torch.from_numpy(x),
            timesteps=torch.from_numpy(t),
            crossattn_emb=torch.from_numpy(ctx),
            fps=torch.tensor([24.0]),
            padding_mask=torch.from_numpy(padding_mask),
            condition_video_input_mask=torch.from_numpy(mask),
            condition_video_augment_sigma=torch.zeros(1),
        ).numpy()
    np.testing.assert_allclose(run(None), ref_zero, rtol=2e-3, atol=2e-3)


def test_augment_sigma_init_roundtrip():
    """init_dit_params creates the embedder slot when enabled; the
    forward runs with and without the augment_sigma argument."""
    import jax

    cfg = _cfg()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    assert "augment_sigma_embedder" in params
    x = jnp.zeros((1, 17, 2, 8, 8), jnp.float32)
    out = dit_forward(
        params, cfg, x, jnp.asarray([0.5]), jnp.zeros((1, 4, XATTN)),
        fps=24.0, augment_sigma=jnp.asarray([0.1]),
    )
    assert out.shape == (1, 16, 2, 8, 8)
