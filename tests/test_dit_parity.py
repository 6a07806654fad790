"""Full-network parity: tiny reference VideoExtendGeneralDIT (torch CPU)
vs gen3c_tpu DiT with converted weights."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from gen3c_tpu.models.convert import convert_dit_state_dict
from gen3c_tpu.models.dit import DiTConfig, dit_forward
from tests.reference_oracle import stub_cuda_stack


@pytest.fixture(scope="module")
def ref_net():
    stub_cuda_stack()
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    import sys

    sys.path.insert(0, "/root/reference")
    from cosmos_predict1.diffusion.networks.general_dit_video_conditioned import (
        VideoExtendGeneralDIT,
    )

    torch.manual_seed(0)
    net = VideoExtendGeneralDIT(
        max_img_h=16,
        max_img_w=16,
        max_frames=8,
        in_channels=16 + 16 * 4 + 1,
        out_channels=16,
        patch_spatial=2,
        patch_temporal=1,
        model_channels=96,
        block_config="FA-CA-MLP",
        num_blocks=2,
        num_heads=4,
        concat_padding_mask=True,
        pos_emb_cls="rope3d",
        pos_emb_learnable=False,
        pos_emb_interpolation="crop",
        block_x_format="THWBD",
        affline_emb_norm=True,
        use_adaln_lora=True,
        adaln_lora_dim=8,
        crossattn_emb_channels=32,
        rope_h_extrapolation_ratio=1.0,
        rope_w_extrapolation_ratio=1.0,
        rope_t_extrapolation_ratio=2.0,
    )
    net.eval()
    # randomize the zero-initialized adaLN + final layers so parity is
    # non-trivial
    with torch.no_grad():
        for name, p in net.named_parameters():
            if p.abs().sum() == 0:
                p.copy_(torch.randn_like(p) * 0.02)
    torch.Tensor.cuda = orig_cuda
    return net


CFG = DiTConfig(
    max_img_h=16,
    max_img_w=16,
    max_frames=8,
    in_channels=16 + 16 * 4 + 1,
    out_channels=16,
    model_channels=96,
    num_blocks=2,
    num_heads=4,
    crossattn_emb_channels=32,
    adaln_lora_dim=8,
    rope_t_extrapolation_ratio=2.0,
    dtype=jnp.float32,
)


def test_full_dit_parity(ref_net):
    B, T, H, W = 1, 4, 16, 16
    rng = np.random.RandomState(0)
    x = rng.randn(B, 16, T, H, W).astype(np.float32)
    mask = np.ones((B, 1, T, H, W), np.float32)
    pose = rng.randn(B, 64, T, H, W).astype(np.float32) * 0.5
    t = np.asarray([0.7], np.float32)
    ctx = rng.randn(B, 6, 32).astype(np.float32)
    padding_mask = np.zeros((B, 1, H, W), np.float32)

    with torch.no_grad():
        ref_out = ref_net(
            x=torch.from_numpy(x),
            timesteps=torch.from_numpy(t),
            crossattn_emb=torch.from_numpy(ctx),
            fps=torch.tensor([24.0]),
            padding_mask=torch.from_numpy(padding_mask),
            condition_video_input_mask=torch.from_numpy(mask),
            condition_video_pose=torch.from_numpy(pose),
        ).numpy()

    params = convert_dit_state_dict(
        {k: v.numpy() for k, v in ref_net.state_dict().items()}, CFG
    )
    x_in = jnp.concatenate(
        [jnp.asarray(x), jnp.asarray(mask), jnp.asarray(pose)], axis=1
    )
    ours = np.asarray(
        dit_forward(
            params,
            CFG,
            x_in,
            jnp.asarray(t),
            jnp.asarray(ctx),
            fps=24.0,
            padding_mask=jnp.asarray(padding_mask[:, 0]),
        )
    )
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=2e-3, atol=2e-3)
