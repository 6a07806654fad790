"""Full-network parity: tiny reference MultiviewGeneralDIT (torch CPU)
vs gen3c_tpu multiview DiT with converted weights."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from gen3c_tpu.models.convert import convert_multiview_dit_state_dict
from gen3c_tpu.models.dit_multiview import (
    MultiviewDiTConfig,
    multiview_dit_forward,
)
from tests.reference_oracle import stub_cuda_stack

V, T, H, W = 3, 2, 16, 16


@pytest.fixture(scope="module")
def ref_net():
    stub_cuda_stack()
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    import sys

    sys.path.insert(0, "/root/reference")
    from cosmos_predict1.diffusion.networks.general_dit_multiview import (
        MultiviewGeneralDIT,
    )

    torch.manual_seed(0)
    net = MultiviewGeneralDIT(
        max_img_h=H,
        max_img_w=W,
        max_frames=8,
        in_channels=16,
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
        n_views=V,
        view_condition_dim=3,
        add_repeat_frame_embedding=True,
        rope_h_extrapolation_ratio=1.0,
        rope_w_extrapolation_ratio=1.0,
        rope_t_extrapolation_ratio=1.0,
    )
    net.eval()
    with torch.no_grad():
        for name, p in net.named_parameters():
            if p.abs().sum() == 0:
                p.copy_(torch.randn_like(p) * 0.02)
    torch.Tensor.cuda = orig_cuda
    return net


def test_multiview_dit_parity(ref_net):
    cfg = MultiviewDiTConfig(
        max_img_h=H,
        max_img_w=W,
        max_frames=8,
        in_channels=16,
        model_channels=96,
        num_blocks=2,
        num_heads=4,
        adaln_lora_dim=8,
        crossattn_emb_channels=32,
        n_views=V,
        view_condition_dim=3,
        add_repeat_frame_embedding=True,
        dtype=jnp.float32,
    )
    params = convert_multiview_dit_state_dict(ref_net.state_dict(), cfg)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 16, V * T, H, W).astype(np.float32)
    t = np.array([7.0], np.float32)
    ctx = rng.randn(1, V * 4, 32).astype(np.float32)
    frame_repeat = np.array([[0.0, 1.0, 2.0]], np.float32)

    with torch.no_grad():
        ref = ref_net(
            torch.from_numpy(x),
            torch.from_numpy(t),
            torch.from_numpy(ctx),
            fps=torch.tensor([24.0]),
            padding_mask=torch.zeros(1, 1, H, W),
            frame_repeat=torch.from_numpy(frame_repeat),
        ).numpy()
    got = np.asarray(
        multiview_dit_forward(
            params, cfg, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
            fps=24.0, frame_repeat=jnp.asarray(frame_repeat),
        )
    )
    assert got.shape == ref.shape
    denom = np.abs(ref).mean() + 1e-8
    rel = np.abs(got - ref).mean() / denom
    assert rel < 2e-3, rel
