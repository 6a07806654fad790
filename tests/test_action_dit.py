"""Parity: reference ActionConditionalVideoExtendGeneralDIT (torch CPU)
vs gen3c_tpu DiT with action conditioning and converted weights
(training/networks/general_dit_action.py:276-431)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from gen3c_tpu.models.convert import convert_dit_state_dict
from gen3c_tpu.models.dit import dit_forward
from gen3c_tpu.models.dit_action import ActionDiTConfig
from tests.reference_oracle import stub_cuda_stack

CH, HEADS, BLOCKS, LORA, XATTN = 96, 4, 2, 8, 32


def _make_ref_net():
    stub_cuda_stack()
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    import sys

    sys.path.insert(0, "/root/reference")
    from cosmos_predict1.diffusion.training.networks.general_dit_action import (
        ActionConditionalVideoExtendGeneralDIT,
    )

    torch.manual_seed(0)
    net = ActionConditionalVideoExtendGeneralDIT(
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
    return ActionDiTConfig(
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
        dtype=jnp.float32,
    )


def test_action_dit_parity(ref_net):
    cfg = _cfg()
    B, T, H, W = 1, 4, 16, 16
    rng = np.random.RandomState(0)
    x = rng.randn(B, 16, T, H, W).astype(np.float32)
    mask = np.ones((B, 1, T, H, W), np.float32)
    t = np.asarray([0.7], np.float32)
    ctx = rng.randn(B, 6, XATTN).astype(np.float32)
    padding_mask = np.zeros((B, 1, H, W), np.float32)
    action = rng.randn(B, 1, 7).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_net(
            x=torch.from_numpy(x),
            timesteps=torch.from_numpy(t),
            crossattn_emb=torch.from_numpy(ctx),
            action=torch.from_numpy(action),
            fps=torch.tensor([24.0]),
            padding_mask=torch.from_numpy(padding_mask),
            condition_video_input_mask=torch.from_numpy(mask),
        ).numpy()

    params = convert_dit_state_dict(
        {k: v.numpy() for k, v in ref_net.state_dict().items()}, cfg,
        strict=True,
    )
    assert "action_embedder_B_3D" in params  # converter picked them up
    x_in = jnp.concatenate([jnp.asarray(x), jnp.asarray(mask)], axis=1)
    ours = np.asarray(
        dit_forward(
            params, cfg, x_in, jnp.asarray(t), jnp.asarray(ctx), fps=24.0,
            padding_mask=jnp.asarray(padding_mask[:, 0]),
            action=jnp.asarray(action),
        )
    )
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=2e-3, atol=2e-3)

    # the action must actually change the output (3D lora path live)
    ours2 = np.asarray(
        dit_forward(
            params, cfg, x_in, jnp.asarray(t), jnp.asarray(ctx), fps=24.0,
            padding_mask=jnp.asarray(padding_mask[:, 0]),
            action=jnp.asarray(action + 1.0),
        )
    )
    assert np.abs(ours2 - ours).max() > 1e-4


def test_action_training_step():
    """Action-conditioned training: batch carries "action" (B, T, 7)
    through the sharded step (video2world_action experiment family)."""
    import jax
    from jax.sharding import PartitionSpec as P

    from gen3c_tpu.models.dit_action import init_action_dit_params
    from gen3c_tpu.parallel.mesh import make_mesh
    from gen3c_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        make_sharded_train_step,
    )

    cfg = _cfg()
    mesh = make_mesh(dp=1, cp=1, tp=1, devices=jax.devices()[:1])
    params = init_action_dit_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(lr=1e-3, warmup_steps=1)
    step_fn, _ = make_sharded_train_step(
        mesh, cfg, opt, params, video_extend=True, first_random_n_max=1,
        extra_batch_specs={"action": P("dp")},
    )
    state = init_train_state(params, opt)
    rng = np.random.RandomState(1)
    batch = {
        "x0": jnp.asarray(rng.randn(1, 16, 4, 8, 8), jnp.float32),
        "crossattn_emb": jnp.asarray(rng.randn(1, 6, XATTN), jnp.float32),
        "extra_channels": jnp.asarray(rng.randn(1, 1, 4, 8, 8), jnp.float32),
        "action": jnp.asarray(rng.randn(1, 1, 7), jnp.float32),
    }
    w0 = np.asarray(
        state.params["action_embedder_B_3D"]["fc2"]["w"]).copy()
    for i in range(2):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["loss"]))
    # the 3D action embedder trains (it is live in the forward)
    assert not np.allclose(
        np.asarray(state.params["action_embedder_B_3D"]["fc2"]["w"]), w0)


def test_action_experiment_registered():
    """video2world_action experiments are registered with ActionDiTConfig
    and the video-extend [x, mask] channel layout (reference
    training/config/video2world_action/experiment.py family)."""
    from gen3c_tpu.utils import registry

    for name in ("video2world_action_tiny", "video2world_action_7b"):
        preset = registry.get("experiment", name)
        assert isinstance(preset.dit, ActionDiTConfig)
        assert preset.dit.in_channels == preset.dit.out_channels + 1
        assert preset.dit.action_dim == 7
