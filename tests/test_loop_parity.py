"""Loop-level sampling parity vs the reference's ACTUAL sampling loop.

Runs the reference `DiffusionV2WModel.generate_samples_from_batch`
(model_v2w.py:84-155, incl. `_augment_noise_with_latent` :201-247 and the
x0 replacement :144-147) and the `DiffusionGen3CModel` conditioning path
(model_gen3c.py:59-139) as torch-CPU oracles — real reference code, real
`VideoExtendConditioner`, real `VideoExtendGeneralDIT` — against
`gen3c_tpu.diffusion.sampler.generate_samples` end-to-end with shared
converted weights and injected noise (VERDICT r2 'missing #2' / SURVEY §7
"bit-comparable sampling").

The diffusers `EDMEulerScheduler` the reference constructs
(model_t2w.py:65) is stubbed in tests/reference_oracle.py with the same
karras/EDM semantics gen3c_tpu re-derived.
"""

import sys
from types import SimpleNamespace
from unittest import mock

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gen3c_tpu.diffusion.sampler import arch_invariant_randn, generate_samples
from gen3c_tpu.models.convert import convert_dit_state_dict
from gen3c_tpu.models.dit import DiTConfig, dit_forward
from tests.reference_oracle import stub_cuda_stack, stub_diffusers

pytestmark = pytest.mark.slow

B, C, TL, H, W = 1, 16, 4, 16, 16
M, XATTN = 6, 32
FRAME_BUFFER_MAX = 2
POSE_CH = FRAME_BUFFER_MAX * 2 * C  # video+mask latents per buffer = 64
NUM_STEPS = 5
GUIDANCE = 1.5
SEED = 7
AUG_SIGMA = 0.001
NUM_COND_T = 1
MODEL_CH, HEADS, BLOCKS, LORA = 96, 4, 2, 8


def _make_ref_net(in_channels):
    """Tiny VideoExtendGeneralDIT (same recipe as test_dit_parity)."""
    stub_cuda_stack()
    stub_diffusers()
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from cosmos_predict1.diffusion.networks.general_dit_video_conditioned import (
        VideoExtendGeneralDIT,
    )

    torch.manual_seed(0)
    net = VideoExtendGeneralDIT(
        max_img_h=16,
        max_img_w=16,
        max_frames=8,
        in_channels=in_channels,
        out_channels=C,
        patch_spatial=2,
        patch_temporal=1,
        model_channels=MODEL_CH,
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
        for _, p in net.named_parameters():
            if p.abs().sum() == 0:
                p.copy_(torch.randn_like(p) * 0.02)
    torch.Tensor.cuda = orig_cuda
    return net


def _jax_cfg(in_channels):
    return DiTConfig(
        max_img_h=16,
        max_img_w=16,
        max_frames=8,
        in_channels=in_channels,
        out_channels=C,
        model_channels=MODEL_CH,
        num_blocks=BLOCKS,
        num_heads=HEADS,
        crossattn_emb_channels=XATTN,
        adaln_lora_dim=LORA,
        rope_t_extrapolation_ratio=2.0,
        dtype=jnp.float32,
    )


def _make_conditioner():
    """The reference VideoExtendConditioner with the production embedder
    set (config/base/conditioner.py:202-218: text + fps + padding_mask;
    video_cond_bool is set explicitly by the sampling loop)."""
    from cosmos_predict1.diffusion.conditioner import (
        TextAttr,
        VideoExtendConditioner,
    )
    from cosmos_predict1.diffusion.config.base.conditioner import ReMapkey

    # lazy_config.instantiate is stubbed to identity, so obj carries the
    # real embedder instance
    return VideoExtendConditioner(
        text=SimpleNamespace(
            obj=TextAttr(),
            dropout_rate=0.2,
            input_keys=["t5_text_embeddings", "t5_text_mask"],
        ),
        fps=SimpleNamespace(
            obj=ReMapkey(output_key="fps", dtype=None),
            dropout_rate=0.0,
            input_key="fps",
        ),
        padding_mask=SimpleNamespace(
            obj=ReMapkey(output_key="padding_mask", dtype=None),
            dropout_rate=0.0,
            input_key="padding_mask",
        ),
    )


def _make_ref_model(net, kind, latent_condition=None):
    """Construct the reference diffusion model on CPU around `net`."""
    from cosmos_predict1.diffusion.model.model_gen3c import DiffusionGen3CModel
    from cosmos_predict1.diffusion.model.model_v2w import DiffusionV2WModel

    config = SimpleNamespace(
        precision="float32",
        sigma_data=0.5,
        latent_shape=[C, TL, H, W],
        input_data_key="video",
        frame_buffer_max=FRAME_BUFFER_MAX,
    )
    if kind == "v2w":
        model = DiffusionV2WModel(config)
    else:
        # inject the pose latent in place of the VAE warped-frame encode
        # (encode_warped_frames is VAE territory, parity-tested separately
        # in test_vae.py; here the loop + conditioning are under test)
        class _Gen3CInjected(DiffusionGen3CModel):
            def encode_warped_frames(self, condition_state,
                                     condition_state_mask, dtype):
                return latent_condition

        model = _Gen3CInjected(config)
    model.tensor_kwargs = {"device": "cpu", "dtype": torch.float32}
    model.model = torch.nn.ModuleDict(
        {"net": net, "conditioner": _make_conditioner()}
    )
    return model


def _data_batch(rng, kind):
    batch = {
        "t5_text_embeddings": torch.from_numpy(
            rng.randn(B, M, XATTN).astype(np.float32)
        ),
        "t5_text_mask": torch.ones(B, M),
        "fps": torch.tensor([24.0]),
        "padding_mask": torch.zeros(B, 1, H, W),
    }
    if kind == "gen3c":
        # consumed only by the injected encode_warped_frames
        batch["condition_state"] = torch.zeros(B, 3, FRAME_BUFFER_MAX, 1, 8, 8)
        batch["condition_state_mask"] = torch.zeros(
            B, 1, FRAME_BUFFER_MAX, 1, 8, 8
        )
    return batch


def _run_reference(kind):
    """Run the reference sampling loop; returns (samples, shared arrays)."""
    in_ch = C + 1 + (POSE_CH if kind == "gen3c" else 0)
    net = _make_ref_net(in_ch)
    rng = np.random.RandomState(3)
    batch = _data_batch(rng, kind)
    gt_latent = rng.randn(B, C, TL, H, W).astype(np.float32) * 0.5
    latent_condition = None
    if kind == "gen3c":
        latent_condition = torch.from_numpy(
            rng.randn(B, POSE_CH, TL, H, W).astype(np.float32) * 0.3
        )
    model = _make_ref_model(net, kind, latent_condition)

    init_noise = np.random.RandomState(11).randn(B, C, TL, H, W).astype(
        np.float32
    )

    # the loop draws its initial noise via torch.randn
    # (model_v2w.py:124); inject the shared noise there
    def _fixed_randn(*args, size=None, **kwargs):
        return torch.from_numpy(init_noise.copy())

    with torch.no_grad(), mock.patch("torch.randn", _fixed_randn):
        samples = model.generate_samples_from_batch(
            data_batch=batch,
            guidance=GUIDANCE,
            seed=SEED,
            state_shape=(C, TL, H, W),
            n_sample=B,
            num_steps=NUM_STEPS,
            condition_latent=torch.from_numpy(gt_latent),
            num_condition_t=NUM_COND_T,
            condition_augment_sigma=AUG_SIGMA,
        )
    shared = dict(
        net=net,
        crossattn=np.asarray(batch["t5_text_embeddings"]),
        gt_latent=gt_latent,
        init_noise=init_noise,
        latent_condition=(
            None if latent_condition is None else latent_condition.numpy()
        ),
    )
    return samples.numpy(), shared


def _jax_args(shared, kind):
    indicator = np.zeros((1, 1, TL, 1, 1), np.float32)
    indicator[:, :, :NUM_COND_T] = 1.0
    input_mask = np.broadcast_to(
        indicator, (B, 1, TL, H, W)
    ).astype(np.float32)
    args = dict(
        init_noise=jnp.asarray(shared["init_noise"]),
        augment_noise=jnp.asarray(
            arch_invariant_randn((B, C, TL, H, W), SEED)
        ),
        crossattn_cond=jnp.asarray(shared["crossattn"]),
        crossattn_uncond=jnp.zeros((B, M, XATTN), jnp.float32),
        gt_latent=jnp.asarray(shared["gt_latent"]),
        condition_video_indicator=jnp.asarray(indicator),
        condition_video_input_mask=jnp.asarray(input_mask),
        num_steps=NUM_STEPS,
        guidance=GUIDANCE,
        condition_augment_sigma=AUG_SIGMA,
    )
    if kind == "gen3c":
        args["pose_latent_cond"] = jnp.asarray(shared["latent_condition"])
        args["pose_latent_uncond"] = jnp.zeros_like(
            args["pose_latent_cond"]
        )
    return args


def _converted_params(net, cfg):
    return convert_dit_state_dict(
        {k: v.numpy() for k, v in net.state_dict().items()}, cfg
    )


def _net_fn(bundle, x_in, t, ctx):
    p, c = bundle
    return dit_forward(
        p, c, x_in, t, ctx, fps=24.0,
        padding_mask=jnp.zeros((x_in.shape[0], H, W), jnp.float32),
    )


@pytest.fixture(scope="module")
def gen3c_oracle():
    return _run_reference("gen3c")


def test_v2w_loop_parity():
    """35-step-loop equivalence at 5 steps: re-noise/replace + CFG,
    no warp conditioning (DiffusionV2WModel, model_v2w.py:84-155)."""
    ref, shared = _run_reference("v2w")
    cfg = _jax_cfg(C + 1)
    params = _converted_params(shared["net"], cfg)
    out = np.asarray(
        generate_samples(
            net_fn=_net_fn, net_params=(params, cfg),
            **_jax_args(shared, "v2w"),
        )
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_gen3c_loop_parity(gen3c_oracle):
    """Same, with the GEN3C warped-buffer pose conditioning incl. the
    uncond pose dropout (model_gen3c.py:59-139)."""
    ref, shared = gen3c_oracle
    cfg = _jax_cfg(C + 1 + POSE_CH)
    params = _converted_params(shared["net"], cfg)
    out = np.asarray(
        generate_samples(
            net_fn=_net_fn, net_params=(params, cfg),
            **_jax_args(shared, "gen3c"),
        )
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_gen3c_loop_parity_cp(gen3c_oracle):
    """The context-parallel shard_map sampler reproduces the reference
    loop's latents (split_inputs_cp semantics, module/parallel.py:25-87)."""
    from gen3c_tpu.parallel.cp import cp_generate_samples
    from gen3c_tpu.parallel.mesh import make_mesh

    ref, shared = gen3c_oracle
    cfg = _jax_cfg(C + 1 + POSE_CH)
    params = _converted_params(shared["net"], cfg)
    mesh = make_mesh(dp=1, cp=2, tp=1, devices=jax.devices()[:2])
    out = np.asarray(
        cp_generate_samples(
            mesh, params, cfg, **_jax_args(shared, "gen3c")
        )
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)
