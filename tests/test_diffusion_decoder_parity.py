"""Diffusion-decoder oracle parity vs the reference torch model.

Runs the REAL reference LatentDiffusionDecoderModel.generate_samples_from_batch
(autoregressive/diffusion_decoder/model.py:86-146) with the production
token-conditioned configuration (config/inference/
cosmos_diffusiondecoder_7b.py: condition_on_tokenizer_corruptor_token=True,
token vocab/dim, corruption off, sigma_min=0.02 scheduler) as a torch-CPU
oracle against DiffusionDecoderPipeline._refine_chunk with shared
converted weights and injected noise — the same recipe as
tests/test_loop_parity.py (VERDICT r3 'missing #3')."""

import sys
from types import SimpleNamespace
from unittest import mock

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from gen3c_tpu.models.convert import convert_dit_state_dict
from gen3c_tpu.models.dit import DiTConfig
from gen3c_tpu.pipelines.diffusion_decoder import (
    DDSamplingConfig,
    DiffusionDecoderPipeline,
)
from tests.reference_oracle import stub_cuda_stack, stub_diffusers

pytestmark = pytest.mark.slow

B, C, TL = 1, 16, 2
HT, WT = 8, 8  # token grid (16x compression)
HL, WL = 16, 16  # latent grid (8x compression)
M, XATTN = 6, 32
VOCAB, TOKEN_DIM = 64, 32
NUM_STEPS = 5
GUIDANCE = 1.8
SEED = 7
MODEL_CH, HEADS, BLOCKS, LORA = 96, 4, 2, 8


def _make_ref_net():
    stub_cuda_stack()
    stub_diffusers()
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from cosmos_predict1.autoregressive.diffusion_decoder.network import (
        DiffusionDecoderGeneralDIT,
    )

    torch.manual_seed(0)
    net = DiffusionDecoderGeneralDIT(
        max_img_h=16,
        max_img_w=16,
        max_frames=8,
        in_channels=C,
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
        rope_t_extrapolation_ratio=1.0,
        is_diffusion_decoder=True,
        diffusion_decoder_condition_on_sigma=False,
        diffusion_decoder_condition_on_token=True,
        diffusion_decoder_token_condition_voc_size=VOCAB,
        diffusion_decoder_token_condition_dim=TOKEN_DIM,
    )
    net.eval()
    with torch.no_grad():
        for _, p in net.named_parameters():
            if p.abs().sum() == 0:
                p.copy_(torch.randn_like(p) * 0.02)
    torch.Tensor.cuda = orig_cuda
    return net


def _make_conditioner():
    """The production VideoDiffusionDecoderConditioner embedder set
    (diffusion_decoder/config/base/conditioner.py:53-62, minus the
    net-unused num_frames/image_size ReMapkeys): text + fps +
    padding_mask + latent_condition (dropout 0.2: CFG DROPS the tokens)
    + latent_condition_sigma (dropout 0)."""
    from cosmos_predict1.diffusion.conditioner import TextAttr
    from cosmos_predict1.diffusion.config.base.conditioner import ReMapkey

    sys.path.insert(0, "/root/reference")
    from cosmos_predict1.autoregressive.diffusion_decoder.config.base.conditioner import (  # noqa: E501
        VideoDiffusionDecoderConditioner,
    )

    return VideoDiffusionDecoderConditioner(
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
        latent_condition=SimpleNamespace(
            obj=ReMapkey(output_key="latent_condition", dtype=None),
            dropout_rate=0.2,
            input_key="latent_condition",
        ),
        latent_condition_sigma=SimpleNamespace(
            obj=ReMapkey(output_key="latent_condition_sigma", dtype=None),
            dropout_rate=0.0,
            input_key="latent_condition_sigma",
        ),
    )


class _DummyCorruptor:
    """Satisfies LatentDiffusionDecoderModel.__init__'s tokenizer_corruptor
    plumbing (model.py:70-76); its decode output is computed but UNUSED
    in the token-conditioned preencode path (model.py:214-216)."""

    def reset_dtype(self):
        pass

    def decode(self, tokens):
        b = tokens.shape[0]
        return torch.zeros(b, 3, 1, 8, 8)


def _run_reference():
    net = _make_ref_net()
    from cosmos_predict1.autoregressive.diffusion_decoder.model import (
        LatentDiffusionDecoderModel,
    )

    config = SimpleNamespace(
        precision="float32",
        sigma_data=0.5,
        latent_shape=[C, TL, HL, WL],
        input_data_key="video",
        latent_corruptor=None,
        pixel_corruptor=None,
        tokenizer_corruptor=_DummyCorruptor(),
        diffusion_decoder_cond_sigma_low=0.0,
        diffusion_decoder_cond_sigma_high=0.0,
        diffusion_decoder_corrupt_prob=0.0,
        condition_on_tokenizer_corruptor_token=True,
    )
    model = LatentDiffusionDecoderModel(config)
    model.tensor_kwargs = {"device": "cpu", "dtype": torch.float32}
    model.model = torch.nn.ModuleDict(
        {"net": net, "conditioner": _make_conditioner()}
    )

    rng = np.random.RandomState(3)
    tokens = rng.randint(0, VOCAB, (B, 1, TL, HT, WT))
    t5 = rng.randn(B, M, XATTN).astype(np.float32)
    batch = {
        "video": torch.from_numpy(tokens).to(torch.int32),
        "t5_text_embeddings": torch.from_numpy(t5),
        "t5_text_mask": torch.ones(B, M),
        "fps": torch.tensor([24.0]),
        "padding_mask": torch.zeros(B, 1, HL, WL),
    }

    init_noise = np.random.RandomState(SEED).standard_normal(
        (B, C, TL, HL, WL)
    ).astype(np.float32)

    def _fixed_randn(*args, size=None, **kwargs):
        return torch.from_numpy(init_noise.copy())

    with torch.no_grad(), mock.patch("torch.randn", _fixed_randn):
        samples = model.generate_samples_from_batch(
            data_batch=batch,
            guidance=GUIDANCE,
            seed=SEED,
            state_shape=(C, TL, HL, WL),
            n_sample=B,
            num_steps=NUM_STEPS,
            apply_corruptor=False,
            preencode_condition=True,
        )
    return samples.numpy(), net, tokens, t5


def test_diffusion_decoder_loop_parity():
    ref, net, tokens, t5 = _run_reference()

    cfg = DiTConfig(
        max_img_h=16,
        max_img_w=16,
        max_frames=8,
        in_channels=C + TOKEN_DIM,
        out_channels=C,
        model_channels=MODEL_CH,
        num_blocks=BLOCKS,
        num_heads=HEADS,
        crossattn_emb_channels=XATTN,
        adaln_lora_dim=LORA,
        rope_t_extrapolation_ratio=1.0,
        dtype=jnp.float32,
    )
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    token_table = sd.pop("token_embedder.weight")
    params = convert_dit_state_dict(sd, cfg)
    params["token_embedder.weight"] = jnp.asarray(token_table)

    pipe = DiffusionDecoderPipeline(
        dit_params=params,
        dit_cfg=cfg,
        continuous_tokenizer=SimpleNamespace(latent_ch=C),  # latents only
        sampling=DDSamplingConfig(num_steps=NUM_STEPS, guidance=GUIDANCE),
    )
    out = np.asarray(
        pipe._refine_chunk(
            jnp.asarray(tokens, jnp.int32), jnp.asarray(t5), seed=SEED
        )
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)
