"""Checkpoint-converter hardening: structurally complete key sets.

Validates the torch->JAX converters against the EXACT key inventory a
real 7B checkpoint ships (all 28 blocks, TE _extra_state keys, EMA
'-'-mangled variants, {"model": ..., "ema": ...} wrappers — reference
inference_utils.py:217-292,327-346) and against a REAL torch.jit.save
archive of the reference tokenizer — so key-mapping drift is caught
before real weights arrive.
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gen3c_tpu.models.convert import (
    convert_dit_state_dict,
    normalize_reference_checkpoint,
)
from gen3c_tpu.models.dit import DiTConfig, init_dit_params
from tests.reference_oracle import stub_cuda_stack

CFG28 = DiTConfig(
    max_img_h=16,
    max_img_w=16,
    max_frames=8,
    in_channels=16 + 16 * 4 + 1,
    out_channels=16,
    model_channels=64,
    num_blocks=28,
    num_heads=4,
    crossattn_emb_channels=32,
    adaln_lora_dim=8,
    rope_t_extrapolation_ratio=2.0,
    dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def ref_sd_28():
    """State dict of a structurally-7B (28-block) reference net, tiny
    channels, with the non-parameter keys a real checkpoint carries."""
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
        model_channels=64,
        block_config="FA-CA-MLP",
        num_blocks=28,
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
        rope_t_extrapolation_ratio=2.0,
    )
    torch.Tensor.cuda = orig_cuda
    sd = {f"net.{k}": v for k, v in net.state_dict().items()}
    # keys a real training checkpoint additionally carries:
    # TransformerEngine FP8 metadata + the EDM logvar head
    sd["net.blocks.block0.blocks.0.block.attn._extra_state"] = torch.zeros(2)
    sd["net.blocks.block27.blocks.2.block._extra_state"] = torch.zeros(2)
    sd["logvar.0.freqs"] = torch.zeros(128)
    sd["logvar.1.weight"] = torch.zeros(1, 256)
    return sd


def test_full_28block_keyset_consumed_strict(ref_sd_28):
    """Every key of a structurally complete 7B state dict is consumed or
    recognized-skippable; the converted tree matches init_dit_params'
    structure + shapes exactly."""
    np_sd = {k: v.float().numpy() for k, v in ref_sd_28.items()}
    params = convert_dit_state_dict(np_sd, CFG28, strict=True)
    expect = init_dit_params(jax.random.PRNGKey(0), CFG28, jnp.float32)
    # identical treedef
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(expect))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(expect),
    ):
        assert a.shape == b.shape, (pa, a.shape, b.shape)


def test_strict_catches_key_mapping_drift(ref_sd_28):
    np_sd = {k: v.float().numpy() for k, v in ref_sd_28.items()}
    np_sd["net.blocks.block0.blocks.0.block.attn.to_q.0.bias"] = (
        np.zeros(64, np.float32)
    )
    with pytest.raises(ValueError, match="unconsumed"):
        convert_dit_state_dict(np_sd, CFG28, strict=True)


def test_ema_mangled_checkpoint_roundtrip(tmp_path, ref_sd_28):
    """A {"model", "ema"} wrapper with '-'-mangled EMA keys
    (inference_utils.py:337-341): the default load takes "model";
    use_ema=True overlays the de-mangled EMA values."""
    from gen3c_tpu.utils.checkpoint import load_torch_dit_checkpoint

    model_sd = {k: v.float() for k, v in ref_sd_28.items()}
    ema_sd = {
        k.replace(".", "-"): v * 0.5
        for k, v in model_sd.items()
        if "_extra_state" not in k and not k.startswith("logvar")
    }
    path = os.path.join(tmp_path, "model.pt")
    torch.save({"model": model_sd, "ema": ema_sd}, path)

    base = load_torch_dit_checkpoint(path, CFG28, dtype=jnp.float32)
    ema = load_torch_dit_checkpoint(
        path, CFG28, dtype=jnp.float32, use_ema=True
    )
    w_base = np.asarray(base["blocks"][5]["fa"]["q"]["w"])
    w_ema = np.asarray(ema["blocks"][5]["fa"]["q"]["w"])
    np.testing.assert_allclose(w_ema, w_base * 0.5, rtol=1e-6)


def test_normalize_reference_checkpoint_plain_dict(ref_sd_28):
    """A bare state dict (no wrapper) passes through unchanged."""
    sd = normalize_reference_checkpoint({"a.b": 1})
    assert sd == {"a.b": 1}


def test_torchscript_tokenizer_archive_roundtrip(tmp_path):
    """Load a REAL torch.jit.save archive produced from the reference
    tokenizer's encoder_jit()/decoder_jit() Sequentials
    (continuous_video.py:55-76) through load_torchscript_tokenizer, and
    check the extracted params match the eager state dict + drive the
    JAX VAE encode."""
    stub_cuda_stack()
    import sys

    sys.path.insert(0, "/root/reference")
    from cosmos_predict1.tokenizer.networks.continuous_video import (
        CausalContinuousVideoTokenizer,
    )

    from gen3c_tpu.models import vae as jvae
    from gen3c_tpu.utils.checkpoint import load_torchscript_tokenizer

    kw = dict(
        attn_resolutions=[16],
        channels=8,
        channels_mult=[2, 4, 4],
        dropout=0.0,
        in_channels=3,
        num_res_blocks=1,
        out_channels=3,
        resolution=64,
        patch_size=4,
        patch_method="haar",
        latent_channels=4,
        z_channels=4,
        z_factor=1,
        num_groups=1,
        legacy_mode=False,
        spatial_compression=8,
        temporal_compression=8,
        formulation="AE",
        encoder="FACTORIZED",
        decoder="FACTORIZED",
        name="CV",
    )
    torch.manual_seed(0)
    net = CausalContinuousVideoTokenizer(**kw).eval()

    x = torch.randn(1, 3, 9, 64, 64)
    with torch.no_grad():
        z = net.encode(x)[0]
    enc = torch.jit.trace(net.encoder_jit(), x, strict=False)
    dec = torch.jit.trace(net.decoder_jit(), z, strict=False)
    torch.jit.save(enc, os.path.join(tmp_path, "encoder.jit"))
    torch.jit.save(dec, os.path.join(tmp_path, "decoder.jit"))
    torch.save(
        (torch.zeros(4), torch.ones(4)), os.path.join(tmp_path, "mean_std.pt")
    )

    flat, mean, std = load_torchscript_tokenizer(str(tmp_path))
    assert mean is not None and std is not None

    # the archive's params must round-trip identically to the eager net's
    ref_flat = jvae.convert_vae_state_dict(
        {k: v.numpy() for k, v in net.state_dict().items()}
    )
    assert set(flat) == set(ref_flat), (
        set(flat) ^ set(ref_flat)
    )
    for k in ref_flat:
        np.testing.assert_array_equal(np.asarray(flat[k]),
                                      np.asarray(ref_flat[k]), err_msg=k)

    # and they must actually drive the JAX encoder
    cfg = jvae.VAEConfig(
        in_channels=3,
        out_channels=3,
        channels=8,
        channels_mult=(2, 4, 4),
        num_res_blocks=1,
        attn_resolutions=(16,),
        resolution=64,
        patch_size=4,
        latent_channels=4,
        z_channels=4,
    )
    lat = jvae.vae_encode(flat, cfg, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(
        np.asarray(lat), z.numpy(), rtol=1e-3, atol=1e-3
    )
