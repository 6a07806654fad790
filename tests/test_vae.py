"""Golden tests: JAX causal video VAE vs reference tokenizer (torch CPU)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from gen3c_tpu.models import vae as jvae
from tests.reference_oracle import stub_cuda_stack

stub_cuda_stack()
import sys

sys.path.insert(0, "/root/reference")

from cosmos_predict1.tokenizer.modules.patching import Patcher3D, UnPatcher3D  # noqa: E402
from cosmos_predict1.tokenizer.networks.continuous_video import (  # noqa: E402
    CausalContinuousVideoTokenizer,
)

TINY_KW = dict(
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

TINY_CFG = jvae.VAEConfig(
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


@pytest.fixture(scope="module")
def ref_tok():
    torch.manual_seed(0)
    net = CausalContinuousVideoTokenizer(**TINY_KW)
    net.eval()
    return net


def test_haar_patch3d_matches_reference():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 9, 32, 32).astype(np.float32)
    ref = Patcher3D(4, "haar")(torch.from_numpy(x)).numpy()
    ours = np.asarray(jvae.haar_patch3d(jnp.asarray(x), 4))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_haar_unpatch3d_matches_reference():
    rng = np.random.RandomState(1)
    z = rng.randn(1, 192, 3, 8, 8).astype(np.float32)
    ref = UnPatcher3D(4, "haar")(torch.from_numpy(z)).numpy()
    ours = np.asarray(jvae.haar_unpatch3d(jnp.asarray(z), 4))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_haar_roundtrip():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 9, 32, 32).astype(np.float32)
    z = jvae.haar_patch3d(jnp.asarray(x), 4)
    back = np.asarray(jvae.haar_unpatch3d(z, 4))
    # first frame is replicated before the DWT; frames 1: are exact
    np.testing.assert_allclose(back[:, :, 1:], x[:, :, 1:], rtol=1e-4, atol=1e-5)


def test_vae_encode_matches_reference(ref_tok):
    params = jvae.convert_vae_state_dict(
        {k: v.numpy() for k, v in ref_tok.state_dict().items()}
    )
    rng = np.random.RandomState(3)
    x = (rng.rand(1, 3, 9, 64, 64).astype(np.float32) * 2) - 1
    with torch.no_grad():
        ref_latent, _ = ref_tok.encode(torch.from_numpy(x))
    ours = np.asarray(jvae.vae_encode(params, TINY_CFG, jnp.asarray(x)))
    assert ours.shape == tuple(ref_latent.shape), (ours.shape, ref_latent.shape)
    np.testing.assert_allclose(ours, ref_latent.numpy(), rtol=2e-3, atol=2e-4)


def test_vae_decode_matches_reference(ref_tok):
    params = jvae.convert_vae_state_dict(
        {k: v.numpy() for k, v in ref_tok.state_dict().items()}
    )
    rng = np.random.RandomState(4)
    z = rng.randn(1, 4, 2, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_tok.decode(torch.from_numpy(z)).numpy()
    ours = np.asarray(jvae.vae_decode(params, TINY_CFG, jnp.asarray(z)))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=2e-3, atol=2e-4)


def test_tokenizer_chunking_roundtrip_shapes(ref_tok):
    params = jvae.convert_vae_state_dict(
        {k: v.numpy() for k, v in ref_tok.state_dict().items()}
    )
    tok = jvae.VideoTokenizer(
        params, TINY_CFG, pixel_chunk_duration=9, spatial_resolution=(64, 64)
    )
    assert tok.latent_chunk_duration == 2
    assert tok.get_latent_num_frames(18) == 4
    assert tok.get_pixel_num_frames(4) == 18
    rng = np.random.RandomState(5)
    x = (rng.rand(1, 3, 18, 64, 64).astype(np.float32) * 2) - 1
    lat = tok.encode(jnp.asarray(x))
    assert lat.shape == (1, 4, 4, 8, 8)
    out = tok.decode(lat)
    assert out.shape == (1, 3, 18, 64, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_tokenizer_two_chunks_equal_independent_encodes(ref_tok):
    """Causal chunking: encoding 2 chunks batched == encoding separately."""
    params = jvae.convert_vae_state_dict(
        {k: v.numpy() for k, v in ref_tok.state_dict().items()}
    )
    tok = jvae.VideoTokenizer(
        params, TINY_CFG, pixel_chunk_duration=9, spatial_resolution=(64, 64)
    )
    rng = np.random.RandomState(6)
    x = (rng.rand(1, 3, 18, 64, 64).astype(np.float32) * 2) - 1
    both = np.asarray(tok.encode(jnp.asarray(x)))
    first = np.asarray(tok.encode(jnp.asarray(x[:, :, :9])))
    second = np.asarray(tok.encode(jnp.asarray(x[:, :, 9:])))
    np.testing.assert_allclose(both[:, :, :2], first, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(both[:, :, 2:], second, rtol=1e-5, atol=1e-6)
