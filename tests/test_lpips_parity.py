"""LPIPS oracle parity: JAX VGG16 perceptual loss vs the REAL reference
LPIPS module (tokenizer/training/losses/lpips.py) at random weights.

The reference class wraps torchvision's vgg16 `features`; torchvision is
absent here, so the test builds the exact `features` Sequential layout
in plain torch, injects it as the stubbed torchvision.models.vgg16, and
runs the unmodified reference LPIPS.forward as the oracle (the same
random weights convert into the JAX side)."""

import sys
import types
from unittest import mock

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gen3c_tpu.training import lpips as jlpips
from tests.reference_oracle import stub_cuda_stack

pytestmark = pytest.mark.slow


def _torch_vgg16_features():
    """torchvision models.vgg16().features layout (13 convs, 5 pools)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(cin, v, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=False))
            cin = v
    return torch.nn.Sequential(*layers)


@pytest.fixture(scope="module")
def ref_lpips():
    stub_cuda_stack()
    torch.manual_seed(0)
    features = _torch_vgg16_features()

    class _FakeVGG(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.features = features

    tv = sys.modules["torchvision"]
    models_mod = types.ModuleType("torchvision.models")
    models_mod.vgg16 = lambda *a, **k: _FakeVGG()
    of = types.ModuleType("torchvision.models.optical_flow")
    of.raft = types.SimpleNamespace(
        grid_sample=torch.nn.functional.grid_sample
    )
    of.raft_large = lambda *a, **k: None
    models_mod.optical_flow = of
    tv.models = models_mod
    sys.modules["torchvision.models"] = models_mod
    sys.modules["torchvision.models.optical_flow"] = of
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    with mock.patch(
        "cosmos_predict1.tokenizer.training.losses.lpips.LPIPS."
        "load_from_pretrained",
        lambda self, *a, **k: None,
        create=True,
    ):
        from cosmos_predict1.tokenizer.training.losses.lpips import LPIPS

        with mock.patch.object(LPIPS, "load_from_pretrained",
                               lambda self, *a, **k: None):
            model = LPIPS()
    model.eval()
    return model, features


def test_lpips_matches_reference(ref_lpips):
    model, features = ref_lpips
    sd = {k: v.detach().numpy() for k, v in features.state_dict().items()}
    params = jlpips.convert_vgg16_state_dict(
        {f"features.{k}": v for k, v in sd.items()}
    )

    rng = np.random.RandomState(0)
    x = (rng.rand(2, 3, 40, 48).astype(np.float32) * 2) - 1
    y = np.clip(x + rng.randn(2, 3, 40, 48).astype(np.float32) * 0.1, -1, 1)

    with torch.no_grad():
        ref = model(torch.from_numpy(x), torch.from_numpy(y)).numpy()
    ours = np.asarray(jlpips.lpips(params, jnp.asarray(x), jnp.asarray(y)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    # identical inputs -> exactly zero
    z = np.asarray(jlpips.lpips(params, jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(z, 0.0, atol=1e-7)


def test_tokenizer_loss_with_lpips_term():
    """tokenizer_loss wires the perceptual term (finite, >0 for imperfect
    recon, differentiable)."""
    from gen3c_tpu.models import vae as jvae
    from gen3c_tpu.training.tokenizer_train import tokenizer_loss

    cfg = jvae.VAEConfig(
        channels=8, channels_mult=(2, 4, 4), num_res_blocks=1,
        attn_resolutions=(), resolution=32, patch_size=4,
        latent_channels=4, z_channels=4,
    )
    params = jvae.init_vae_params(jax.random.PRNGKey(0), cfg)
    lp = jlpips.init_vgg16_params(jax.random.PRNGKey(1))
    video = jnp.asarray(
        np.random.RandomState(2).rand(1, 3, 9, 32, 32).astype(np.float32)
        * 2 - 1
    )
    loss, metrics = tokenizer_loss(
        params, cfg, video, lpips_params=lp, w_perceptual=0.5
    )
    assert np.isfinite(float(loss))
    assert float(metrics["perceptual"]) > 0
    g = jax.grad(
        lambda p: tokenizer_loss(
            p, cfg, video, lpips_params=lp, w_perceptual=0.5
        )[0]
    )(params)
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_production_perceptual_loss_matches_reference(ref_lpips):
    """The PRODUCTION PerceptualLoss variant (continuous.py:122-209):
    layer-weighted masked L1 on RAW VGG features + the gram term, run
    against the unmodified reference class at random weights."""
    from types import SimpleNamespace

    _, features = ref_lpips
    sys.path.insert(0, "/root/reference")
    from cosmos_predict1.tokenizer.training.losses.continuous import (
        PerceptualLoss,
    )

    layer_weights = [1 / 2.6, 1 / 4.8, 1 / 3.7, 1 / 5.6, 10 / 1.5]
    config = SimpleNamespace(
        checkpoint_activations=False,
        gram_enabled=True,
        corr_enabled=False,
        layer_weights=layer_weights,
        lpips_boundaries=[0], lpips_values=[1.0, 1.0],
        gram_boundaries=[0], gram_values=[1.0, 1.0],
        corr_boundaries=[0], corr_values=[0.0, 0.0],
    )
    with mock.patch.object(PerceptualLoss, "load_from_pretrained",
                           lambda self, *a, **k: None):
        ref_model = PerceptualLoss(config)
    ref_model.eval()

    sd = {k: v.detach().numpy() for k, v in features.state_dict().items()}
    params = jlpips.convert_vgg16_state_dict(
        {f"features.{k}": v for k, v in sd.items()}
    )

    rng = np.random.RandomState(5)
    B, T, H, W = 1, 2, 40, 48
    x = (rng.rand(B, 3, T, H, W).astype(np.float32) * 2) - 1
    y = np.clip(x + rng.randn(B, 3, T, H, W).astype(np.float32) * 0.1, -1, 1)
    m = (rng.rand(B, 3, T, H, W) > 0.2).astype(np.float32)

    with torch.no_grad():
        out = ref_model(
            {"INPUT": torch.from_numpy(x), "loss_mask": torch.from_numpy(m)},
            {"reconstructions": torch.from_numpy(y)},
            iteration=1,
        )
    # reference expands the per-sample scalar over pixel dims; its mean
    # IS the per-sample value's mean
    ref_lpips_val = float(out["lpips"].mean())
    ref_gram_val = float(out["gram"].mean())

    ours_val, ours_gram = jlpips.perceptual_video(
        params, jnp.asarray(x), jnp.asarray(y),
        mask=jnp.asarray(m[:, :1]), gram=True,
    )
    np.testing.assert_allclose(float(ours_val), ref_lpips_val,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(ours_gram), ref_gram_val,
                               rtol=1e-4, atol=1e-6)
