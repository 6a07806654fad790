"""Tokenizer (video VAE) training losses + step.

Parity: cosmos_predict1/tokenizer/training/ (losses: reconstruction,
perceptual, flow/video temporal consistency). TPU-native functional
equivalents without torch-pretrained perceptual networks:

  * reconstruction: L1 + MSE mix
  * gradient (edge) loss as the dependency-free perceptual proxy
    (matches high-frequency detail the VGG perceptual term targets)
  * temporal-consistency: the reconstruction of frame differences must
    match the input's frame differences (the flow-loss objective without
    an external flow network)
  * latent regularization: small L2 on the latent (AE formulation —
    continuous_video uses IdentityDistribution, no KL)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from gen3c_tpu.models.vae import VAEConfig, vae_decode, vae_encode

Array = jax.Array


def _gradients(x: Array) -> Tuple[Array, Array]:
    dh = x[..., 1:, :] - x[..., :-1, :]
    dw = x[..., :, 1:] - x[..., :, :-1]
    return dh, dw


def tokenizer_loss(
    params: Dict[str, Array],
    cfg: VAEConfig,
    video: Array,  # (B, 3, T, H, W) in [-1, 1]
    w_l1: float = 1.0,
    w_mse: float = 1.0,
    w_grad: float = 0.5,
    w_temporal: float = 0.5,
    w_latent: float = 1e-4,
) -> Tuple[Array, dict]:
    latent = vae_encode(params, cfg, video)
    recon = vae_decode(params, cfg, latent)
    vf = video.astype(jnp.float32)
    rf = recon.astype(jnp.float32)

    l1 = jnp.mean(jnp.abs(rf - vf))
    mse = jnp.mean((rf - vf) ** 2)
    gh_r, gw_r = _gradients(rf)
    gh_v, gw_v = _gradients(vf)
    grad_loss = jnp.mean(jnp.abs(gh_r - gh_v)) + jnp.mean(jnp.abs(gw_r - gw_v))
    dt_r = rf[:, :, 1:] - rf[:, :, :-1]
    dt_v = vf[:, :, 1:] - vf[:, :, :-1]
    temporal = jnp.mean(jnp.abs(dt_r - dt_v))
    latent_reg = jnp.mean(latent.astype(jnp.float32) ** 2)

    loss = (
        w_l1 * l1
        + w_mse * mse
        + w_grad * grad_loss
        + w_temporal * temporal
        + w_latent * latent_reg
    )
    return loss, {
        "loss": loss,
        "l1": l1,
        "mse": mse,
        "grad": grad_loss,
        "temporal": temporal,
    }


def tokenizer_train_step(
    params: Any,
    opt_state: Any,
    video: Array,
    cfg: VAEConfig,
    optimizer: optax.GradientTransformation,
) -> Tuple[Any, Any, dict]:
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: tokenizer_loss(p, cfg, video), has_aux=True
    )(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, metrics
