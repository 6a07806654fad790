"""EDM training loss for the video diffusion model.

Parity: diffusion/training/models/model.py:314-344
(compute_loss_with_epsilon_and_sigma): log-normal sigma sampling
(P_mean=0.0, P_std=1.0 on top of sigma_data scaling per EDM), per-sample
loss weight (sigma^2 + sigma_data^2) / (sigma * sigma_data)^2, MSE between
the preconditioned denoised prediction and the clean latent.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from gen3c_tpu.diffusion.scheduler import EDMEulerSchedule

Array = jax.Array


def sample_sigma(
    key: Array, batch: int, p_mean: float = 0.0, p_std: float = 1.0,
    sigma_data: float = 0.5,
) -> Array:
    """EDM log-normal sigma: sigma = exp(p_mean + p_std * N(0,1))."""
    return jnp.exp(p_mean + p_std * jax.random.normal(key, (batch,)))


def edm_loss(
    net_fn: Callable[..., Array],
    net_params,
    x0: Array,  # (B, C, T, H, W) clean latent (sigma_data-scaled)
    sigma: Array,  # (B,)
    noise: Array,  # (B, C, T, H, W)
    crossattn_emb: Array,
    extra_channels: Array,  # (B, C_extra, T, H, W) condition channels
    schedule: EDMEulerSchedule = EDMEulerSchedule(),
) -> Tuple[Array, Array]:
    """Returns (scalar loss, per-sample loss)."""
    s = sigma[:, None, None, None, None]
    xt = x0 + s * noise
    c_noise = 0.25 * jnp.log(sigma)
    x_in = jnp.concatenate(
        [xt * schedule.c_in(s), extra_channels.astype(xt.dtype)], axis=1
    )
    f = net_fn(net_params, x_in, c_noise, crossattn_emb).astype(jnp.float32)
    denoised = schedule.c_skip(s) * xt + schedule.c_out(s) * f
    weight = (s**2 + schedule.sigma_data**2) / (s * schedule.sigma_data) ** 2
    per_sample = jnp.mean(
        weight * (denoised - x0.astype(jnp.float32)) ** 2, axis=(1, 2, 3, 4)
    )
    return per_sample.mean(), per_sample
