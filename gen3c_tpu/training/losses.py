"""EDM training loss for the video diffusion model.

Parity: diffusion/training/models/model.py:314-344
(compute_loss_with_epsilon_and_sigma): log-normal sigma sampling
(P_mean=0.0, P_std=1.0 on top of sigma_data scaling per EDM), per-sample
loss weight (sigma^2 + sigma_data^2) / (sigma * sigma_data)^2, MSE between
the preconditioned denoised prediction and the clean latent.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gen3c_tpu.diffusion.scheduler import EDMEulerSchedule

Array = jax.Array


def init_logvar_params(key: Array, num_channels: int = 128) -> dict:
    """Learned per-sigma uncertainty head (model_t2w.py:111-113:
    FourierFeatures(num_channels=128, normalize=True) ->
    Linear(128, 1, bias=False)). freqs/phases are the FourierFeatures
    random buffers (blocks.py FourierFeatures.__init__); w follows the
    torch Linear default uniform(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    k1, k2, k3 = jax.random.split(key, 3)
    bound = 1.0 / np.sqrt(num_channels)
    return {
        "freqs": 2.0 * jnp.pi * jax.random.normal(k1, (num_channels,)),
        "phases": 2.0 * jnp.pi * jax.random.uniform(k2, (num_channels,)),
        "w": jax.random.uniform(
            k3, (num_channels, 1), minval=-bound, maxval=bound
        ),
    }


def logvar_fn(params: dict, sigma: Array) -> Array:
    """(B,) log-variance of the noise prediction at each sample's sigma
    (model_image.py:330: logvar(c_noise) with c_noise = log(sigma)/4;
    FourierFeatures forward = cos(x*freqs + phases) * sqrt(2))."""
    c_noise = 0.25 * jnp.log(sigma)
    feats = jnp.cos(
        c_noise[:, None] * params["freqs"][None, :] + params["phases"][None, :]
    ) * np.sqrt(2.0)
    return (feats @ params["w"])[:, 0]


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
    logvar_params: Optional[dict] = None,
) -> Tuple[Array, Array]:
    """Returns (scalar loss, per-sample EDM loss).

    With logvar_params, the scalar is the Kendall uncertainty-weighted
    loss (model_image.py:232-235, config.loss_add_logvar):
    edm * exp(-logvar(sigma)) + logvar(sigma); the per-sample aux stays
    the raw EDM term for logging (reference returns both)."""
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
    if logvar_params is not None:
        lv = logvar_fn(logvar_params, sigma)
        kendall = per_sample * jnp.exp(-lv) + lv
        return kendall.mean(), per_sample
    return per_sample.mean(), per_sample
