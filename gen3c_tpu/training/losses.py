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


def condition_dropout(
    key: Array,
    crossattn_emb: Array,  # (B, M, D)
    extra_channels: Array,  # (B, C_extra, T, H, W)
    text_rate: float = 0.2,
    video_cond_rate: float = 0.0,
) -> Tuple[Array, Array, Array]:
    """Training-time CFG condition dropout (conditioner.py:74-81 +
    config/base/conditioner.py:44-49).

    Text embeddings are zeroed PER SAMPLE with probability text_rate
    (BaseConditionEntry.random_dropout_input: bernoulli(1-rate) per
    batch row). The video conditioning flag is a PER BATCH Bernoulli
    (BooleanFlag.random_dropout_input draws torch.ones(1)): when
    dropped, video_cond_bool=False zeroes the condition input mask and
    the GEN3C pose latents (model_v2w.py:75-80, model_gen3c.py:126-128)
    — here, the whole extra_channels block.

    Returns (crossattn_emb, extra_channels, video_keep) — video_keep is
    the scalar 0/1 flag so video-extend training can also drop the
    condition-region latent replacement (extend_model.py:185-205,
    cfg_unconditional_type="zero_condition_region_condition_mask")."""
    k_text, k_vid = jax.random.split(key)
    B = crossattn_emb.shape[0]
    keep_text = jax.random.bernoulli(
        k_text, 1.0 - text_rate, (B,)
    ).astype(crossattn_emb.dtype)
    crossattn_emb = crossattn_emb * keep_text[:, None, None]
    keep_vid = jax.random.bernoulli(k_vid, 1.0 - video_cond_rate, ()).astype(
        extra_channels.dtype
    )
    return crossattn_emb, extra_channels * keep_vid, keep_vid


def sample_condition_indicator(
    key: Array,
    batch: int,
    latent_t: int,
    location: str = "first_random_n",
    n_min: int = 0,
    n_max: int = 4,
    random_rate: float = 0.5,
    n_views: int = 1,
) -> Array:
    """(B,1,n_views*T,1,1) training condition-region indicator
    (config/base/conditioner.py:146-150 + extend_model
    add_condition_video_indicator_and_video_input_mask "first_random_n"
    / "random" branches): "first_random_n" marks the first n latent
    frames with n ~ U{n_min..n_max} per sample; "random" marks each
    frame i.i.d. Bernoulli(random_rate). latent_t is the PER-VIEW
    latent length; with n_views>1 the same per-view pattern repeats for
    every view (extend_model_multiview.py:195-230 rearranges
    (V T) -> V,T, marks the first n of each view, and folds back)."""
    if location == "first_random_n":
        n = jax.random.randint(key, (batch,), n_min, n_max + 1)
        ind = (jnp.arange(latent_t)[None, :] < n[:, None]).astype(jnp.float32)
    elif location == "random":
        ind = jax.random.bernoulli(
            key, random_rate, (batch, latent_t)
        ).astype(jnp.float32)
    elif location == "first_and_last_1":
        # world-interpolator training (training/models/interpolator.py:
        # 87-95): the first and last num_condition_t (=n_max here)
        # latent frames are the condition region
        t = jnp.arange(latent_t)[None, :]
        ind = ((t < n_max) | (t >= latent_t - n_max)).astype(jnp.float32)
        ind = jnp.broadcast_to(ind, (batch, latent_t))
    else:
        raise ValueError(f"Unknown condition_location {location}")
    if n_views > 1:
        ind = jnp.tile(ind, (1, n_views))
    return ind[:, None, :, None, None]


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
    weights_per_sample: Optional[Array] = None,  # (B,) e.g. aesthetic
    loss_mask: Optional[Array] = None,  # broadcastable to x0
    loss_reduce: str = "mean",
    loss_scale: float = 1.0,
    condition_video_indicator: Optional[Array] = None,  # (B,1,T,1,1)
    augment_sigma: Optional[Array] = None,  # (B,) condition corruption
    augment_noise: Optional[Array] = None,  # like x0
    video_cond_keep: Optional[Array] = None,  # scalar 0/1 CFG flag
    compute_loss_for_condition_region: bool = False,
) -> Tuple[Array, Array]:
    """Returns (scalar loss, per-sample EDM loss).

    With logvar_params, the scalar is the Kendall uncertainty-weighted
    loss (model_image.py:232-235, config.loss_add_logvar):
    edm * exp(-logvar(sigma)) + logvar(sigma); the per-sample aux stays
    the raw EDM term for logging (reference returns both).

    weights_per_sample / loss_mask: extra per-sample weight (aesthetic,
    camera) and per-element mask (human faces/hands),
    model_image.py:228-231. loss_reduce/loss_scale: model_image.py:291-296
    — "mean" averages over all elements; "sum" sums each sample's
    elements before the batch mean (the logvar term then scales by the
    element count, since the reference adds it per element).

    Video-extend training (extend_model.py:206-287 denoise): with
    condition_video_indicator, the condition region of xt is replaced by
    the augment-corrupted gt latent (x0 + augment_noise*augment_sigma),
    rescaled by c_in(augment_sigma)/c_in(sigma) so the later c_in(sigma)
    multiply lands it at c_in(augment_sigma)*augment_latent
    (extend_model.py:165-183); the x0 prediction's condition region is
    replaced by the gt latent (zero loss there) unless
    compute_loss_for_condition_region. video_cond_keep=0 zeroes the
    replacement region (CFG uncond, extend_model.py:185-205)."""
    s = sigma[:, None, None, None, None]
    xt = x0 + s * noise
    if condition_video_indicator is not None:
        ind = condition_video_indicator.astype(jnp.float32)
        if augment_sigma is None:
            augment_sigma = jnp.zeros_like(sigma)
        aug_s = augment_sigma[:, None, None, None, None]
        augment_latent = x0.astype(jnp.float32)
        if augment_noise is not None:
            augment_latent = augment_latent + augment_noise * aug_s
        # c_in(aug)/c_in(s) pre-scale (cancelled by the c_in(s) below)
        augment_latent = augment_latent * (
            schedule.c_in(aug_s) / schedule.c_in(s)
        )
        if video_cond_keep is not None:
            augment_latent = augment_latent * video_cond_keep
        xt = ind * augment_latent + (1.0 - ind) * xt
    c_noise = 0.25 * jnp.log(sigma)
    x_in = jnp.concatenate(
        [xt * schedule.c_in(s), extra_channels.astype(xt.dtype)], axis=1
    )
    f = net_fn(net_params, x_in, c_noise, crossattn_emb).astype(jnp.float32)
    denoised = schedule.c_skip(s) * xt + schedule.c_out(s) * f
    if (condition_video_indicator is not None
            and not compute_loss_for_condition_region):
        # x0_pred_replaced (extend_model.py:272-277): gt in the
        # condition region -> that region contributes zero loss
        ind = condition_video_indicator.astype(jnp.float32)
        denoised = ind * x0.astype(jnp.float32) + (1.0 - ind) * denoised
    weight = (s**2 + schedule.sigma_data**2) / (s * schedule.sigma_data) ** 2
    mse = (denoised - x0.astype(jnp.float32)) ** 2
    if loss_mask is not None:
        mse = mse * loss_mask.astype(jnp.float32)
    per_sample = jnp.mean(weight * mse, axis=(1, 2, 3, 4))
    if weights_per_sample is not None:
        per_sample = per_sample * weights_per_sample.astype(jnp.float32)
    if logvar_params is not None:
        lv = logvar_fn(logvar_params, sigma)
        kendall = per_sample * jnp.exp(-lv) + lv
    else:
        kendall = per_sample
    if loss_reduce == "sum":
        numel = np.prod(x0.shape[1:])
        return kendall.mean() * float(numel) * loss_scale, per_sample
    if loss_reduce != "mean":
        raise ValueError(f"Invalid loss_reduce: {loss_reduce}")
    return kendall.mean() * loss_scale, per_sample
