"""Sharded training step: EDM loss + AdamW + EMA in one jit.

The TPU-native replacement for the reference training runtime's hot path
(reference: utils/trainer.py:211-266 training_step with DDP/FSDP/TP —
here one jit over a (dp, cp, tp) mesh; XLA inserts the gradient
all-reduces that DDP/Megatron perform explicitly). Gradient accumulation,
clipping and the optimizer come from optax (replacing the apex FusedAdam,
utils/fused_adam.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gen3c_tpu.diffusion.scheduler import EDMEulerSchedule
from gen3c_tpu.models.dit import DiTConfig, dit_forward
from gen3c_tpu.training.ema import ema_update, power_ema_beta
from gen3c_tpu.training.losses import (
    condition_dropout,
    edm_loss,
    sample_condition_indicator,
    sample_sigma,
)

Array = jax.Array


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema_params: Any
    step: Array


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 0.1,
    betas: Tuple[float, float] = (0.9, 0.99),
    grad_clip: float = 1.0,
    warmup_steps: int = 1000,
    grad_accum_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW + grad-clip + linear warmup (FusedAdam + GradClip callback +
    lr_scheduler parity); grad_accum_steps > 1 wraps in optax.MultiSteps
    (the reference's grad-accumulation window, utils/trainer.py:240)."""
    schedule = optax.linear_schedule(0.0, lr, warmup_steps)
    opt = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, b1=betas[0], b2=betas[1],
                    weight_decay=weight_decay),
    )
    if grad_accum_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=grad_accum_steps)
    return opt


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        # copy=True: EMA must not alias params (donation would double-free)
        ema_params=jax.tree.map(
            lambda x: jnp.array(x, jnp.float32, copy=True), params
        ),
        step=jnp.zeros((), jnp.int32),
    )


def _net(bundle, x, t, ctx):
    params, cfg, remat, sp_sharding, *rest = bundle
    action = rest[0] if rest else None
    from gen3c_tpu.models.dit_multiview import (
        MultiviewDiTConfig,
        multiview_dit_forward,
    )

    if isinstance(cfg, MultiviewDiTConfig):
        # multiview training (extend_model_multiview.py): per-view
        # cross-attn/pos-emb forward; remat wraps the whole net (the
        # multiview forward has no per-block remat hook)
        assert action is None, "action conditioning is base-DiT only"
        fwd = lambda p, xx: multiview_dit_forward(p, cfg, xx, t, ctx,
                                                  fps=24.0)
        return jax.checkpoint(fwd)(params, x) if remat else fwd(params, x)
    return dit_forward(params, cfg, x, t, ctx, fps=24.0, remat=remat,
                       sp_sharding=sp_sharding, action=action)


def train_step(
    state: TrainState,
    batch: dict,
    rng: Array,
    cfg: DiTConfig,
    optimizer: optax.GradientTransformation,
    schedule: EDMEulerSchedule = EDMEulerSchedule(),
    remat: bool = False,
    sp_sharding=None,
    loss_add_logvar: bool = False,
    text_dropout_rate: float = 0.0,
    video_cond_dropout_rate: float = 0.0,
    loss_reduce: str = "mean",
    loss_scale: float = 1.0,
    video_extend: bool = False,
    condition_location: str = "first_random_n",
    first_random_n_min: int = 0,
    first_random_n_max: int = 4,
    random_condition_rate: float = 0.5,
    augment_sigma_multiplier: float = 4.0,
    compute_loss_for_condition_region: bool = False,
    data_type: str = "video",
) -> Tuple[TrainState, dict]:
    """One optimizer step. batch keys:
    x0 (B,16,T,H,W), crossattn_emb (B,M,1024), extra_channels
    (B,C_extra,T,H,W) condition channels (input mask + pose latents);
    optional weights_per_sample (B,) and loss_mask (broadcastable to x0)
    — model_image.py:228-231.

    text_dropout_rate / video_cond_dropout_rate: training-time CFG
    condition dropout (conditioner.py:74-81; the reference trains text
    at 0.2). loss_reduce/loss_scale: model_image.py:291-296.

    video_extend=True trains the video-extend conditioning
    (extend_model.py:206-287): a condition-region indicator is sampled
    per step (condition_location "first_random_n"/"random",
    config/base/conditioner.py:146-150) unless the batch carries
    "condition_video_indicator"; the region's xt is replaced by the
    augment-corrupted gt latent (augment sigma ~ lognormal *
    augment_sigma_multiplier, extend_model.py:82-100) and excluded from
    the loss; extra_channels' FIRST channel (the condition input mask)
    is rebuilt from the sampled indicator.

    sp_sharding: optional NamedSharding for the DiT token stream —
    Megatron sequence parallelism via GSPMD constraints (see
    dit_forward).

    data_type="image": joint image+video training, image-batch leg
    (model.py:273-306 get_data_and_condition + general_dit_lvg.py:112-117
    DataType.IMAGE): x0 may be (B,C,H,W) or (B,C,1,H,W), extra_channels
    may be omitted (zero-padded to cfg.in_channels like the reference
    net's image case), and video-extend conditioning is skipped.

    loss_add_logvar: train with the Kendall uncertainty loss
    (reference config.loss_add_logvar, model_image.py:232-235). The
    state's params must then be the wrapper tree
    {"net": dit_params, "logvar": init_logvar_params(key)} so the
    logvar head trains alongside the network.
    """
    if data_type == "image":
        # joint image+video training (model.py:286-296): image batches
        # skip video-extend conditioning and zero-pad the condition
        # channels (general_dit_lvg.py:112-117 DataType.IMAGE case)
        video_extend = False
    k_sigma, k_noise, k_drop, k_ind, k_aug_s, k_aug_n = jax.random.split(
        rng, 6)
    x0 = batch["x0"]
    if data_type == "image" and x0.ndim == 4:
        # (B, C, H, W) -> (B, C, 1, H, W), _augment_image_dim_inplace
        # (model.py:259-270)
        x0 = x0[:, :, None]
        batch = {**batch, "x0": x0}
    B = batch["x0"].shape[0]
    sigma = sample_sigma(k_sigma, B)
    noise = jax.random.normal(k_noise, batch["x0"].shape, jnp.float32)
    crossattn_emb = batch["crossattn_emb"]
    extra_channels = batch.get("extra_channels")
    if extra_channels is None:
        assert data_type == "image", "video batches require extra_channels"
        pad_c = cfg.in_channels - x0.shape[1]
        extra_channels = jnp.zeros(
            (B, pad_c, x0.shape[2], x0.shape[3], x0.shape[4]), x0.dtype)
    video_keep = None
    if text_dropout_rate > 0.0 or video_cond_dropout_rate > 0.0:
        crossattn_emb, extra_channels, video_keep = condition_dropout(
            k_drop, crossattn_emb, extra_channels,
            text_rate=text_dropout_rate,
            video_cond_rate=video_cond_dropout_rate,
        )
    indicator = augment_sigma = augment_noise = None
    if video_extend:
        indicator = batch.get("condition_video_indicator")
        if indicator is None:
            n_views = getattr(cfg, "n_views", 1)
            indicator = sample_condition_indicator(
                k_ind, B, batch["x0"].shape[2] // n_views,
                location=condition_location,
                n_min=first_random_n_min, n_max=first_random_n_max,
                random_rate=random_condition_rate, n_views=n_views,
            )
        augment_sigma = sample_sigma(k_aug_s, B) * augment_sigma_multiplier
        augment_noise = jax.random.normal(
            k_aug_n, batch["x0"].shape, jnp.float32)
        # the condition input mask channel must match the sampled region
        _, _, T, H, W = extra_channels.shape
        in_mask = jnp.broadcast_to(
            indicator.astype(extra_channels.dtype), (B, 1, T, H, W))
        if video_keep is not None:
            in_mask = in_mask * video_keep
        extra_channels = jnp.concatenate(
            [in_mask, extra_channels[:, 1:]], axis=1)

    def loss_fn(params):
        net_params = params["net"] if loss_add_logvar else params
        loss, per_sample = edm_loss(
            _net,
            (net_params, cfg, remat, sp_sharding, batch.get("action")),
            batch["x0"].astype(jnp.float32),
            sigma,
            noise,
            crossattn_emb,
            extra_channels,
            schedule,
            logvar_params=params["logvar"] if loss_add_logvar else None,
            weights_per_sample=batch.get("weights_per_sample"),
            loss_mask=batch.get("loss_mask"),
            loss_reduce=loss_reduce,
            loss_scale=loss_scale,
            condition_video_indicator=indicator,
            augment_sigma=augment_sigma,
            augment_noise=augment_noise,
            video_cond_keep=video_keep,
            compute_loss_for_condition_region=(
                compute_loss_for_condition_region),
        )
        return loss, per_sample

    (loss, per_sample), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    step = state.step + 1
    beta = power_ema_beta(step)
    ema_params = ema_update(state.ema_params, params, beta)
    metrics = {
        "loss": loss,
        "grad_norm": optax.global_norm(grads),
        "sigma_mean": sigma.mean(),
    }
    return TrainState(params, opt_state, ema_params, step), metrics


def make_sharded_train_step(
    mesh: Mesh,
    cfg: DiTConfig,
    optimizer: optax.GradientTransformation,
    params_template: Any,
    remat: bool = False,
    fsdp_axis: Optional[str] = None,
    sequence_parallel: bool = False,
    loss_add_logvar: bool = False,
    text_dropout_rate: float = 0.0,
    video_cond_dropout_rate: float = 0.0,
    loss_reduce: str = "mean",
    loss_scale: float = 1.0,
    extra_batch_specs: Optional[dict] = None,
    data_type: str = "video",
    **loss_kwargs,
):
    """jit the train step with (dp, tp) shardings over the mesh.

    extra_batch_specs: PartitionSpecs for optional batch keys beyond the
    standard three (e.g. {"weights_per_sample": P("dp"),
    "loss_mask": P("dp", None, "cp")}) — must match the batches fed in.

    Params/opt-state/EMA shard Megatron-style on 'tp'; the batch shards on
    'dp' (+ latent-T on 'cp' for context-parallel activation sharding).
    XLA inserts the dp grad all-reduce and the tp collectives.
    remat=True rematerializes DiT blocks in the backward pass;
    fsdp_axis='dp' additionally shards params/opt-state/EMA over data
    parallel (ZeRO-3 — see parallel.sharding.dit_param_pspecs).
    sequence_parallel=True enables Megatron-SP: the DiT residual stream
    is constrained to shard its token axis over 'tp' between TP matmuls
    (reference general_dit.py:221,623-630), so the partitioner emits
    reduce-scatter + all-gather around each attn/MLP in place of
    all-reduce and the norm/adaLN work runs on L/tp tokens per rank.
    """
    from gen3c_tpu.models.dit_multiview import MultiviewDiTConfig
    from gen3c_tpu.parallel.sharding import dit_param_pspecs

    if sequence_parallel and isinstance(cfg, MultiviewDiTConfig):
        raise ValueError(
            "sequence_parallel is not supported for multiview training "
            "(the multiview forward has no SP constraint hook)"
        )
    if (getattr(cfg, "attn_temporal_window", None) is not None
            and mesh.shape.get("cp", 1) > 1):
        raise ValueError(
            "attn_temporal_window training requires cp=1 (the banded "
            "splash kernel cannot partition the token axis; use dp/tp)"
        )

    # token stream (B, L, D): keep the batch on 'dp' and shard the
    # merged token axis over BOTH 'cp' and 'tp' — constraining with a
    # bare P(None, 'tp', None) would force GSPMD to re-replicate the
    # dp/cp-sharded activations at every block boundary (28 all-gathers
    # per forward), the opposite of SP's memory reduction
    sp_sharding = (
        NamedSharding(mesh, P("dp", ("cp", "tp"), None))
        if sequence_parallel else None
    )
    pspecs = dit_param_pspecs(params_template, fsdp_axis=fsdp_axis)
    param_sh = jax.tree.map(
        lambda s: NamedSharding(mesh, s), pspecs,
        is_leaf=lambda x: isinstance(x, P),
    )
    replicated = NamedSharding(mesh, P())
    if data_type == "image":
        # image batches (T=1) cannot shard the temporal axis on 'cp' —
        # the reference likewise disables CP for image batches
        # (model.py:323-339 compute_loss_with_epsilon_and_sigma)
        batch_sh = {
            "x0": NamedSharding(mesh, P("dp")),
            "crossattn_emb": NamedSharding(mesh, P("dp")),
        }
    else:
        batch_sh = {
            "x0": NamedSharding(mesh, P("dp", None, "cp")),
            "crossattn_emb": NamedSharding(mesh, P("dp")),
            "extra_channels": NamedSharding(mesh, P("dp", None, "cp")),
        }
    for k, spec in (extra_batch_specs or {}).items():
        batch_sh[k] = NamedSharding(mesh, spec)
    step_fn = partial(train_step, cfg=cfg, optimizer=optimizer, remat=remat,
                      sp_sharding=sp_sharding, data_type=data_type,
                      loss_add_logvar=loss_add_logvar,
                      text_dropout_rate=text_dropout_rate,
                      video_cond_dropout_rate=video_cond_dropout_rate,
                      loss_reduce=loss_reduce, loss_scale=loss_scale,
                      **loss_kwargs)
    # state shardings are inferred from the input state (device_put the
    # params with dit_param_shardings first — see parallel.sharding)
    return jax.jit(
        step_fn,
        in_shardings=(None, batch_sh, replicated),
        donate_argnums=(0,),
    ), param_sh
