"""Context-parallel denoising: latent-T sharded over the mesh 'cp' axis.

TPU-native replacement for the reference CP machinery
(reference: module/parallel.py:25-87 split_inputs_cp/cat_outputs_cp +
TransformerEngine ring attention, general_dit.py:524-543, and the
per-rank condition splits of model_v2w.py:126-128/241-244 and
general_dit_video_conditioned.py:102-110):

  * the whole sampling loop runs inside ONE shard_map over the mesh —
    latents, condition masks and pose latents enter sharded on latent-T
    (contiguous chunks, exactly split_inputs_cp semantics), text
    embeddings and parameters replicated;
  * self-attention uses the all-gather-KV strategy over the cp axis
    (inside gen3c_tpu.models.dit._attn_block) — one collective per layer
    riding ICI instead of TE's P2P ring;
  * positional tables are generated for the full grid and sliced per
    rank (position_embedding.py:61-79 parity);
  * the final all-gather of samples (cat_outputs_cp) is implicit in the
    shard_map output spec.

Latent T (=16) must be divisible by the cp size (parallel.py:47 parity).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gen3c_tpu.diffusion.sampler import generate_samples
from gen3c_tpu.diffusion.scheduler import EDMEulerSchedule
from gen3c_tpu.models.dit import DiTConfig, dit_forward

Array = jax.Array


def _cp_net_fn(bundle, x, t, ctx):
    params, cfg = bundle
    return dit_forward(params, cfg, x, t, ctx, fps=24.0, cp_axis="cp")


def _cp_tp_net_fn(bundle, x, t, ctx):
    params, cfg = bundle
    return dit_forward(
        params, cfg, x, t, ctx, fps=24.0, cp_axis="cp", tp_axis="tp"
    )


def _cp_span_refresh_fn(bundle, x, t, ctx):
    params, cfg = bundle
    return dit_forward(params, cfg, x, t, ctx, fps=24.0, cp_axis="cp",
                       return_span_delta=True)


def _cp_span_skip_fn(bundle, x, t, ctx, delta):
    params, cfg = bundle
    return dit_forward(params, cfg, x, t, ctx, fps=24.0, cp_axis="cp",
                       span_delta=delta)


def _cp_tp_span_refresh_fn(bundle, x, t, ctx):
    params, cfg = bundle
    return dit_forward(params, cfg, x, t, ctx, fps=24.0, cp_axis="cp",
                       tp_axis="tp", return_span_delta=True)


def _cp_tp_span_skip_fn(bundle, x, t, ctx, delta):
    params, cfg = bundle
    return dit_forward(params, cfg, x, t, ctx, fps=24.0, cp_axis="cp",
                       tp_axis="tp", span_delta=delta)


def _cp_tp_sp_net_fn(bundle, x, t, ctx):
    params, cfg = bundle
    return dit_forward(params, cfg, x, t, ctx, fps=24.0, cp_axis="cp",
                       tp_axis="tp", sp=True)


def _cp_tp_sp_span_refresh_fn(bundle, x, t, ctx):
    params, cfg = bundle
    return dit_forward(params, cfg, x, t, ctx, fps=24.0, cp_axis="cp",
                       tp_axis="tp", sp=True, return_span_delta=True)


def _cp_tp_sp_span_skip_fn(bundle, x, t, ctx, delta):
    params, cfg = bundle
    return dit_forward(params, cfg, x, t, ctx, fps=24.0, cp_axis="cp",
                       tp_axis="tp", sp=True, span_delta=delta)


def cp_generate_samples(
    mesh: Mesh,
    dit_params,
    dit_cfg: DiTConfig,
    init_noise: Array,
    augment_noise: Array,
    crossattn_cond: Array,
    crossattn_uncond: Array,
    gt_latent: Array,
    condition_video_indicator: Array,
    condition_video_input_mask: Array,
    pose_latent_cond: Array,
    pose_latent_uncond: Array,
    num_steps: int = 35,
    guidance: float = 1.0,
    condition_augment_sigma: float = 0.001,
    schedule: EDMEulerSchedule = EDMEulerSchedule(),
    step_cache_interval: int = 1,
    step_cache_threshold: float = 0.0,
    net_in_dtype=None,
    sequence_parallel: bool = False,
    solver: str = "euler",
    guidance_interval=None,
    cfg_rescale: float = 0.0,
) -> Array:
    """Context-parallel version of sampler.generate_samples.

    All tensor arguments are GLOBAL (full latent-T); sharding happens via
    the shard_map specs. Returns the full samples (implicit all-gather).

    When the mesh also has a 'tp' axis of size > 1, the DiT additionally
    runs Megatron tensor-parallel inside the same shard_map (params
    sharded per dit_param_pspecs, psum'd row-parallel outputs) — the 2D
    cp x tp serving layout. The reference composes the same two axes via
    megatron parallel_state process groups (utils/trainer.py:66-70).
    sequence_parallel=True additionally shards the residual-stream token
    axis over 'tp' between TP matmuls (Megatron-SP, reference
    general_dit.py:221,623-630; see dit_forward sp=True).
    """
    T = init_noise.shape[2]
    cp = mesh.shape["cp"]
    tp = mesh.shape.get("tp", 1)
    cfg_n = mesh.shape.get("cfg", 1)
    cfg_axis = "cfg" if cfg_n > 1 else None
    assert T % cp == 0, f"latent T={T} must divide cp={cp}"
    use_span = (
        dit_cfg.cache_block_span is not None and step_cache_interval > 1
    )
    if tp > 1:
        assert dit_cfg.num_heads % tp == 0, (
            f"num_heads={dit_cfg.num_heads} must divide tp={tp}"
        )
        from gen3c_tpu.parallel.sharding import dit_param_pspecs

        param_spec = dit_param_pspecs(dit_params)
        if sequence_parallel:
            net_fn = (_cp_tp_sp_span_refresh_fn if use_span
                      else _cp_tp_sp_net_fn)
            net_fn_skip = _cp_tp_sp_span_skip_fn if use_span else None
        else:
            net_fn = _cp_tp_span_refresh_fn if use_span else _cp_tp_net_fn
            net_fn_skip = _cp_tp_span_skip_fn if use_span else None
    else:
        if sequence_parallel:
            raise ValueError(
                "sequence_parallel requires a 'tp' mesh axis of size > 1 "
                "(Megatron-SP shards the token stream across the TP "
                "group); this mesh has tp=1"
            )
        param_spec = P()
        net_fn = _cp_span_refresh_fn if use_span else _cp_net_fn
        net_fn_skip = _cp_span_skip_fn if use_span else None

    seq = P(None, None, "cp")  # (B, C, T, H, W) sharded on T
    indic = P(None, None, "cp")  # (B, 1, T, 1, 1)
    rep = P()

    def body(
        init_noise,
        augment_noise,
        crossattn_cond,
        crossattn_uncond,
        gt_latent,
        indicator,
        input_mask,
        pose_cond,
        pose_uncond,
        params,
    ):
        return generate_samples(
            net_fn=net_fn,
            net_fn_skip=net_fn_skip,
            net_params=(params, dit_cfg),
            init_noise=init_noise,
            augment_noise=augment_noise,
            crossattn_cond=crossattn_cond,
            crossattn_uncond=crossattn_uncond,
            gt_latent=gt_latent,
            condition_video_indicator=indicator,
            condition_video_input_mask=input_mask,
            pose_latent_cond=pose_cond,
            pose_latent_uncond=pose_uncond,
            num_steps=num_steps,
            guidance=guidance,
            condition_augment_sigma=condition_augment_sigma,
            schedule=schedule,
            step_cache_interval=step_cache_interval,
            step_cache_threshold=step_cache_threshold,
            net_in_dtype=net_in_dtype,
            drift_axis="cp",
            solver=solver,
            guidance_interval=guidance_interval,
            cfg_axis=cfg_axis,
            cfg_rescale=cfg_rescale,
        )

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(seq, seq, rep, rep, seq, indic, seq, seq, seq,
                  param_spec),
        out_specs=seq,
        check_vma=False,
    )
    return mapped(
        init_noise,
        augment_noise,
        crossattn_cond,
        crossattn_uncond,
        gt_latent,
        condition_video_indicator,
        condition_video_input_mask,
        pose_latent_cond,
        pose_latent_uncond,
        dit_params,
    )
