"""EDM-Euler video sampling loop with conditioned-region replacement + CFG.

Parity target: DiffusionV2WModel.generate_samples_from_batch and
_augment_noise_with_latent (reference: model_v2w.py:84-259), used
unchanged by DiffusionGen3CModel.

TPU-first design: the whole num_steps loop runs inside ONE jit as a
lax.fori_loop over precomputed (sigma, sigma_next, c_noise) tables, and
the CFG pair (condition / uncondition) is evaluated as a single batched
DiT forward of size 2B instead of two sequential forwards — same math,
half the kernel launches, and the MXU sees twice the batch.

Noise parity: the reference re-generates the SAME augmentation noise
every step from np.random.RandomState(seed) (misc.arch_invariant_rand,
model_v2w.py:232-237); we generate it once on the host and pass it in.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gen3c_tpu.diffusion.scheduler import EDMEulerSchedule
from gen3c_tpu.models.conditioner import VideoExtendCondition

Array = jax.Array


def arch_invariant_randn(shape, seed: Optional[int] = None) -> np.ndarray:
    """Architecture-invariant normal noise (misc.py:133-155 parity)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal(shape).astype(np.float32)


def guidance_interval_steps(
    schedule: EDMEulerSchedule, num_steps: int, guidance_interval
) -> tuple:
    """Static per-step CFG activity from a sigma interval.

    Returns ``(i0, i1)``: the unconditional forward (CFG) runs on steps
    ``i0 <= i < i1``; steps outside run a condition-only forward with
    the guidance term dropped — the limited-interval guidance of
    Kynkäänniemi et al. (arXiv:2404.07724), which both improves sample
    quality at high guidance scales and skips ~half the network compute
    on the inactive steps. The EDM sigma schedule is strictly
    decreasing, so the active set is contiguous by construction and the
    split is fully static (no traced control flow).

    The reference pipeline has no such knob (it runs the CFG pair every
    step — model_v2w.py:130-149); this is a TPU-side extra, quality-
    gated at toy scale by diffusion/quality.py.
    """
    lo, hi = float(guidance_interval[0]), float(guidance_interval[1])
    if not (0.0 <= lo <= hi):
        raise ValueError(
            f"guidance_interval must satisfy 0 <= lo <= hi, got ({lo}, {hi})"
        )
    sig = np.asarray(schedule.sigmas(num_steps), np.float64)[:num_steps]
    active = (sig >= lo) & (sig <= hi)
    idx = np.nonzero(active)[0]
    if idx.size == 0:
        return 0, 0
    return int(idx[0]), int(idx[-1]) + 1


def _per_sample_std(x: Array, shard_axis: Optional[str] = None) -> Array:
    """Per-sample std over all non-batch dims — GLOBAL when the tensor
    is sharded over a named mesh axis (psum'd moments), matching the
    single-device value up to fp reduction order."""
    axes = tuple(range(1, x.ndim))
    if shard_axis is None:
        return jnp.std(x, axis=axes, keepdims=True)
    n_local = 1
    for a in axes:
        n_local *= x.shape[a]
    s1 = jax.lax.psum(jnp.sum(x, axis=axes, keepdims=True), shard_axis)
    s2 = jax.lax.psum(jnp.sum(x * x, axis=axes, keepdims=True),
                      shard_axis)
    n = n_local * jax.lax.axis_size(shard_axis)
    mean = s1 / n
    return jnp.sqrt(jnp.maximum(s2 / n - mean * mean, 0.0))


def apply_cfg(
    out_cond: Array,
    out_uncond: Array,
    guidance: float,
    cfg_rescale: float = 0.0,
    shard_axis: Optional[str] = None,
) -> Array:
    """CFG combine + optional rescale (Lin et al., arXiv:2305.08891).

    net_output = cond + g*(cond - uncond) — the reference combine
    (model_v2w.py:130-149). cfg_rescale=phi>0 additionally rescales the
    combined output so its per-sample std matches the conditioned
    branch's (the paper's fix for high-guidance oversaturation), then
    blends: phi*rescaled + (1-phi)*combined. phi=0 (default) is exactly
    the reference CFG; the reference has no such knob.

    shard_axis: mesh axis name the tensors are token-sharded over
    (context parallelism) — the stds are then computed globally so the
    rescale matches the single-device value.
    """
    out = out_cond + guidance * (out_cond - out_uncond)
    if cfg_rescale <= 0:
        return out
    std_c = _per_sample_std(out_cond, shard_axis)
    std_o = _per_sample_std(out, shard_axis)
    rescaled = out * (std_c / jnp.maximum(std_o, 1e-6))
    return cfg_rescale * rescaled + (1.0 - cfg_rescale) * out


def _net_inputs(x_scaled: Array, condition: VideoExtendCondition) -> Array:
    """Channel-concat [x, condition_video_input_mask, condition_video_pose]
    (VideoExtendGeneralDIT.forward, general_dit_video_conditioned.py:97-118).
    """
    parts = [x_scaled, condition.condition_video_input_mask.astype(x_scaled.dtype)]
    if condition.condition_video_pose is not None:
        parts.append(condition.condition_video_pose.astype(x_scaled.dtype))
    return jnp.concatenate(parts, axis=1)


@partial(
    jax.jit,
    static_argnames=(
        "net_fn",
        "num_steps",
        "guidance",
        "condition_augment_sigma",
        "schedule",
        "step_cache_interval",
        "step_cache_threshold",
        "net_fn_skip",
        "net_in_dtype",
        "drift_axis",
        "cfg_sequential",
        "solver",
        "guidance_interval",
        "cfg_axis",
        "cfg_rescale",
    ),
)
def generate_samples(
    net_fn: Callable[..., Array],
    net_params,  # traced pytree passed through to net_fn
    init_noise: Array,  # (B, C, T, H, W) ~ N(0,1)
    augment_noise: Array,  # (B, C, T, H, W) — fixed across steps
    crossattn_cond: Array,  # (B, M, 1024)
    crossattn_uncond: Array,  # (B, M, 1024)
    gt_latent: Array,  # (B, C, T, H, W)
    condition_video_indicator: Array,  # (B or 1, 1, T, 1, 1)
    condition_video_input_mask: Optional[Array] = None,  # (B, 1, T, H, W)
    pose_latent_cond: Optional[Array] = None,  # (B, P, T, H, W)
    pose_latent_uncond: Optional[Array] = None,  # (B, P, T, H, W)
    num_steps: int = 35,
    guidance: float = 1.0,
    condition_augment_sigma: float = 0.001,
    schedule: EDMEulerSchedule = EDMEulerSchedule(),
    step_cache_interval: int = 1,
    step_cache_threshold: float = 0.0,
    net_fn_skip: Optional[Callable[..., Array]] = None,
    net_in_dtype=None,
    drift_axis: Optional[str] = None,
    cfg_sequential: bool = False,
    solver: str = "euler",
    guidance_interval: Optional[tuple] = None,
    cfg_axis: Optional[str] = None,
    cfg_rescale: float = 0.0,
) -> Array:
    """Run the full denoising loop; returns the final latent (B,C,T,H,W).

    guidance_interval=(sigma_lo, sigma_hi) restricts CFG to the steps
    whose sigma lies inside the interval (Kynkäänniemi et al.,
    arXiv:2404.07724): outside it, only the CONDITIONED forward runs
    (batch B instead of 2B — about half the step cost) and the guidance
    term is dropped. Because the sigma schedule is strictly decreasing,
    the active steps form one static contiguous range, and the loop
    compiles as up to three fori_loop segments with static shapes.
    Composable with the fixed-interval step cache (the cache's uncond
    half is refreshed on re-entry into the CFG range); NOT composable
    with adaptive/span caching. None (default) = reference CFG on every
    step.

    solver: integration rule for the denoise trajectory at EQUAL network
    cost (one CFG forward per step): "euler" (default, reference v2w
    loop), "dpm2m" (DPM-Solver++(2M) x0-multistep), or "res2ab" (the
    reference Sampler's exponential-integrator AB2,
    functional/multi_step.py "2ab"). The conditioned-region replacement
    runs per step in x0 space exactly as in the euler loop. Multistep
    solvers are not supported together with step caching.

    net_fn(net_params, x_in, c_noise_t, crossattn_emb) -> (B, C, T, H, W)
    raw DiT output; x_in already carries the concatenated condition
    channels. net_fn must be a stable (hashable) callable — it is a jit
    static argument; net_params is traced.

    step_cache_interval > 1 enables training-free output caching
    (Delta-DiT / SmoothCache / FORA family, arXiv:2406.01125,
    2411.10510): the DiT runs on every `interval`-th step (plus a 2-step
    warmup and 2-step tail where the trajectory changes fastest); skipped
    steps reuse the cached raw network output, re-preconditioned with the
    CURRENT sigma and latent. Denoise wall-clock scales by roughly
    (refreshed steps / num_steps) at the quality cost characterized in
    those papers. interval=1 is bit-identical to the uncached loop.

    cfg_sequential=True evaluates the CFG pair as two sequential B-sized
    DiT forwards instead of one batched 2B forward — identical math, at
    the cost of reading the weights twice per step (~10 ms at HBM
    bandwidth vs a ~30 s step). NOTE: inside this whole-loop jit it does
    NOT reduce XLA temp memory at the production shape (measured 11.2 GB
    vs 9.5 GB batched — XLA schedules the two calls' temps together;
    scripts/probe_sampler_memory.py). It DOES halve the single-step
    program's temp in generate_samples_host_loop, which is where the
    memory-constrained path uses it if the batched step ever regresses.
    Incompatible with span caching (net_fn_skip).

    cfg_axis names a 2-rank mesh axis that CFG-PARALLELIZES the pair:
    inside a shard_map over that axis, rank 0 runs the conditioned
    forward and rank 1 the unconditioned one (batch B each instead of
    the 2B batched pair), and the guidance combine is ONE psum of the
    weighted outputs ((1+g)*cond - g*uncond) — ~22 MB of latent per
    step riding ICI, vs per-layer collectives for context parallelism.
    The reference has no CFG parallelism (it batches the pair on every
    GPU). Composes with guidance_interval (inactive steps compute the
    cond forward replicated on both ranks, zero communication) and
    fixed-interval step caching (the cache holds the COMBINED B-sized
    net_output); not with adaptive/span caching or cfg_sequential.

    step_cache_threshold > 0 switches to ADAPTIVE caching (TeaCache
    family, arXiv:2411.19108): the relative L1 drift of the scaled
    latent between consecutive steps accumulates, and the DiT only
    refreshes when the accumulated drift crosses the threshold (the
    drift of the model input upper-bounds the drift of its output on a
    smooth trajectory) — refreshes concentrate where the trajectory
    actually bends instead of on a fixed grid. Warmup/tail steps always
    refresh; `step_cache_interval` is ignored in this mode. TeaCache's
    fitted per-model polynomial input-rescaling is intentionally
    omitted (no fitted coefficients exist for GEN3C; the raw ratio is
    the conservative choice). threshold=0 with interval<=1 is the
    exact uncached loop.

    net_fn_skip enables Delta-DiT SPAN caching instead (arXiv:
    2406.01125): net_fn must then return (raw_out, span_delta) and
    net_fn_skip(net_params, x_in, t, ctx, span_delta) -> raw_out runs
    only the blocks outside cfg.cache_block_span, re-applying the
    cached delta — skipped steps still track the current latent through
    the out-of-span blocks (higher fidelity than whole-output reuse at
    a smaller speedup). Refresh cadence comes from step_cache_interval
    (warmup/tail always refresh).
    """
    sigmas = jnp.asarray(schedule.sigmas(num_steps))  # (num_steps+1,)
    c_noises = jnp.asarray(schedule.timesteps(num_steps))  # (num_steps,)

    xt0 = init_noise.astype(jnp.float32) * schedule.init_noise_sigma
    aug = condition_augment_sigma
    gt = gt_latent.astype(jnp.float32)
    indicator_base = condition_video_indicator.astype(jnp.float32)
    # condition region latents, augmented once (noise is identical per step)
    augment_latent = (gt + augment_noise.astype(jnp.float32) * aug) * schedule.c_in(
        aug
    )

    crossattn_both = jnp.concatenate([crossattn_cond, crossattn_uncond], axis=0)
    B = init_noise.shape[0]

    if cfg_sequential and net_fn_skip is not None:
        raise ValueError("cfg_sequential is not supported with span "
                         "caching (net_fn_skip)")

    def _net_call(x_in: Array, t_in: Array) -> Array:
        """One CFG evaluation: batched [cond|uncond] forward, or two
        sequential B-sized forwards (halved temp memory)."""
        if not cfg_sequential:
            return net_fn(net_params, x_in, t_in, crossattn_both)
        out_c = net_fn(net_params, x_in[:B], t_in[:B], crossattn_cond)
        out_u = net_fn(net_params, x_in[B:], t_in[B:], crossattn_uncond)
        return jnp.concatenate([out_c, out_u], axis=0)

    # net inputs may be assembled in the network's compute dtype
    # (bf16 for the 7B): the DiT casts to its dtype on entry anyway, and
    # building the (2B, 146ch) concat in fp32 costs 2x the HBM — at the
    # production shape the fp32 x_in alone is ~0.5 GB. Euler/CFG math
    # stays fp32 regardless.
    in_dtype = jnp.float32 if net_in_dtype is None else net_in_dtype

    def _step_parts(i, xt):
        """Shared per-step construction: conditioned-region re-noise and
        the cond / uncond network inputs (not yet batched)."""
        sigma = sigmas[i]
        t = c_noises[i]
        indicator = jnp.where(aug >= sigma, jnp.zeros_like(indicator_base),
                              indicator_base)
        augment_latent_unscaled = augment_latent / schedule.c_in(sigma)
        new_xt = indicator * augment_latent_unscaled + (1 - indicator) * xt
        new_xt_scaled = (new_xt * schedule.c_in(sigma)).astype(in_dtype)

        cond_parts = [new_xt_scaled]
        uncond_parts = [new_xt_scaled]
        if condition_video_input_mask is not None:
            m = condition_video_input_mask.astype(in_dtype)
            cond_parts.append(m)
            uncond_parts.append(m)
        if pose_latent_cond is not None:
            cond_parts.append(pose_latent_cond.astype(in_dtype))
            uncond_parts.append(pose_latent_uncond.astype(in_dtype))
        x_cond = jnp.concatenate(cond_parts, axis=1)
        x_uncond = jnp.concatenate(uncond_parts, axis=1)
        return sigma, t, indicator, new_xt, x_cond, x_uncond

    def _step_inputs(i, xt):
        """Shared per-step construction: conditioned-region re-noise and
        the batched [cond | uncond] CFG network input."""
        sigma, t, indicator, new_xt, x_cond, x_uncond = _step_parts(i, xt)
        x_in = jnp.concatenate([x_cond, x_uncond], axis=0)
        t_in = jnp.broadcast_to(t[None], (2 * B,))
        return sigma, indicator, new_xt, x_in, t_in

    def _net_call_cond(x_cond: Array, t: Array) -> Array:
        """Condition-only forward (batch B) for guidance-interval steps."""
        t_in = jnp.broadcast_to(t[None], (B,))
        return net_fn(net_params, x_cond, t_in, crossattn_cond)

    def _finish(i, sigma, indicator, new_xt, net_output):
        """Conditioned-region replacement + Euler step."""
        latent_unscaled = schedule.reverse_precondition_output(
            gt, new_xt, sigma
        )
        new_output = (
            indicator * latent_unscaled + (1 - indicator) * net_output
        )
        return schedule.step(new_output, new_xt, sigma, sigmas[i + 1])

    def _step_outputs(i, sigma, indicator, new_xt, net_out):
        """Shared CFG combine + conditioned-region replacement + Euler."""
        out_cond, out_uncond = net_out[:B], net_out[B:]
        net_output = apply_cfg(out_cond, out_uncond, guidance, cfg_rescale,
                               shard_axis=drift_axis)
        return _finish(i, sigma, indicator, new_xt, net_output)

    def body(i, xt):
        sigma, indicator, new_xt, x_in, t_in = _step_inputs(i, xt)
        net_out = _net_call(x_in, t_in).astype(jnp.float32)
        return _step_outputs(i, sigma, indicator, new_xt, net_out)

    def body_cond(i, xt):
        """Guidance-interval inactive step: condition-only forward."""
        sigma, t, indicator, new_xt, x_cond, _ = _step_parts(i, xt)
        out_c = _net_call_cond(x_cond, t).astype(jnp.float32)
        return _finish(i, sigma, indicator, new_xt, out_c)

    # guidance interval -> static contiguous CFG-active range [gi0, gi1)
    gi = None
    if guidance_interval is not None:
        gi = guidance_interval_steps(schedule, num_steps, guidance_interval)
        if gi == (0, num_steps):
            gi = None  # full interval: keep the single-loop program
        elif step_cache_threshold > 0 or net_fn_skip is not None:
            raise ValueError(
                "guidance_interval composes with the plain and fixed-"
                "interval-cached loops only (not adaptive/span caching)"
            )

    if cfg_axis is not None:
        if step_cache_threshold > 0 or net_fn_skip is not None:
            raise ValueError(
                "cfg_axis composes with the plain and fixed-interval-"
                "cached loops only (not adaptive/span caching)"
            )
        if cfg_sequential:
            raise ValueError(
                "cfg_sequential is meaningless under cfg_axis (the pair "
                "is already split across ranks)"
            )

        def _cfg_axis_output(x_cond, x_uncond, t):
            """Per-rank forward + ONE psum: rank 0 computes the cond
            branch, rank 1 the uncond branch; the guidance combine
            (1+g)*cond - g*uncond is the psum of w_r * out_r."""
            is_c = jax.lax.axis_index(cfg_axis) == 0
            x_r = jnp.where(is_c, x_cond, x_uncond)
            ctx_r = jnp.where(is_c, crossattn_cond, crossattn_uncond)
            t_b = jnp.broadcast_to(t[None], (B,))
            raw = net_fn(net_params, x_r, t_b, ctx_r).astype(jnp.float32)
            w = jnp.where(is_c, 1.0 + guidance, -guidance)
            out = jax.lax.psum(w * raw, cfg_axis)
            if cfg_rescale <= 0:
                return out
            # cfg-rescale (arXiv:2305.08891) under CFG parallelism: the
            # cond branch's per-sample std lives on rank 0 — broadcast
            # it with one scalar-sized psum-select
            std_r = _per_sample_std(raw, drift_axis)
            std_c = jax.lax.psum(
                jnp.where(is_c, std_r, jnp.zeros_like(std_r)), cfg_axis
            )
            std_o = _per_sample_std(out, drift_axis)
            rescaled = out * (std_c / jnp.maximum(std_o, 1e-6))
            return cfg_rescale * rescaled + (1.0 - cfg_rescale) * out

        gi0a, gi1a = (0, num_steps) if gi is None else gi

        def _segments(body_cfg_steps, body_cond_steps, carry):
            if gi0a > 0:
                carry = jax.lax.fori_loop(0, gi0a, body_cond_steps, carry)
            if gi1a > gi0a:
                carry = jax.lax.fori_loop(
                    gi0a, gi1a, body_cfg_steps, carry
                )
            if gi1a < num_steps:
                carry = jax.lax.fori_loop(
                    gi1a, num_steps, body_cond_steps, carry
                )
            return carry

        if solver != "euler":
            if solver not in ("dpm2m", "res2ab"):
                raise ValueError(
                    f"unknown solver {solver!r}; expected "
                    "euler/dpm2m/res2ab"
                )
            if step_cache_interval > 1:
                raise ValueError(
                    "multistep solvers are not supported with step "
                    "caching"
                )
            from gen3c_tpu.diffusion.solvers import (
                dpm2m_x0_step,
                res_x0_rk2_step,
            )

            def _ms_finish_ax(i, sigma, indicator, new_xt, net_output,
                              prev_x0):
                latent_unscaled = schedule.reverse_precondition_output(
                    gt, new_xt, sigma
                )
                raw = (indicator * latent_unscaled
                       + (1 - indicator) * net_output)
                x0 = schedule.precondition_outputs(new_xt, raw, sigma)
                s1n = sigmas[i + 1]

                def euler_step(_):
                    return schedule.step(raw, new_xt, sigma, s1n)

                def multi(_):
                    prev_s = sigmas[jnp.maximum(i - 1, 0)]
                    step_fn = (res_x0_rk2_step if solver == "res2ab"
                               else dpm2m_x0_step)
                    return step_fn(new_xt, s1n, sigma, x0, prev_s,
                                   prev_x0)

                use_multi = jnp.logical_and(i > 0, s1n > 0)
                return (jax.lax.cond(use_multi, multi, euler_step, None),
                        x0)

            def ms_body_ax(i, carry):
                xt, prev_x0 = carry
                (sigma, t, indicator, new_xt,
                 x_cond, x_uncond) = _step_parts(i, xt)
                net_output = _cfg_axis_output(x_cond, x_uncond, t)
                return _ms_finish_ax(i, sigma, indicator, new_xt,
                                     net_output, prev_x0)

            def ms_body_ax_cond(i, carry):
                xt, prev_x0 = carry
                (sigma, t, indicator, new_xt,
                 x_cond, _) = _step_parts(i, xt)
                out_c = _net_call_cond(x_cond, t).astype(jnp.float32)
                return _ms_finish_ax(i, sigma, indicator, new_xt, out_c,
                                     prev_x0)

            out, _ = _segments(ms_body_ax, ms_body_ax_cond, (xt0, xt0))
            return out

        if step_cache_interval <= 1:

            def body_ax(i, xt):
                (sigma, t, indicator, new_xt,
                 x_cond, x_uncond) = _step_parts(i, xt)
                net_output = _cfg_axis_output(x_cond, x_uncond, t)
                return _finish(i, sigma, indicator, new_xt, net_output)

            return _segments(body_ax, body_cond, xt0)

        # fixed-interval caching: the cache holds the COMBINED B-sized
        # net_output (cond-only output in the inactive segments), so
        # skipped steps need no psum at all
        warmup_ax, tail_ax = 2, 2

        def _refresh_pred(i):
            return (
                (i < warmup_ax)
                | (i >= num_steps - tail_ax)
                | ((i - warmup_ax) % step_cache_interval == 0)
            )

        def cached_body_ax(i, carry):
            xt, cached = carry
            (sigma, t, indicator, new_xt,
             x_cond, x_uncond) = _step_parts(i, xt)
            # re-entry into the CFG range: the cached combined output
            # came from a cond-only step — force one refresh
            refresh = _refresh_pred(i) | (i == gi0a)
            net_output = jax.lax.cond(
                refresh,
                lambda: _cfg_axis_output(x_cond, x_uncond, t),
                lambda: cached,
            )
            return (_finish(i, sigma, indicator, new_xt, net_output),
                    net_output)

        def cached_body_ax_cond(i, carry):
            xt, cached = carry
            (sigma, t, indicator, new_xt,
             x_cond, _) = _step_parts(i, xt)
            out_c = jax.lax.cond(
                _refresh_pred(i),
                lambda: _net_call_cond(x_cond, t).astype(jnp.float32),
                lambda: cached,
            )
            return (_finish(i, sigma, indicator, new_xt, out_c), out_c)

        cache0_ax = jnp.zeros((B, gt.shape[1]) + gt.shape[2:],
                              jnp.float32)
        out, _ = _segments(
            cached_body_ax, cached_body_ax_cond, (xt0, cache0_ax)
        )
        return out

    if solver != "euler":
        # higher-order integration at EQUAL network cost: carry the
        # previous x0 (denoised) prediction and extrapolate
        if solver not in ("dpm2m", "res2ab"):
            raise ValueError(
                f"unknown solver {solver!r}; expected euler/dpm2m/res2ab"
            )
        if (step_cache_interval > 1 or step_cache_threshold > 0
                or net_fn_skip is not None):
            raise ValueError(
                "multistep solvers are not supported with step caching"
            )
        from gen3c_tpu.diffusion.solvers import (
            dpm2m_x0_step,
            res_x0_rk2_step,
        )

        def _ms_finish(i, sigma, indicator, new_xt, net_output, prev_x0):
            latent_unscaled = schedule.reverse_precondition_output(
                gt, new_xt, sigma
            )
            raw = indicator * latent_unscaled + (1 - indicator) * net_output
            x0 = schedule.precondition_outputs(new_xt, raw, sigma)
            s1n = sigmas[i + 1]

            def euler_step(_):
                return schedule.step(raw, new_xt, sigma, s1n)

            def multi(_):
                prev_s = sigmas[jnp.maximum(i - 1, 0)]
                step_fn = (res_x0_rk2_step if solver == "res2ab"
                           else dpm2m_x0_step)
                return step_fn(new_xt, s1n, sigma, x0, prev_s, prev_x0)

            use_multi = jnp.logical_and(i > 0, s1n > 0)
            x_next = jax.lax.cond(use_multi, multi, euler_step, None)
            return (x_next, x0)

        def body_ms(i, carry):
            xt, prev_x0 = carry
            sigma, indicator, new_xt, x_in, t_in = _step_inputs(i, xt)
            net_out = _net_call(x_in, t_in).astype(jnp.float32)
            out_cond, out_uncond = net_out[:B], net_out[B:]
            net_output = apply_cfg(out_cond, out_uncond, guidance,
                                   cfg_rescale, shard_axis=drift_axis)
            return _ms_finish(i, sigma, indicator, new_xt, net_output,
                              prev_x0)

        def body_ms_cond(i, carry):
            xt, prev_x0 = carry
            sigma, t, indicator, new_xt, x_cond, _ = _step_parts(i, xt)
            out_c = _net_call_cond(x_cond, t).astype(jnp.float32)
            return _ms_finish(i, sigma, indicator, new_xt, out_c, prev_x0)

        if gi is None:
            out, _ = jax.lax.fori_loop(0, num_steps, body_ms, (xt0, xt0))
            return out
        gi0, gi1 = gi
        carry = (xt0, xt0)
        if gi0 > 0:
            carry = jax.lax.fori_loop(0, gi0, body_ms_cond, carry)
        if gi1 > gi0:
            carry = jax.lax.fori_loop(gi0, gi1, body_ms, carry)
        if gi1 < num_steps:
            carry = jax.lax.fori_loop(gi1, num_steps, body_ms_cond, carry)
        return carry[0]

    if (step_cache_interval <= 1 and step_cache_threshold <= 0
            and net_fn_skip is None):
        if gi is None:
            return jax.lax.fori_loop(0, num_steps, body, xt0)
        gi0, gi1 = gi
        xt = xt0
        if gi0 > 0:
            xt = jax.lax.fori_loop(0, gi0, body_cond, xt)
        if gi1 > gi0:
            xt = jax.lax.fori_loop(gi0, gi1, body, xt)
        if gi1 < num_steps:
            xt = jax.lax.fori_loop(gi1, num_steps, body_cond, xt)
        return xt

    # --- step-cached variants: carry the last raw [cond|uncond] output ---
    warmup, tail = 2, 2

    if net_fn_skip is not None:
        # Delta-DiT span caching: carry the span's residual delta
        if step_cache_interval <= 1:
            raise ValueError(
                "net_fn_skip requires step_cache_interval >= 2 (interval "
                f"{step_cache_interval} would silently enable caching on "
                "a caller that asked for the uncached loop)"
            )
        if step_cache_threshold > 0:
            raise ValueError(
                "step_cache_threshold is not supported with net_fn_skip "
                "(span caching refreshes on a fixed interval); use one "
                "or the other"
            )
        interval = step_cache_interval

        def span_body(i, carry):
            xt, delta = carry
            sigma, indicator, new_xt, x_in, t_in = _step_inputs(i, xt)
            refresh = (
                (i < warmup)
                | (i >= num_steps - tail)
                | ((i - warmup) % interval == 0)
            )

            def do_refresh():
                out, d = net_fn(net_params, x_in, t_in, crossattn_both)
                return out.astype(jnp.float32), d

            def do_skip():
                out = net_fn_skip(
                    net_params, x_in, t_in, crossattn_both, delta
                )
                return out.astype(jnp.float32), delta

            net_out, delta = jax.lax.cond(refresh, do_refresh, do_skip)
            return (
                _step_outputs(i, sigma, indicator, new_xt, net_out),
                delta,
            )

        # trace once to get the delta's structure for the init carry
        # (a single array, or (int8 codes, fp32 scales) when the config
        # uses the quantized span carry)
        d_shape = jax.eval_shape(
            lambda: net_fn(
                net_params,
                _step_inputs(0, xt0)[3],
                jnp.zeros((2 * B,), jnp.float32),
                crossattn_both,
            )[1]
        )
        delta0 = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), d_shape
        )
        final, _ = jax.lax.fori_loop(
            0, num_steps, span_body, (xt0, delta0)
        )
        return final

    if step_cache_threshold > 0:
        # adaptive (TeaCache-style): refresh when the accumulated
        # relative L1 drift of the scaled latent crosses the threshold
        def adaptive_body(i, carry):
            xt, cached, prev, acc = carry
            sigma, indicator, new_xt, x_in, t_in = _step_inputs(i, xt)
            cur = new_xt * schedule.c_in(sigma)
            num = jnp.mean(jnp.abs(cur - prev))
            den = jnp.mean(jnp.abs(prev))
            if drift_axis is not None:
                # under sequence (cp) sharding the refresh decision MUST
                # be identical on every rank — the refresh branch holds
                # collectives, and divergent lax.cond branches deadlock.
                # Average the drift statistics over the axis first.
                num = jax.lax.pmean(num, drift_axis)
                den = jax.lax.pmean(den, drift_axis)
            rel = num / (den + 1e-8)
            # the first step has no predecessor: force-refresh via warmup
            drift = acc + rel
            refresh = (
                (i < warmup)
                | (i >= num_steps - tail)
                | (drift > step_cache_threshold)
            )
            net_out = jax.lax.cond(
                refresh,
                lambda: _net_call(x_in, t_in).astype(jnp.float32),
                lambda: cached,
            )
            acc_next = jnp.where(refresh, 0.0, drift)
            return (
                _step_outputs(i, sigma, indicator, new_xt, net_out),
                net_out,
                cur,
                acc_next,
            )

        C_out = gt.shape[1]
        cache0 = jnp.zeros((2 * B, C_out) + gt.shape[2:], jnp.float32)
        prev0 = jnp.zeros_like(xt0)
        final, _, _, _ = jax.lax.fori_loop(
            0, num_steps, adaptive_body, (xt0, cache0, prev0, jnp.float32(0))
        )
        return final

    gi0_cfg = 0 if gi is None else gi[0]

    def cached_body(i, carry):
        xt, cached = carry
        sigma, indicator, new_xt, x_in, t_in = _step_inputs(i, xt)
        refresh = (
            (i < warmup)
            | (i >= num_steps - tail)
            | ((i - warmup) % step_cache_interval == 0)
            # on re-entry into the CFG range the cache's uncond half is
            # stale (cond-only segments never refresh it) — force one
            | (i == gi0_cfg)
        )
        net_out = jax.lax.cond(
            refresh,
            lambda: _net_call(x_in, t_in).astype(jnp.float32),
            lambda: cached,
        )
        return (_step_outputs(i, sigma, indicator, new_xt, net_out),
                net_out)

    def cached_body_cond(i, carry):
        """Guidance-interval inactive step under the fixed-interval
        cache: condition-only forward; only the cache's cond half is
        read or refreshed."""
        xt, cached = carry
        sigma, t, indicator, new_xt, x_cond, _ = _step_parts(i, xt)
        refresh = (
            (i < warmup)
            | (i >= num_steps - tail)
            | ((i - warmup) % step_cache_interval == 0)
        )
        out_c = jax.lax.cond(
            refresh,
            lambda: _net_call_cond(x_cond, t).astype(jnp.float32),
            lambda: cached[:B],
        )
        new_cached = jnp.concatenate([out_c, cached[B:]], axis=0)
        return (_finish(i, sigma, indicator, new_xt, out_c), new_cached)

    C_out = gt.shape[1]
    cache0 = jnp.zeros((2 * B, C_out) + gt.shape[2:], jnp.float32)
    if gi is None:
        final, _ = jax.lax.fori_loop(
            0, num_steps, cached_body, (xt0, cache0)
        )
        return final
    gi0, gi1 = gi
    carry = (xt0, cache0)
    if gi0 > 0:
        carry = jax.lax.fori_loop(0, gi0, cached_body_cond, carry)
    if gi1 > gi0:
        carry = jax.lax.fori_loop(gi0, gi1, cached_body, carry)
    if gi1 < num_steps:
        carry = jax.lax.fori_loop(gi1, num_steps, cached_body_cond, carry)
    return carry[0]


@partial(
    jax.jit,
    static_argnames=(
        "net_fn",
        "guidance",
        "aug",
        "schedule",
        "net_in_dtype",
        "refresh",
        "cfg_sequential",
        "solver",
        "use_cfg",
        "cfg_rescale",
    ),
    # the carries (xt, cached_out, prev_x0) die each iteration — donate
    # so XLA aliases the step's outputs onto them. Without this the 7B
    # step peaks ~0.6 GB higher (out-of-place carries + the async queue
    # keeping the previous triple alive) and the measured-fitting
    # 16.2 GB program OOMs at runtime on a 16 GiB chip
    donate_argnums=(2, 3, 4),
)
def _host_loop_step(
    net_fn,
    net_params,
    xt: Array,
    cached_out: Array,
    prev_x0: Array,  # previous denoised prediction (multistep carry)
    prev_sigma: Array,  # () f32; 0.0 on the first step (disables multi)
    sigma: Array,  # () f32, traced: one compile covers all steps
    sigma_next: Array,
    c_noise: Array,
    augment_latent: Array,
    gt: Array,
    indicator_base: Array,
    crossattn_cond: Array,
    crossattn_uncond: Array,
    condition_video_input_mask: Optional[Array],
    pose_latent_cond: Optional[Array],
    pose_latent_uncond: Optional[Array],
    guidance: float,
    aug: float,
    schedule: EDMEulerSchedule,
    net_in_dtype,
    refresh: bool,
    cfg_sequential: bool,
    solver: str = "euler",
    use_cfg: bool = True,
    cfg_rescale: float = 0.0,
):
    """One denoise step for the host-driven loop (same math as the
    fori_loop body in generate_samples). Returns
    (xt_next, net_out, x0). Multistep solvers stay ONE compiled
    program: the first/last-step fallbacks are a runtime lax.cond on
    (prev_sigma > 0, sigma_next > 0), not static branches — the 7B step
    compile is minutes, so variants matter.

    use_cfg=False (guidance-interval inactive step) runs the condition-
    only forward at batch B — about half the step's compute and temp
    memory — and drops the guidance term; the returned net_out keeps the
    2B cache layout (uncond half carried through stale-but-unused).
    NOTE: mixing use_cfg values within one denoise compiles a SECOND
    big single-step program (the B-sized forward)."""
    B = xt.shape[0]
    indicator = jnp.where(aug >= sigma, jnp.zeros_like(indicator_base),
                          indicator_base)
    augment_latent_unscaled = augment_latent / schedule.c_in(sigma)
    new_xt = indicator * augment_latent_unscaled + (1 - indicator) * xt
    new_xt_scaled = (new_xt * schedule.c_in(sigma)).astype(net_in_dtype)

    cond_parts = [new_xt_scaled]
    uncond_parts = [new_xt_scaled]
    if condition_video_input_mask is not None:
        m = condition_video_input_mask.astype(net_in_dtype)
        cond_parts.append(m)
        uncond_parts.append(m)
    if pose_latent_cond is not None:
        cond_parts.append(pose_latent_cond.astype(net_in_dtype))
        uncond_parts.append(pose_latent_uncond.astype(net_in_dtype))
    x_cond = jnp.concatenate(cond_parts, axis=1)
    x_uncond = jnp.concatenate(uncond_parts, axis=1)
    t_in = jnp.broadcast_to(c_noise[None], (B,))

    if refresh:
        if not use_cfg:
            out_c = net_fn(net_params, x_cond, t_in, crossattn_cond)
            net_out = jnp.concatenate(
                [out_c.astype(jnp.float32), cached_out[B:]], axis=0
            )
        elif cfg_sequential:
            out_c = net_fn(net_params, x_cond, t_in, crossattn_cond)
            out_u = net_fn(net_params, x_uncond, t_in, crossattn_uncond)
            net_out = jnp.concatenate([out_c, out_u], axis=0).astype(
                jnp.float32
            )
        else:
            x_in = jnp.concatenate([x_cond, x_uncond], axis=0)
            t2 = jnp.broadcast_to(c_noise[None], (2 * B,))
            both = jnp.concatenate([crossattn_cond, crossattn_uncond],
                                   axis=0)
            net_out = net_fn(net_params, x_in, t2, both).astype(
                jnp.float32
            )
    else:
        net_out = cached_out

    out_cond, out_uncond = net_out[:B], net_out[B:]
    if use_cfg:
        net_output = apply_cfg(out_cond, out_uncond, guidance, cfg_rescale)
    else:
        net_output = out_cond
    latent_unscaled = schedule.reverse_precondition_output(gt, new_xt, sigma)
    new_output = indicator * latent_unscaled + (1 - indicator) * net_output
    x0 = schedule.precondition_outputs(new_xt, new_output, sigma)
    if solver == "euler":
        return (schedule.step(new_output, new_xt, sigma, sigma_next),
                net_out, x0)

    from gen3c_tpu.diffusion.solvers import dpm2m_x0_step, res_x0_rk2_step

    def euler_step(_):
        return schedule.step(new_output, new_xt, sigma, sigma_next)

    def multi(_):
        step_fn = res_x0_rk2_step if solver == "res2ab" else dpm2m_x0_step
        return step_fn(new_xt, sigma_next, sigma, x0, prev_sigma, prev_x0)

    use_multi = jnp.logical_and(prev_sigma > 0, sigma_next > 0)
    return jax.lax.cond(use_multi, multi, euler_step, None), net_out, x0


def _host_loop_schedule(
    num_steps: int,
    step_cache_interval: int,
    schedule: EDMEulerSchedule,
    guidance_interval: Optional[tuple],
    warmup: int = 2,
    tail: int = 2,
):
    """Per-step (refresh, use_cfg) static flags for the host-loop
    sampler. Shared by the dispatch loop and warm_host_loop_compiles so
    speculative warming compiles EXACTLY the program variants the loop
    will request — if this drifts, warming silently compiles the wrong
    set (caught by test_host_loop_warm_covers_drive_combos)."""
    if guidance_interval is None:
        cfg_active = [True] * num_steps
    else:
        gi0, gi1 = guidance_interval_steps(
            schedule, num_steps, guidance_interval
        )
        cfg_active = [gi0 <= i < gi1 for i in range(num_steps)]
    flags = []
    for i in range(num_steps):
        refresh = (
            step_cache_interval <= 1
            or i < warmup
            or i >= num_steps - tail
            or (i - warmup) % step_cache_interval == 0
            # re-entry into the CFG range: the cache's uncond half is
            # stale — force one full refresh
            or (cfg_active[i] and i > 0 and not cfg_active[i - 1])
        )
        flags.append((bool(refresh), bool(cfg_active[i])))
    return flags


def warm_host_loop_compiles(
    net_fn,
    net_params,  # (param tree — real or abstract — , cfg)
    *,
    batch: int,
    state_shape: Tuple[int, int, int, int],  # (C, T, H, W) latent
    crossattn_shape: Tuple[int, int],  # (tokens, dim), e.g. (512, 1024)
    pose_channels: Optional[int],
    num_steps: int,
    guidance: float,
    condition_augment_sigma: float,
    schedule: EDMEulerSchedule = EDMEulerSchedule(),
    step_cache_interval: int = 1,
    cfg_sequential: bool = False,
    net_in_dtype=None,
    solver: str = "euler",
    guidance_interval: Optional[tuple] = None,
    cfg_rescale: float = 0.0,
    has_input_mask: bool = True,
) -> int:
    """AOT-compile (abstract shapes — zero HBM, zero state) every
    _host_loop_step program variant a generate_samples_host_loop run
    with this configuration will request. Returns the variant count.

    Same speculative-warming idea as Cache3DBuffer.warm_update_compiles:
    the compiled executables land in the persistent compilation cache
    (utils/jax_setup.py), so when the real denoise issues the same HLO
    it deserializes in seconds instead of paying the 20-300 s remote
    compile. Run it on a background thread while the host does the
    model build / depth / warp-render prep — on the cold 241-frame AR
    run of 2026-08-19 the step-program compiles were ~2.5 min of chunk
    1's 7:07 denoise. Program identity is by HLO fingerprint, not
    Python object identity, so warming from a different thread (or even
    process) sharing the cache dir still hits."""
    import jax as _jax

    params, cfg = net_params
    sds = _jax.ShapeDtypeStruct
    abs_params = _jax.tree.map(
        lambda x: sds(jnp.shape(x), jnp.result_type(x)), params
    )
    C, T, H, W = state_shape
    B = int(batch)
    f32 = jnp.float32
    lat = sds((B, C, T, H, W), f32)
    net_out = sds((2 * B, C, T, H, W), f32)
    scalar = sds((), f32)
    # the conditioner builds the indicator batch-independent — always
    # (1, 1, T, 1, 1) (conditioner.add_condition_video_indicator_and_
    # input_mask); warming (B,1,T,1,1) at batch>1 would compile a
    # program the real run never requests (ADVICE r3)
    indicator = sds((1, 1, T, 1, 1), f32)
    ca = sds((B,) + tuple(crossattn_shape), f32)
    mask = sds((B, 1, T, H, W), f32) if has_input_mask else None
    pose = (
        sds((B, int(pose_channels), T, H, W), f32)
        if pose_channels
        else None
    )
    combos = sorted(
        set(
            _host_loop_schedule(
                num_steps, step_cache_interval, schedule,
                guidance_interval,
            )
        )
    )
    nid = jnp.float32 if net_in_dtype is None else net_in_dtype
    for refresh, use_cfg in combos:
        _host_loop_step.lower(
            net_fn,
            (abs_params, cfg),
            lat,  # xt
            net_out,  # cached_out
            lat,  # prev_x0
            scalar,  # prev_sigma
            scalar,  # sigma
            scalar,  # sigma_next
            scalar,  # c_noise
            lat,  # augment_latent
            lat,  # gt
            indicator,
            ca,  # crossattn_cond
            ca,  # crossattn_uncond
            mask,
            pose,  # pose_latent_cond
            pose,  # pose_latent_uncond
            guidance=float(guidance),
            aug=float(condition_augment_sigma),
            schedule=schedule,
            net_in_dtype=nid,
            refresh=bool(refresh),
            cfg_sequential=bool(cfg_sequential),
            solver=solver,
            use_cfg=bool(use_cfg),
            cfg_rescale=float(cfg_rescale),
        ).compile()
    return len(combos)


class PendingSamples:
    """Handle for an asynchronously-dispatched host-loop denoise.

    ``result()`` joins the dispatch thread and returns the final latent
    (the device work itself remains async JAX arrays — callers still
    block only when they read). Exceptions raised on the dispatch thread
    re-raise in ``result()``."""

    def __init__(self, thread, box):
        self._thread = thread
        self._box = box

    def result(self) -> Array:
        self._thread.join()
        if "error" in self._box:
            raise self._box["error"]
        return self._box["xt"]


def generate_samples_host_loop(
    net_fn,
    net_params,
    init_noise: Array,
    augment_noise: Array,
    crossattn_cond: Array,
    crossattn_uncond: Array,
    gt_latent: Array,
    condition_video_indicator: Array,
    condition_video_input_mask: Optional[Array] = None,
    pose_latent_cond: Optional[Array] = None,
    pose_latent_uncond: Optional[Array] = None,
    num_steps: int = 35,
    guidance: float = 1.0,
    condition_augment_sigma: float = 0.001,
    schedule: EDMEulerSchedule = EDMEulerSchedule(),
    step_cache_interval: int = 1,
    cfg_sequential: bool = False,
    net_in_dtype=None,
    solver: str = "euler",
    dispatch_async: bool = False,
    guidance_interval: Optional[tuple] = None,
    cfg_rescale: float = 0.0,
):
    """Memory-lean sampler: a HOST python loop over a jitted single-step
    program, instead of one jit holding the whole `num_steps` fori_loop.

    Why: XLA's whole-loop program needs args 7.84 GB + temp 9.5-11.2 GB
    at the production W8A8 7B shape — over one v5e's 16 GB HBM, and this
    backend rejects it at COMPILE time (scripts/probe_sampler_memory.py).
    The single-step program is the same one bench.py measures, which
    compiles and runs with the params resident. Cost: num_steps dispatch
    round-trips (~26 ms each through the axon tunnel) against a ~30 s
    step — <0.2% overhead. Math is identical to generate_samples;
    step_cache_interval reuses the cached raw output on skipped steps
    with the same warmup/tail refresh schedule.

    Host-CPU-contention hardening (VERDICT r2 #4): per-step scalars
    (sigma / sigma_next / c_noise / prev_sigma) are staged to the device
    in ONE batch up front and sliced on-device per step — the loop body
    performs zero host->device transfers, so a starved tunnel client
    costs dispatch RTTs only, not transfer round-trips. With
    ``dispatch_async=True`` the whole dispatch loop runs on a dedicated
    thread and a :class:`PendingSamples` handle returns immediately: the
    device queue fills (the tunnel queues executions; the denoise
    "completes" in seconds of dispatch and drains on device) even while
    the caller's thread does CPU-heavy work beside it.
    """
    sig = np.asarray(schedule.sigmas(num_steps), np.float32)
    c_noises = np.asarray(schedule.timesteps(num_steps), np.float32)

    xt = init_noise.astype(jnp.float32) * schedule.init_noise_sigma
    aug = condition_augment_sigma
    gt = gt_latent.astype(jnp.float32)
    indicator_base = condition_video_indicator.astype(jnp.float32)
    augment_latent = (
        gt + augment_noise.astype(jnp.float32) * aug
    ) * schedule.c_in(aug)

    if solver != "euler" and step_cache_interval > 1:
        raise ValueError(
            "multistep solvers are not supported with step caching"
        )
    B = init_noise.shape[0]
    C_out = gt.shape[1]
    # one batched upload of every per-step scalar: prev_sigma row i is
    # sig[i-1] with the 0.0 first-step sentinel in row 0
    scalar_table = jax.device_put(
        jnp.asarray(
            np.stack(
                [
                    np.concatenate([[0.0], sig[: num_steps - 1]]),
                    sig[:num_steps],
                    sig[1 : num_steps + 1],
                    c_noises,
                ],
                axis=1,
            ).astype(np.float32)
        )
    )  # (num_steps, 4)
    step_flags = _host_loop_schedule(
        num_steps, step_cache_interval, schedule, guidance_interval
    )
    box: dict = {}

    def _drive():
        try:
            xt_c = xt
            net_out = jnp.zeros(
                (2 * B, C_out) + gt.shape[2:], jnp.float32
            )
            prev_x0 = jnp.zeros_like(xt_c)
            for i, (refresh, _use_cfg) in enumerate(step_flags):
                row = scalar_table[i]  # device slice, no h2d transfer
                xt_c, net_out, prev_x0 = _host_loop_step(
                    net_fn,
                    net_params,
                    xt_c,
                    net_out,
                    prev_x0,
                    row[0],
                    row[1],
                    row[2],
                    row[3],
                    augment_latent,
                    gt,
                    indicator_base,
                    crossattn_cond,
                    crossattn_uncond,
                    condition_video_input_mask,
                    pose_latent_cond,
                    pose_latent_uncond,
                    guidance=guidance,
                    aug=aug,
                    schedule=schedule,
                    net_in_dtype=(
                        jnp.float32 if net_in_dtype is None
                        else net_in_dtype
                    ),
                    refresh=bool(refresh),
                    cfg_sequential=cfg_sequential,
                    solver=solver,
                    use_cfg=bool(_use_cfg),
                    cfg_rescale=cfg_rescale,
                )
            box["xt"] = xt_c
        except BaseException as e:  # noqa: BLE001 — re-raised in result()
            box["error"] = e

    if not dispatch_async:
        _drive()
        if "error" in box:
            raise box["error"]
        return box["xt"]
    import threading

    thread = threading.Thread(
        target=_drive, name="gen3c-denoise-dispatch", daemon=True
    )
    thread.start()
    return PendingSamples(thread, box)


def generate_samples_auto(
    net_fn,
    net_params,  # (param_tree, cfg) as used by every pipeline net_fn
    offload: bool = False,
    step_cache_threshold: float = 0.0,
    streaming_net=None,  # models/dit_streaming.StreamingDiT -> streamed
    **kwargs,
):
    """Dispatch between the one-jit whole-loop sampler and the
    memory-constrained host-loop sampler.

    offload=True means the params rest in host RAM (factory
    offload_dit): they are staged into HBM, the denoise runs as a host
    loop over the single-step program (the whole-loop program does not
    fit beside the staged 7B — docs/STATUS.md "Memory / offload"), and
    the staged buffers are freed before returning. Used by the
    text2world / world-interpolator CLIs and Gen3CModel (the multiview
    CLI keeps the whole-loop sampler: its (params, cfg, frame_repeat)
    net_params layout and multi-view shapes have no single-chip-7B
    serving mode).
    """
    if streaming_net is not None:
        if step_cache_threshold > 0:
            from gen3c_tpu.utils import log

            log.warning(
                "adaptive step caching is not available in the "
                "streaming sampler; running uncached (use "
                "step_cache_interval instead)"
            )
        for k in ("net_in_dtype", "drift_axis"):
            kwargs.pop(k, None)
        if kwargs.pop("cfg_sequential", False):
            from gen3c_tpu.utils import log

            log.warning(
                "cfg_sequential is not implemented in the streaming "
                "sampler; running the batched 2B forward"
            )
        if kwargs.pop("net_fn_skip", None) is not None:
            raise ValueError(
                "span caching is not available with the block-streamed "
                "DiT"
            )
        def net_py(x_in, t_in, crossattn_both):
            return streaming_net(x_in, t_in, crossattn_both, fps=24.0)

        return generate_samples_streaming(
            net_py,
            net_in_dtype=streaming_net.cfg.dtype,
            **kwargs,
        )

    if not offload:
        return generate_samples(
            net_fn=net_fn,
            net_params=net_params,
            step_cache_threshold=step_cache_threshold,
            **kwargs,
        )
    from gen3c_tpu.utils.offload import staged

    params, cfg = net_params
    if step_cache_threshold > 0:
        from gen3c_tpu.utils import log

        log.warning(
            "adaptive step caching is not available in the "
            "memory-constrained host-loop sampler; running uncached "
            "(use step_cache_interval instead)"
        )
    kwargs.pop("net_in_dtype", None)
    kwargs.pop("drift_axis", None)
    if kwargs.pop("net_fn_skip", None) is not None:
        raise ValueError(
            "span caching (net_fn_skip) is not available in the "
            "memory-constrained host-loop sampler"
        )
    with staged(params, True, tag="dit") as dp:
        out = generate_samples_host_loop(
            net_fn=net_fn,
            net_params=(dp, cfg),
            net_in_dtype=cfg.dtype,
            **kwargs,
        )
        jax.block_until_ready(out)
        np.asarray(out[:1, :1, :1, :1, :1])  # tunnel-safe sync
    return out


@partial(jax.jit, static_argnames=("aug", "schedule", "net_in_dtype",
                                   "cfg"))
def _stream_step_pre(
    xt,
    sigma,
    augment_latent,
    indicator_base,
    condition_video_input_mask,
    pose_latent_cond,
    pose_latent_uncond,
    aug: float,
    schedule: EDMEulerSchedule,
    net_in_dtype,
    cfg: bool = True,
):
    """Per-step input assembly for the streaming sampler (same math as
    _host_loop_step's preamble). Returns (new_xt, indicator, x_in(2B)),
    or x_in(B) cond-only when cfg=False (guidance-interval step)."""
    indicator = jnp.where(aug >= sigma, jnp.zeros_like(indicator_base),
                          indicator_base)
    augment_latent_unscaled = augment_latent / schedule.c_in(sigma)
    new_xt = indicator * augment_latent_unscaled + (1 - indicator) * xt
    new_xt_scaled = (new_xt * schedule.c_in(sigma)).astype(net_in_dtype)

    cond_parts = [new_xt_scaled]
    uncond_parts = [new_xt_scaled]
    if condition_video_input_mask is not None:
        m = condition_video_input_mask.astype(net_in_dtype)
        cond_parts.append(m)
        uncond_parts.append(m)
    if pose_latent_cond is not None:
        cond_parts.append(pose_latent_cond.astype(net_in_dtype))
        uncond_parts.append(pose_latent_uncond.astype(net_in_dtype))
    if not cfg:
        return new_xt, indicator, jnp.concatenate(cond_parts, axis=1)
    x_in = jnp.concatenate(
        [jnp.concatenate(cond_parts, axis=1),
         jnp.concatenate(uncond_parts, axis=1)], axis=0,
    )
    return new_xt, indicator, x_in


@partial(jax.jit, static_argnames=("guidance", "schedule", "solver",
                                   "use_cfg", "cfg_rescale"))
def _stream_step_post(
    net_out,
    new_xt,
    indicator,
    gt,
    sigma,
    sigma_next,
    prev_x0,
    prev_sigma,
    guidance: float,
    schedule: EDMEulerSchedule,
    solver: str = "euler",
    use_cfg: bool = True,
    cfg_rescale: float = 0.0,
):
    """CFG combine + conditioned-region replacement + solver step.
    Returns (xt_next, x0). Multistep solvers use the same runtime
    lax.cond trick as _host_loop_step (one compiled program).
    use_cfg=False (guidance-interval step): net_out keeps the 2B cache
    layout, but only the cond half is used and guidance is dropped."""
    B = new_xt.shape[0]
    net_out = net_out.astype(jnp.float32)
    out_cond, out_uncond = net_out[:B], net_out[B:]
    if use_cfg:
        net_output = apply_cfg(out_cond, out_uncond, guidance, cfg_rescale)
    else:
        net_output = out_cond
    latent_unscaled = schedule.reverse_precondition_output(gt, new_xt, sigma)
    new_output = indicator * latent_unscaled + (1 - indicator) * net_output
    x0 = schedule.precondition_outputs(new_xt, new_output, sigma)
    if solver == "euler":
        return schedule.step(new_output, new_xt, sigma, sigma_next), x0

    from gen3c_tpu.diffusion.solvers import dpm2m_x0_step, res_x0_rk2_step

    def euler_step(_):
        return schedule.step(new_output, new_xt, sigma, sigma_next)

    def multi(_):
        step_fn = res_x0_rk2_step if solver == "res2ab" else dpm2m_x0_step
        return step_fn(new_xt, sigma_next, sigma, x0, prev_sigma, prev_x0)

    use_multi = jnp.logical_and(prev_sigma > 0, sigma_next > 0)
    return jax.lax.cond(use_multi, multi, euler_step, None), x0


def generate_samples_streaming(
    net_py,  # python callable (x_in(2B), t_in(2B), crossattn_both) -> out
    init_noise: Array,
    augment_noise: Array,
    crossattn_cond: Array,
    crossattn_uncond: Array,
    gt_latent: Array,
    condition_video_indicator: Array,
    condition_video_input_mask: Optional[Array] = None,
    pose_latent_cond: Optional[Array] = None,
    pose_latent_uncond: Optional[Array] = None,
    num_steps: int = 35,
    guidance: float = 1.0,
    condition_augment_sigma: float = 0.001,
    schedule: EDMEulerSchedule = EDMEulerSchedule(),
    step_cache_interval: int = 1,
    net_in_dtype=None,
    solver: str = "euler",
    guidance_interval: Optional[tuple] = None,
    cfg_rescale: float = 0.0,
) -> Array:
    """Sampler for PYTHON-level networks (models/dit_streaming.py): the
    per-step Euler math runs in two small jits around a python net call
    that itself orchestrates block staging + per-block jits. Same math
    as generate_samples/generate_samples_host_loop (parity-tested);
    whole-output step caching supported via step_cache_interval.
    """
    sig = np.asarray(schedule.sigmas(num_steps), np.float32)
    c_noises = np.asarray(schedule.timesteps(num_steps), np.float32)

    xt = init_noise.astype(jnp.float32) * schedule.init_noise_sigma
    aug = condition_augment_sigma
    gt = gt_latent.astype(jnp.float32)
    indicator_base = condition_video_indicator.astype(jnp.float32)
    augment_latent = (
        gt + augment_noise.astype(jnp.float32) * aug
    ) * schedule.c_in(aug)
    crossattn_both = jnp.concatenate(
        [crossattn_cond, crossattn_uncond], axis=0
    )
    in_dtype = jnp.float32 if net_in_dtype is None else net_in_dtype
    B = init_noise.shape[0]

    if solver != "euler" and step_cache_interval > 1:
        raise ValueError(
            "multistep solvers are not supported with step caching"
        )
    warmup, tail = 2, 2
    if guidance_interval is None:
        cfg_active = [True] * num_steps
        cached = None
    else:
        gi0, gi1 = guidance_interval_steps(
            schedule, num_steps, guidance_interval
        )
        cfg_active = [gi0 <= i < gi1 for i in range(num_steps)]
        # cond-only refreshes write only the cache's cond half — start
        # from a full-shaped zero cache so the uncond half exists
        cached = jnp.zeros((2 * B, gt.shape[1]) + gt.shape[2:],
                           jnp.float32)
    prev_x0 = jnp.zeros_like(xt)
    prev_sigma = 0.0
    for i in range(num_steps):
        sigma = jnp.float32(sig[i])
        use_cfg = cfg_active[i]
        new_xt, indicator, x_in = _stream_step_pre(
            xt, sigma, augment_latent, indicator_base,
            condition_video_input_mask, pose_latent_cond,
            pose_latent_uncond, aug=aug, schedule=schedule,
            net_in_dtype=in_dtype, cfg=use_cfg,
        )
        refresh = (
            step_cache_interval <= 1
            or i < warmup
            or i >= num_steps - tail
            or (i - warmup) % step_cache_interval == 0
            # CFG-range re-entry: the cache's uncond half is stale
            or (use_cfg and i > 0 and not cfg_active[i - 1])
        )
        if refresh or cached is None:
            if use_cfg:
                t_in = jnp.broadcast_to(
                    jnp.float32(c_noises[i])[None], (2 * B,)
                )
                cached = net_py(x_in, t_in, crossattn_both)
            else:
                t_in = jnp.broadcast_to(
                    jnp.float32(c_noises[i])[None], (B,)
                )
                out_c = net_py(x_in, t_in, crossattn_cond)
                cached = jnp.concatenate(
                    [out_c.astype(jnp.float32), cached[B:]], axis=0
                )
        xt, prev_x0 = _stream_step_post(
            cached, new_xt, indicator, gt, sigma,
            jnp.float32(sig[i + 1]), prev_x0, jnp.float32(prev_sigma),
            guidance=guidance, schedule=schedule, solver=solver,
            use_cfg=use_cfg, cfg_rescale=cfg_rescale,
        )
        prev_sigma = float(sig[i])
        # throttle: force this step's chain to finish before dispatching
        # the next. Without it, all num_steps x num_blocks transfers and
        # block programs enqueue at once (the whole denoise "completes"
        # in seconds of dispatch and drains during the next host read),
        # unbounding in-flight staged-block memory and making phase logs
        # meaningless. ~26 ms/step through the tunnel vs a ~33 s step.
        float(jnp.sum(xt[:1, :1, :1, :1, :1]))
    return xt
