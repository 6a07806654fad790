"""Sampling-loop behavior tests (conditioned-region replacement, CFG)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gen3c_tpu.diffusion.sampler import arch_invariant_randn, generate_samples
from gen3c_tpu.diffusion.scheduler import EDMEulerSchedule


def _shapes(B=1, C=4, T=6, H=8, W=8, P=8):
    return B, C, T, H, W, P


def test_arch_invariant_randn_matches_reference_rng():
    # misc.arch_invariant_rand == np.random.RandomState(seed).standard_normal
    a = arch_invariant_randn((2, 3), seed=7)
    b = np.random.RandomState(7).standard_normal((2, 3)).astype(np.float32)
    np.testing.assert_array_equal(a, b)


def test_conditioned_region_reproduces_gt():
    """With ANY net, the conditioned latent frames must come back ~= gt
    (the loop substitutes the exact-denoiser output there)."""
    B, C, T, H, W, P = _shapes()
    rng = np.random.RandomState(0)
    gt = jnp.asarray(rng.randn(B, C, T, H, W).astype(np.float32))
    indicator = jnp.zeros((1, 1, T, 1, 1)).at[:, :, :2].set(1.0)
    in_mask = jnp.broadcast_to(indicator, (B, 1, T, H, W))
    pose = jnp.asarray(rng.randn(B, P, T, H, W).astype(np.float32))
    ctx = jnp.asarray(rng.randn(B, 4, 16).astype(np.float32))

    def net_fn(params, x_in, t, crossattn):
        # a garbage net: predicts zeros
        return jnp.zeros(x_in.shape[:1] + (C,) + x_in.shape[2:], jnp.float32)

    out = generate_samples(
        net_fn=net_fn,
        net_params=None,
        init_noise=jnp.asarray(rng.randn(B, C, T, H, W).astype(np.float32)),
        augment_noise=jnp.asarray(arch_invariant_randn((B, C, T, H, W), 1)),
        crossattn_cond=ctx,
        crossattn_uncond=jnp.zeros_like(ctx),
        gt_latent=gt,
        condition_video_indicator=indicator,
        condition_video_input_mask=in_mask,
        pose_latent_cond=pose,
        pose_latent_uncond=jnp.zeros_like(pose),
        num_steps=20,
        guidance=1.0,
    )
    out = np.asarray(out)
    gt_np = np.asarray(gt)
    # conditioned frames track gt (augment noise sigma=0.001)
    np.testing.assert_allclose(out[:, :, :2], gt_np[:, :, :2], atol=5e-3)
    # generated frames must NOT equal gt
    assert np.abs(out[:, :, 2:] - gt_np[:, :, 2:]).mean() > 0.1


def test_perfect_denoiser_recovers_target():
    """If the net predicts exactly the preconditioned x0, sampling converges
    to x0 in the generation region."""
    B, C, T, H, W, P = _shapes()
    rng = np.random.RandomState(1)
    x0 = rng.randn(B, C, T, H, W).astype(np.float32)
    x0_j = jnp.asarray(x0)
    sched = EDMEulerSchedule()
    indicator = jnp.zeros((1, 1, T, 1, 1))
    in_mask = jnp.zeros((B, 1, T, H, W))
    pose = jnp.zeros((B, P, T, H, W))
    ctx = jnp.zeros((B, 4, 16))

    def net_fn(params, x_in, t, crossattn):
        # x_in[:, :C] = c_in(sigma) * xt; sigma = exp(4t)
        sigma = jnp.exp(4.0 * t)[:, None, None, None, None]
        xt = x_in[:, :C] / sched.c_in(sigma)
        return sched.reverse_precondition_output(
            jnp.concatenate([x0_j, x0_j], 0), xt, sigma
        )

    out = generate_samples(
        net_fn=net_fn,
        net_params=None,
        init_noise=jnp.asarray(rng.randn(B, C, T, H, W).astype(np.float32)),
        augment_noise=jnp.zeros((B, C, T, H, W)),
        crossattn_cond=ctx,
        crossattn_uncond=ctx,
        gt_latent=jnp.zeros_like(x0_j),
        condition_video_indicator=indicator,
        condition_video_input_mask=in_mask,
        pose_latent_cond=pose,
        pose_latent_uncond=pose,
        num_steps=35,
        guidance=0.0,
    )
    np.testing.assert_allclose(np.asarray(out), x0, rtol=1e-3, atol=1e-3)


def test_cfg_combination():
    """net_output = cond + g*(cond - uncond) (model_t2w.py:194)."""
    B, C, T, H, W, P = _shapes()
    sched = EDMEulerSchedule()
    calls = {}

    def net_fn(params, x_in, t, crossattn):
        # cond half returns +1s, uncond half returns -1s, recorded via ctx
        is_cond = crossattn[:, 0, 0][:, None, None, None, None]
        return jnp.broadcast_to(is_cond, x_in.shape[:1] + (C,) + x_in.shape[2:])

    ctx_cond = jnp.ones((B, 2, 4))
    ctx_uncond = -jnp.ones((B, 2, 4))
    out1 = generate_samples(
        net_fn=net_fn,
        net_params=None,
        init_noise=jnp.zeros((B, C, T, H, W)),
        augment_noise=jnp.zeros((B, C, T, H, W)),
        crossattn_cond=ctx_cond,
        crossattn_uncond=ctx_uncond,
        gt_latent=jnp.zeros((B, C, T, H, W)),
        condition_video_indicator=jnp.zeros((1, 1, T, 1, 1)),
        condition_video_input_mask=jnp.zeros((B, 1, T, H, W)),
        pose_latent_cond=jnp.zeros((B, P, T, H, W)),
        pose_latent_uncond=jnp.zeros((B, P, T, H, W)),
        num_steps=1,
        guidance=2.0,
    )
    # one step from sigma=80 to 0 with model_output = 1 + 2*(1-(-1)) = 5
    # denoised = c_skip*x + c_out*5; x=0 -> denoised = c_out(80)*5
    expect = float(sched.c_out(80.0) * 5.0)
    np.testing.assert_allclose(np.asarray(out1), expect, rtol=1e-5)


def test_negative_prompt_conditioning():
    """Negative prompt replaces the uncond text embedding
    (conditioner.get_condition_with_negative_prompt parity)."""
    import jax.numpy as jnp

    from gen3c_tpu.models.conditioner import make_condition_pair

    latent = jnp.zeros((1, 4, 4, 2, 2))
    t5 = jnp.ones((1, 8, 16))
    neg = -2.0 * jnp.ones((1, 8, 16))
    pose = jnp.ones((1, 8, 4, 2, 2))
    cond, uncond = make_condition_pair(latent, t5, 1, pose_latent=pose)
    assert float(jnp.sum(uncond.crossattn_emb)) == 0.0  # zeros w/o neg
    assert float(jnp.sum(uncond.condition_video_pose)) == 0.0
    cond, uncond = make_condition_pair(
        latent, t5, 1, pose_latent=pose, neg_t5_embeddings=neg
    )
    np.testing.assert_array_equal(np.asarray(uncond.crossattn_emb),
                                  np.asarray(neg))
    np.testing.assert_array_equal(np.asarray(cond.crossattn_emb),
                                  np.asarray(t5))


def test_step_cache_interval_one_is_identity():
    """step_cache_interval=1 takes the original code path bit-for-bit."""
    B, C, T, H, W, P = _shapes()
    rng = np.random.RandomState(3)
    sched = EDMEulerSchedule()
    indicator = jnp.zeros((1, 1, T, 1, 1))
    kwargs = dict(
        init_noise=jnp.asarray(rng.randn(B, C, T, H, W).astype(np.float32)),
        augment_noise=jnp.zeros((B, C, T, H, W)),
        crossattn_cond=jnp.zeros((B, 4, 16)),
        crossattn_uncond=jnp.zeros((B, 4, 16)),
        gt_latent=jnp.zeros((B, C, T, H, W)),
        condition_video_indicator=indicator,
        condition_video_input_mask=jnp.zeros((B, 1, T, H, W)),
        pose_latent_cond=jnp.zeros((B, P, T, H, W)),
        pose_latent_uncond=jnp.zeros((B, P, T, H, W)),
        num_steps=6,
        guidance=1.0,
    )

    def net_fn(params, x_in, t, crossattn):
        return -0.3 * x_in[:, :C] + 0.1

    a = generate_samples(net_fn=net_fn, net_params=None,
                         step_cache_interval=1, **kwargs)
    b = generate_samples(net_fn=net_fn, net_params=None, **kwargs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_step_cache_perfect_denoiser_still_converges():
    """Output caching every 2nd step (Delta-DiT-style reuse) still
    converges to the target with a perfect denoiser: the cached raw
    output is re-preconditioned with the fresh sigma each step."""
    B, C, T, H, W, P = _shapes()
    rng = np.random.RandomState(1)
    x0 = rng.randn(B, C, T, H, W).astype(np.float32)
    x0_j = jnp.asarray(x0)
    sched = EDMEulerSchedule()

    def net_fn(params, x_in, t, crossattn):
        sigma = jnp.exp(4.0 * t)[:, None, None, None, None]
        xt = x_in[:, :C] / sched.c_in(sigma)
        return sched.reverse_precondition_output(
            jnp.concatenate([x0_j, x0_j], 0), xt, sigma
        )

    kwargs = dict(
        init_noise=jnp.asarray(rng.randn(B, C, T, H, W).astype(np.float32)),
        augment_noise=jnp.zeros((B, C, T, H, W)),
        crossattn_cond=jnp.zeros((B, 4, 16)),
        crossattn_uncond=jnp.zeros((B, 4, 16)),
        gt_latent=jnp.zeros_like(x0_j),
        condition_video_indicator=jnp.zeros((1, 1, T, 1, 1)),
        condition_video_input_mask=jnp.zeros((B, 1, T, H, W)),
        pose_latent_cond=jnp.zeros((B, P, T, H, W)),
        pose_latent_uncond=jnp.zeros((B, P, T, H, W)),
        num_steps=35,
        guidance=0.0,
    )
    out = generate_samples(net_fn=net_fn, net_params=None,
                           step_cache_interval=2, **kwargs)
    # looser than the uncached test: skipped steps reuse stale raw
    # outputs, but warmup/tail refreshes keep the endpoint accurate
    np.testing.assert_allclose(np.asarray(out), x0, rtol=2e-2, atol=2e-2)


def test_step_cache_changes_trajectory():
    """Caching really skips net evaluations: with a LINEAR net (whose
    output depends on the current latent) the cached trajectory must
    diverge from the full one on skipped steps while staying finite."""
    B, C, T, H, W, P = _shapes()

    def net_fn(params, x_in, t, crossattn):
        return 0.5 * x_in[:, :C]

    kwargs = dict(
        init_noise=jnp.ones((B, C, T, H, W)),
        augment_noise=jnp.zeros((B, C, T, H, W)),
        crossattn_cond=jnp.zeros((B, 4, 16)),
        crossattn_uncond=jnp.zeros((B, 4, 16)),
        gt_latent=jnp.zeros((B, C, T, H, W)),
        condition_video_indicator=jnp.zeros((1, 1, T, 1, 1)),
        condition_video_input_mask=jnp.zeros((B, 1, T, H, W)),
        pose_latent_cond=jnp.zeros((B, P, T, H, W)),
        pose_latent_uncond=jnp.zeros((B, P, T, H, W)),
        num_steps=12,
        guidance=0.0,
    )
    cached = generate_samples(net_fn=net_fn, net_params=None,
                              step_cache_interval=3, **kwargs)
    full = generate_samples(net_fn=net_fn, net_params=None, **kwargs)
    # with a LINEAR net the cached trajectory must differ from the full
    # one (stale outputs on skipped steps) but stay finite and close
    assert np.isfinite(np.asarray(cached)).all()
    diff = np.abs(np.asarray(cached) - np.asarray(full)).mean()
    assert diff > 0  # caching actually changed the trajectory


def _adaptive_kwargs(num_steps=12):
    B, C, T, H, W, P = _shapes()
    rng = np.random.RandomState(7)
    return dict(
        init_noise=jnp.asarray(rng.randn(B, C, T, H, W).astype(np.float32)),
        augment_noise=jnp.zeros((B, C, T, H, W)),
        crossattn_cond=jnp.zeros((B, 4, 16)),
        crossattn_uncond=jnp.zeros((B, 4, 16)),
        gt_latent=jnp.zeros((B, C, T, H, W)),
        condition_video_indicator=jnp.zeros((1, 1, T, 1, 1)),
        condition_video_input_mask=jnp.zeros((B, 1, T, H, W)),
        pose_latent_cond=jnp.zeros((B, P, T, H, W)),
        pose_latent_uncond=jnp.zeros((B, P, T, H, W)),
        num_steps=num_steps,
        guidance=0.0,
    )


def test_adaptive_cache_tiny_threshold_is_uncached():
    """TeaCache-style adaptive mode with a ~0 threshold refreshes every
    step -> identical output to the uncached loop."""
    B, C = _shapes()[0], _shapes()[1]

    def net_fn(params, x_in, t, crossattn):
        return 0.5 * x_in[:, :C]

    kwargs = _adaptive_kwargs()
    full = generate_samples(net_fn=net_fn, net_params=None, **kwargs)
    adaptive = generate_samples(
        net_fn=net_fn, net_params=None, step_cache_threshold=1e-12, **kwargs
    )
    np.testing.assert_array_equal(np.asarray(adaptive), np.asarray(full))


def test_adaptive_cache_huge_threshold_skips():
    """A huge threshold only refreshes warmup/tail: the trajectory of a
    latent-dependent net must diverge from the full run, stay finite."""
    C = _shapes()[1]

    def net_fn(params, x_in, t, crossattn):
        return 0.5 * x_in[:, :C]

    kwargs = _adaptive_kwargs()
    full = generate_samples(net_fn=net_fn, net_params=None, **kwargs)
    lazy = generate_samples(
        net_fn=net_fn, net_params=None, step_cache_threshold=1e9, **kwargs
    )
    assert np.isfinite(np.asarray(lazy)).all()
    assert float(jnp.max(jnp.abs(lazy - full))) > 1e-6


def test_adaptive_cache_threshold_orders_error():
    """Tighter thresholds track the uncached trajectory at least as well
    as the lazy extreme (perfect-denoiser setup, same as the fixed-
    interval convergence test)."""
    B, C, T, H, W, P = _shapes()
    rng = np.random.RandomState(1)
    x0 = rng.randn(B, C, T, H, W).astype(np.float32)
    x0_j = jnp.asarray(x0)
    sched = EDMEulerSchedule()

    def net_fn(params, x_in, t, crossattn):
        sigma = jnp.exp(4.0 * t)[:, None, None, None, None]
        xt = x_in[:, :C] / sched.c_in(sigma)
        return sched.reverse_precondition_output(
            jnp.concatenate([x0_j, x0_j], 0), xt, sigma
        )

    kwargs = _adaptive_kwargs(num_steps=35)
    kwargs["init_noise"] = jnp.asarray(
        np.random.RandomState(2).randn(B, C, T, H, W).astype(np.float32)
    )
    out = generate_samples(
        net_fn=net_fn, net_params=None, step_cache_threshold=0.05, **kwargs
    )
    # adaptive caching with a practical threshold still converges to the
    # perfect-denoiser target within the fixed-interval test's tolerance
    np.testing.assert_allclose(np.asarray(out), x0, rtol=2e-2, atol=2e-2)


def test_cfg_sequential_matches_batched():
    """cfg_sequential=True (two B-sized forwards per step, halved temp
    memory — scripts/probe_sampler_memory.py) must reproduce the
    batched-CFG trajectory."""
    B, C, T, H, W, P = _shapes()
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(C + 1 + P, C) * 0.05, jnp.float32)

    def net_fn(params, x_in, t, crossattn):
        # a real (nonlinear, cross-attn-dependent) toy net so any
        # batched-vs-sequential wiring mistake changes the output
        h = jnp.einsum("bcthw,cd->bdthw", x_in, w)
        bias = jnp.mean(crossattn, axis=(1, 2))[:, None, None, None, None]
        return jnp.tanh(h + bias + t[:, None, None, None, None] * 0.01)

    kwargs = dict(
        net_fn=net_fn,
        net_params=None,
        init_noise=jnp.asarray(rng.randn(B, C, T, H, W), jnp.float32),
        augment_noise=jnp.asarray(rng.randn(B, C, T, H, W), jnp.float32),
        crossattn_cond=jnp.asarray(rng.randn(B, 2, 4), jnp.float32),
        crossattn_uncond=jnp.zeros((B, 2, 4), jnp.float32),
        gt_latent=jnp.asarray(rng.randn(B, C, T, H, W), jnp.float32),
        condition_video_indicator=jnp.zeros((1, 1, T, 1, 1))
        .at[:, :, :2].set(1.0),
        condition_video_input_mask=jnp.zeros((B, 1, T, H, W)),
        pose_latent_cond=jnp.asarray(rng.randn(B, P, T, H, W), jnp.float32),
        pose_latent_uncond=jnp.zeros((B, P, T, H, W), jnp.float32),
        num_steps=6,
        guidance=1.5,
    )
    batched = np.asarray(generate_samples(**kwargs))
    seq = np.asarray(generate_samples(cfg_sequential=True, **kwargs))
    np.testing.assert_allclose(seq, batched, rtol=1e-5, atol=1e-6)

    # also under whole-output step caching
    batched_c = np.asarray(
        generate_samples(step_cache_interval=2, **kwargs)
    )
    seq_c = np.asarray(
        generate_samples(step_cache_interval=2, cfg_sequential=True,
                         **kwargs)
    )
    np.testing.assert_allclose(seq_c, batched_c, rtol=1e-5, atol=1e-6)


def test_host_loop_matches_fori_loop():
    """generate_samples_host_loop (memory-lean single-chip path) must
    reproduce the one-jit fori_loop sampler, uncached and interval-cached."""
    from gen3c_tpu.diffusion.sampler import generate_samples_host_loop

    B, C, T, H, W, P = _shapes()
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(C + 1 + P, C) * 0.05, jnp.float32)

    def net_fn(params, x_in, t, crossattn):
        h = jnp.einsum("bcthw,cd->bdthw", x_in, w)
        bias = jnp.mean(crossattn, axis=(1, 2))[:, None, None, None, None]
        return jnp.tanh(h + bias + t[:, None, None, None, None] * 0.01)

    kwargs = dict(
        net_fn=net_fn,
        net_params=None,
        init_noise=jnp.asarray(rng.randn(B, C, T, H, W), jnp.float32),
        augment_noise=jnp.asarray(rng.randn(B, C, T, H, W), jnp.float32),
        crossattn_cond=jnp.asarray(rng.randn(B, 2, 4), jnp.float32),
        crossattn_uncond=jnp.zeros((B, 2, 4), jnp.float32),
        gt_latent=jnp.asarray(rng.randn(B, C, T, H, W), jnp.float32),
        condition_video_indicator=jnp.zeros((1, 1, T, 1, 1))
        .at[:, :, :2].set(1.0),
        condition_video_input_mask=jnp.zeros((B, 1, T, H, W)),
        pose_latent_cond=jnp.asarray(rng.randn(B, P, T, H, W), jnp.float32),
        pose_latent_uncond=jnp.zeros((B, P, T, H, W), jnp.float32),
        num_steps=7,
        guidance=1.5,
    )
    ref = np.asarray(generate_samples(**kwargs))
    host = np.asarray(generate_samples_host_loop(**kwargs))
    np.testing.assert_allclose(host, ref, rtol=1e-5, atol=1e-6)

    ref_c = np.asarray(generate_samples(step_cache_interval=3, **kwargs))
    host_c = np.asarray(
        generate_samples_host_loop(step_cache_interval=3, **kwargs)
    )
    np.testing.assert_allclose(host_c, ref_c, rtol=1e-5, atol=1e-6)

    # sequential CFG inside the host step
    host_s = np.asarray(
        generate_samples_host_loop(cfg_sequential=True, **kwargs)
    )
    np.testing.assert_allclose(host_s, ref, rtol=1e-5, atol=1e-6)

    # async dispatch thread (VERDICT r2 #4): identical result via the
    # PendingSamples handle, with the caller's thread busy meanwhile
    pending = generate_samples_host_loop(dispatch_async=True, **kwargs)
    acc = 0.0
    for i in range(200_000):  # synthetic CPU work on the main thread
        acc += i * 1e-9
    host_a = np.asarray(pending.result())
    assert acc > 0
    np.testing.assert_allclose(host_a, ref, rtol=1e-5, atol=1e-6)


def test_host_loop_async_error_propagates():
    """Exceptions on the dispatch thread re-raise in result()."""
    from gen3c_tpu.diffusion.sampler import generate_samples_host_loop

    B, C, T, H, W, P = _shapes()
    rng = np.random.RandomState(2)

    def bad_net(params, x_in, t, crossattn):
        raise RuntimeError("boom in net")

    pending = generate_samples_host_loop(
        net_fn=bad_net,
        net_params=None,
        init_noise=jnp.asarray(rng.randn(B, C, T, H, W), jnp.float32),
        augment_noise=jnp.asarray(rng.randn(B, C, T, H, W), jnp.float32),
        crossattn_cond=jnp.asarray(rng.randn(B, 2, 4), jnp.float32),
        crossattn_uncond=jnp.zeros((B, 2, 4), jnp.float32),
        gt_latent=jnp.asarray(rng.randn(B, C, T, H, W), jnp.float32),
        condition_video_indicator=jnp.zeros((1, 1, T, 1, 1)),
        num_steps=2,
        dispatch_async=True,
    )
    with pytest.raises(RuntimeError, match="boom in net"):
        pending.result()


def test_streaming_sampler_matches_fori_loop():
    """generate_samples_streaming (python net around jitted pre/post
    steps, used by the block-streamed bf16 7B) reproduces the one-jit
    sampler, uncached and interval-cached."""
    from gen3c_tpu.diffusion.sampler import generate_samples_streaming

    B, C, T, H, W, P = _shapes()
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.randn(C + 1 + P, C) * 0.05, jnp.float32)

    def net_fn(params, x_in, t, crossattn):
        h = jnp.einsum("bcthw,cd->bdthw", x_in, w)
        bias = jnp.mean(crossattn, axis=(1, 2))[:, None, None, None, None]
        return jnp.tanh(h + bias + t[:, None, None, None, None] * 0.01)

    kwargs = dict(
        init_noise=jnp.asarray(rng.randn(B, C, T, H, W), jnp.float32),
        augment_noise=jnp.asarray(rng.randn(B, C, T, H, W), jnp.float32),
        crossattn_cond=jnp.asarray(rng.randn(B, 2, 4), jnp.float32),
        crossattn_uncond=jnp.zeros((B, 2, 4), jnp.float32),
        gt_latent=jnp.asarray(rng.randn(B, C, T, H, W), jnp.float32),
        condition_video_indicator=jnp.zeros((1, 1, T, 1, 1))
        .at[:, :, :2].set(1.0),
        condition_video_input_mask=jnp.zeros((B, 1, T, H, W)),
        pose_latent_cond=jnp.asarray(rng.randn(B, P, T, H, W), jnp.float32),
        pose_latent_uncond=jnp.zeros((B, P, T, H, W), jnp.float32),
        num_steps=7,
        guidance=1.5,
    )
    ref = np.asarray(generate_samples(net_fn=net_fn, net_params=None,
                                      **kwargs))

    def net_py(x_in, t_in, crossattn_both):
        return net_fn(None, x_in, t_in, crossattn_both)

    out = np.asarray(generate_samples_streaming(net_py, **kwargs))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    ref_c = np.asarray(generate_samples(net_fn=net_fn, net_params=None,
                                        step_cache_interval=3, **kwargs))
    out_c = np.asarray(
        generate_samples_streaming(net_py, step_cache_interval=3, **kwargs)
    )
    np.testing.assert_allclose(out_c, ref_c, rtol=1e-5, atol=1e-6)


def _solver_kwargs(num_steps=12):
    B, C, T, H, W, P = _shapes()
    rng = np.random.RandomState(21)
    return dict(
        net_params=None,
        init_noise=jnp.asarray(rng.randn(B, C, T, H, W).astype(np.float32)),
        augment_noise=jnp.zeros((B, C, T, H, W)),
        crossattn_cond=jnp.zeros((B, 4, 16)),
        crossattn_uncond=jnp.zeros((B, 4, 16)),
        gt_latent=jnp.asarray(rng.randn(B, C, T, H, W).astype(np.float32)),
        condition_video_indicator=jnp.zeros((1, 1, T, 1, 1))
        .at[:, :, :1].set(1.0),
        condition_video_input_mask=jnp.zeros((B, 1, T, H, W)),
        pose_latent_cond=jnp.zeros((B, P, T, H, W)),
        pose_latent_uncond=jnp.zeros((B, P, T, H, W)),
        num_steps=num_steps,
        guidance=0.0,
    ), rng


def test_multistep_solvers_perfect_denoiser_converge():
    """At equal network cost, res2ab/dpm2m still recover x0 in the
    generation region and keep the conditioned region pinned to gt."""
    B, C, T, H, W, P = _shapes()
    kwargs, rng = _solver_kwargs()
    x0 = rng.randn(B, C, T, H, W).astype(np.float32)
    x0_j = jnp.asarray(x0)
    sched = EDMEulerSchedule()

    def net_fn(params, x_in, t, crossattn):
        sigma = jnp.exp(4.0 * t)[:, None, None, None, None]
        xt = x_in[:, :C] / sched.c_in(sigma)
        return sched.reverse_precondition_output(
            jnp.concatenate([x0_j, x0_j], 0), xt, sigma
        )

    ref = np.asarray(generate_samples(net_fn=net_fn, solver="euler",
                                      **kwargs))
    for solver in ("res2ab", "dpm2m"):
        out = np.asarray(
            generate_samples(net_fn=net_fn, solver=solver, **kwargs)
        )
        # generation region -> x0; conditioned first latent frame matches
        # the euler loop's conditioned-region semantics exactly
        np.testing.assert_allclose(out[:, :, 1:], x0[:, :, 1:],
                                   rtol=2e-3, atol=2e-3, err_msg=solver)
        np.testing.assert_allclose(out[:, :, :1], ref[:, :, :1],
                                   rtol=1e-4, atol=1e-4, err_msg=solver)


def test_multistep_solver_differs_from_euler_on_nonlinear_net():
    """Sanity: the solver option actually changes the trajectory for a
    non-trivial denoiser (and stays finite)."""
    kwargs, _ = _solver_kwargs()

    def net_fn(params, x_in, t, crossattn):
        return jnp.tanh(x_in[:, :4])

    e = np.asarray(generate_samples(net_fn=net_fn, solver="euler", **kwargs))
    r = np.asarray(generate_samples(net_fn=net_fn, solver="res2ab", **kwargs))
    assert np.isfinite(e).all() and np.isfinite(r).all()
    assert np.abs(e - r).max() > 1e-6


def test_multistep_solver_rejects_step_caching():
    import pytest

    kwargs, _ = _solver_kwargs()

    def net_fn(params, x_in, t, crossattn):
        return jnp.tanh(x_in[:, :4])

    with pytest.raises(ValueError, match="not supported with step"):
        generate_samples(net_fn=net_fn, solver="res2ab",
                         step_cache_interval=3, **kwargs)


def test_host_loop_multistep_matches_fori_loop():
    """The host-loop sampler's multistep solvers match the one-jit
    generate_samples(solver=...) trajectories exactly."""
    from gen3c_tpu.diffusion.sampler import generate_samples_host_loop

    kwargs, _ = _solver_kwargs()

    def net_fn(params, x_in, t, crossattn):
        return jnp.tanh(x_in[:, :4])

    for solver in ("res2ab", "dpm2m"):
        ref = np.asarray(
            generate_samples(net_fn=net_fn, solver=solver, **kwargs)
        )
        got = np.asarray(
            generate_samples_host_loop(net_fn=net_fn, solver=solver,
                                       **kwargs)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6,
                                   err_msg=solver)


def test_streaming_multistep_matches_fori_loop():
    """generate_samples_streaming's multistep solvers match the one-jit
    sampler (the python net stands in for the block-streamed DiT)."""
    from gen3c_tpu.diffusion.sampler import generate_samples_streaming

    kwargs, _ = _solver_kwargs()

    def net_fn(params, x_in, t, crossattn):
        return jnp.tanh(x_in[:, :4])

    def net_py(x_in, t_in, crossattn_both):
        return jnp.tanh(x_in[:, :4])

    for solver in ("res2ab", "dpm2m"):
        ref = np.asarray(
            generate_samples(net_fn=net_fn, solver=solver, **kwargs)
        )
        skw = {k: v for k, v in kwargs.items() if k != "net_params"}
        got = np.asarray(
            generate_samples_streaming(net_py, solver=solver, **skw)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6,
                                   err_msg=solver)
