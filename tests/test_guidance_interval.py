"""Guidance-interval (limited-interval CFG) tests.

The knob restricts CFG to the denoise steps whose sigma lies inside
[sigma_lo, sigma_hi] (Kynkaanniemi et al., arXiv:2404.07724); outside
the interval only the CONDITIONED forward runs (batch B instead of 2B)
and the guidance term is dropped. The reference pipeline has no such
knob (CFG runs every step — model_v2w.py:130-149); this is a TPU-side
speed/quality lever, so the tests here pin its semantics against the
exact loop rather than a torch oracle.
"""

import numpy as np

import jax.numpy as jnp

from gen3c_tpu.diffusion.sampler import (
    generate_samples,
    generate_samples_host_loop,
    generate_samples_streaming,
    guidance_interval_steps,
)
from gen3c_tpu.diffusion.scheduler import EDMEulerSchedule


def _shapes(B=1, C=4, T=6, H=8, W=8, P=8):
    return B, C, T, H, W, P


def _harness(num_steps=7, guidance=1.5):
    """A CFG-sensitive tiny net + full argument set (net output depends
    on the crossattn embedding, so cond and uncond forwards differ)."""
    B, C, T, H, W, P = _shapes()
    rng = np.random.RandomState(3)
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
        num_steps=num_steps,
        guidance=guidance,
    )
    return net_fn, kwargs


def _mid_interval(num_steps):
    """A sigma interval covering the middle third of the schedule."""
    sig = np.asarray(EDMEulerSchedule().sigmas(num_steps))[:num_steps]
    lo, hi = sig[2 * num_steps // 3], sig[num_steps // 3]
    return (float(lo), float(hi))


def test_interval_steps_static_math():
    sched = EDMEulerSchedule()
    n = 35
    sig = np.asarray(sched.sigmas(n))[:n]
    # full coverage
    assert guidance_interval_steps(sched, n, (0.0, float(sig[0]) + 1)) == (
        0, n,
    )
    # empty
    assert guidance_interval_steps(
        sched, n, (1e9, 2e9)
    ) == (0, 0)
    # a middle interval is contiguous and matches a direct scan
    lo, hi = float(sig[20]), float(sig[10])
    i0, i1 = guidance_interval_steps(sched, n, (lo, hi))
    active = [(lo <= s <= hi) for s in sig]
    assert active == [i0 <= i < i1 for i in range(n)]
    assert i0 == 10 and i1 == 21


def test_full_interval_is_identity():
    """An interval covering every sigma must be bit-identical to the
    plain CFG loop (it collapses to the single-loop program)."""
    _, kwargs = _harness()
    sig = np.asarray(EDMEulerSchedule().sigmas(kwargs["num_steps"]))
    ref = np.asarray(generate_samples(**kwargs))
    full = np.asarray(
        generate_samples(
            guidance_interval=(0.0, float(sig[0]) + 1.0), **kwargs
        )
    )
    np.testing.assert_array_equal(full, ref)


def test_empty_interval_matches_guidance_zero():
    """With CFG never active, the loop runs condition-only forwards —
    exactly the guidance=0 semantics (net_output = out_cond)."""
    _, kwargs = _harness()
    kwargs_g0 = dict(kwargs, guidance=0.0)
    ref = np.asarray(generate_samples(**kwargs_g0))
    out = np.asarray(
        generate_samples(guidance_interval=(1e9, 2e9), **kwargs)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)


def test_mid_interval_differs_and_host_loop_matches():
    """A middle interval changes the trajectory vs full CFG, and the
    host-loop sampler reproduces the whole-loop jit bitwise-close."""
    _, kwargs = _harness()
    gi = _mid_interval(kwargs["num_steps"])
    ref_full = np.asarray(generate_samples(**kwargs))
    ref = np.asarray(generate_samples(guidance_interval=gi, **kwargs))
    assert np.abs(ref - ref_full).mean() > 1e-5
    host = np.asarray(
        generate_samples_host_loop(guidance_interval=gi, **kwargs)
    )
    np.testing.assert_allclose(host, ref, rtol=1e-5, atol=1e-6)


def test_interval_composes_with_step_cache():
    """guidance_interval + fixed-interval step caching: whole-loop and
    host-loop implement the same refresh schedule (incl. the forced
    full refresh on CFG-range re-entry) and must agree."""
    _, kwargs = _harness(num_steps=9)
    gi = _mid_interval(kwargs["num_steps"])
    ref = np.asarray(
        generate_samples(
            guidance_interval=gi, step_cache_interval=3, **kwargs
        )
    )
    host = np.asarray(
        generate_samples_host_loop(
            guidance_interval=gi, step_cache_interval=3, **kwargs
        )
    )
    np.testing.assert_allclose(host, ref, rtol=1e-5, atol=1e-6)
    # caching on top of the interval changes the result (sanity that
    # the cached path actually engaged)
    uncached = np.asarray(
        generate_samples(guidance_interval=gi, **kwargs)
    )
    assert np.abs(ref - uncached).mean() > 1e-7


def test_interval_multistep_host_loop_matches():
    """Multistep solvers (res2ab/dpm2m) support the interval too."""
    _, kwargs = _harness()
    gi = _mid_interval(kwargs["num_steps"])
    for solver in ("res2ab", "dpm2m"):
        ref = np.asarray(
            generate_samples(guidance_interval=gi, solver=solver, **kwargs)
        )
        host = np.asarray(
            generate_samples_host_loop(
                guidance_interval=gi, solver=solver, **kwargs
            )
        )
        np.testing.assert_allclose(host, ref, rtol=1e-5, atol=1e-6)


def test_interval_streaming_matches():
    """The block-streaming sampler implements the same semantics."""
    net_fn, kwargs = _harness()
    gi = _mid_interval(kwargs["num_steps"])

    def net_py(x_in, t_in, crossattn):
        return net_fn(None, x_in, t_in, crossattn)

    skw = dict(kwargs)
    skw.pop("net_fn")
    skw.pop("net_params")
    ref = np.asarray(generate_samples(guidance_interval=gi, **kwargs))
    stream = np.asarray(
        generate_samples_streaming(net_py, guidance_interval=gi, **skw)
    )
    np.testing.assert_allclose(stream, ref, rtol=1e-5, atol=1e-6)
    # and with caching on top
    ref_c = np.asarray(
        generate_samples(
            guidance_interval=gi, step_cache_interval=3, **kwargs
        )
    )
    stream_c = np.asarray(
        generate_samples_streaming(
            net_py, guidance_interval=gi, step_cache_interval=3, **skw
        )
    )
    np.testing.assert_allclose(stream_c, ref_c, rtol=1e-5, atol=1e-6)


def test_interval_rejects_adaptive_and_span():
    """Adaptive/span caching do not compose with the interval."""
    import pytest

    _, kwargs = _harness()
    gi = _mid_interval(kwargs["num_steps"])
    with pytest.raises(ValueError, match="guidance_interval"):
        generate_samples(
            guidance_interval=gi, step_cache_threshold=0.05, **kwargs
        )


def test_interval_validation():
    import pytest

    sched = EDMEulerSchedule()
    with pytest.raises(ValueError, match="guidance_interval"):
        guidance_interval_steps(sched, 10, (2.0, 1.0))
    with pytest.raises(ValueError, match="guidance_interval"):
        guidance_interval_steps(sched, 10, (-1.0, 1.0))


def test_perf_preset_expansion():
    """--perf_preset fast expands only defaults; explicit flags win."""
    import argparse

    from gen3c_tpu.pipelines.factory import apply_perf_preset

    ns = argparse.Namespace(
        perf_preset="fast", quantize_w8a8=False, quantize_int8=False,
        attn_temporal_window=None, step_cache_interval=1,
        step_cache_threshold=0.0, guidance_interval=None,
    )
    apply_perf_preset(ns)
    assert ns.quantize_w8a8 and ns.attn_temporal_window == 2
    assert ns.step_cache_interval == 2
    assert tuple(ns.guidance_interval) == (1.75, 81.0)

    ns2 = argparse.Namespace(
        perf_preset="fast", quantize_w8a8=False, quantize_int8=True,
        attn_temporal_window=4, step_cache_interval=3,
        step_cache_threshold=0.0, guidance_interval=[0.1, 2.0],
    )
    apply_perf_preset(ns2)
    assert not ns2.quantize_w8a8 and ns2.attn_temporal_window == 4
    assert ns2.step_cache_interval == 3
    assert ns2.guidance_interval == [0.1, 2.0]

    ns3 = argparse.Namespace(perf_preset="exact", quantize_w8a8=False)
    apply_perf_preset(ns3)
    assert not ns3.quantize_w8a8

    # the preset's sigma interval pins CFG to the 17 highest-sigma steps
    # of the 35-step schedule (~q0.5; sigma[17]=1.7492 < 1.75)
    assert guidance_interval_steps(
        EDMEulerSchedule(), 35, (1.75, 81.0)
    ) == (0, 17)
