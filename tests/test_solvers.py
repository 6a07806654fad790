"""Multi-solver sampler tests: each solver must recover the target of a
known analytic denoiser, higher-order solvers more accurately."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gen3c_tpu.diffusion.solvers import SOLVERS, sample_ode


def _gaussian_x0_fn(mu):
    """Analytic MMSE denoiser for data = delta(mu): x0(x, sigma) = mu."""

    def x0_fn(x, sigma):
        return jnp.broadcast_to(mu, x.shape)

    return x0_fn


@pytest.mark.parametrize("solver", SOLVERS)
def test_solver_recovers_point_mass(solver):
    mu = jnp.asarray(np.random.RandomState(0).randn(4, 8).astype(np.float32))
    noise = jnp.asarray(np.random.RandomState(1).randn(4, 8).astype(np.float32))
    out = sample_ode(
        _gaussian_x0_fn(mu), noise, num_steps=20, solver=solver
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(mu), atol=1e-2)


def test_heun_more_accurate_than_euler_on_linear_denoiser():
    """For data ~ N(0, I): x0(x, s) = x / (1 + s^2); the exact PF-ODE
    solution from (x0, smax) to 0 is x0 / sqrt(1 + smax^2)."""
    rng = np.random.RandomState(2)
    noise = jnp.asarray(rng.randn(512).astype(np.float32))

    def x0_fn(x, s):
        return x / (1 + s**2)

    from gen3c_tpu.diffusion.scheduler import EDMEulerSchedule

    smax_eff = EDMEulerSchedule().init_noise_sigma
    exact = np.asarray(noise) * smax_eff / np.sqrt(1 + smax_eff**2)

    errs = {}
    for solver in ("euler", "heun", "rk4", "dpm2m"):
        out = np.asarray(sample_ode(x0_fn, noise, num_steps=10, solver=solver))
        errs[solver] = np.abs(out - exact).mean()
    assert errs["heun"] < errs["euler"], errs
    assert errs["rk4"] < errs["euler"], errs
    assert errs["dpm2m"] < errs["euler"], errs


def test_solver_shapes_and_finiteness():
    noise = jnp.asarray(
        np.random.RandomState(3).randn(1, 4, 2, 4, 4).astype(np.float32)
    )

    def x0_fn(x, s):
        return jnp.tanh(x)

    for solver in SOLVERS:
        out = sample_ode(x0_fn, noise, num_steps=6, solver=solver)
        assert out.shape == noise.shape
        assert np.isfinite(np.asarray(out)).all(), solver


def test_res_x0_rk2_step_matches_reference():
    """res_x0_rk2_step == the reference torch implementation
    (functional/runge_kutta.py:53-95), elementwise."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    from cosmos_predict1.diffusion.functional.runge_kutta import (
        res_x0_rk2_step as ref_step,
    )

    from gen3c_tpu.diffusion.solvers import res_x0_rk2_step

    rng = np.random.RandomState(0)
    x_s = rng.randn(2, 3, 4).astype(np.float32)
    x0_s = rng.randn(2, 3, 4).astype(np.float32)
    x0_s1 = rng.randn(2, 3, 4).astype(np.float32)
    s, t, s1 = 1.2, 0.7, 2.1  # current, target, previous sigmas

    ref = ref_step(
        torch.from_numpy(x_s),
        torch.full((2,), t), torch.full((2,), s),
        torch.from_numpy(x0_s),
        torch.full((2,), s1), torch.from_numpy(x0_s1),
    ).numpy()
    got = np.asarray(
        res_x0_rk2_step(
            jnp.asarray(x_s), jnp.asarray(t), jnp.asarray(s),
            jnp.asarray(x0_s), jnp.asarray(s1), jnp.asarray(x0_s1),
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_res2ab_loop_matches_reference_sampler_loop():
    """The whole res2ab trajectory == the reference Sampler's "2ab"
    multistep loop (multi_step.py order2_fn driven step by step)."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    from cosmos_predict1.diffusion.functional.multi_step import (
        get_multi_step_fn,
    )

    from gen3c_tpu.diffusion.scheduler import EDMEulerSchedule

    sch = EDMEulerSchedule()
    sigmas = np.asarray(sch.sigmas(10))
    noise = np.random.RandomState(7).randn(1, 4, 2, 4, 4).astype(np.float32)

    x = torch.from_numpy(noise) * sch.init_noise_sigma
    fn = get_multi_step_fn("2ab")
    x0_preds = []
    for i in range(10):
        s, t = float(sigmas[i]), float(sigmas[i + 1])
        x0 = x / (1 + s**2)
        if t <= 0:
            x = x0  # final Euler step to sigma=0
            break
        x, x0_preds = fn(x, torch.tensor([s]), torch.tensor([t]), x0,
                         x0_preds)
    ref = x.numpy()

    got = np.asarray(
        sample_ode(lambda x, s: x / (1 + s**2), jnp.asarray(noise),
                   num_steps=10, solver="res2ab")
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_res2mid_loop_matches_reference_rk2_mid():
    """The res2mid trajectory == the reference Sampler's default RK
    ("2mid": runge_kutta.py rk2_mid, geometric-midpoint exponential
    integrator) driven step by step, with the final step to sigma=0
    taken as the plain Euler step."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    from cosmos_predict1.diffusion.functional.runge_kutta import rk2_mid

    from gen3c_tpu.diffusion.scheduler import EDMEulerSchedule

    sch = EDMEulerSchedule()
    sigmas = np.asarray(sch.sigmas(8))
    noise = np.random.RandomState(11).randn(1, 4, 2, 4, 4).astype(np.float32)

    def torch_x0_fn(x, s):
        return x / (1 + s**2)

    x = torch.from_numpy(noise) * sch.init_noise_sigma
    for i in range(8):
        s, t = float(sigmas[i]), float(sigmas[i + 1])
        if t <= 0:
            x = torch_x0_fn(x, torch.tensor([s]))
            break
        x, _ = rk2_mid(x, torch.tensor([s]), torch.tensor([t]),
                       lambda xx, ss: xx / (1 + ss**2))
    ref = x.numpy()

    got = np.asarray(
        sample_ode(lambda x, s: x / (1 + s**2), jnp.asarray(noise),
                   num_steps=8, solver="res2mid")
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_multistep_degenerate_lanes_finite():
    """On TPU, lax.cond over cheap elementwise branches lowers to a
    both-branches select, so the step functions are evaluated at the
    degenerate values the callers gate away (t=0 final step, s1==s
    first step, prev_sigma=0 host-loop warmup) — and a NaN/inf there
    poisons the select output (observed: all-NaN res2ab samples on
    v5e). The lanes must be finite by construction."""
    from gen3c_tpu.diffusion.solvers import dpm2m_x0_step, res_x0_rk2_step

    x = jnp.asarray(np.random.RandomState(0).randn(4, 8).astype(np.float32))
    x = x * 80.0  # sigma_max-scaled noise: large enough to overflow
    # any nan_to_num(inf)-sized coefficient into inf
    x0a, x0b = 0.9 * x, 0.8 * x
    s0, s1, s2 = 80.0, 1.749, 2e-4
    for fn in (res_x0_rk2_step, dpm2m_x0_step):
        for (t, s, sp) in (
            (0.0, s2, s1),   # final step: t == 0
            (s1, s0, s0),    # first step: prev sigma == current
            (s2, s1, 0.0),   # host-loop warmup: prev_sigma == 0
        ):
            out = np.asarray(
                fn(x, jnp.float32(t), jnp.float32(s), x0a,
                   jnp.float32(sp), x0b)
            )
            assert np.isfinite(out).all(), (fn.__name__, t, s, sp)
    # t -> 0 limit with IDENTICAL x0 predictions is exactly that x0
    # (no extrapolation left; checks the clamp lands on the ODE limit)
    for fn in (res_x0_rk2_step, dpm2m_x0_step):
        out = np.asarray(
            fn(x, jnp.float32(0.0), jnp.float32(s2), x0a,
               jnp.float32(s1), x0a)
        )
        np.testing.assert_allclose(out, np.asarray(x0a), rtol=1e-2,
                                   atol=1e-2)
