"""Multi-solver samplers over the EDM sigma schedule.

Parity: cosmos_predict1/diffusion/modules/res_sampler.py +
functional/{multi_step,runge_kutta}.py — the in-repo Sampler supporting
multiple ODE solvers (EDM Euler / Heun, DDIM, DPM-style multistep,
Runge-Kutta) over a Karras sigma schedule. GEN3C inference itself uses
the Euler loop in diffusion/sampler.py; these solvers cover the wider
Cosmos sampling surface (text2world quality sampling, ablations).

All solvers consume a denoiser x0_fn(x, sigma) -> x0 prediction and run
the whole loop inside jit via lax.fori_loop.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from gen3c_tpu.diffusion.scheduler import EDMEulerSchedule

Array = jax.Array
X0Fn = Callable[[Array, Array], Array]

SOLVERS = ("euler", "heun", "dpm2m", "rk4", "ddim", "res2ab", "res2mid")


def _phi1(t: Array) -> Array:
    """(exp(t) - 1) / t  (runge_kutta.py:22-35); t -> 0 limit is 1."""
    t_safe = jnp.where(t == 0.0, 1.0, t)
    return jnp.where(t == 0.0, 1.0, jnp.expm1(t_safe) / t_safe)


def _phi2(t: Array) -> Array:
    """(phi1(t) - 1) / t  (runge_kutta.py:38-50); t -> 0 limit is 1/2."""
    t_safe = jnp.where(t == 0.0, 1.0, t)
    return jnp.where(t == 0.0, 0.5, (_phi1(t_safe) - 1.0) / t_safe)


# Every lane of these step functions MUST stay finite even at the
# degenerate argument values the callers' lax.cond gates away (t = 0 on
# the final step, s1 == s on the first): on TPU, XLA lowers a cond whose
# branches are cheap elementwise math to a select that EVALUATES BOTH
# BRANCHES, and a NaN/inf produced in the untaken lane poisons the
# select output (observed: all-NaN res2ab samples on a v5e while the
# same program is clean on CPU, where cond stays a real branch).


def dpm2m_x0_step(x_s: Array, t: Array, s: Array, x0_s: Array,
                  s1: Array, x0_s1: Array) -> Array:
    """DPM-Solver++(2M) data-prediction multistep step in sigma space:
    extrapolate x0 from the current (s) and previous (s1) predictions,
    then take the exponential-integrator first-order step to t. Shared
    by sample_ode and all three production samplers (argument order
    matches res_x0_rk2_step). Degenerate lanes are finite: t = 0 steps
    to x0 (the correct limit), s1 == s degrades to the first-order
    step."""
    t = jnp.maximum(t, 1e-10)
    h = jnp.log(t) - jnp.log(s)
    h_last = jnp.log(s) - jnp.log(s1)
    r = h_last / h
    r_safe = jnp.where(r == 0.0, 1.0, r)
    coef = jnp.where(r == 0.0, 0.0, 1.0 / (2.0 * r_safe))
    x0_bar = (1 + coef) * x0_s - coef * x0_s1
    return x_s * (t / s) + (1 - t / s) * x0_bar


def res_x0_rk2_step(x_s: Array, t: Array, s: Array, x0_s: Array,
                    s1: Array, x0_s1: Array) -> Array:
    """Residual (exponential-integrator) 2nd-order step in -log-sigma
    time (runge_kutta.py:53-95 parity): the update rule behind the
    reference Sampler's "2ab" Adams-Bashforth multistep
    (functional/multi_step.py:28-40, arXiv:2308.02157). Degenerate
    lanes are finite: t = 0 steps to (approximately) x0_s, s1 == s
    zeroes the second-order term."""
    t = jnp.maximum(t, 1e-10)
    s_ = -jnp.log(s)
    t_ = -jnp.log(t)
    m_ = -jnp.log(s1)
    dt = t_ - s_
    c2 = (m_ - s_) / dt
    c2_safe = jnp.where(c2 == 0.0, 1.0, c2)
    p1, p2 = _phi1(-dt), _phi2(-dt)
    b2 = jnp.where(c2 == 0.0, 0.0, p2 / c2_safe)
    b1 = p1 - b2
    return jnp.exp(-dt) * x_s + dt * (b1 * x0_s + b2 * x0_s1)


def _to_x0_steps(schedule: EDMEulerSchedule, num_steps: int) -> Array:
    return jnp.asarray(schedule.sigmas(num_steps))


@partial(jax.jit, static_argnames=("x0_fn", "solver", "num_steps", "schedule"))
def sample_ode(
    x0_fn: X0Fn,
    init_noise: Array,  # ~N(0,1), same shape as the latent
    num_steps: int = 35,
    solver: str = "euler",
    schedule: EDMEulerSchedule = EDMEulerSchedule(),
) -> Array:
    """Integrate the probability-flow ODE dx/dsigma = (x - x0(x,sigma))/sigma
    from sigma_max to 0 with the chosen solver."""
    assert solver in SOLVERS, solver
    sigmas = _to_x0_steps(schedule, num_steps)
    x = init_noise.astype(jnp.float32) * schedule.init_noise_sigma

    def d(x, sigma):
        # sigma clamp: heun's corrector lane and rk4's k-stages evaluate
        # d at sigma = 0 inside an un-taken cond branch; on TPU cond can
        # lower to a both-branches select, so the lane must stay finite
        # (c_noise(0) = log(0) would NaN the net input otherwise).
        sigma = jnp.maximum(sigma, 1e-10)
        return (x - x0_fn(x, sigma)) / sigma

    if solver in ("euler", "ddim"):
        # DDIM (eta=0) in sigma parameterization == Euler on the PF-ODE

        def body(i, x):
            s, s1 = sigmas[i], sigmas[i + 1]
            return x + (s1 - s) * d(x, s)

        return jax.lax.fori_loop(0, num_steps, body, x)

    if solver == "heun":
        # EDM 2nd-order (Karras Alg. 1): trapezoidal correction except at
        # the final step to sigma=0

        def body(i, x):
            s, s1 = sigmas[i], sigmas[i + 1]
            d0 = d(x, s)
            x_euler = x + (s1 - s) * d0

            def correct(_):
                d1 = d(x_euler, s1)
                return x + (s1 - s) * 0.5 * (d0 + d1)

            return jax.lax.cond(s1 > 0, correct, lambda _: x_euler, None)

        return jax.lax.fori_loop(0, num_steps, body, x)

    if solver == "rk4":

        def body(i, x):
            s, s1 = sigmas[i], sigmas[i + 1]
            h = s1 - s
            sm = s + 0.5 * h
            k1 = d(x, s)

            def full(_):
                k2 = d(x + 0.5 * h * k1, sm)
                k3 = d(x + 0.5 * h * k2, sm)
                k4 = d(x + h * k3, jnp.maximum(s1, 1e-8))
                return x + h / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)

            return jax.lax.cond(s1 > 0, full, lambda _: x + h * k1, None)

        return jax.lax.fori_loop(0, num_steps, body, x)

    if solver == "res2mid":
        # reference Sampler's default RK ("2mid", runge_kutta.py:182-204):
        # Euler to the geometric midpoint s1 = sqrt(s*t), then the
        # exponential-integrator 2nd-order step from both x0 predictions
        # (2 net evaluations per step). The final step to sigma = 0
        # degenerates to the plain Euler step, as in rk1_euler.

        def body(i, x):
            s, t = sigmas[i], sigmas[i + 1]
            x0_s = x0_fn(x, jnp.maximum(s, 1e-10))

            def full(_):
                s1 = jnp.sqrt(jnp.maximum(s * t, 1e-20))
                x_s1 = x * (s1 / s) + (1 - s1 / s) * x0_s
                x0_s1 = x0_fn(x_s1, s1)
                return res_x0_rk2_step(x, t, s, x0_s, s1, x0_s1)

            def last(_):
                return x * (t / s) + (1 - t / s) * x0_s

            return jax.lax.cond(t > 0, full, last, None)

        return jax.lax.fori_loop(0, num_steps, body, x)

    if solver == "res2ab":
        # reference Sampler's "2ab" multistep (multi_step.py:28-40):
        # Euler on the first step, exponential-integrator AB2 after

        def body(i, carry):
            x, prev_x0 = carry
            s, s1n = sigmas[i], sigmas[i + 1]
            x0 = x0_fn(x, s)

            def first_or_last(_):
                # reg_x0_euler_step (runge_kutta.py:98-118)
                return x * (s1n / s) + (1 - s1n / s) * x0

            def multistep(_):
                prev_s = sigmas[jnp.maximum(i - 1, 0)]
                return res_x0_rk2_step(x, s1n, s, x0, prev_s, prev_x0)

            use_multi = jnp.logical_and(i > 0, s1n > 0)
            x_next = jax.lax.cond(use_multi, multistep, first_or_last, None)
            return (x_next, x0)

        (x, _), = (jax.lax.fori_loop(0, num_steps, body, (x, x)),)
        return x

    # dpm2m: DPM-Solver++(2M) in log-sigma time with x0 predictions

    def body(i, carry):
        x, prev_x0 = carry
        s, s1 = sigmas[i], sigmas[i + 1]
        x0 = x0_fn(x, s)

        def first_or_last(_):
            return x * (s1 / s) + (1 - s1 / s) * x0

        def multistep(_):
            prev_s = sigmas[jnp.maximum(i - 1, 0)]
            return dpm2m_x0_step(x, s1, s, x0, prev_s, prev_x0)

        use_multi = jnp.logical_and(i > 0, s1 > 0)
        x_next = jax.lax.cond(use_multi, multistep, first_or_last, None)
        return (x_next, x0)

    (x, _), = (jax.lax.fori_loop(0, num_steps, body, (x, x)),)
    return x
