"""EDM Euler scheduler math tests (hand-derived diffusers parity)."""

import numpy as np

import jax.numpy as jnp

from gen3c_tpu.diffusion.scheduler import EDMEulerSchedule


def test_karras_sigma_schedule():
    s = EDMEulerSchedule()
    sig = s.sigmas(35)
    assert sig.shape == (36,)
    np.testing.assert_allclose(sig[0], 80.0, rtol=1e-6)
    np.testing.assert_allclose(sig[34], 0.0002, rtol=1e-5)
    assert sig[35] == 0.0
    assert np.all(np.diff(sig) < 0)  # strictly decreasing
    # karras formula at midpoint, rho=7
    i = 17
    ramp = i / 34
    expect = (80 ** (1 / 7) + ramp * (0.0002 ** (1 / 7) - 80 ** (1 / 7))) ** 7
    np.testing.assert_allclose(sig[i], expect, rtol=1e-6)


def test_timesteps_are_quarter_log_sigma():
    s = EDMEulerSchedule()
    t = s.timesteps(10)
    sig = s.sigmas(10)[:-1]
    np.testing.assert_allclose(t, 0.25 * np.log(sig), rtol=1e-6)


def test_init_noise_sigma():
    s = EDMEulerSchedule()
    np.testing.assert_allclose(s.init_noise_sigma, (80.0**2 + 1) ** 0.5)


def test_preconditioning_identities():
    s = EDMEulerSchedule()
    sigma = 3.7
    # c_skip + sigma-weighted c_out relation: c_skip^2 + (c_out/sigma_data)^2 * ... –
    # check the EDM identities directly
    np.testing.assert_allclose(s.c_in(sigma), 1 / np.sqrt(sigma**2 + 0.25))
    np.testing.assert_allclose(s.c_skip(sigma), 0.25 / (sigma**2 + 0.25))
    np.testing.assert_allclose(
        s.c_out(sigma), sigma * 0.5 / np.sqrt(sigma**2 + 0.25)
    )


def test_reverse_precondition_output_roundtrip():
    s = EDMEulerSchedule()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3).astype(np.float32))
    latent = jnp.asarray(rng.randn(2, 3).astype(np.float32))
    sigma = 1.3
    model_out = s.reverse_precondition_output(latent, x, sigma)
    denoised = s.precondition_outputs(x, model_out, sigma)
    np.testing.assert_allclose(np.asarray(denoised), np.asarray(latent), rtol=1e-5)


def test_euler_step_reaches_denoised_at_zero_sigma():
    # one Euler step from sigma to 0 with a perfect denoiser lands on x0
    s = EDMEulerSchedule()
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(4).astype(np.float32))
    sigma = 2.0
    noise = jnp.asarray(rng.randn(4).astype(np.float32))
    xt = x0 + sigma * noise
    model_out = s.reverse_precondition_output(x0, xt, sigma)
    x_next = s.step(model_out, xt, sigma, 0.0)
    np.testing.assert_allclose(np.asarray(x_next), np.asarray(x0), rtol=1e-4, atol=1e-5)
