"""EDM Euler scheduler (Karras et al. 2022), pure JAX.

Re-derivation of the diffusers ``EDMEulerScheduler`` semantics the
reference relies on (reference: model_t2w.py:65 constructs
``EDMEulerScheduler(sigma_max=80, sigma_min=0.0002, sigma_data=0.5)``;
the sampling loop in model_v2w.py:121-149 uses set_timesteps,
_init_step_index, sigmas, scale_model_input, step):

  * karras sigma schedule with rho=7:
    sigma_i = (smax^(1/rho) + i/(N-1) * (smin^(1/rho) - smax^(1/rho)))^rho,
    with a trailing 0 appended
  * timesteps (c_noise) = 0.25 * ln(sigma)  — this is what the DiT's
    timestep embedder receives
  * init_noise_sigma = (sigma_max^2 + 1)^0.5
  * preconditioning: c_in = 1/sqrt(sigma^2 + sigma_data^2),
    c_skip = sigma_data^2/(sigma^2+sigma_data^2),
    c_out = sigma*sigma_data/sqrt(sigma^2+sigma_data^2)
  * Euler step: denoised = c_skip*x + c_out*model_out;
    x_{i+1} = x_i + (sigma_{i+1} - sigma_i) * (x_i - denoised)/sigma_i

Everything is a pure function of (sigma, x) so the whole sampling loop
jit-compiles into a single XLA program with a fori_loop.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class EDMEulerSchedule:
    sigma_min: float = 0.0002
    sigma_max: float = 80.0
    sigma_data: float = 0.5
    rho: float = 7.0

    @property
    def init_noise_sigma(self) -> float:
        return float((self.sigma_max**2 + 1) ** 0.5)

    def sigmas(self, num_steps: int) -> np.ndarray:
        """num_steps+1 sigmas (last is 0)."""
        ramp = np.linspace(0, 1, num_steps)
        min_inv = self.sigma_min ** (1 / self.rho)
        max_inv = self.sigma_max ** (1 / self.rho)
        s = (max_inv + ramp * (min_inv - max_inv)) ** self.rho
        return np.concatenate([s, [0.0]]).astype(np.float32)

    def timesteps(self, num_steps: int) -> np.ndarray:
        """c_noise values fed to the network: 0.25*ln(sigma)."""
        return (0.25 * np.log(self.sigmas(num_steps)[:-1])).astype(np.float32)

    # -- preconditioning (all shapes broadcast against x) --

    def c_in(self, sigma):
        return 1.0 / (sigma**2 + self.sigma_data**2) ** 0.5

    def c_skip(self, sigma):
        return self.sigma_data**2 / (sigma**2 + self.sigma_data**2)

    def c_out(self, sigma):
        return sigma * self.sigma_data / (sigma**2 + self.sigma_data**2) ** 0.5

    def precondition_inputs(self, x: Array, sigma) -> Array:
        return x * self.c_in(sigma)

    def precondition_outputs(self, x: Array, model_output: Array, sigma) -> Array:
        return self.c_skip(sigma) * x + self.c_out(sigma) * model_output

    def step(self, model_output: Array, x: Array, sigma, sigma_next) -> Array:
        """One Euler step from sigma to sigma_next."""
        denoised = self.precondition_outputs(x, model_output, sigma)
        derivative = (x - denoised) / sigma
        return x + (sigma_next - sigma) * derivative

    # -- inversions used by the v2w conditioned-region logic --

    def reverse_precondition_input(self, xt: Array, sigma) -> Array:
        """Undo c_in scaling (model_v2w.py:249-252)."""
        return xt / self.c_in(sigma)

    def reverse_precondition_output(self, latent: Array, xt: Array, sigma) -> Array:
        """Model output that makes precondition_outputs return `latent`
        (model_v2w.py:254-259)."""
        return (latent - self.c_skip(sigma) * xt) / self.c_out(sigma)
