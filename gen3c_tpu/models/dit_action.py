"""Action-conditioned DiT — the robot post-training family.

Parity target: cosmos_predict1/diffusion/training/networks/
general_dit_action.py:276-431 (ActionConditionalVideoExtendGeneralDIT):
the base video-extend DiT plus two timm-Mlp action embedders
(7 -> 4*D gelu(tanh) -> D and 7 -> 4*D -> 3*D). Only the 3D embedder
affects the forward (the B_D add lands on a rebound local after the
affline alias was taken — see dit.dit_forward docstring); both are
carried for checkpoint compatibility. Used by the
video2world_action training experiments
(training/config/video2world_action/experiment.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gen3c_tpu.models.dit import DiTConfig, init_dit_params

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ActionDiTConfig(DiTConfig):
    # bridge robot action: [dx, dy, dz, droll, dpitch, dyaw, gripper]
    # (general_dit_action.py:290-304 hardcodes in_features=7)
    action_dim: int = 7


def _init_mlp(key: Array, d_in: int, d_hidden: int, d_out: int,
              dtype) -> dict:
    """timm Mlp init (fc1/fc2 torch Linear defaults: kaiming-uniform
    weights, uniform biases)."""
    import numpy as np

    k1, k2, k3, k4 = jax.random.split(key, 4)
    b1 = 1.0 / np.sqrt(d_in)
    b2 = 1.0 / np.sqrt(d_hidden)
    return {
        "fc1": {
            "w": jax.random.uniform(
                k1, (d_in, d_hidden), dtype, -b1, b1),
            "b": jax.random.uniform(k2, (d_hidden,), dtype, -b1, b1),
        },
        "fc2": {
            "w": jax.random.uniform(
                k3, (d_hidden, d_out), dtype, -b2, b2),
            "b": jax.random.uniform(k4, (d_out,), dtype, -b2, b2),
        },
    }


def init_action_dit_params(key: Array, cfg: ActionDiTConfig,
                           param_dtype=jnp.float32) -> dict:
    params = init_dit_params(key, cfg, param_dtype)
    D = cfg.model_channels
    k1, k2 = jax.random.split(jax.random.fold_in(key, 777))
    params["action_embedder_B_D"] = _init_mlp(
        k1, cfg.action_dim, 4 * D, D, param_dtype)
    params["action_embedder_B_3D"] = _init_mlp(
        k2, cfg.action_dim, 4 * D, 3 * D, param_dtype)
    return params
