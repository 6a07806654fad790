"""EMA weight tracking (reference: utils/ema.py — EMAModelTracker buffers
+ PowerEMATracker power-law beta). Functional: EMA state is just a param
pytree updated per step; PowerEMA computes beta(iteration) on the fly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, beta: float):
    """ema <- beta * ema + (1 - beta) * params (utils/ema.py parity)."""
    return jax.tree.map(
        lambda e, p: (beta * e + (1.0 - beta) * p.astype(e.dtype)).astype(
            e.dtype
        ),
        ema_params,
        params,
    )


def power_ema_beta(iteration, exp: float = 0.6667) -> jnp.ndarray:
    """PowerEMATracker beta schedule (utils/ema.py): beta = (1 - 1/i)^(exp+1)."""
    i = jnp.maximum(jnp.asarray(iteration, jnp.float32), 1.0)
    return (1.0 - 1.0 / i) ** (exp + 1.0)
