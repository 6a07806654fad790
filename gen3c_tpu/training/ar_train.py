"""Autoregressive world-model training: next-token cross-entropy.

Parity: cosmos_predict1/autoregressive/training/ (model.py + trainer) —
teacher-forced next-token prediction over FSQ video tokens, optional
z-loss stabilizer and label smoothing; one jitted step with the same
(dp, tp) mesh shardings as the diffusion trainer.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax

from gen3c_tpu.models.ar_transformer import ARConfig, ar_forward, rope_tables

Array = jax.Array


def ar_loss(
    params: Any,
    cfg: ARConfig,
    tokens: Array,  # (B, L) int32 — full sequence
    context: Array = None,
    label_smoothing: float = 0.0,
    z_loss: float = 1e-4,
) -> Tuple[Array, dict]:
    """Causal LM loss: predict tokens[:, 1:] from tokens[:, :-1]."""
    rope = rope_tables(cfg)
    logits, _ = ar_forward(params, cfg, tokens[:, :-1], rope, None, context)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if label_smoothing > 0:
        smooth = -logp.mean(axis=-1)
        nll = (1 - label_smoothing) * nll + label_smoothing * smooth
    loss = nll.mean()
    if z_loss > 0:
        lse = jax.nn.logsumexp(logits, axis=-1)
        loss = loss + z_loss * jnp.mean(lse**2)
    acc = jnp.mean(
        (jnp.argmax(logits, axis=-1) == targets).astype(jnp.float32)
    )
    return loss, {"loss": loss, "accuracy": acc}


def ar_train_step(
    params: Any,
    opt_state: Any,
    tokens: Array,
    cfg: ARConfig,
    optimizer: optax.GradientTransformation,
    context: Array = None,
) -> Tuple[Any, Any, dict]:
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: ar_loss(p, cfg, tokens, context), has_aux=True
    )(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    metrics["grad_norm"] = optax.global_norm(grads)
    return params, opt_state, metrics
