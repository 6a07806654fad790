"""LoRA / PEFT fine-tuning for the DiT.

Parity: diffusion/training/utils/peft/ (+ layer_control/) — low-rank
adapters injected into the attention q/k/v/output projections per block,
with config-parsed per-layer control. Functional formulation: the
adapters live in their own pytree; training differentiates only that
pytree and the merged weights W + scale * (A @ B) are materialized
on-the-fly inside the jitted step (one extra matmul per adapted weight).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

Array = jax.Array

DEFAULT_TARGETS = r"blocks/\d+/(fa|ca)/(q|k|v|out)/w$"


def _iter_paths(params):
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
        )
        yield name, leaf


def init_lora_params(
    key: Array,
    params: Any,
    rank: int = 16,
    targets: str = DEFAULT_TARGETS,
    dtype=jnp.float32,
    plan: Optional[Dict[str, Tuple[int, float]]] = None,
) -> Dict[str, Dict[str, Array]]:
    """A/B adapters (A ~ N(0, 1/r), B = 0 so the model starts unchanged).

    plan: fine-grained per-parameter {path: (rank, scale)} from
    training.peft_control.parse_layer_control (the reference's
    LayerControlConfigParser semantics) — overrides targets/rank. The
    per-path scales are returned by plan_scales(plan) and passed to
    apply_lora(scales=...)."""
    pattern = re.compile(targets)
    lora = {}
    i = 0
    for name, leaf in _iter_paths(params):
        if plan is not None:
            if name not in plan:
                continue
            r = plan[name][0]
        elif leaf.ndim == 2 and pattern.search(name):
            r = rank
        else:
            continue
        i += 1
        k = jax.random.fold_in(key, i)
        lora[name] = {
            "a": jax.random.normal(k, (leaf.shape[0], r), dtype) / r,
            "b": jnp.zeros((r, leaf.shape[1]), dtype),
        }
    if plan is not None and set(lora) != set(plan):
        missing = sorted(set(plan) - set(lora))
        raise ValueError(f"plan paths not found in params: {missing[:5]}")
    assert lora, f"no parameters matched LoRA targets {targets!r}"
    return lora


def plan_scales(plan: Dict[str, Tuple[int, float]]) -> Dict[str, float]:
    """Per-path merge scales from a layer-control plan."""
    return {name: s for name, (_, s) in plan.items()}


def apply_lora(params: Any, lora: Dict[str, Dict[str, Array]],
               scale: float = 1.0,
               scales: Optional[Dict[str, float]] = None) -> Any:
    """Merged params: W + scale * A @ B for every adapted weight.

    scales: per-path overrides (layer-control plans, see plan_scales)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for keypath, leaf in flat:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
        )
        if name in lora:
            ab = (lora[name]["a"] @ lora[name]["b"]).astype(leaf.dtype)
            s = scale if scales is None else scales.get(name, scale)
            leaf = leaf + s * ab
        out.append(leaf)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), out
    )


def lora_train_step(
    lora: Dict,
    opt_state,
    base_params: Any,
    batch: dict,
    rng: Array,
    cfg,
    optimizer: optax.GradientTransformation,
    scale: float = 1.0,
) -> Tuple[Dict, Any, dict]:
    """One LoRA-only optimizer step on the EDM loss (base frozen)."""
    from gen3c_tpu.models.dit import dit_forward
    from gen3c_tpu.training.losses import edm_loss, sample_sigma

    k_sigma, k_noise = jax.random.split(rng)
    B = batch["x0"].shape[0]
    sigma = sample_sigma(k_sigma, B)
    noise = jax.random.normal(k_noise, batch["x0"].shape, jnp.float32)

    def net(bundle, x, t, ctx):
        lora_p, base_p = bundle
        merged = apply_lora(base_p, lora_p, scale)
        return dit_forward(merged, cfg, x, t, ctx, fps=24.0)

    def loss_fn(lora_p):
        loss, _ = edm_loss(
            net,
            (lora_p, base_params),
            batch["x0"].astype(jnp.float32),
            sigma,
            noise,
            batch["crossattn_emb"],
            batch["extra_channels"],
        )
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(lora)
    updates, opt_state = optimizer.update(grads, opt_state, lora)
    lora = optax.apply_updates(lora, updates)
    return lora, opt_state, {"loss": loss}
