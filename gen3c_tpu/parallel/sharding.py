"""Parameter / batch PartitionSpecs for pjit auto-sharding.

Megatron-style tensor parallelism expressed declaratively (the reference
implements it imperatively with ColumnParallelLinear/RowParallelLinear +
explicit all-reduces, autoregressive/modules/linear.py:20-223 and
training/networks/general_dit.py:303-345). Here the specs annotate the
parameter pytree and XLA's SPMD partitioner inserts the collectives:

  attention q/k/v:   (D, D)   -> P(None, 'tp')   column parallel
  attention out:     (D, D)   -> P('tp', None)   row parallel (all-reduce)
  mlp fc1:           (D, 4D)  -> P(None, 'tp')
  mlp fc2:           (4D, D)  -> P('tp', None)
  everything else (norms, adaLN LoRA, pos-emb, embedders): replicated

Batch specs shard the leading batch dim over 'dp' and (optionally) the
latent-T dim over 'cp' (split_inputs_cp parity).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def dit_param_pspecs(params: Any, tp_axis: str = "tp") -> Any:
    """PartitionSpec pytree matching a DiT param pytree."""

    def spec_for(path: tuple, leaf) -> P:
        keys = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        name = "/".join(keys)
        if any(s in name for s in ("/q/w", "/k/w", "/v/w", "fc1/w")):
            return P(None, tp_axis)
        if any(s in name for s in ("/out/w", "fc2/w")):
            return P(tp_axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def dit_param_shardings(mesh: Mesh, params: Any, tp_axis: str = "tp") -> Any:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        dit_param_pspecs(params, tp_axis),
        is_leaf=lambda x: isinstance(x, P),
    )


def vae_param_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    """VAE params are small (<100M); replicate."""
    return {k: P() for k in params}


def batch_pspec(dp_axis: str = "dp", cp_axis: str | None = None) -> P:
    """(B, C, T, H, W) batches: B over dp, optionally T over cp."""
    if cp_axis is None:
        return P(dp_axis)
    return P(dp_axis, None, cp_axis)


def shard_params(mesh: Mesh, params: Any, tp_axis: str = "tp") -> Any:
    """Device-put a param pytree with its TP shardings."""
    shardings = dit_param_shardings(mesh, params, tp_axis)
    return jax.tree.map(jax.device_put, params, shardings)
