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


# leaves with at least this many elements get FSDP-sharded
_FSDP_MIN_SIZE = 1 << 16


def dit_param_pspecs(
    params: Any, tp_axis: str = "tp", fsdp_axis: str | None = None
) -> Any:
    """PartitionSpec pytree matching a DiT param pytree.

    With `fsdp_axis` set, large weights additionally shard their non-TP
    dim over that axis (typically 'dp'): ZeRO-3/FSDP-style fully-sharded
    parameters + optimizer state (the declarative replacement for the
    reference's torch FSDP wrap, training/models/model.py:661+,
    utils/fsdp_checkpointer.py). XLA all-gathers weights where a matmul
    needs them and reduce-scatters the grads.
    """

    def spec_for(path: tuple, leaf) -> P:
        keys = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        name = "/".join(keys)
        if any(s in name for s in ("/q/w", "/k/w", "/v/w", "fc1/w")):
            return P(fsdp_axis, tp_axis)
        if any(s in name for s in ("/out/w", "fc2/w")):
            return P(tp_axis, fsdp_axis)
        if (
            fsdp_axis is not None
            and hasattr(leaf, "ndim")
            and leaf.ndim == 2
            and leaf.size >= _FSDP_MIN_SIZE
        ):
            # remaining big 2D weights (embedders, adaLN, final): shard
            # the larger dim over fsdp
            if leaf.shape[0] >= leaf.shape[1]:
                return P(fsdp_axis, None)
            return P(None, fsdp_axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def dit_param_shardings(
    mesh: Mesh, params: Any, tp_axis: str = "tp",
    fsdp_axis: str | None = None,
) -> Any:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        dit_param_pspecs(params, tp_axis, fsdp_axis),
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


def shard_params(
    mesh: Mesh, params: Any, tp_axis: str = "tp",
    fsdp_axis: str | None = None,
) -> Any:
    """Device-put a param pytree with its TP (+ optional FSDP) shardings."""
    shardings = dit_param_shardings(mesh, params, tp_axis, fsdp_axis)
    return jax.tree.map(jax.device_put, params, shardings)


def ar_param_pspecs(
    params: Any, tp_axis: str = "tp", fsdp_axis: str | None = None
) -> Any:
    """PartitionSpecs for the AR llama transformer (Megatron TP parity:
    autoregressive/modules/linear.py column/row-parallel + vocab-parallel
    embedding). Column-parallel: wq/wk/wv/w1/w3 + the vocab output head;
    row-parallel (all-reduce): wo/w2; embeddings vocab-sharded.
    n_heads and n_kv_heads must divide the tp size."""

    def spec_for(path: tuple, leaf) -> P:
        keys = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        name = "/".join(keys)
        last = keys[-1] if keys else ""
        parent = keys[-2] if len(keys) >= 2 else ""
        if last in ("q", "q8", "scale") and parent:
            # int8-quantized entries ({"q"|"q8", "scale"},
            # models/quantize.quantize_ar_params): codes shard like the
            # weight they replace; per-output-channel scales follow the
            # output dim
            col = parent in ("wq", "wk", "wv", "w1", "w3",
                             "cwq", "cwk", "cwv", "output")
            row = parent in ("wo", "w2", "cwo")
            if last == "scale":
                return P(None, tp_axis) if col else P()
            if col:
                return P(fsdp_axis, tp_axis)
            if row:
                return P(tp_axis, fsdp_axis)
            if parent == "tok_embeddings":
                return P(tp_axis, None)
            return P()
        if last in ("wq", "wk", "wv", "w1", "w3", "cwq", "cwk", "cwv"):
            return P(fsdp_axis, tp_axis)
        if last in ("wo", "w2", "cwo"):
            return P(tp_axis, fsdp_axis)
        if "tok_embeddings" in name:
            return P(tp_axis, None)  # vocab-parallel embedding
        if "output" in name and getattr(leaf, "ndim", 0) == 2:
            return P(None, tp_axis)  # column-parallel LM head
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_ar_params(
    mesh: Mesh, params: Any, tp_axis: str = "tp",
    fsdp_axis: str | None = None,
) -> Any:
    specs = ar_param_pspecs(params, tp_axis, fsdp_axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: not isinstance(x, (dict, list)),
    )
