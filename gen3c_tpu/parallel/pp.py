"""Pipeline parallelism for the DiT: a real GPipe-style schedule.

The reference only plumbs pipeline_model_parallel_size through megatron
parallel_state without implementing any schedule (utils/trainer.py:67,
SURVEY §2.5 "PP: config-only"). Here PP is implemented TPU-natively:

  * the 28 transformer blocks are stacked on a leading axis and sharded
    over the mesh's 'pp' axis (each stage owns a contiguous block range);
  * inside one shard_map, microbatches (split on the batch dim) flow
    through the classic GPipe schedule: M + S - 1 ticks, activations
    hop stage-to-stage via ppermute over ICI;
  * embeddings / positional tables / the final head are replicated
    (tiny compared to the blocks) so only block compute is pipelined;
  * the whole schedule is differentiable — jax.grad through the
    shard_map yields the reverse-pipeline backward, so the same function
    serves training.

Bubble fraction is the standard (S-1)/(M+S-1); pick n_microbatches >= S.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gen3c_tpu.models import dit as base

Array = jax.Array


def stack_block_params(params: Any) -> Any:
    """Convert params["blocks"] (list of per-block dicts) into one dict
    of leaves with a leading num_blocks axis (shardable over 'pp')."""
    blocks = params["blocks"]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    out = dict(params)
    out["blocks"] = stacked
    return out


def pp_param_specs(params_stacked: Any, pp_axis: str = "pp") -> Any:
    """PartitionSpecs: stacked block leaves shard their leading (block)
    dim over pp; everything else replicated."""

    def spec(path, leaf):
        keys = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        if keys and keys[0] == "blocks":
            return P(pp_axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params_stacked)


def pp_dit_forward(
    mesh: Mesh,
    params_stacked: Any,
    cfg: base.DiTConfig,
    x: Array,  # (B, C, T, H, W)
    timesteps: Array,  # (B,)
    crossattn_emb: Array,  # (B, M, D_ctx)
    n_microbatches: int = 2,
    fps: Optional[float] = 24.0,
    pp_axis: str = "pp",
) -> Array:
    """Pipeline-parallel GeneralDIT forward over mesh[pp_axis].

    NOTE: self-attention RoPE is applied with full-grid tables inside
    each stage (tokens are never sequence-sharded here — PP composes
    with CP/TP via separate mesh axes). Batch B must divide
    n_microbatches.
    """
    B = x.shape[0]
    M = n_microbatches
    S = mesh.shape[pp_axis]
    assert B % M == 0, (B, M)
    assert cfg.num_blocks % S == 0, (cfg.num_blocks, S)

    specs = pp_param_specs(params_stacked, pp_axis)
    rep = P()

    def fwd(params, x, timesteps, crossattn_emb):
        Bl, C, T, H, W = x.shape
        dtype = cfg.dtype
        xx = x.astype(dtype)
        tokens = base.patchify(cfg, params, xx, None)
        _, Tp, Hp, Wp, D = tokens.shape
        L = Tp * Hp * Wp
        tokens = tokens.reshape(Bl, L, D)
        rope = base.rope_3d_table(cfg, Tp, Hp, Wp, fps=fps)
        extra = base.build_extra_pos_emb(params, Tp, Hp, Wp)
        extra = extra.reshape(1, L, D).astype(dtype)
        # rotate q/k inside the blocks is stage-local; rope rides via
        # closure on the full table
        sincos = base.timestep_sincos(timesteps.reshape(-1), D)
        h = sincos @ base._w(params["t_embedder"]["linear_1"], jnp.float32)
        h = jax.nn.silu(h)
        lora = h @ base._w(params["t_embedder"]["linear_2"], jnp.float32)
        emb = base._rms_norm(sincos, params["affline_norm"]["scale"])
        ctx = crossattn_emb.astype(dtype)

        s_idx = jax.lax.axis_index(pp_axis)
        perm = [(j, (j + 1) % S) for j in range(S)]

        # microbatches along batch: (M, Bm, ...)
        Bm = Bl // M
        mb_tokens = tokens.reshape(M, Bm, L, D)
        mb_emb = emb.reshape(M, Bm, -1)
        mb_lora = lora.reshape(M, Bm, -1)
        mb_ctx = ctx.reshape(M, Bm, *ctx.shape[1:])

        def stage(tok, e, lo, cx):
            # inject rope into fa via a wrapped block apply
            def body(t, blk):
                t = t + extra
                t = base._modulated_residual(
                    t,
                    lambda s: base._attn_block(
                        blk["fa"], s, None, cfg.num_heads, rope
                    ),
                    blk["fa"], e, lo,
                )
                t = base._modulated_residual(
                    t,
                    lambda s: base._attn_block(
                        blk["ca"], s, cx, cfg.num_heads, None
                    ),
                    blk["ca"], e, lo,
                )
                t = base._modulated_residual(
                    t, lambda s: base._mlp_block(blk["mlp"], s),
                    blk["mlp"], e, lo,
                )
                return t, None

            out, _ = jax.lax.scan(body, tok, params["blocks"])
            return out

        outputs = jnp.zeros((M, Bm, L, D), dtype)
        carry_in = jnp.zeros((Bm, L, D), dtype)

        def tick(t, state):
            carry, outputs = state
            # stage 0 injects microbatch t (clamped); later stages use
            # the activation received from the previous stage
            mb_idx = jnp.clip(t, 0, M - 1)
            inject = jax.lax.dynamic_index_in_dim(
                mb_tokens, mb_idx, 0, keepdims=False
            )
            tok_in = jnp.where(s_idx == 0, inject, carry)
            # per-microbatch conditioning (emb/lora/ctx follow the
            # microbatch index that THIS stage is processing at tick t)
            my_mb = jnp.clip(t - s_idx, 0, M - 1)
            e = jax.lax.dynamic_index_in_dim(mb_emb, my_mb, 0, False)
            lo = jax.lax.dynamic_index_in_dim(mb_lora, my_mb, 0, False)
            cx = jax.lax.dynamic_index_in_dim(mb_ctx, my_mb, 0, False)
            out = stage(tok_in, e, lo, cx)
            # last stage records its finished microbatch
            done_idx = jnp.clip(t - (S - 1), 0, M - 1)
            record = (s_idx == S - 1) & (t >= S - 1) & (t - (S - 1) < M)
            outputs = jnp.where(
                record,
                jax.lax.dynamic_update_index_in_dim(
                    outputs, out, done_idx, 0
                ),
                outputs,
            )
            carry = jax.lax.ppermute(out, pp_axis, perm)
            return (carry, outputs)

        _, outputs = jax.lax.fori_loop(0, M + S - 1, tick,
                                       (carry_in, outputs))
        # broadcast the last stage's outputs to every rank
        outputs = jax.lax.psum(
            jnp.where(s_idx == S - 1, outputs, jnp.zeros_like(outputs)),
            pp_axis,
        )
        tokens = outputs.reshape(Bl, L, D)

        fshift, fscale = base._adaln_modulation(
            params["final"]["adaln"], emb, lora, 2
        )
        normed = base._layer_norm(tokens)
        tokens = (
            normed.astype(jnp.float32) * (1 + fscale[:, None, :])
            + fshift[:, None, :]
        ).astype(dtype)
        tokens = base._linear(tokens, params["final"]["linear"], dtype)
        tokens = tokens.reshape(Bl, Tp, Hp, Wp, -1)
        return base.unpatchify(cfg, tokens, T, H, W)

    mapped = jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(specs, rep, rep, rep),
        out_specs=rep,
        check_vma=False,
    )
    return mapped(params_stacked, x, timesteps, crossattn_emb)


def shard_pp_params(mesh: Mesh, params_stacked: Any,
                    pp_axis: str = "pp") -> Any:
    specs = pp_param_specs(params_stacked, pp_axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params_stacked, specs,
        is_leaf=lambda x: not isinstance(x, (dict, list)),
    )
