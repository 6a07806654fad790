"""Block-streamed DiT forward: the UNQUANTIZED bf16 7B on one 16 GB chip.

The bf16 7B is 14.5 GB — it cannot rest in HBM next to activations. But
with pinned_host residency (utils/offload.py) a 0.52 GB block stages
into HBM in ~45 ms at the measured ~11 GB/s DMA rate, while one block's
compute at the production shape takes ~1 s. So the forward STREAMS:
blocks rest in the TPU VM's RAM, `prefetch` block transfers ride ahead
of compute (JAX dispatch is async — transfers overlap the running
block), and each block's HBM copy is deleted right after its use. Peak
HBM = aux params + a few blocks + one block's activations, instead of
the whole network.

This is a TPU-native capability the reference lacks (it offloads whole
modules per phase, gen3c_pipeline.py:186-225 — never sub-model
streaming): full-precision 7B serving on a 16 GB chip at roughly the
resident-model step time.

Structure mirrors models/dit.py::dit_forward exactly (per-block
learnable pos-emb added every block, AdaLN-LoRA modulated residuals,
FA-CA-MLP); parity is tested in tests/test_dit_streaming.py. Reference
topology: networks/general_dit.py:439-522.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from gen3c_tpu.models.dit import (
    DiTConfig,
    _adaln_modulation,
    _attn_block,
    _layer_norm,
    _mlp_block,
    _modulated_residual,
    _rms_norm,
    _w,
    build_extra_pos_emb,
    patchify,
    rope_3d_table,
    timestep_sincos,
    unpatchify,
)

Array = jax.Array


@partial(jax.jit, static_argnames=("cfg",))
def _prologue(aux, cfg: DiTConfig, x: Array, timesteps: Array):
    """patchify + timestep embedding + per-axis pos emb. Returns
    (tokens (B,L,D), emb (B,D) f32, lora (B,3D) f32, extra (1,L,D))."""
    x = x.astype(cfg.dtype)
    tokens = patchify(cfg, aux, x, None)
    B, Tp, Hp, Wp, D = tokens.shape
    tokens = tokens.reshape(B, Tp * Hp * Wp, D)

    extra = build_extra_pos_emb(aux, Tp, Hp, Wp).astype(cfg.dtype)
    extra = extra.reshape(1, Tp * Hp * Wp, D)

    sincos = timestep_sincos(timesteps.reshape(-1), D)
    h = sincos @ _w(aux["t_embedder"]["linear_1"], jnp.float32)
    h = jax.nn.silu(h)
    lora = h @ _w(aux["t_embedder"]["linear_2"], jnp.float32)
    emb = _rms_norm(sincos, aux["affline_norm"]["scale"])
    return tokens, emb, lora, extra


@partial(jax.jit, static_argnames=("cfg", "temporal_band"))
def _block_apply(blk, cfg: DiTConfig, tokens, emb, lora, extra, ctx_emb,
                 cos, sin, temporal_band=None):
    """One GeneralDITTransformerBlock (FA-CA-MLP), identical math to the
    block_step closure in dit.py::dit_forward."""
    rope = (cos, sin)
    tokens = tokens + extra
    tokens = _modulated_residual(
        tokens,
        lambda t: _attn_block(blk["fa"], t, None, cfg.num_heads, rope,
                              temporal_band=temporal_band),
        blk["fa"],
        emb,
        lora,
    )
    tokens = _modulated_residual(
        tokens,
        lambda t: _attn_block(blk["ca"], t, ctx_emb, cfg.num_heads, None),
        blk["ca"],
        emb,
        lora,
    )
    return _modulated_residual(
        tokens,
        lambda t: _mlp_block(blk["mlp"], t),
        blk["mlp"],
        emb,
        lora,
    )


@partial(jax.jit, static_argnames=("cfg", "T", "H", "W"))
def _epilogue(aux, cfg: DiTConfig, tokens, emb, lora, T: int, H: int,
              W: int):
    fshift, fscale = _adaln_modulation(aux["final"]["adaln"], emb, lora, 2)
    normed = _layer_norm(tokens)
    tokens = (
        normed.astype(jnp.float32) * (1 + fscale[:, None, :])
        + fshift[:, None, :]
    ).astype(cfg.dtype)
    tokens = tokens @ _w(aux["final"]["linear"], cfg.dtype)
    ps, pt = cfg.patch_spatial, cfg.patch_temporal
    tokens = tokens.reshape(
        tokens.shape[0], T // pt, H // ps, W // ps, -1
    )
    return unpatchify(cfg, tokens, T, H, W)


class StreamingDiT:
    """Callable wrapper: blocks pinned off-device, streamed per forward.

    net(x, timesteps, crossattn_emb, fps=24.0) -> (B, out_ch, T, H, W)
    """

    def __init__(self, params, cfg: DiTConfig, prefetch: int = 2,
                 free_source: bool = False):
        from gen3c_tpu.utils.offload import tree_to_host

        self.cfg = cfg
        self.prefetch = max(1, prefetch)
        self.aux = {k: v for k, v in params.items() if k != "blocks"}
        # blocks move to pinned_host (device-adjacent RAM); 0.5 s total
        # for the 7B when the source tree is on device
        self.blocks: List = []
        for b in params["blocks"]:
            pinned = tree_to_host(b)
            if free_source:
                # free the source HBM block immediately (the bf16 7B's
                # 13.9 GB of blocks can't stay resident) — the caller
                # must not reuse params["blocks"] afterwards
                pinned_ids = {id(x) for x in jax.tree.leaves(pinned)}
                for leaf in jax.tree.leaves(b):
                    if (isinstance(leaf, jax.Array)
                            and id(leaf) not in pinned_ids):
                        leaf.delete()
            self.blocks.append(pinned)
        self._rope_cache = {}
        try:
            from jax.sharding import SingleDeviceSharding

            self._dev_sharding = SingleDeviceSharding(
                jax.devices()[0], memory_kind="device"
            )
        except Exception:  # noqa: BLE001
            self._dev_sharding = None

    def _stage(self, block):
        """Pinned (or host) block -> a NEW device-memory copy. Explicit
        memory-kind placement: a plain device_put of a pinned array can
        be a no-op, and deleting that would destroy the resident copy."""
        if self._dev_sharding is None:
            return jax.device_put(block)
        return jax.tree.map(
            lambda x: jax.device_put(x, self._dev_sharding), block
        )

    def _rope(self, Tp: int, Hp: int, Wp: int, fps: Optional[float]):
        key = (Tp, Hp, Wp, fps)
        if key not in self._rope_cache:
            self._rope_cache[key] = rope_3d_table(
                self.cfg, Tp, Hp, Wp, fps=fps
            )
        return self._rope_cache[key]

    def __call__(self, x: Array, timesteps: Array, crossattn_emb: Array,
                 fps: Optional[float] = 24.0) -> Array:
        cfg = self.cfg
        B, C, T, H, W = x.shape
        ps, pt = cfg.patch_spatial, cfg.patch_temporal
        cos, sin = self._rope(T // pt, H // ps, W // ps, fps)
        temporal_band = (
            ((H // ps) * (W // ps), cfg.attn_temporal_window,
             cfg.attn_prefix_frames)
            if cfg.attn_temporal_window is not None else None
        )

        tokens, emb, lora, extra = _prologue(self.aux, cfg, x, timesteps)
        ctx_emb = crossattn_emb.astype(cfg.dtype)

        n = len(self.blocks)
        inflight = [
            self._stage(self.blocks[i]) for i in range(min(self.prefetch, n))
        ]
        for bi in range(n):
            blk = inflight.pop(0)
            nxt = bi + self.prefetch
            if nxt < n:
                # issue the next transfer BEFORE running this block so
                # the DMA overlaps the compute (both are async)
                inflight.append(self._stage(self.blocks[nxt]))
            tokens = _block_apply(
                blk, cfg, tokens, emb, lora, extra, ctx_emb, cos, sin,
                temporal_band=temporal_band,
            )
            # free this block's HBM copy; PJRT refcounts keep it alive
            # for the in-flight computation that uses it
            src_ids = {id(x) for x in jax.tree.leaves(self.blocks[bi])}
            for leaf in jax.tree.leaves(blk):
                if isinstance(leaf, jax.Array) and id(leaf) not in src_ids:
                    leaf.delete()
        return _epilogue(self.aux, cfg, tokens, emb, lora, T, H, W)
