"""Multiview (view-consistent) GeneralDIT variant.

Parity: cosmos_predict1/diffusion/networks/general_dit_multiview.py
(+ general_dit_video_conditioned_multiview.py, module/position_embedding
Multiview* classes) — the Sample-AV family (n_views=6):

  * a learnable per-view embedding (view_condition_dim) is broadcast over
    (T, H, W) and channel-concatenated before the patch embed;
  * RoPE + the per-block abs pos-emb are generated per view (each view
    restarts its temporal index) and tiled across the view axis — here
    the abs pos-emb is the sincos variant (extra_per_block_abs_pos_emb_
    type="sincos");
  * self-attention runs over the full (V*T*H*W) token sequence
    (cross-view consistency); cross-attention folds views into the batch
    with a per-view context slice (blocks.py VideoAttn n_views folding);
  * optional per-view "repeat frame" scalar embedding
    (add_repeat_frame_embedding).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gen3c_tpu.models import dit as base

Array = jax.Array
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MultiviewDiTConfig(base.DiTConfig):
    n_views: int = 6
    view_condition_dim: int = 6
    concat_view_embedding: bool = True
    add_repeat_frame_embedding: bool = False
    # per-block abs sincos pos-emb extrapolation (reference
    # extra_{h,w,t}_extrapolation_ratio, default 1.0)
    extra_h_extrapolation_ratio: float = 1.0
    extra_w_extrapolation_ratio: float = 1.0
    extra_t_extrapolation_ratio: float = 1.0

    @property
    def patch_in_dim(self) -> int:
        c = self.in_channels + (1 if self.concat_padding_mask else 0)
        if self.concat_view_embedding:
            c += self.view_condition_dim
        return c * self.patch_spatial * self.patch_spatial * self.patch_temporal


jax.tree_util.register_static(MultiviewDiTConfig)

FADITV2_MULTIVIEW_7B = MultiviewDiTConfig(
    n_views=6,
    view_condition_dim=6,
    add_repeat_frame_embedding=True,
)


def init_multiview_dit_params(key: Array, cfg: MultiviewDiTConfig,
                              param_dtype=jnp.float32) -> Params:
    params = base.init_dit_params(key, cfg, param_dtype)
    k2 = jax.random.fold_in(key, 1234)
    params["view_embeddings"] = (
        jax.random.normal(
            k2, (cfg.n_views, cfg.view_condition_dim), param_dtype
        )
        * 0.02
    )
    if cfg.add_repeat_frame_embedding:
        params["repeat_frame_embedding"] = {
            "w": jnp.zeros((1, cfg.view_condition_dim), param_dtype),
            "b": jnp.zeros((cfg.view_condition_dim,), param_dtype),
        }
    return params


def _sincos_axis_emb(n: int, d: int, extrapolation: float = 1.0) -> np.ndarray:
    """1D sincos table (get_1d_sincos_pos_embed_from_grid parity):
    [sin | cos] halves over d channels, positions rescaled by the
    extrapolation ratio (position_embedding.py:461-465)."""
    omega = np.arange(d // 2, dtype=np.float64) / (d / 2.0)
    omega = 1.0 / 10000**omega
    out = np.outer(np.arange(n, dtype=np.float64) / extrapolation, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def _multiview_sincos_extra(D: int, Tp: int, Hp: int, Wp: int,
                            rt: float = 1.0, rh: float = 1.0,
                            rw: float = 1.0) -> np.ndarray:
    """Per-axis CONCATENATED sincos extra pos-emb for one view
    (MultiviewSinCosPosEmbAxis parity, position_embedding.py:430-497):
    channel split dim_h = dim_w = D//6*2, dim_t = rest; layout
    [t-emb | h-emb | w-emb] broadcast over the (T, H, W) grid."""
    dim_h = D // 6 * 2
    dim_w = dim_h
    dim_t = D - 2 * dim_h
    emb_t = _sincos_axis_emb(Tp, dim_t, rt)
    emb_h = _sincos_axis_emb(Hp, dim_h, rh)
    emb_w = _sincos_axis_emb(Wp, dim_w, rw)
    out = np.concatenate(
        [
            np.broadcast_to(emb_t[:, None, None, :], (Tp, Hp, Wp, dim_t)),
            np.broadcast_to(emb_h[None, :, None, :], (Tp, Hp, Wp, dim_h)),
            np.broadcast_to(emb_w[None, None, :, :], (Tp, Hp, Wp, dim_w)),
        ],
        axis=-1,
    )
    return out.reshape(Tp * Hp * Wp, D)


def multiview_dit_forward(
    params: Params,
    cfg: MultiviewDiTConfig,
    x: Array,  # (B, C, V*T, H, W) — views stacked on the frame axis
    timesteps: Array,  # (B,)
    crossattn_emb: Array,  # (B, V*M, D_ctx) per-view context stacked on M
    fps: Optional[float] = None,
    padding_mask: Optional[Array] = None,
    frame_repeat: Optional[Array] = None,  # (B, V)
) -> Array:
    B, C, VT, H, W = x.shape
    V = cfg.n_views
    T = VT // V
    dtype = cfg.dtype
    x = x.astype(dtype)

    # channel order into the patch embedder is [x | padding_mask |
    # view_emb] (general_dit_multiview.py:332-381: the padding mask is
    # concatenated BEFORE the view-embedding channels)
    if cfg.concat_padding_mask:
        if padding_mask is None:
            padding_mask = jnp.zeros((B, H, W), dtype)
        pm = jnp.broadcast_to(
            padding_mask[:, None, None, :, :], (B, 1, VT, H, W)
        ).astype(dtype)
        x = jnp.concatenate([x, pm], axis=1)

    # per-view condition channels (general_dit_multiview.py:340-381)
    if cfg.concat_view_embedding:
        view_emb = params["view_embeddings"].astype(dtype)  # (V, vc)
        if cfg.add_repeat_frame_embedding:
            fr = (
                frame_repeat
                if frame_repeat is not None
                else jnp.zeros((B, V), dtype)
            )
            rep = (
                fr[..., None] @ params["repeat_frame_embedding"]["w"].astype(dtype)
                + params["repeat_frame_embedding"]["b"].astype(dtype)
            )  # (B, V, vc)
            view_cond = view_emb[None] + rep
        else:
            view_cond = jnp.broadcast_to(view_emb[None], (B, V, view_emb.shape[1]))
        view_ch = jnp.repeat(view_cond, T, axis=1)  # (B, V*T, vc)
        view_ch = jnp.transpose(view_ch, (0, 2, 1))[..., None, None]
        view_ch = jnp.broadcast_to(
            view_ch, (B, view_cond.shape[2], VT, H, W)
        )
        x = jnp.concatenate([x, view_ch], axis=1)

    # padding mask already concatenated above in the reference's order
    cfg_nopad = dataclasses.replace(cfg, concat_padding_mask=False)
    tokens = base.patchify(cfg_nopad, params, x, None)
    Bt, Tp_all, Hp, Wp, D = tokens.shape
    Tp = Tp_all // V
    L = Tp_all * Hp * Wp
    tokens = tokens.reshape(B, L, D)

    # per-view positional tables, tiled over views
    cos1, sin1 = base.rope_3d_table(cfg, Tp, Hp, Wp, fps=fps)
    cos = jnp.tile(cos1, (V, 1))
    sin = jnp.tile(sin1, (V, 1))
    extra1 = _multiview_sincos_extra(
        D, Tp, Hp, Wp,
        cfg.extra_t_extrapolation_ratio,
        cfg.extra_h_extrapolation_ratio,
        cfg.extra_w_extrapolation_ratio,
    )
    extra = jnp.tile(jnp.asarray(extra1, jnp.float32), (V, 1))[None].astype(
        dtype
    )

    sincos_t = base.timestep_sincos(timesteps.reshape(-1), D)
    hbuf = sincos_t @ params["t_embedder"]["linear_1"]["w"].astype(jnp.float32)
    hbuf = jax.nn.silu(hbuf)
    lora = hbuf @ params["t_embedder"]["linear_2"]["w"].astype(jnp.float32)
    emb = base._rms_norm(sincos_t, params["affline_norm"]["scale"])

    ctx = crossattn_emb.astype(dtype)
    M = ctx.shape[1] // V

    def cross_block(blk, t):
        # fold views into batch for per-view cross attention
        # (blocks.py:319-335): tokens (B, V*Lv, D) -> (B*V, Lv, D)
        Lv = L // V
        tv = t.reshape(B, V, Lv, D).reshape(B * V, Lv, D)
        cv = ctx.reshape(B, V, M, -1).reshape(B * V, M, -1)
        out = base._attn_block(blk["ca"], tv, cv, cfg.num_heads, None)
        return out.reshape(B, V, Lv, D).reshape(B, L, D)

    for blk in params["blocks"]:
        tokens = tokens + extra
        tokens = base._modulated_residual(
            tokens,
            lambda t: base._attn_block(
                blk["fa"], t, None, cfg.num_heads, (cos, sin)
            ),
            blk["fa"],
            emb,
            lora,
        )
        tokens = base._modulated_residual(
            tokens, lambda t: cross_block(blk, t), blk["ca"], emb, lora
        )
        tokens = base._modulated_residual(
            tokens, lambda t: base._mlp_block(blk["mlp"], t), blk["mlp"],
            emb, lora,
        )

    fshift, fscale = base._adaln_modulation(
        params["final"]["adaln"], emb, lora, 2
    )
    normed = base._layer_norm(tokens)
    tokens = (
        normed.astype(jnp.float32) * (1 + fscale[:, None, :])
        + fshift[:, None, :]
    ).astype(dtype)
    tokens = tokens @ params["final"]["linear"]["w"].astype(dtype)
    tokens = tokens.reshape(B, Tp_all, Hp, Wp, -1)
    return base.unpatchify(cfg, tokens, VT, H, W)
