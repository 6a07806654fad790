"""GeneralDIT: the Cosmos 7B video diffusion transformer, TPU-native.

Functional JAX re-design of the reference network (reference:
cosmos_predict1/diffusion/networks/general_dit.py,
module/{blocks,attention,position_embedding}.py). Architecture parity:

  * PatchEmbed: reshape + single matmul, patch 2x2x1, no bias
    (blocks.py:126-186); channel order of the flattened patch is
    (c, t_patch, h_patch, w_patch).
  * Timestep embedding: sincos [cos|sin] halves (blocks.py:33-51); with
    AdaLN-LoRA the affine embedding fed to blocks is the *raw sincos*
    (blocks.py:68-80) RMS-normalized by affline_norm (general_dit.py:173-177),
    while the 2-layer MLP output becomes the shared LoRA 3D term.
  * 28 transformer blocks, each FA -> CA -> MLP (GeneralDITTransformerBlock,
    blocks.py:478-558); per-sub-block AdaLN: SiLU -> Linear(D,256) ->
    Linear(256,3D), plus the shared LoRA term, chunked into
    (shift, scale, gate) (blocks.py:419-475).
  * Attention: per-head RMSNorm on q and k (qkv_norm "RRI",
    attention.py:141-313), 3D RoPE on self-attention only, softmax scale
    1/sqrt(head_dim); MLP = Linear -> GELU -> Linear, ratio 4.
  * 3D RoPE (position_embedding.py:85-187): head_dim split
    dim_h = dim_w = head_dim//6*2, dim_t = rest; NTK factors
    ratio^(dim/(dim-2)); angle table layout [t|h|w|t|h|w] with
    GPT-NeoX-style rotate-half application (TE fused rope parity).
  * Learnable per-axis absolute pos-emb, L2-RMS-normalized, added to the
    tokens at the start of EVERY block (position_embedding.py:190-233,
    blocks.py:547-548).
  * FinalLayer: LN (no affine) + AdaLN(2 chunks, lora[:, :2D]) + linear
    un-patchify (blocks.py:189-242, general_dit.py:328-358).

TPU-first choices: tokens live as (B, L, D) with L = T*H*W (the
reference's THWBD becomes a flat batched sequence); attention runs
through the Pallas TPU flash kernel when available (XLA fallback
elsewhere); everything is a pure function of a parameter pytree so pjit
can shard it (see gen3c_tpu.parallel).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    """GeneralDIT hyper-parameters.

    Defaults = FADITV2 7B (reference: diffusion/config/base/net.py:23-43)
    with the GEN3C channel layout (config/inference/cosmos-1-diffusion-
    gen3c.py:38-43).
    """

    max_img_h: int = 240
    max_img_w: int = 240
    max_frames: int = 128
    in_channels: int = 16
    out_channels: int = 16
    patch_spatial: int = 2
    patch_temporal: int = 1
    model_channels: int = 4096
    num_blocks: int = 28
    num_heads: int = 32
    mlp_ratio: float = 4.0
    crossattn_emb_channels: int = 1024
    adaln_lora_dim: int = 256
    rope_h_extrapolation_ratio: float = 1.0
    rope_w_extrapolation_ratio: float = 1.0
    rope_t_extrapolation_ratio: float = 1.0
    concat_padding_mask: bool = True
    base_fps: int = 24
    # Optional augment-sigma affine embedder (general_dit_video_
    # conditioned.py:181-189 / training general_dit_lvg.py:37-58):
    # sincos(condition_video_augment_sigma) added to the pre-norm affine
    # embedding. Under AdaLN-LoRA (all reference configs) the embedder's
    # SDXLTimestepEmbedding returns the RAW sincos as emb_B_D and its
    # 3D-lora output is discarded at the call site — so the two linears
    # are forward-dead; they are still initialized/converted for
    # checkpoint compatibility.
    add_augment_sigma_embedding: bool = False
    # context-parallel self-attention strategy:
    #   "allgather" — one K/V all-gather per layer (production default)
    #   "ring"      — ppermute KV rotation + online softmax (TE ring
    #                 attention equivalent; O(L/cp) peak KV memory)
    #   "ulysses"   — head-scatter all-to-all (xDiT/DeepSpeed-Ulysses);
    #                 lowest ICI traffic, needs num_heads % cp == 0
    cp_attn_impl: str = "allgather"
    # OPT-IN sparse self-attention (sliding-tile-attention family): each
    # query frame attends to frames within +/- attn_temporal_window plus
    # the first attn_prefix_frames (seed) frames globally. None = full
    # attention (the pretrained-weight behavior). A speed/quality knob
    # like step caching: on the splash kernel masked KV blocks are
    # skipped, so self-attention FLOPs scale with the band width.
    attn_temporal_window: Optional[int] = None
    attn_prefix_frames: int = 1
    # Delta-DiT span caching (arXiv:2406.01125): blocks [lo, hi) are the
    # cacheable span — on cache-skip denoise steps only the blocks
    # OUTSIDE the span run, and the span's cached residual delta is
    # re-applied (sampler step_cache_interval>1 + this span). None = the
    # whole-output caching mode instead.
    cache_block_span: Optional[Tuple[int, int]] = None
    # "int8": store the span delta as int8 codes + per-token fp32 scales
    # (4x smaller carry — needed to fit the full 7B + delta in one
    # chip's HBM; ~0.4% rel. delta error). "bf16"/"fp32": exact.
    cache_span_dtype: str = "bf16"
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.model_channels // self.num_heads

    @property
    def patch_in_dim(self) -> int:
        c = self.in_channels + (1 if self.concat_padding_mask else 0)
        return c * self.patch_spatial * self.patch_spatial * self.patch_temporal

    @property
    def len_h(self) -> int:
        return self.max_img_h // self.patch_spatial

    @property
    def len_w(self) -> int:
        return self.max_img_w // self.patch_spatial

    @property
    def len_t(self) -> int:
        return self.max_frames // self.patch_temporal


# DiTConfig is hashable + frozen: register as a static pytree node so it
# can ride inside traced argument pytrees (e.g. the sampler's net_params).
jax.tree_util.register_static(DiTConfig)

GEN3C_7B = DiTConfig(
    in_channels=16 + 16 * 4 + 1,  # latent + 2 buffers x (rgb+mask) + cond mask
    rope_t_extrapolation_ratio=2.0,
)

# FADITV2 14B (config/base/net.py:46-49): 5120ch x 36 blocks x 40 heads
FADITV2_14B = DiTConfig(
    model_channels=5120,
    num_heads=40,
    num_blocks=36,
)


# ------------------------------ init ------------------------------


def _xavier(key, shape, dtype):
    fan_in, fan_out = shape[0], shape[1]
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def init_dit_params(key: Array, cfg: DiTConfig, param_dtype=jnp.float32) -> Params:
    """Initialize a parameter pytree (xavier linears, zero adaLN, trunc-
    normal pos-emb — mirrors general_dit.py:180-203)."""
    keys = iter(jax.random.split(key, 16 + cfg.num_blocks * 16))
    D, L = cfg.model_channels, cfg.adaln_lora_dim
    hd = cfg.head_dim

    def lin(in_d, out_d):
        return {"w": _xavier(next(keys), (in_d, out_d), param_dtype)}

    def attn(ctx_dim):
        return {
            "q": lin(D, D),
            "k": lin(ctx_dim, D),
            "v": lin(ctx_dim, D),
            "out": lin(D, D),
            "q_norm": {"scale": jnp.ones((hd,), param_dtype)},
            "k_norm": {"scale": jnp.ones((hd,), param_dtype)},
            "adaln": {
                "w1": _xavier(next(keys), (D, L), param_dtype),
                "w2": jnp.zeros((L, 3 * D), param_dtype),
            },
        }

    def mlp():
        hidden = int(D * cfg.mlp_ratio)
        return {
            "fc1": lin(D, hidden),
            "fc2": lin(hidden, D),
            "adaln": {
                "w1": _xavier(next(keys), (D, L), param_dtype),
                "w2": jnp.zeros((L, 3 * D), param_dtype),
            },
        }

    def trunc_normal(shape, std=0.02):
        u = jax.random.truncated_normal(next(keys), -2.0, 2.0, shape, param_dtype)
        return u * std

    params = {
        "x_embedder": lin(cfg.patch_in_dim, D),
        "t_embedder": {
            "linear_1": {"w": trunc_normal((D, D))},
            "linear_2": {"w": trunc_normal((D, 3 * D))},
        },
        "affline_norm": {"scale": jnp.ones((D,), param_dtype)},
        **(
            {
                "augment_sigma_embedder": {
                    # normal(std=0.02) init (general_dit_lvg.py:47-56)
                    "linear_1": {"w": trunc_normal((D, D))},
                    "linear_2": {"w": trunc_normal((D, 3 * D))},
                }
            }
            if cfg.add_augment_sigma_embedding
            else {}
        ),
        "extra_pos_emb": {
            "t": trunc_normal((cfg.len_t, D)),
            "h": trunc_normal((cfg.len_h, D)),
            "w": trunc_normal((cfg.len_w, D)),
        },
        "blocks": [
            {
                "fa": attn(D),
                "ca": attn(cfg.crossattn_emb_channels),
                "mlp": mlp(),
            }
            for _ in range(cfg.num_blocks)
        ],
        "final": {
            "linear": {
                "w": jnp.zeros(
                    (
                        D,
                        cfg.patch_spatial**2 * cfg.patch_temporal * cfg.out_channels,
                    ),
                    param_dtype,
                )
            },
            "adaln": {
                "w1": _xavier(next(keys), (D, L), param_dtype),
                "w2": jnp.zeros((L, 2 * D), param_dtype),
            },
        },
    }
    return params


# --------------------------- building blocks ---------------------------


def _w(entry, dtype):
    """Weight resolver: plain {"w"} or int8-quantized {"q"|"q8","scale"}
    entries — delegates to the single source of truth in models.quantize."""
    from gen3c_tpu.models.quantize import weight

    return weight(entry, dtype)


def _linear(x, entry, dtype):
    """x @ W for a params entry. "q8"-marked entries run W8A8 (dynamic
    per-token int8 activations x int8 weights on the MXU, 1.5x bf16 on
    the GEN3C MLP shape); others dequantize/cast and matmul in bf16."""
    if "q8" in entry:
        from gen3c_tpu.models.quantize import w8a8_matmul

        return w8a8_matmul(x, entry, dtype)
    return x @ _w(entry, dtype)


def _rms_norm(x: Array, scale: Array, eps: float = 1e-6) -> Array:
    """TE-style RMSNorm: fp32 statistics, learnable scale."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32)).astype(x.dtype)


def _layer_norm(x: Array, eps: float = 1e-6) -> Array:
    """LayerNorm with no affine params, fp32 statistics."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _l2_rms_normalize(x: Array, eps: float = 1e-6) -> Array:
    """The reference's `normalize` (attention.py:108-124) on the last dim:
    x / (eps + ||x|| / sqrt(D))."""
    xf = x.astype(jnp.float32)
    norm = jnp.linalg.norm(xf, axis=-1, keepdims=True)
    norm = eps + norm / math.sqrt(x.shape[-1])
    return (xf / norm).astype(x.dtype)


def timestep_sincos(timesteps: Array, num_channels: int) -> Array:
    """Sincos features, [cos | sin] halves (blocks.py:33-51)."""
    half = num_channels // 2
    exponent = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    freqs = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)


def rope_3d_table(cfg: DiTConfig, T: int, H: int, W: int,
                  fps: Optional[float] = None) -> Tuple[Array, Array]:
    """(cos, sin) tables of shape (T*H*W, head_dim), fp32.

    Angle layout parity: VideoRopePosition3DEmb.generate_embeddings
    (position_embedding.py:126-187): dims split t/h/w = rest/42/42 for
    head_dim=128, NTK extrapolation theta = 10000 * ratio^(dim/(dim-2)),
    table = concat([t, h, w] angles) duplicated twice.
    """
    d = cfg.head_dim
    dim_h = d // 6 * 2
    dim_w = dim_h
    dim_t = d - 2 * dim_h

    h_ntk = cfg.rope_h_extrapolation_ratio ** (dim_h / (dim_h - 2))
    w_ntk = cfg.rope_w_extrapolation_ratio ** (dim_w / (dim_w - 2))
    t_ntk = cfg.rope_t_extrapolation_ratio ** (dim_t / (dim_t - 2))

    h_range = np.arange(0, dim_h, 2)[: dim_h // 2].astype(np.float64) / dim_h
    t_range = np.arange(0, dim_t, 2)[: dim_t // 2].astype(np.float64) / dim_t
    h_freqs = 1.0 / (10000.0 * h_ntk) ** h_range
    w_freqs = 1.0 / (10000.0 * w_ntk) ** h_range
    t_freqs = 1.0 / (10000.0 * t_ntk) ** t_range

    t_scale = np.arange(T, dtype=np.float64)
    if fps is not None:
        t_scale = t_scale / fps * cfg.base_fps
    half_t = np.outer(t_scale, t_freqs)  # (T, dim_t/2)
    half_h = np.outer(np.arange(H, dtype=np.float64), h_freqs)
    half_w = np.outer(np.arange(W, dtype=np.float64), w_freqs)

    ang = np.concatenate(
        [
            np.broadcast_to(half_t[:, None, None, :], (T, H, W, half_t.shape[1])),
            np.broadcast_to(half_h[None, :, None, :], (T, H, W, half_h.shape[1])),
            np.broadcast_to(half_w[None, None, :, :], (T, H, W, half_w.shape[1])),
        ],
        axis=-1,
    )  # (T,H,W,d/2)
    ang = np.concatenate([ang, ang], axis=-1).reshape(T * H * W, d)
    return jnp.asarray(np.cos(ang), jnp.float32), jnp.asarray(np.sin(ang), jnp.float32)


def apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    """GPT-NeoX rotate-half RoPE. x: (B, L, heads, d); cos/sin: (L, d)."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    xf = x.astype(jnp.float32)
    rotf = rot.astype(jnp.float32)
    out = xf * cos[None, :, None, :] + rotf * sin[None, :, None, :]
    return out.astype(x.dtype)


def _pick_block(n: int, candidates) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return n


def make_temporal_band_mask(L: int, hw: int, window_frames: int,
                            prefix_frames: int = 1):
    """Splash-attention mask: frame-granular temporal band + global
    prefix (sliding-tile-attention family, arXiv:2502.04507; tokens in
    t-major THW order so |q_frame - k_frame| <= window is a block band).
    Every query also attends to the first `prefix_frames` frames (the
    seed/conditioning frames). Lazy/computable — never materializes the
    (L, L) matrix; the splash kernel skips fully-masked KV blocks, so
    FLOPs scale with the band width instead of L."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_mask as sm,
    )

    class _TemporalBandMask(sm._ComputableMask):
        def __init__(self):
            def fn(q_ids, kv_ids):
                # operator-only math: the splash kernel calls this both
                # with numpy id grids (MaskInfo build) and with traced
                # arrays (partial-block in-kernel evaluation)
                qf = q_ids // hw
                kf = kv_ids // hw
                d = qf - kf
                band = (d <= window_frames) & (d >= -window_frames)
                return band | (kf < prefix_frames)

            super().__init__(shape=(L, L), mask_function=fn)

        def __eq__(self, other):
            return (
                type(other).__name__ == type(self).__name__
                and other.shape == self.shape
                and getattr(other, "_key", None) == self._key
            )

        def __hash__(self):
            return hash((type(self).__name__, self.shape, self._key))

    m = _TemporalBandMask()
    m._key = (L, hw, window_frames, prefix_frames)
    return m


def _dense_band_mask(Lq: int, Lk: int, hw: int, window_frames: int,
                     prefix_frames: int) -> Array:
    qf = jnp.arange(Lq)[:, None] // hw
    kf = jnp.arange(Lk)[None, :] // hw
    return (jnp.abs(qf - kf) <= window_frames) | (kf < prefix_frames)


def attention_op(
    q: Array, k: Array, v: Array,
    temporal_band: Optional[Tuple[int, int, int]] = None,
) -> Array:
    """Scaled dot-product attention. q: (B, Lq, h, d), k/v: (B, Lk, h, d).

    TPU: splash-attention Pallas kernel for self-attention-sized inputs
    (Lq == Lk, ~143 TF/s at the GEN3C shape), flash-attention kernel for
    cross-attention, XLA elsewhere. Replaces the reference's
    TransformerEngine DotProductAttention (attention.py:228-238).

    temporal_band=(hw, window_frames, prefix_frames): OPT-IN sparse
    self-attention (see make_temporal_band_mask) — an approximation of
    the full-attention net, like step caching a speed/quality knob. On
    the splash path masked-out KV blocks are skipped (real FLOP
    savings); elsewhere the equivalent dense mask is applied (exact same
    numerics, no savings — the CPU-testable path).
    """
    scale = 1.0 / math.sqrt(q.shape[-1])
    # Backend dispatch is a trace-time (static) decision.
    on_tpu = (
        jax.default_backend() == "tpu"
        and q.shape[1] % 128 == 0
        and k.shape[1] % 128 == 0
        and q.shape[-1] % 128 == 0
    )
    if on_tpu and q.shape[1] == k.shape[1] and q.shape[1] >= 1024:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )

        B, L, H, D = q.shape
        bq = _pick_block(L, (1408, 1024, 512, 256, 128))
        bkv = _pick_block(L, (1024, 512, 256, 128))
        bs = sk.BlockSizes(
            block_q=bq, block_kv=bkv, block_kv_compute=bkv,
            block_q_dkv=bq, block_kv_dkv=bkv, block_kv_dkv_compute=bkv,
            block_q_dq=bq, block_kv_dq=bkv,
        )
        if temporal_band is not None:
            head_mask = make_temporal_band_mask(L, *temporal_band)
        else:
            head_mask = sm.FullMask((L, L))
        mmask = sm.MultiHeadMask([head_mask] * H)
        kernel = sk.make_splash_mha(
            mask=mmask, head_shards=1, q_seq_shards=1, block_sizes=bs
        )
        qt = jnp.swapaxes(q, 1, 2) * scale  # (B, h, L, d), pre-scaled
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)
        out = jax.vmap(kernel)(qt, kt, vt)
        return jnp.swapaxes(out, 1, 2)
    if on_tpu and temporal_band is None:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            flash_attention,
        )

        qt = jnp.swapaxes(q, 1, 2)  # (B, h, L, d)
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)
        lq, lk = qt.shape[2], kt.shape[2]

        # Block sizes swept on v5e at the GEN3C shape (56,320 tokens,
        # d=128): block_q 1408 / block_k 1024 hits ~133 TF/s (vs ~122 at
        # 512/512); larger blocks exceed the ~16 MB VMEM scope. Pick the
        # largest candidate that divides the sequence.
        def pick(n, candidates):
            for c in candidates:
                if n % c == 0:
                    return c
            return n  # n < 128: single block

        bq = pick(lq, (1408, 1024, 512, 256, 128))
        bk = pick(lk, (1024, 512, 256, 128))
        bs = BlockSizes(
            block_q=bq,
            block_k_major=bk,
            block_k=bk,
            block_b=1,
            block_q_major_dkv=bq,
            block_k_major_dkv=bk,
            block_k_dkv=bk,
            block_q_dkv=bq,
            block_k_major_dq=bk,
            block_k_dq=bk,
            block_q_dq=bq,
        )
        out = flash_attention(qt, kt, vt, causal=False, sm_scale=scale,
                              block_sizes=bs)
        return jnp.swapaxes(out, 1, 2)
    # XLA fallback (CPU tests / small shapes)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    if temporal_band is not None:
        mask = _dense_band_mask(q.shape[1], k.shape[1], *temporal_band)
        logits = jnp.where(mask[None, None], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _adaln_modulation(p: Params, emb: Array, lora: Array, n_chunks: int) -> Tuple:
    """SiLU -> Linear(D,256) -> Linear(256,nD), + shared LoRA term, chunk."""
    h = jax.nn.silu(emb.astype(jnp.float32))
    h = h @ p["w1"].astype(jnp.float32)
    h = h @ p["w2"].astype(jnp.float32)
    h = h + lora[:, : h.shape[-1]].astype(jnp.float32)
    return jnp.split(h, n_chunks, axis=-1)


def _ring_attention(q: Array, k: Array, v: Array, axis_name: str,
                    q_block: int = 512,
                    temporal_band: Optional[Tuple[int, int, int]] = None,
                    ) -> Array:
    """Ring context-parallel attention: each rank holds a KV shard,
    shards rotate around the cp axis via ppermute while an online-softmax
    accumulator folds them in (the in-framework equivalent of
    TransformerEngine's internal ring/P2P CP attention the reference
    delegates to, general_dit.py:524-543). Full (non-causal) attention.

    q/k/v: (B, L_local, H, D) local shards. Returns (B, L_local, H, D).
    Queries are processed in q_block-row chunks inside each ring step
    (lax.map, sequential) so the peak score-matrix memory is
    B*H*q_block*L_shard fp32 instead of the full L_local x L_shard —
    combined with the one-shard KV residency this keeps the path viable
    at production sequence lengths (at the GEN3C shape, cp=4:
    ~1.8 GB transient vs ~50 GB unchunked).

    temporal_band=(hw, window_frames, prefix_frames): the same
    frame-granular sparse mask as make_temporal_band_mask, evaluated
    DYNAMICALLY per rank — global token positions are recovered from
    lax.axis_index (q rows) and the ring step (KV shard origin), which
    is what the program-static splash block mask cannot express under
    SPMD. Ring steps whose whole (q-shard, kv-shard) frame ranges fall
    outside band+prefix skip their score/AV compute via lax.cond (the
    ppermute still runs on every step — collectives must stay uniform
    across ranks), so attention FLOPs scale with the band width once
    cp exceeds the band's shard footprint. Masked entries are gated by
    construction (where on the probabilities, -1e30 logits) — no
    NaN/inf ever exists in either cond lane (TPU lowers cheap conds to
    both-lanes select; see CLAUDE.md).

    FLOP-saving caveat (ADVICE r2): numerics are correct either way, but
    the cond only saves compute if XLA emits a real branch. TPU lowers
    CHEAP conds to both-lanes select; this cond's taken lane is a full
    chunked attention scan (matmuls + online softmax), which XLA does
    compile as a real conditional, so the skip is expected to hold on
    TPU — but this is unverified on real multi-chip hardware (none
    available; single-chip has no ring). Until measured, treat the
    band+ring FLOP scaling as CPU-mesh-verified parity + TPU-expected
    perf, not a measured multi-chip number.
    """
    size = jax.lax.axis_size(axis_name)
    rank = jax.lax.axis_index(axis_name)
    perm = [(j, (j + 1) % size) for j in range(size)]
    scale = 1.0 / math.sqrt(q.shape[-1])
    B, L, H, D = q.shape
    qb = min(q_block, L)
    if L % qb:  # fall back to one block when the shard doesn't divide
        qb = L
    nq = L // qb
    # (nq, B, H, qb, D): accumulators chunked identically to the queries
    qf = jnp.swapaxes(q.astype(jnp.float32), 1, 2)  # (B, H, L, D)
    qf = qf.reshape(B, H, nq, qb, D).transpose(2, 0, 1, 3, 4)
    m = jnp.full((nq, B, H, qb), -jnp.inf, jnp.float32)
    num = jnp.zeros((nq, B, H, qb, D), jnp.float32)
    den = jnp.zeros((nq, B, H, qb), jnp.float32)
    if temporal_band is not None:
        hw, window, prefix = temporal_band
        assert L % hw == 0, (
            f"local shard L={L} must be whole frames (hw={hw})"
        )
        f_loc = L // hw  # frames per shard
        q_row0 = rank * L + jnp.arange(nq, dtype=jnp.int32) * qb
    else:
        q_row0 = jnp.zeros((nq,), jnp.int32)  # unused

    k_cur, v_cur = k, v
    for step in range(size):
        kf = jnp.swapaxes(k_cur.astype(jnp.float32), 1, 2)  # (B,H,Ls,D)
        vf = jnp.swapaxes(v_cur.astype(jnp.float32), 1, 2)
        # after `step` forward rotations rank r holds rank (r-step)'s shard
        kv_rank = jnp.mod(rank - step, size)

        def chunk_update(args, kf=kf, vf=vf, kv_rank=kv_rank):
            qc, mc, numc, denc, row0 = args  # (B,H,qb,D), (B,H,qb), ...
            logits = jnp.einsum("bhqd,bhkd->bhqk", qc, kf) * scale
            if temporal_band is not None:
                qfr = (row0 + jnp.arange(qb, dtype=jnp.int32)) // hw
                kfr = (kv_rank * L + jnp.arange(
                    kf.shape[2], dtype=jnp.int32)) // hw
                d = qfr[:, None] - kfr[None, :]
                mask = ((d <= window) & (d >= -window)
                        | (kfr < prefix)[None, :])  # (qb, Ls)
                logits = jnp.where(mask[None, None], logits, -1e30)
            cmax = jnp.max(logits, axis=-1)
            m_new = jnp.maximum(mc, cmax)
            p = jnp.exp(logits - m_new[..., None])
            if temporal_band is not None:
                # all-masked rows have m_new=-1e30 -> exp(0)=1: gate them
                p = jnp.where(mask[None, None], p, 0.0)
            corr = jnp.exp(mc - m_new)
            numc = numc * corr[..., None] + jnp.einsum(
                "bhqk,bhkd->bhqd", p, vf
            )
            denc = denc * corr + jnp.sum(p, axis=-1)
            return m_new, numc, denc

        def do_step(carry):
            mm, nn, dd = carry
            mm, nn, dd = jax.lax.map(
                chunk_update, (qf, mm, nn, dd, q_row0))
            return mm, nn, dd

        if temporal_band is not None:
            # whole-step skip when no (q frame, kv frame) pair of this
            # rank pair is inside band or prefix
            qf0 = rank * f_loc
            kf0 = kv_rank * f_loc
            needed = (
                (kf0 <= qf0 + (f_loc - 1) + window)
                & (qf0 <= kf0 + (f_loc - 1) + window)
            ) | (kf0 < prefix)
            m, num, den = jax.lax.cond(
                needed, do_step, lambda c: c, (m, num, den))
        else:
            m, num, den = do_step((m, num, den))
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
    out = num / den[..., None]  # (nq, B, H, qb, D)
    out = out.transpose(1, 2, 0, 3, 4).reshape(B, H, L, D)
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)


def _ulysses_attention(
    q: Array, k: Array, v: Array, axis_name: str,
    temporal_band: Optional[Tuple[int, int, int]] = None,
) -> Array:
    """Ulysses/DeepSpeed-style sequence parallelism (the head-scatter
    strategy xDiT popularized for DiTs, arXiv:2411.01738): one all-to-all
    turns sequence shards into head shards, full-sequence attention runs
    locally on H/cp heads (the splash kernel still applies), a second
    all-to-all restores sequence sharding. Moves ~4*L*H*D/cp bytes per
    layer vs the all-gather strategy's 2*L*H*D*(cp-1)/cp — the
    low-traffic choice when heads divide the cp size.

    q/k/v: (B, L_local, H, D) local shards; requires H % cp == 0.
    """
    # (B, Lloc, H, D) -> (B, L, H/cp, D): split heads, gather sequence
    qg = jax.lax.all_to_all(q, axis_name, split_axis=2, concat_axis=1,
                            tiled=True)
    kg = jax.lax.all_to_all(k, axis_name, split_axis=2, concat_axis=1,
                            tiled=True)
    vg = jax.lax.all_to_all(v, axis_name, split_axis=2, concat_axis=1,
                            tiled=True)
    # full-sequence attention: the band mask composes (global positions)
    out = attention_op(qg, kg, vg, temporal_band=temporal_band)
    # inverse: split sequence, gather heads
    return jax.lax.all_to_all(out, axis_name, split_axis=1, concat_axis=2,
                              tiled=True)


def _attn_block(
    p: Params,
    x: Array,
    context: Optional[Array],
    num_heads: int,
    rope: Optional[Tuple[Array, Array]],
    cp_axis: Optional[str] = None,
    cp_attn_impl: str = "allgather",
    tp_axis: Optional[str] = None,
    sp: bool = False,
    temporal_band: Optional[Tuple[int, int, int]] = None,
) -> Array:
    """Self- or cross-attention with per-head RMSNorm on q,k.

    Under context parallelism (cp_axis set, inside shard_map) the token
    axis is sharded: q stays local while k/v are either all-gathered over
    the cp axis (default — one collective per layer) or rotated through a
    ppermute ring with online-softmax accumulation (cp_attn_impl="ring",
    the TE-ring-attention equivalent). RoPE tables must be the LOCAL
    shard for q/k — rotate first, then communicate.

    Under tensor parallelism (tp_axis set, inside shard_map with the
    q/k/v weights column-sharded and `out` row-sharded per
    parallel.sharding.dit_param_pspecs) each rank runs num_heads/tp
    local heads and the output projection's partial sums are psum'd —
    Megatron attention semantics (reference: training/networks/
    general_dit.py:303-345 TE tp_group linears). Composes with cp_axis:
    KV all-gather rides 'cp', the output reduction rides 'tp'.

    With sp=True (requires tp_axis; Megatron sequence parallelism,
    reference training/networks/general_dit.py:221,623-630 +
    training/tensor_parallel.py:23-102): x arrives TOKEN-SHARDED over
    the tp axis (the norm/modulate region between TP matmuls runs on
    L/tp local tokens). The block all-gathers tokens over tp before the
    column-parallel projections and REDUCE-SCATTERS (psum_scatter) the
    row-parallel output instead of all-reducing — same total comm bytes
    as plain TP, 1/tp the activation memory + elementwise work outside
    the matmuls. all_gather/psum_scatter are JAX-transposable, so the
    backward pass gets the mirrored collectives for free.
    """
    if sp:
        assert tp_axis is not None, "sp requires tp_axis"
        x = jax.lax.all_gather(x, tp_axis, axis=1, tiled=True)
    B, L, D = x.shape
    hd = D // num_heads
    dtype = x.dtype
    ctx = x if context is None else context
    # with TP the projections are column shards: (B, L, D/tp) -> -1 heads
    q = _linear(x, p["q"], dtype).reshape(B, L, -1, hd)
    k = _linear(ctx, p["k"], dtype).reshape(B, ctx.shape[1], -1, hd)
    v = _linear(ctx, p["v"], dtype).reshape(B, ctx.shape[1], -1, hd)
    q = _rms_norm(q, p["q_norm"]["scale"])
    k = _rms_norm(k, p["k_norm"]["scale"])
    if context is None and rope is not None:
        q = apply_rope(q, *rope)
        k = apply_rope(k, *rope)
    if context is None and cp_axis is not None:
        if temporal_band is not None and cp_attn_impl not in (
            "ulysses", "ring"
        ):
            # ValueError (not assert): under `python -O` an assert would
            # be stripped and the allgather branch below would silently
            # drop the band (exact attention instead of the requested
            # approximation).
            raise ValueError(
                "attn_temporal_window under context parallelism requires "
                "cp_attn_impl='ulysses' (local full-sequence attention) "
                "or 'ring' (dynamic per-rank band masks); the allgather "
                "strategy's splash mask is program-static under SPMD and "
                "cannot encode per-rank q offsets"
            )
        if cp_attn_impl == "ring":
            out = _ring_attention(q, k, v, cp_axis,
                                  temporal_band=temporal_band)
        elif cp_attn_impl == "ulysses":
            out = _ulysses_attention(q, k, v, cp_axis,
                                     temporal_band=temporal_band)
        elif cp_attn_impl != "allgather":
            raise ValueError(
                f"unknown cp_attn_impl {cp_attn_impl!r}; expected "
                "'allgather', 'ring' or 'ulysses'"
            )
        else:
            k = jax.lax.all_gather(k, cp_axis, axis=1, tiled=True)
            v = jax.lax.all_gather(v, cp_axis, axis=1, tiled=True)
            out = attention_op(q, k, v)
    else:
        out = attention_op(q, k, v, temporal_band=temporal_band)
    out = out.reshape(B, L, -1)
    out = _linear(out, p["out"], dtype)
    if tp_axis is not None:
        if sp:
            # row-parallel reduction fused with the token re-scatter
            out = jax.lax.psum_scatter(
                out, tp_axis, scatter_dimension=1, tiled=True
            )
        else:
            out = jax.lax.psum(out, tp_axis)  # row-parallel reduction
    return out


def _mlp_block(
    p: Params, x: Array, tp_axis: Optional[str] = None, sp: bool = False
) -> Array:
    dtype = x.dtype
    if sp:
        assert tp_axis is not None, "sp requires tp_axis"
        x = jax.lax.all_gather(x, tp_axis, axis=1, tiled=True)
    h = _linear(x, p["fc1"], dtype)  # column shard under TP
    h = jax.nn.gelu(h, approximate=False)
    h = _linear(h, p["fc2"], dtype)  # row shard: partial sums
    if tp_axis is not None:
        if sp:
            h = jax.lax.psum_scatter(
                h, tp_axis, scatter_dimension=1, tiled=True
            )
        else:
            h = jax.lax.psum(h, tp_axis)
    return h


def _modulated_residual(x, sub_out_fn, p_sub, emb, lora):
    """x + gate * f(LN(x) * (1+scale) + shift)  (blocks.py:419-475)."""
    shift, scale, gate = _adaln_modulation(p_sub["adaln"], emb, lora, 3)
    dtype = x.dtype
    normed = _layer_norm(x)
    modded = (
        normed.astype(jnp.float32) * (1 + scale[:, None, :]) + shift[:, None, :]
    ).astype(dtype)
    return x + gate[:, None, :].astype(dtype) * sub_out_fn(modded)


# ------------------------------ forward ------------------------------


def patchify(cfg: DiTConfig, params: Params, x: Array,
             padding_mask: Optional[Array]) -> Array:
    """(B, C, T, H, W) -> (B, T', H', W', D) tokens."""
    B, C, T, H, W = x.shape
    ps, pt = cfg.patch_spatial, cfg.patch_temporal
    if cfg.concat_padding_mask:
        if padding_mask is None:
            padding_mask = jnp.zeros((B, H, W), x.dtype)
        pm = jnp.broadcast_to(padding_mask[:, None, None, :, :], (B, 1, T, H, W))
        x = jnp.concatenate([x, pm.astype(x.dtype)], axis=1)
        C = C + 1
    # b c (t r) (h m) (w n) -> b t h w (c r m n)
    x = x.reshape(B, C, T // pt, pt, H // ps, ps, W // ps, ps)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)  # B t h w c r m n
    x = x.reshape(B, T // pt, H // ps, W // ps, C * pt * ps * ps)
    return x @ _w(params["x_embedder"], x.dtype)


def unpatchify(cfg: DiTConfig, x: Array, T: int, H: int, W: int) -> Array:
    """(B, T', H', W', p1*p2*t*C) -> (B, C, T, H, W) with channel layout
    (p1, p2, t, C) (general_dit.py:348-357)."""
    B = x.shape[0]
    ps, pt = cfg.patch_spatial, cfg.patch_temporal
    C = cfg.out_channels
    x = x.reshape(B, T // pt, H // ps, W // ps, ps, ps, pt, C)
    # -> B C (T t) (H p1) (W p2)
    x = x.transpose(0, 7, 1, 6, 2, 4, 3, 5)  # B C T t H p1 W p2
    return x.reshape(B, C, T, H, W)


def dit_forward(
    params: Params,
    cfg: DiTConfig,
    x: Array,  # (B, C, T, H, W)
    timesteps: Array,  # (B,)
    crossattn_emb: Array,  # (B, M, 1024)
    fps: Optional[float] = None,
    padding_mask: Optional[Array] = None,
    rope_tables: Optional[Tuple[Array, Array]] = None,
    extra_pos_emb: Optional[Array] = None,
    cp_axis: Optional[str] = None,
    remat: bool = False,
    tp_axis: Optional[str] = None,
    sp: bool = False,
    sp_sharding=None,
    span_delta: Optional[Array] = None,
    return_span_delta: bool = False,
    return_block_residuals: bool = False,
    action: Optional[Array] = None,  # (B, 7) or (B, T_act, 7)
    augment_sigma: Optional[Array] = None,  # (B,)
) -> Array:
    """Full GeneralDIT forward. Returns (B, out_channels, T, H, W).

    action: robot-action conditioning (training/networks/
    general_dit_action.py:276-431, ActionConditionalVideoExtendGeneralDIT):
    the first frame's action vector runs through the action_embedder_B_3D
    MLP and adds to the AdaLN-LoRA vector. NOTE the reference also
    computes action_embedder_B_D but its add lands on a rebound local
    AFTER `affline_emb_B_D = timesteps_B_D` aliased the pre-add tensor
    (general_dit_action.py:421-431) — the B_D term never reaches the
    network, so we match that effective behavior (the B_D embedder params
    are still carried for checkpoint compatibility).

    Delta-DiT span caching (cfg.cache_block_span=(lo,hi), arXiv:
    2406.01125): with return_span_delta=True the forward also returns
    the residual delta the span's blocks added to the token stream,
    (B, L, D); with span_delta given, the span's blocks are SKIPPED and
    the cached delta is re-applied in their place — the cheap path for
    cache-skip denoise steps (runs num_blocks - (hi-lo) blocks).

    rope_tables / extra_pos_emb may be precomputed; by default they are
    built for the full (T', H', W') token grid. With cp_axis set (inside
    a shard_map over that axis), x is the LOCAL latent-T shard: the
    positional tables are generated for the full T'*cp grid and sliced to
    this rank's contiguous chunk (parity with the reference's CP-aware
    pos-emb, position_embedding.py:61-79), and self-attention gathers K/V
    across the axis.

    With tp_axis set (inside a shard_map whose in_specs shard the params
    per parallel.sharding.dit_param_pspecs), attention and MLP run
    Megatron tensor-parallel: column-sharded projections, psum on the
    row-parallel outputs. cp_axis and tp_axis compose on a 2D mesh —
    tokens sharded over 'cp', heads/hidden over 'tp'.

    sp=True (requires tp_axis) adds Megatron sequence parallelism
    (reference general_dit.py:221,623-630, tensor_parallel.py:23-102):
    the residual/norm/adaLN token stream between TP matmuls is sharded
    L/tp per rank; each attn/MLP sub-block all-gathers tokens in and
    reduce-scatters its row-parallel output back out. Requires
    L % tp == 0. Composes with cp_axis (tokens already cp-sharded shard
    further over tp).

    sp_sharding (a NamedSharding for the (B, L, D) token stream, tokens
    over the tp mesh axis) is the DECLARATIVE form for GSPMD/pjit
    callers (the sharded train step): the token stream is constrained to
    that sharding at every block boundary and XLA's SPMD partitioner
    derives the same reduce-scatter/all-gather decomposition (and its
    transpose for grads). Mutually exclusive with sp.
    """
    B, C, T, H, W = x.shape
    dtype = cfg.dtype
    x = x.astype(dtype)

    tokens = patchify(cfg, params, x, padding_mask)  # (B,T',H',W',D)
    Bt, Tp, Hp, Wp, D = tokens.shape
    L = Tp * Hp * Wp
    tokens = tokens.reshape(B, L, D)
    temporal_band = (
        (Hp * Wp, cfg.attn_temporal_window, cfg.attn_prefix_frames)
        if cfg.attn_temporal_window is not None
        else None
    )

    cp_size = 1 if cp_axis is None else jax.lax.axis_size(cp_axis)
    if rope_tables is None:
        rope_tables = rope_3d_table(cfg, Tp * cp_size, Hp, Wp, fps=fps)
    if extra_pos_emb is None:
        extra_pos_emb = build_extra_pos_emb(params, Tp * cp_size, Hp, Wp)
    if cp_axis is not None:
        # slice this rank's contiguous latent-T chunk (token order is
        # t-major so a T-chunk is an L-chunk)
        idx = jax.lax.axis_index(cp_axis)
        cos, sin = rope_tables
        if cos.shape[0] != L:
            cos = jax.lax.dynamic_slice_in_dim(cos, idx * L, L, 0)
            sin = jax.lax.dynamic_slice_in_dim(sin, idx * L, L, 0)
            rope_tables = (cos, sin)
        if extra_pos_emb.shape[0] != Tp:
            extra_pos_emb = jax.lax.dynamic_slice_in_dim(
                extra_pos_emb, idx * Tp, Tp, 0
            )
    extra = extra_pos_emb.astype(dtype)
    if extra.ndim == 4:  # (T,H,W,D) -> (1, L, D)
        extra = extra.reshape(1, L, D)

    if sp:
        # Megatron-SP scatter: each tp rank keeps a contiguous L/tp token
        # chunk for the norm/modulate/residual regions. RoPE tables stay
        # full-length (applied after the in-block all-gather).
        assert tp_axis is not None, "sp requires tp_axis"
        assert sp_sharding is None, "sp and sp_sharding are exclusive"
        tp_size = jax.lax.axis_size(tp_axis)
        assert L % tp_size == 0, f"L={L} must divide tp={tp_size} for sp"
        tp_idx = jax.lax.axis_index(tp_axis)
        L_loc = L // tp_size
        tokens = jax.lax.dynamic_slice_in_dim(
            tokens, tp_idx * L_loc, L_loc, 1
        )
        extra = jax.lax.dynamic_slice_in_dim(extra, tp_idx * L_loc, L_loc, 1)
    elif sp_sharding is not None:
        tokens = jax.lax.with_sharding_constraint(tokens, sp_sharding)

    # timestep embedding: affine emb = RMSNorm(sincos), lora = MLP output
    sincos = timestep_sincos(timesteps.reshape(-1), D)  # (B, D) fp32
    h = sincos @ _w(params["t_embedder"]["linear_1"], jnp.float32)
    h = jax.nn.silu(h)
    lora = h @ _w(params["t_embedder"]["linear_2"], jnp.float32)  # (B,3D)
    if action is not None:
        a = (action[:, 0] if action.ndim == 3 else action).astype(
            jnp.float32)
        p_a = params["action_embedder_B_3D"]
        h_a = jax.nn.gelu(
            a @ _w(p_a["fc1"], jnp.float32)
            + p_a["fc1"]["b"].astype(jnp.float32),
            approximate=True,
        )
        lora = lora + (
            h_a @ _w(p_a["fc2"], jnp.float32)
            + p_a["fc2"]["b"].astype(jnp.float32)
        )
    affine = sincos
    if cfg.add_augment_sigma_embedding:
        # general_dit_video_conditioned.py:181-189: affline_emb +=
        # augment_sigma_embedder(condition_video_augment_sigma) where the
        # SDXLTimestepEmbedding under AdaLN-LoRA returns the raw sincos
        # (blocks.py SDXLTimestepEmbedding.forward) and the lora output
        # is discarded at the call site. None => zeros (image case /
        # unconditioned video, same as the reference fallback).
        aug = (
            jnp.zeros_like(timesteps.reshape(-1))
            if augment_sigma is None
            else augment_sigma.reshape(-1)
        )
        affine = affine + timestep_sincos(aug, D)
    emb = _rms_norm(affine, params["affline_norm"]["scale"])  # (B, D) fp32

    def block_step(tokens, blk, emb, lora, extra, ctx_emb):
        tokens = tokens + extra
        tokens = _modulated_residual(
            tokens,
            lambda t: _attn_block(
                blk["fa"], t, None, cfg.num_heads, rope_tables, cp_axis,
                cfg.cp_attn_impl, tp_axis, sp,
                temporal_band=temporal_band,
            ),
            blk["fa"],
            emb,
            lora,
        )
        tokens = _modulated_residual(
            tokens,
            lambda t: _attn_block(
                blk["ca"], t, ctx_emb, cfg.num_heads, None,
                tp_axis=tp_axis, sp=sp,
            ),
            blk["ca"],
            emb,
            lora,
        )
        tokens = _modulated_residual(
            tokens,
            lambda t: _mlp_block(blk["mlp"], t, tp_axis, sp),
            blk["mlp"],
            emb,
            lora,
        )
        if sp_sharding is not None:
            # declarative SP: pin the residual stream's token axis to the
            # tp mesh axis at every block boundary; the SPMD partitioner
            # turns the row-parallel all-reduces into reduce-scatter +
            # all-gather pairs (and transposes them in the backward)
            tokens = jax.lax.with_sharding_constraint(tokens, sp_sharding)
        return tokens

    if remat:
        # rematerialize per block during training: activations of the 28
        # blocks are recomputed in the backward pass instead of stored
        # (replaces the reference's forward_blocks_memory_save path,
        # training/networks/general_dit.py:736-849)
        block_step = jax.checkpoint(block_step)

    ctx_emb = crossattn_emb.astype(dtype)
    span = cfg.cache_block_span
    if (span_delta is not None or return_span_delta) and span is None:
        raise ValueError(
            "span_delta/return_span_delta need cfg.cache_block_span"
        )
    span_lo, span_hi = span if span is not None else (-1, -1)
    tokens_at_lo = None
    new_span_delta = None
    block_residuals = []  # per-block mean|delta|/mean|x| (span ranking)
    for bi, blk in enumerate(params["blocks"]):
        if bi == span_lo:
            if span_delta is not None:
                # cache-skip step: re-apply the cached span delta and
                # jump over the span's blocks
                if isinstance(span_delta, tuple):  # int8 codes + scales
                    codes, scales = span_delta
                    d = codes.astype(jnp.float32) * scales
                else:
                    d = span_delta
                tokens = tokens + d.astype(tokens.dtype)
            elif return_span_delta:
                tokens_at_lo = tokens
        if span_delta is not None and span_lo <= bi < span_hi:
            continue
        before = tokens if return_block_residuals else None
        tokens = block_step(tokens, blk, emb, lora, extra, ctx_emb)
        if return_block_residuals:
            bf = before.astype(jnp.float32)
            block_residuals.append(
                jnp.mean(jnp.abs(tokens.astype(jnp.float32) - bf))
                / (jnp.mean(jnp.abs(bf)) + 1e-8)
            )
        if return_span_delta and span_lo < span_hi and bi == span_hi - 1:
            d = tokens - tokens_at_lo
            if cfg.cache_span_dtype == "int8":
                # per-token symmetric int8: 4x smaller sampler carry
                df = d.astype(jnp.float32)
                scales = jnp.max(jnp.abs(df), axis=-1,
                                 keepdims=True) / 127.0
                codes = jnp.clip(
                    jnp.round(df / jnp.maximum(scales, 1e-8)), -127, 127
                ).astype(jnp.int8)
                new_span_delta = (codes, scales)
            else:
                new_span_delta = d
    if return_span_delta and span_lo == span_hi:
        # empty span: delta is identically zero (skip path == full path)
        if cfg.cache_span_dtype == "int8":
            new_span_delta = (
                jnp.zeros(tokens.shape, jnp.int8),
                jnp.zeros(tokens.shape[:-1] + (1,), jnp.float32),
            )
        else:
            new_span_delta = jnp.zeros_like(tokens)

    # final layer (blocks.py:189-242)
    fshift, fscale = _adaln_modulation(params["final"]["adaln"], emb, lora, 2)
    normed = _layer_norm(tokens)
    tokens = (
        normed.astype(jnp.float32) * (1 + fscale[:, None, :]) + fshift[:, None, :]
    ).astype(dtype)
    tokens = tokens @ _w(params["final"]["linear"], dtype)
    if sp:
        # re-assemble the full (cp-local) token stream for unpatchify
        tokens = jax.lax.all_gather(tokens, tp_axis, axis=1, tiled=True)
    tokens = tokens.reshape(B, Tp, Hp, Wp, -1)
    out = unpatchify(cfg, tokens, T, H, W)
    if return_block_residuals:
        return out, jnp.stack(block_residuals)
    if return_span_delta:
        return out, new_span_delta
    return out


def randomize_degenerate_inits(params: Params, seed: int = 9) -> Params:
    """Bench/test helper: a fresh init has ZERO adaLN gates and a zero
    final linear (general_dit.py zero-init parity), which makes every
    block an identity and the output constant — useless for exercising
    caching policies or ranking block contributions without a real
    checkpoint. Randomize those entries (in place) so blocks contribute.
    """
    keys = iter(jax.random.split(jax.random.PRNGKey(seed),
                                 4 * len(params["blocks"]) + 4))
    for blk in params["blocks"]:
        for sub in ("fa", "ca", "mlp"):
            w2 = blk[sub]["adaln"]["w2"]
            blk[sub]["adaln"]["w2"] = 0.1 * jax.random.normal(
                next(keys), w2.shape, w2.dtype
            )
    fl = params["final"]["linear"]["w"]
    params["final"]["linear"]["w"] = 0.1 * jax.random.normal(
        next(keys), fl.shape, fl.dtype
    )
    return params


def build_extra_pos_emb(params: Params, T: int, H: int, W: int) -> Array:
    """Learnable per-axis pos emb, cropped + summed + RMS-normalized
    (position_embedding.py:218-233). Returns (T, H, W, D) fp32."""
    pe = params["extra_pos_emb"]
    emb = (
        pe["t"][:T, None, None, :]
        + pe["h"][None, :H, None, :]
        + pe["w"][None, None, :W, :]
    )
    return _l2_rms_normalize(emb)
