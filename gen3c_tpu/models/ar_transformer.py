"""Llama-style autoregressive transformer over discrete video tokens.

Parity: cosmos_predict1/autoregressive/networks/transformer.py +
modules/{attention,mlp}.py — GQA attention (wq/wk/wv/wo, no bias,
optional per-head RMSNorm on q/k), RMSNorm pre-norms, SwiGLU MLP
(w1/w2/w3), 1D or 3D RoPE, optional cross-attention to T5 context,
KV-cache incremental decoding with temperature / top-k / top-p sampling
(utils/sampling.py parity).

TPU-native: functional params, a jitted single-token decode step driven
by lax.scan (the KV cache is a carried pytree, not module state), and
Megatron-style TP via the same PartitionSpec scheme as the DiT
(reference: autoregressive/modules/linear.py column/row parallel).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ARConfig:
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 8
    vocab_size: int = 64000
    ffn_hidden_size: int = 14336
    norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    max_seq_len: int = 8192
    use_qk_normalization: bool = True
    context_dim: int = 0  # >0 enables cross-attention (video2world)
    rope_dim: str = "1D"  # "1D" | "3D"
    latent_shape: Tuple[int, int, int] = (0, 0, 0)  # (T,H,W) for 3D rope
    # llama3-style rope scaling (factor, low_freq_factor,
    # high_freq_factor, original_max_position_embeddings); None = off.
    # Needed for Llama-3.1-family checkpoints (e.g. Llama-Guard-3-8B).
    rope_scaling: Optional[Tuple[float, float, float, int]] = None
    # YaRN long-context rope scaling (the reference AR world models use
    # COSMOS_YARN_CONFIG, configs/base/model_config.py:57-63; rope
    # math: autoregressive/modules/embedding.py:250-320)
    apply_yarn: bool = False
    yarn_scale: float = 1.0
    yarn_beta_fast: int = 32
    yarn_beta_slow: int = 1
    original_seq_len: Optional[int] = None  # 1D yarn reference length
    original_latent_shape: Tuple[int, int, int] = (0, 0, 0)  # 3D yarn
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads


jax.tree_util.register_static(ARConfig)

AR_TINY = ARConfig(
    dim=128, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=512,
    ffn_hidden_size=256, max_seq_len=256, dtype=jnp.float32,
)


class KVCache(NamedTuple):
    k: Array  # (layers, B, max_seq, kv_heads, head_dim)
    v: Array
    pos: Array  # () int32 — current length
    # int8 KV mode (init_kv_cache(quantized=True)): k/v hold int8 codes
    # and these hold per-(layer,B,pos,head) fp32 absmax/127 scales;
    # None = plain bf16/fp32 cache
    k_scale: Optional[Array] = None  # (layers, B, max_seq, kv_heads, 1)
    v_scale: Optional[Array] = None


def _kv_quantize(x: Array) -> Tuple[Array, Array]:
    """Per-(pos, head) symmetric int8: scale = absmax(head_dim)/127."""
    scale = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                    keepdims=True) / 127.0
    q = jnp.round(x.astype(jnp.float32) / jnp.maximum(scale, 1e-8))
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


def _mm(x: Array, w, dtype) -> Array:
    """x @ W where W is a raw array or a models.quantize entry
    ({"q"|"q8", "scale"}): int8 weight-only dequantizes into the matmul
    reads (halved weight bandwidth — the decode bottleneck at small
    batch); "q8" runs the W8A8 int8 MXU path."""
    if isinstance(w, dict):
        from gen3c_tpu.models import quantize as qz

        if "q8" in w:
            return qz.w8a8_matmul(x, w, x.dtype)
        return x @ qz.weight(w, dtype)
    return x @ w.astype(dtype)


def _embed(table, tokens: Array, dtype) -> Array:
    """Token-embedding lookup for raw or int8-quantized tables."""
    if isinstance(table, dict):
        q = table.get("q", table.get("q8"))
        return q[tokens].astype(dtype) * table["scale"].astype(dtype)
    return table.astype(dtype)[tokens]


def init_ar_params(key: Array, cfg: ARConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 8 + cfg.n_layers * 12))

    def lin(i, o, std=0.02):
        return jax.random.normal(next(keys), (i, o), dtype) * std

    hd = cfg.head_dim

    def layer():
        p = {
            "attention_norm": {"scale": jnp.ones((cfg.dim,), dtype)},
            "ffn_norm": {"scale": jnp.ones((cfg.dim,), dtype)},
            "wq": lin(cfg.dim, cfg.n_heads * hd),
            "wk": lin(cfg.dim, cfg.n_kv_heads * hd),
            "wv": lin(cfg.dim, cfg.n_kv_heads * hd),
            "wo": lin(cfg.n_heads * hd, cfg.dim),
            "w1": lin(cfg.dim, cfg.ffn_hidden_size),
            "w2": lin(cfg.ffn_hidden_size, cfg.dim),
            "w3": lin(cfg.dim, cfg.ffn_hidden_size),
        }
        if cfg.use_qk_normalization:
            p["q_norm"] = {"scale": jnp.ones((hd,), dtype)}
            p["k_norm"] = {"scale": jnp.ones((hd,), dtype)}
        if cfg.context_dim:
            p["cross_norm"] = {"scale": jnp.ones((cfg.dim,), dtype)}
            p["cwq"] = lin(cfg.dim, cfg.n_heads * hd)
            p["cwk"] = lin(cfg.context_dim, cfg.n_kv_heads * hd)
            p["cwv"] = lin(cfg.context_dim, cfg.n_kv_heads * hd)
            p["cwo"] = lin(cfg.n_heads * hd, cfg.dim)
        return p

    return {
        "tok_embeddings": lin(cfg.vocab_size, cfg.dim, 0.02),
        "layers": [layer() for _ in range(cfg.n_layers)],
        "norm": {"scale": jnp.ones((cfg.dim,), dtype)},
        "output": lin(cfg.dim, cfg.vocab_size),
    }


def _rms(x: Array, scale: Array, eps: float) -> Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)).astype(
        x.dtype
    )


def _yarn_scale_factors(inv_freq: np.ndarray, original_len: int,
                        cfg: ARConfig) -> np.ndarray:
    """YaRN frequency interpolation (embedding.py:250-261): low
    frequencies divided by the scale, high kept, smooth ramp between."""
    high = 2 * np.pi * cfg.yarn_beta_fast / original_len
    low = 2 * np.pi * cfg.yarn_beta_slow / original_len
    smooth = np.clip((inv_freq - low) / (high - low), 0.0, 1.0)
    return (1 - smooth) / cfg.yarn_scale + smooth


def rope_tables(cfg: ARConfig) -> Tuple[Array, Array]:
    """cos/sin of shape (max_seq_len, head_dim). 3D rope splits the head
    dim across (T, H, W) axes of the latent token grid (transformer.py
    rope_dim '3D' parity). YaRN (cfg.apply_yarn) rescales the
    frequencies (embedding.py:250-320; like the reference's default "v2"
    rope, no magnitude scaling is applied to the tables)."""
    d = cfg.head_dim
    if cfg.rope_dim == "1D":
        freqs = 1.0 / (
            cfg.rope_theta ** (np.arange(0, d, 2)[: d // 2] / d)
        )
        if cfg.apply_yarn:
            assert cfg.original_seq_len, "original_seq_len required for yarn"
            freqs = freqs * _yarn_scale_factors(
                freqs, cfg.original_seq_len, cfg
            )
        if cfg.rope_scaling is not None:
            # llama3 rope scaling (HF _compute_llama3_parameters parity):
            # low-freq components divided by `factor`, high-freq kept,
            # smooth interpolation between the wavelength bounds
            factor, low_f, high_f, orig_len = cfg.rope_scaling
            wavelen = 2 * np.pi / freqs
            low_wl = orig_len / low_f
            high_wl = orig_len / high_f
            scaled = freqs / factor
            smooth = (orig_len / wavelen - low_f) / (high_f - low_f)
            mid = (1 - smooth) * scaled + smooth * freqs
            freqs = np.where(
                wavelen > low_wl, scaled,
                np.where(wavelen < high_wl, freqs, mid),
            )
        t = np.arange(cfg.max_seq_len)
        ang = np.outer(t, freqs)
        ang = np.concatenate([ang, ang], axis=-1)
    else:
        T, H, W = cfg.latent_shape
        assert T * H * W > 0, "latent_shape required for 3D rope"
        dim_h = d // 6 * 2
        dim_w = dim_h
        dim_t = d - 2 * dim_h
        h_rng = np.arange(0, dim_h, 2)[: dim_h // 2] / dim_h
        t_rng = np.arange(0, dim_t, 2)[: dim_t // 2] / dim_t
        fh = 1.0 / cfg.rope_theta**h_rng
        ft = 1.0 / cfg.rope_theta**t_rng
        if cfg.apply_yarn:
            ot, oh = cfg.original_latent_shape[0], cfg.original_latent_shape[1]
            assert ot and oh, "original_latent_shape required for 3D yarn"
            fh = fh * _yarn_scale_factors(fh, oh, cfg)
            ft = ft * _yarn_scale_factors(ft, ot, cfg)
        tt = np.repeat(np.arange(T), H * W)
        hh = np.tile(np.repeat(np.arange(H), W), T)
        ww = np.tile(np.arange(W), T * H)
        ang = np.concatenate(
            [np.outer(tt, ft), np.outer(hh, fh), np.outer(ww, fh)], axis=-1
        )
        ang = np.concatenate([ang, ang], axis=-1)
        pad = cfg.max_seq_len - ang.shape[0]
        if pad > 0:
            ang = np.concatenate([ang, np.zeros((pad, d))], axis=0)
        ang = ang[: cfg.max_seq_len]
    return (
        jnp.asarray(np.cos(ang), jnp.float32),
        jnp.asarray(np.sin(ang), jnp.float32),
    )


def _apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    """cos/sin: (L, d) shared across the batch, or (B, L, d) per-row
    (left-padded bucketed prefill uses per-row position offsets)."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    if cos.ndim == 2:
        cos, sin = cos[None, :, None, :], sin[None, :, None, :]
    else:
        cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    out = x.astype(jnp.float32) * cos + rot.astype(jnp.float32) * sin
    return out.astype(x.dtype)


def _gqa_attention(q, k, v, causal_offset: Optional[Array] = None,
                   kv_valid_start: Optional[Array] = None,
                   k_scale: Optional[Array] = None,
                   v_scale: Optional[Array] = None):
    """q: (B, Lq, Hq, d); k/v: (B, Lk, Hkv, d) with Hq % Hkv == 0.

    causal_offset: absolute position of q[0] (None => full causal square).
    kv_valid_start: (B,) — keys at positions < kv_valid_start[b] are
    masked out (left-padding support for bucketed prompt lengths).
    k_scale/v_scale: (B, Lk, Hkv, 1) int8-KV dequantization scales,
    FOLDED into the attention math (scores scaled per key column, probs
    scaled before PV) so the int8 cache is never materialized as a full
    bf16 copy — the dtype convert fuses into the matmul reads.
    """
    B, Lq, Hq, d = q.shape
    Lk, Hkv = k.shape[1], k.shape[2]
    rep = Hq // Hkv
    k = jnp.repeat(k, rep, axis=2)
    v = jnp.repeat(v, rep, axis=2)
    if k_scale is not None:
        k = k.astype(q.dtype)
    if v_scale is not None:
        v = v.astype(q.dtype)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    logits = logits / math.sqrt(d)
    if k_scale is not None:
        # per-key-column rescale: s_j factors out of q_i . (k_j * s_j)
        ks = jnp.repeat(k_scale, rep, axis=2)  # (B, Lk, Hq, 1)
        logits = logits * ks[..., 0].transpose(0, 2, 1)[:, :, None, :]
    kpos = jnp.arange(Lk)[None, :]
    if causal_offset is not None:
        qpos = jnp.arange(Lq)[:, None] + causal_offset
        mask = (kpos <= qpos)[None]  # (1, Lq, Lk)
        if kv_valid_start is not None:
            mask = mask & (kpos[None] >= kv_valid_start[:, None, None])
        logits = jnp.where(mask[:, None], logits, -1e30)
    elif kv_valid_start is not None:
        mask = kpos >= kv_valid_start[:, None]  # (B, Lk)
        logits = jnp.where(mask[:, None, None, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    if v_scale is not None:
        # fold the value scales into the probs: sum_j p_ij s_j v_j
        vs = jnp.repeat(v_scale, rep, axis=2)  # (B, Lk, Hq, 1)
        probs = probs * vs[..., 0].transpose(0, 2, 1)[:, :, None, :]
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def ar_forward(
    params: Params,
    cfg: ARConfig,
    tokens: Array,  # (B, L) int32
    rope: Tuple[Array, Array],
    cache: Optional[KVCache] = None,
    context: Optional[Array] = None,  # (B, M, context_dim)
    pad_lens: Optional[Array] = None,  # (B,) left-pad counts
    input_embeddings: Optional[Array] = None,  # (B, L, D)
) -> Tuple[Array, Optional[KVCache]]:
    """Returns (logits (B, L, vocab), updated cache).

    Without a cache: full causal prefill (cache is created when one is
    passed in — positions [pos, pos+L) are written).

    pad_lens: per-row LEFT-padding counts for bucketed prompt lengths —
    row b's real tokens start at buffer index pad_lens[b]; RoPE
    positions are shifted so the first real token gets position 0, and
    padded key/value slots are masked out of every attention. With
    pad_lens the output is bit-identical to an unpadded forward of each
    row (the retrace-per-prompt-length fix; reference pads via HF
    tokenizer batching instead).

    input_embeddings: bypasses the token-embedding lookup — the
    multimodal path (a VLM splices projected vision tokens into the
    text stream, Pixtral semantics). `tokens` is ignored when given.
    """
    dtype = cfg.dtype
    if input_embeddings is not None:
        h = input_embeddings.astype(dtype)
        B, L = h.shape[:2]
    else:
        B, L = tokens.shape
        h = _embed(params["tok_embeddings"], tokens, dtype)
    cos_full, sin_full = rope
    pos0 = cache.pos if cache is not None else jnp.asarray(0, jnp.int32)
    if pad_lens is None:
        cos = jax.lax.dynamic_slice_in_dim(cos_full, pos0, L, 0)
        sin = jax.lax.dynamic_slice_in_dim(sin_full, pos0, L, 0)
    else:
        # per-row positions: buffer index minus the row's left-pad count
        positions = jnp.clip(
            pos0 + jnp.arange(L)[None, :] - pad_lens[:, None], 0
        )  # (B, L)
        cos = cos_full[positions]
        sin = sin_full[positions]

    new_k, new_v = [], []
    new_ks, new_vs = [], []
    hd = cfg.head_dim
    for li, lp in enumerate(params["layers"]):
        x = _rms(h, lp["attention_norm"]["scale"], cfg.norm_eps)
        q = _mm(x, lp["wq"], dtype).reshape(B, L, cfg.n_heads, hd)
        k = _mm(x, lp["wk"], dtype).reshape(B, L, cfg.n_kv_heads, hd)
        v = _mm(x, lp["wv"], dtype).reshape(B, L, cfg.n_kv_heads, hd)
        if cfg.use_qk_normalization:
            q = _rms(q, lp["q_norm"]["scale"], cfg.norm_eps)
            k = _rms(k, lp["k_norm"]["scale"], cfg.norm_eps)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)

        if cache is not None:
            cks = cvs = None
            if cache.k_scale is not None:
                # int8 KV cache: store codes + per-(pos,head) scales.
                # The scales are FOLDED into the attention (k_scale /
                # v_scale args) rather than dequantizing the whole
                # cache into a bf16 copy — the int8->bf16 convert fuses
                # into the matmul reads, so both the footprint AND the
                # read bandwidth halve (~0.4% rel. error).
                kq, ks = _kv_quantize(k)
                vq, vs = _kv_quantize(v)
                ck = jax.lax.dynamic_update_slice_in_dim(
                    cache.k[li], kq, pos0, axis=1
                )
                cv = jax.lax.dynamic_update_slice_in_dim(
                    cache.v[li], vq, pos0, axis=1
                )
                cks = jax.lax.dynamic_update_slice_in_dim(
                    cache.k_scale[li], ks, pos0, axis=1
                )
                cvs = jax.lax.dynamic_update_slice_in_dim(
                    cache.v_scale[li], vs, pos0, axis=1
                )
                new_ks.append(cks)
                new_vs.append(cvs)
            else:
                ck = jax.lax.dynamic_update_slice_in_dim(
                    cache.k[li], k.astype(cache.k.dtype), pos0, axis=1
                )
                cv = jax.lax.dynamic_update_slice_in_dim(
                    cache.v[li], v.astype(cache.v.dtype), pos0, axis=1
                )
            new_k.append(ck)
            new_v.append(cv)
            attn = _gqa_attention(
                q,
                ck if cks is not None else ck.astype(dtype),
                cv if cvs is not None else cv.astype(dtype),
                causal_offset=pos0,
                kv_valid_start=pad_lens,
                k_scale=cks, v_scale=cvs,
            )
        else:
            attn = _gqa_attention(q, k, v, causal_offset=jnp.asarray(0),
                                  kv_valid_start=pad_lens)
        h = h + _mm(attn.reshape(B, L, -1), lp["wo"], dtype)

        if cfg.context_dim and context is not None:
            x = _rms(h, lp["cross_norm"]["scale"], cfg.norm_eps)
            cq = _mm(x, lp["cwq"], dtype).reshape(B, L, cfg.n_heads, hd)
            ckx = _mm(context.astype(dtype), lp["cwk"], dtype).reshape(
                B, -1, cfg.n_kv_heads, hd
            )
            cvx = _mm(context.astype(dtype), lp["cwv"], dtype).reshape(
                B, -1, cfg.n_kv_heads, hd
            )
            cattn = _gqa_attention(cq, ckx, cvx, causal_offset=None)
            h = h + _mm(cattn.reshape(B, L, -1), lp["cwo"], dtype)

        x = _rms(h, lp["ffn_norm"]["scale"], cfg.norm_eps)
        gate = jax.nn.silu(_mm(x, lp["w1"], dtype))
        up = _mm(x, lp["w3"], dtype)
        h = h + _mm(gate * up, lp["w2"], dtype)

    h = _rms(h, params["norm"]["scale"], cfg.norm_eps)
    logits = _mm(h, params["output"], dtype).astype(jnp.float32)
    out_cache = None
    if cache is not None:
        out_cache = KVCache(
            k=jnp.stack(new_k), v=jnp.stack(new_v), pos=pos0 + L,
            k_scale=jnp.stack(new_ks) if new_ks else None,
            v_scale=jnp.stack(new_vs) if new_vs else None,
        )
    return logits, out_cache


def init_kv_cache(cfg: ARConfig, batch: int, dtype=jnp.bfloat16,
                  quantized: bool = False) -> KVCache:
    """quantized=True: int8 codes + fp32 per-(pos,head) scales — half
    the HBM footprint/read bandwidth of a bf16 cache (the scales add
    1/head_dim overhead)."""
    shape = (cfg.n_layers, batch, cfg.max_seq_len, cfg.n_kv_heads,
             cfg.head_dim)
    if quantized:
        sshape = shape[:-1] + (1,)
        return KVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            pos=jnp.asarray(0, jnp.int32),
            k_scale=jnp.zeros(sshape, jnp.float32),
            v_scale=jnp.zeros(sshape, jnp.float32),
        )
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        pos=jnp.asarray(0, jnp.int32),
    )


def sample_logits(
    key: Array, logits: Array, temperature: float = 1.0,
    top_k: int = 0, top_p: float = 0.0,
) -> Array:
    """Temperature / top-k / top-p sampling (utils/sampling.py parity)."""
    if temperature <= 0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -1e30, logits)
    if top_p > 0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -1e30, logits)
    return jax.random.categorical(key, logits, axis=-1)


def _generate_impl(params, cfg, prompt_tokens, key, max_new_tokens,
                   temperature, top_k, top_p, context, pad_lens,
                   quantize_kv=False):
    B, L0 = prompt_tokens.shape
    rope = rope_tables(cfg)
    cache = init_kv_cache(cfg, B, dtype=cfg.dtype, quantized=quantize_kv)
    logits, cache = ar_forward(
        params, cfg, prompt_tokens, rope, cache, context, pad_lens
    )
    # with LEFT padding the last real token is always at buffer index -1
    first = sample_logits(key, logits[:, -1], temperature, top_k, top_p)

    def step(carry, k_i):
        cache, tok = carry
        logits, cache = ar_forward(
            params, cfg, tok[:, None], rope, cache, context, pad_lens
        )
        nxt = sample_logits(k_i, logits[:, -1], temperature, top_k, top_p)
        return (cache, nxt), nxt

    keys = jax.random.split(jax.random.fold_in(key, 1), max_new_tokens - 1)
    (_, _), rest = jax.lax.scan(step, (cache, first), keys)
    new_tokens = jnp.concatenate(
        [first[:, None], jnp.swapaxes(rest, 0, 1)], axis=1
    )
    return jnp.concatenate([prompt_tokens, new_tokens], axis=1)


@partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "temperature", "top_k",
                     "top_p", "quantize_kv"),
)
def generate(
    params: Params,
    cfg: ARConfig,
    prompt_tokens: Array,  # (B, L0)
    key: Array,
    max_new_tokens: int,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    context: Optional[Array] = None,
    quantize_kv: bool = False,
) -> Array:
    """Prefill + lax.scan KV-cache decode. Returns (B, L0+new) tokens.

    quantize_kv=True stores the KV cache as int8 codes + per-(pos,head)
    scales (half the HBM footprint/bandwidth, ~0.4% rel. KV error)."""
    return _generate_impl(params, cfg, prompt_tokens, key, max_new_tokens,
                          temperature, top_k, top_p, context, None,
                          quantize_kv)


@partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "temperature", "top_k",
                     "top_p", "quantize_kv"),
)
def generate_padded(
    params: Params,
    cfg: ARConfig,
    prompt_tokens: Array,  # (B, Lpad) LEFT-padded to the bucket length
    pad_lens: Array,  # (B,) int32 — left-pad count per row
    key: Array,
    max_new_tokens: int,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    context: Optional[Array] = None,
    quantize_kv: bool = False,
) -> Array:
    """generate() over left-padded prompts: bit-identical per-row output
    to an unpadded generate() of that row, but the compiled trace is
    shared by every prompt length in the bucket (fixes the
    retrace-per-prompt-length limitation of the jitted generate)."""
    return _generate_impl(params, cfg, prompt_tokens, key, max_new_tokens,
                          temperature, top_k, top_p, context, pad_lens,
                          quantize_kv)


@partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "temperature", "top_k",
                     "top_p", "quantize_kv"),
)
def generate_with_embeddings(
    params: Params,
    cfg: ARConfig,
    prompt_embeddings: Array,  # (B, L0, D) — text+vision spliced stream
    key: Array,
    max_new_tokens: int,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    context: Optional[Array] = None,
    quantize_kv: bool = False,
) -> Array:
    """generate() with an embedding-space prefill (the VLM path: vision
    tokens spliced into the text stream have no token ids). Returns only
    the (B, max_new_tokens) NEW token ids; decode steps embed the
    sampled ids as usual."""
    B = prompt_embeddings.shape[0]
    rope = rope_tables(cfg)
    cache = init_kv_cache(cfg, B, dtype=cfg.dtype, quantized=quantize_kv)
    logits, cache = ar_forward(
        params, cfg, None, rope, cache, context,
        input_embeddings=prompt_embeddings,
    )
    first = sample_logits(key, logits[:, -1], temperature, top_k, top_p)

    def step(carry, k_i):
        cache, tok = carry
        logits, cache = ar_forward(
            params, cfg, tok[:, None], rope, cache, context
        )
        nxt = sample_logits(k_i, logits[:, -1], temperature, top_k, top_p)
        return (cache, nxt), nxt

    keys = jax.random.split(jax.random.fold_in(key, 1), max_new_tokens - 1)
    (_, _), rest = jax.lax.scan(step, (cache, first), keys)
    return jnp.concatenate(
        [first[:, None], jnp.swapaxes(rest, 0, 1)], axis=1
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "temperature", "top_k",
                     "top_p", "quantize_kv"),
)
def _generate_with_embeddings_padded(
    params, cfg, prompt_embeddings, pad_lens, key, max_new_tokens,
    temperature=1.0, top_k=0, top_p=0.0, context=None,
    quantize_kv=False,
):
    B = prompt_embeddings.shape[0]
    rope = rope_tables(cfg)
    cache = init_kv_cache(cfg, B, dtype=cfg.dtype, quantized=quantize_kv)
    logits, cache = ar_forward(
        params, cfg, None, rope, cache, context, pad_lens,
        input_embeddings=prompt_embeddings,
    )
    first = sample_logits(key, logits[:, -1], temperature, top_k, top_p)

    def step(carry, k_i):
        cache, tok = carry
        logits, cache = ar_forward(
            params, cfg, tok[:, None], rope, cache, context, pad_lens
        )
        nxt = sample_logits(k_i, logits[:, -1], temperature, top_k, top_p)
        return (cache, nxt), nxt

    keys = jax.random.split(jax.random.fold_in(key, 1), max_new_tokens - 1)
    (_, _), rest = jax.lax.scan(step, (cache, first), keys)
    return jnp.concatenate(
        [first[:, None], jnp.swapaxes(rest, 0, 1)], axis=1
    )


def generate_with_embeddings_bucketed(
    params: Params,
    cfg: ARConfig,
    prompt_embeddings: Array,  # (B, L0, D)
    key: Array,
    max_new_tokens: int,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    context: Optional[Array] = None,
    bucket: int = 128,
    quantize_kv: bool = False,
) -> Array:
    """generate_with_embeddings with bucketed LEFT zero-padding: one
    compiled trace per 128-token bucket instead of one per distinct
    spliced-prompt length (the VLM path varies L0 with every prompt
    text and image aspect ratio). Padded slots are masked out of
    attention and RoPE positions shift via pad_lens, so the output is
    bit-identical per row to the unpadded call. Returns only the NEW
    token ids."""
    B, L0, D = prompt_embeddings.shape
    lpad = max(bucket, ((L0 + bucket - 1) // bucket) * bucket)
    lpad = min(lpad, cfg.max_seq_len - max_new_tokens)
    if L0 > lpad:
        raise ValueError(
            f"prompt length {L0} exceeds budget {lpad} "
            f"(max_seq_len {cfg.max_seq_len} - {max_new_tokens} new)"
        )
    pad = lpad - L0
    padded = jnp.pad(prompt_embeddings, ((0, 0), (pad, 0), (0, 0)))
    pad_lens = jnp.full((B,), pad, jnp.int32)
    return _generate_with_embeddings_padded(
        params, cfg, padded, pad_lens, key, max_new_tokens,
        temperature, top_k, top_p, context, quantize_kv,
    )


def generate_bucketed(
    params: Params,
    cfg: ARConfig,
    prompt_ids,  # array-like (B, L0) or list of per-row token lists
    key: Array,
    max_new_tokens: int,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
    context: Optional[Array] = None,
    bucket: int = 128,
    pad_id: int = 0,
    quantize_kv: bool = False,
) -> Array:
    """Host-side wrapper: left-pads prompts to the next multiple of
    `bucket` and runs generate_padded, so at most max_seq_len/bucket
    distinct traces ever compile. Returns (B, Lpad + max_new_tokens)
    tokens; row b's real output starts at index pad_lens[b] (the padded
    prompt region echoes pad_id at the left). Callers that need just the
    completion can slice [:, Lpad:] — identical across rows."""
    rows = [np.asarray(r).reshape(-1) for r in prompt_ids]
    longest = max(r.shape[0] for r in rows)
    lpad = max(bucket, ((longest + bucket - 1) // bucket) * bucket)
    lpad = min(lpad, cfg.max_seq_len - max_new_tokens)
    if longest > lpad:
        raise ValueError(
            f"prompt length {longest} exceeds budget {lpad} "
            f"(max_seq_len {cfg.max_seq_len} - {max_new_tokens} new)"
        )
    padded = np.full((len(rows), lpad), pad_id, np.int32)
    pads = np.zeros((len(rows),), np.int32)
    for i, r in enumerate(rows):
        pads[i] = lpad - r.shape[0]
        padded[i, pads[i]:] = r
    return generate_padded(
        params, cfg, jnp.asarray(padded), jnp.asarray(pads), key,
        max_new_tokens, temperature, top_k, top_p, context, quantize_kv,
    )
