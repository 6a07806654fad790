"""Finite Scalar Quantization (FSQ) + the discrete video tokenizer.

Parity: cosmos_predict1/autoregressive/tokenizer/ +
cosmos_predict1/tokenizer/modules/quantizers.py (FSQuantizer) — the
DV8x16x16 discrete video tokenizer quantizes a 6-dim latent with levels
[8, 8, 8, 5, 5, 5] (implicit codebook of 64,000 codes) on top of the same
factorized causal encoder/decoder topology as the continuous VAE.

FSQ (Mentzer et al. 2023): each latent channel is squashed with tanh to
a bounded grid of L levels and rounded (straight-through); a code index
is the mixed-radix integer over channels.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gen3c_tpu.models import vae as jvae

Array = jax.Array

DEFAULT_LEVELS = (8, 8, 8, 5, 5, 5)


def fsq_bound(z: Array, levels: Sequence[int], eps: float = 1e-3) -> Array:
    """Squash z into the level grid range (FSQ `bound`, quantizers.py
    parity): tanh scaled to (L-1)/2, with a half-step offset (atan-shift)
    for even level counts."""
    lv = jnp.asarray(levels, jnp.float32)
    half_l = (lv - 1) * (1 + eps) / 2.0
    offset = jnp.where(lv % 2 == 0, 0.5, 0.0)
    shift = jnp.arctan(offset / half_l)
    return jnp.tanh(z + shift) * half_l - offset


def fsq_quantize(z: Array, levels: Sequence[int]) -> Tuple[Array, Array]:
    """Quantize (..., C=len(levels)) -> (normalized codes, indices).

    Straight-through round; codes normalized by half_width = L//2 (so
    integer grid points map to exact code values); indices = mixed-radix
    integer of the [0, L-1] digits."""
    lv = np.asarray(levels, np.int64)
    half_width = jnp.asarray(lv // 2, jnp.float32)
    bounded = fsq_bound(z, levels)
    rounded = jnp.round(bounded)
    quantized = bounded + jax.lax.stop_gradient(rounded - bounded)
    codes = quantized / half_width

    digits = jnp.round(
        jax.lax.stop_gradient(quantized) + half_width
    ).astype(jnp.int32)
    basis = np.concatenate([[1], np.cumprod(lv[:-1])]).astype(np.int32)
    idx = jnp.sum(digits * jnp.asarray(basis), axis=-1)
    return codes, idx


def fsq_indices_to_codes(indices: Array, levels: Sequence[int]) -> Array:
    """Inverse of fsq_quantize's index computation -> normalized codes."""
    lv = np.asarray(levels, np.int64)
    basis = np.concatenate([[1], np.cumprod(lv[:-1])]).astype(np.int32)
    digits = (indices[..., None] // jnp.asarray(basis)) % jnp.asarray(
        lv.astype(np.int32)
    )
    half_width = jnp.asarray(lv // 2, jnp.float32)
    return (digits.astype(jnp.float32) - half_width) / half_width


@dataclasses.dataclass(frozen=True)
class DiscreteVAEConfig(jvae.VAEConfig):
    """DV tokenizer: FSQ bottleneck over a 6-channel latent
    (configs.py discrete_video parity: 16x16 spatial, 8x temporal)."""

    levels: Tuple[int, ...] = DEFAULT_LEVELS

    @property
    def vocab_size(self) -> int:
        return int(np.prod(self.levels))


DV8x16x16 = DiscreteVAEConfig(
    latent_channels=len(DEFAULT_LEVELS),
    z_channels=len(DEFAULT_LEVELS),
    spatial_compression=16,
    temporal_compression=8,
    channels_mult=(2, 4, 4, 4),
)


class DiscreteVideoFSQTokenizer:
    """video <-> discrete token indices (DV tokenizer parity)."""

    def __init__(self, params, cfg: DiscreteVAEConfig,
                 pixel_chunk_duration: int = 33):
        self.params = params
        self.cfg = cfg
        self.pixel_chunk_duration = pixel_chunk_duration
        self._encode = jax.jit(partial(jvae.vae_encode, cfg=cfg))
        self._decode = jax.jit(partial(jvae.vae_decode, cfg=cfg))

    @property
    def latent_chunk_duration(self) -> int:
        return (self.pixel_chunk_duration - 1) // self.cfg.temporal_compression + 1

    def encode(self, video: Array) -> Tuple[Array, Array]:
        """(B,3,T,H,W) in [-1,1] -> (codes, indices (B,T',H',W'))."""
        z = self._encode(params=self.params, x=video)  # (B,6,T',H',W')
        z = jnp.moveaxis(z, 1, -1)  # channels last for FSQ
        codes, idx = fsq_quantize(z, self.cfg.levels)
        return jnp.moveaxis(codes, -1, 1), idx

    def decode(self, indices: Array) -> Array:
        """(B,T',H',W') int -> (B,3,T,H,W)."""
        codes = fsq_indices_to_codes(indices, self.cfg.levels)
        z = jnp.moveaxis(codes, -1, 1)
        return self._decode(params=self.params, z=z)
