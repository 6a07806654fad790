"""Pixtral-style vision tower in JAX (the VLM prompt upsampler's eye).

Parity target: the vision side of the reference's Pixtral-12B prompt
upsampler (cosmos_predict1/diffusion/prompt_upsampler/
video2world_prompt_upsampler_inference.py:40-60 builds the model;
cosmos_predict1/autoregressive/ carries the torch vision tower). The
architecture matches HF `PixtralVisionModel` + Llava's multi-modal
projector, so released Pixtral weights convert directly:

  patch_conv (stride=patch conv == patch-matmul on the MXU)
  -> RMSNorm (ln_pre)
  -> N pre-norm transformer layers with 2D RoPE (freqs alternate
     height/width sub-bands, rotate-half convention) and gated-SiLU MLPs
  -> multi-modal projector (linear, GELU, linear) into the text
     embedding space.

Everything is functional + jittable; images are processed one at a time
at a static resolution (the upsampler resizes, reference
video2world_prompt_upsampler_inference.py:62-70).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    """Defaults = Pixtral-12B vision tower (HF PixtralVisionConfig)."""

    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 16
    image_size: int = 1024  # max side; sets the RoPE meshgrid extent
    rope_theta: float = 10000.0
    num_channels: int = 3
    text_hidden_size: int = 5120  # Pixtral-12B text dim
    norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def max_patches_per_side(self) -> int:
        return self.image_size // self.patch_size


def init_vision_params(key: Array, cfg: VisionConfig,
                       dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 8 + cfg.num_layers * 8))
    D, I = cfg.hidden_size, cfg.intermediate_size

    def lin(k, i, o):
        a = math.sqrt(6.0 / (i + o))
        return jax.random.uniform(k, (i, o), dtype, -a, a)

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "attention_norm": {"scale": jnp.ones((D,), dtype)},
            "q": lin(next(keys), D, D),
            "k": lin(next(keys), D, D),
            "v": lin(next(keys), D, D),
            "o": lin(next(keys), D, D),
            "ffn_norm": {"scale": jnp.ones((D,), dtype)},
            "gate": lin(next(keys), D, I),
            "up": lin(next(keys), D, I),
            "down": lin(next(keys), I, D),
        })
    P = cfg.patch_size
    return {
        "patch_conv": lin(
            next(keys), cfg.num_channels * P * P, D
        ),  # (C*p*p, D): the stride-p conv as a patch matmul
        "ln_pre": {"scale": jnp.ones((D,), dtype)},
        "layers": layers,
        "projector": {
            "linear_1": {
                "w": lin(next(keys), D, cfg.text_hidden_size),
                "b": jnp.zeros((cfg.text_hidden_size,), dtype),
            },
            "linear_2": {
                "w": lin(next(keys), cfg.text_hidden_size,
                         cfg.text_hidden_size),
                "b": jnp.zeros((cfg.text_hidden_size,), dtype),
            },
        },
    }


def _rms(x: Array, scale: Array, eps: float) -> Array:
    x32 = x.astype(jnp.float32)
    n = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (n * scale.astype(jnp.float32)).astype(x.dtype)


def rope_2d_tables(cfg: VisionConfig, hp: int, wp: int) -> Tuple[Array, Array]:
    """HF PixtralRotaryEmbedding parity: per-patch frequencies where the
    head-dim sub-bands alternate between the height index (freqs[::2])
    and width index (freqs[1::2]); tables duplicated for rotate-half."""
    d = cfg.head_dim
    freqs = 1.0 / (
        cfg.rope_theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
    )
    h = np.arange(hp, dtype=np.float64)
    w = np.arange(wp, dtype=np.float64)
    fh = np.outer(h, freqs[::2])  # (hp, d//4)
    fw = np.outer(w, freqs[1::2])  # (wp, d//4)
    inv = np.concatenate(
        [
            np.broadcast_to(fh[:, None, :], (hp, wp, fh.shape[1])),
            np.broadcast_to(fw[None, :, :], (hp, wp, fw.shape[1])),
        ],
        axis=-1,
    ).reshape(hp * wp, d // 2)
    emb = np.concatenate([inv, inv], axis=-1)  # (L, d)
    return jnp.asarray(np.cos(emb), jnp.float32), jnp.asarray(
        np.sin(emb), jnp.float32
    )


def _rotate_half(x: Array) -> Array:
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-b, a], axis=-1)


def _apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    # x (L, H, d); cos/sin (L, d)
    c = cos[:, None, :].astype(x.dtype)
    s = sin[:, None, :].astype(x.dtype)
    return x * c + _rotate_half(x) * s


def vision_encode(params: Params, cfg: VisionConfig, image: Array) -> Array:
    """(C, H, W) image (pre-normalized pixels) -> (L, text_hidden) image
    tokens in the text embedding space (tower + multi-modal projector)."""
    tokens = vision_tower_features(params, cfg, image)
    dtype = cfg.dtype
    pj = params["projector"]
    out = tokens @ pj["linear_1"]["w"].astype(dtype) + pj["linear_1"][
        "b"
    ].astype(dtype)
    out = jax.nn.gelu(out, approximate=False)
    out = out @ pj["linear_2"]["w"].astype(dtype) + pj["linear_2"]["b"].astype(
        dtype
    )
    return out


def vision_tower_features(params: Params, cfg: VisionConfig,
                          image: Array) -> Array:
    """(C, H, W) image -> (L, hidden) last-hidden-state of the vision
    transformer (pre-projector; HF PixtralVisionModel parity). H, W must
    be multiples of patch_size. Row-major (h, w) token order, matching
    HF flatten(1).T."""
    C, H, W = image.shape
    P = cfg.patch_size
    hp, wp = H // P, W // P
    dtype = cfg.dtype
    x = image.astype(dtype)
    # stride-P conv == per-patch matmul: (hp, wp, C*P*P) @ (C*P*P, D).
    # Channel-major patch layout matches Conv2d weight (D, C, P, P).
    x = x.reshape(C, hp, P, wp, P).transpose(1, 3, 0, 2, 4)
    x = x.reshape(hp * wp, C * P * P)
    tokens = x @ params["patch_conv"].astype(dtype)  # (L, D)
    tokens = _rms(tokens, params["ln_pre"]["scale"], cfg.norm_eps)

    cos, sin = rope_2d_tables(cfg, hp, wp)
    L, D = tokens.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    scale = 1.0 / math.sqrt(hd)
    for lp in params["layers"]:
        h = _rms(tokens, lp["attention_norm"]["scale"], cfg.norm_eps)
        q = (h @ lp["q"].astype(dtype)).reshape(L, nh, hd)
        k = (h @ lp["k"].astype(dtype)).reshape(L, nh, hd)
        v = (h @ lp["v"].astype(dtype)).reshape(L, nh, hd)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        logits = jnp.einsum(
            "lhd,mhd->hlm", q, k,
            precision=jax.lax.Precision.HIGHEST,
        ) * scale
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
        attn = jnp.einsum("hlm,mhd->lhd", w, v).reshape(L, D)
        tokens = tokens + attn @ lp["o"].astype(dtype)
        h = _rms(tokens, lp["ffn_norm"]["scale"], cfg.norm_eps)
        gate = jax.nn.silu(h @ lp["gate"].astype(dtype))
        up = h @ lp["up"].astype(dtype)
        tokens = tokens + (gate * up) @ lp["down"].astype(dtype)
    return tokens


def convert_hf_pixtral_vision(state_dict, cfg: VisionConfig,
                              dtype=jnp.float32) -> Params:
    """HF Pixtral/Llava state dict -> vision param tree. Accepts either
    bare PixtralVisionModel keys (patch_conv.weight, transformer.layers.*)
    or full Llava checkpoints (vision_tower.* + multi_modal_projector.*).
    """

    def get(name, transpose=False):
        for k in (name, f"vision_tower.{name}"):
            if k in state_dict:
                v = state_dict[k]
                break
        else:
            raise KeyError(name)
        if hasattr(v, "detach"):
            v = v.detach().float().cpu().numpy()
        arr = np.asarray(v)
        if transpose:
            arr = arr.T
        return jnp.asarray(np.ascontiguousarray(arr), dtype)

    D = cfg.hidden_size
    conv = get("patch_conv.weight")  # (D, C, P, P)
    conv = jnp.asarray(
        np.asarray(conv).reshape(D, -1).T
    )  # (C*P*P, D) channel-major, matching vision_encode's patch layout
    layers = []
    for i in range(cfg.num_layers):
        pre = f"transformer.layers.{i}"
        layers.append({
            "attention_norm": {"scale": get(f"{pre}.attention_norm.weight")},
            "q": get(f"{pre}.attention.q_proj.weight", True),
            "k": get(f"{pre}.attention.k_proj.weight", True),
            "v": get(f"{pre}.attention.v_proj.weight", True),
            "o": get(f"{pre}.attention.o_proj.weight", True),
            "ffn_norm": {"scale": get(f"{pre}.ffn_norm.weight")},
            "gate": get(f"{pre}.feed_forward.gate_proj.weight", True),
            "up": get(f"{pre}.feed_forward.up_proj.weight", True),
            "down": get(f"{pre}.feed_forward.down_proj.weight", True),
        })
    params = {
        "patch_conv": conv,
        "ln_pre": {"scale": get("ln_pre.weight")},
        "layers": layers,
    }
    # projector lives beside (not inside) the vision tower in Llava ckpts
    pj = {}
    for part in ("linear_1", "linear_2"):
        wk = f"multi_modal_projector.{part}.weight"
        if wk in state_dict:
            w = state_dict[wk]
            b = state_dict[f"multi_modal_projector.{part}.bias"]
            to_np = (
                lambda t: t.detach().float().cpu().numpy()
                if hasattr(t, "detach") else np.asarray(t)
            )
            pj[part] = {
                "w": jnp.asarray(to_np(w).T, dtype),
                "b": jnp.asarray(to_np(b), dtype),
            }
    if pj:
        params["projector"] = pj
    else:
        # identity projector (vision dim == text dim or caller projects)
        params["projector"] = {
            "linear_1": {
                "w": jnp.eye(D, cfg.text_hidden_size, dtype=dtype),
                "b": jnp.zeros((cfg.text_hidden_size,), dtype),
            },
            "linear_2": {
                "w": jnp.eye(cfg.text_hidden_size, dtype=dtype),
                "b": jnp.zeros((cfg.text_hidden_size,), dtype),
            },
        }
    return params
