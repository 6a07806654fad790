"""MoGe monocular geometry estimation in JAX (checkpoint-gated).

The reference's north-star single-image path runs MoGe ViT-L per AR
chunk (reference: gen3c_single_image.py:19,114-200 — external pip
package "Ruicheng/moge-vitl"). This module provides the TPU-native
implementation with the same role: image -> affine-invariant point map +
validity mask -> recovered focal/shift -> metric-ish depth + intrinsics.

Architecture (MoGe v1, arXiv:2410.19115):
  * backbone: DINOv2 ViT-L/14 (patch 14, width 1024, depth 24, heads 16,
    LayerScale, pre-norm blocks, cls token, learned pos-emb with bicubic
    interpolation to the input grid). Implemented here functionally;
    numerics are oracle-tested against the torch DINOv2 implementation
    (transformers Dinov2Model) at random weights
    (tests/test_moge_parity.py) — the SigLIP/Aegis recipe.
  * head: multi-level feature fusion + conv upsampling to a 4-channel
    output (3 point-map channels + 1 mask logit). The official MoGe head
    is not vendored in the reference repo, so this head is a documented
    re-design with the same contract; the weight converter is
    config-driven and strict (unknown keys raise), so wiring the real
    checkpoint surfaces any naming drift loudly instead of silently.
  * recovery: the affine-invariant point map is lifted to camera space
    by solving for the focal f and z-shift t that minimize the
    projection error of (x, y, z+t) against the pixel grid (MoGe paper
    section 3.2) — a vectorized grid-then-refine search over t with the
    closed-form optimal f per candidate (runs on device, no scipy).

Param naming follows the MoGe/DINOv2 torch layout ("backbone.blocks.N.
attn.qkv.weight", "backbone.pos_embed", ...) so the converter maps the
"Ruicheng/moge-vitl" checkpoint directly.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array

# ImageNet normalization (DINOv2 preprocessing; MoGe uses the same)
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class MoGeConfig:
    patch_size: int = 14
    width: int = 1024
    depth: int = 24
    heads: int = 16
    mlp_ratio: int = 4
    pos_grid: int = 37  # 518/14: DINOv2's native pos-emb grid
    # tapped transformer layers feeding the head (dinov2
    # get_intermediate_layers(n=4) semantics: the LAST n blocks)
    intermediate_layers: Tuple[int, ...] = (20, 21, 22, 23)
    head_dim: int = 256
    out_channels: int = 4  # point map xyz + mask logit
    dtype: object = jnp.float32


MOGE_VITL = MoGeConfig()
MOGE_TINY = MoGeConfig(
    width=64, depth=4, heads=4, pos_grid=8,
    intermediate_layers=(0, 1, 2, 3), head_dim=32,
)


# ----------------------------- init / convert -----------------------------


def init_moge_params(key: Array, cfg: MoGeConfig = MOGE_VITL,
                     dtype=jnp.float32) -> Dict[str, Array]:
    D, H = cfg.width, cfg.head_dim
    n_pos = cfg.pos_grid * cfg.pos_grid + 1
    keys = iter(jax.random.split(key, 16 + 12 * cfg.depth))

    def nrm(shape, scale=0.02):
        return jax.random.normal(next(keys), shape, dtype) * scale

    p = {
        "backbone.cls_token": nrm((1, 1, D)),
        "backbone.pos_embed": nrm((1, n_pos, D)),
        "backbone.patch_embed.proj.weight": nrm(
            (D, 3, cfg.patch_size, cfg.patch_size)
        ),
        "backbone.patch_embed.proj.bias": jnp.zeros((D,), dtype),
        "backbone.norm.weight": jnp.ones((D,), dtype),
        "backbone.norm.bias": jnp.zeros((D,), dtype),
    }
    for i in range(cfg.depth):
        b = f"backbone.blocks.{i}"
        p[f"{b}.norm1.weight"] = jnp.ones((D,), dtype)
        p[f"{b}.norm1.bias"] = jnp.zeros((D,), dtype)
        p[f"{b}.attn.qkv.weight"] = nrm((3 * D, D))
        p[f"{b}.attn.qkv.bias"] = jnp.zeros((3 * D,), dtype)
        p[f"{b}.attn.proj.weight"] = nrm((D, D))
        p[f"{b}.attn.proj.bias"] = jnp.zeros((D,), dtype)
        p[f"{b}.ls1.gamma"] = jnp.ones((D,), dtype) * 1e-5
        p[f"{b}.norm2.weight"] = jnp.ones((D,), dtype)
        p[f"{b}.norm2.bias"] = jnp.zeros((D,), dtype)
        p[f"{b}.mlp.fc1.weight"] = nrm((cfg.mlp_ratio * D, D))
        p[f"{b}.mlp.fc1.bias"] = jnp.zeros((cfg.mlp_ratio * D,), dtype)
        p[f"{b}.mlp.fc2.weight"] = nrm((D, cfg.mlp_ratio * D))
        p[f"{b}.mlp.fc2.bias"] = jnp.zeros((D,), dtype)
        p[f"{b}.ls2.gamma"] = jnp.ones((D,), dtype) * 1e-5
    # head: per-level 1x1 projections + fused conv stack + upsample
    for i in range(len(cfg.intermediate_layers)):
        p[f"head.proj.{i}.weight"] = nrm((H, D, 1, 1))
        p[f"head.proj.{i}.bias"] = jnp.zeros((H,), dtype)
    for j in range(2):  # two x2 upsample conv stages
        p[f"head.up.{j}.weight"] = nrm((H, H, 3, 3))
        p[f"head.up.{j}.bias"] = jnp.zeros((H,), dtype)
    p["head.out.weight"] = nrm((cfg.out_channels, H, 3, 3))
    p["head.out.bias"] = jnp.zeros((cfg.out_channels,), dtype)
    return p


def convert_moge_state_dict(sd: dict, cfg: MoGeConfig = MOGE_VITL,
                            strict: bool = True) -> Dict[str, Array]:
    """Torch MoGe checkpoint -> params (identity key map; the torch
    layout IS our layout). strict raises on unconsumed keys so real-
    checkpoint naming drift is loud."""
    template = jax.eval_shape(
        lambda: init_moge_params(jax.random.PRNGKey(0), cfg)
    )
    out, consumed = {}, set()
    for k, shape in template.items():
        if k in sd:
            arr = np.asarray(sd[k], np.float32)
            assert arr.shape == tuple(shape.shape), (k, arr.shape, shape.shape)
            out[k] = jnp.asarray(arr)
            consumed.add(k)
        else:
            raise KeyError(f"MoGe checkpoint missing key {k}")
    leftover = sorted(set(sd) - consumed)
    if strict and leftover:
        raise ValueError(
            f"{len(leftover)} unconsumed MoGe checkpoint keys (naming "
            f"drift?): {leftover[:8]}{'...' if len(leftover) > 8 else ''}"
        )
    return out


# ------------------------------- backbone -------------------------------


def _ln(p, base, x):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + 1e-6)
    return xn * p[f"{base}.weight"] + p[f"{base}.bias"]


def _attn(p, base, x, heads):
    B, L, D = x.shape
    qkv = x @ p[f"{base}.qkv.weight"].T + p[f"{base}.qkv.bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_split(t):
        return t.reshape(B, L, heads, D // heads).transpose(0, 2, 1, 3)

    q, k, v = heads_split(q), heads_split(k), heads_split(v)
    scale = (D // heads) ** -0.5
    a = jax.nn.softmax((q * scale) @ k.transpose(0, 1, 3, 2), axis=-1)
    o = (a @ v).transpose(0, 2, 1, 3).reshape(B, L, D)
    return o @ p[f"{base}.proj.weight"].T + p[f"{base}.proj.bias"]


def _interp_pos_embed(pos: Array, grid: int, h: int, w: int) -> Array:
    """(1, 1+grid^2, D) -> (1, 1+h*w, D), bicubic over the patch grid
    (dinov2 interpolate_pos_encoding)."""
    if (h, w) == (grid, grid):
        return pos
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    D = pos.shape[-1]
    patch = patch_pos.reshape(1, grid, grid, D)
    patch = jax.image.resize(patch, (1, h, w, D), method="bicubic")
    return jnp.concatenate([cls_pos, patch.reshape(1, h * w, D)], axis=1)


def dinov2_forward(
    params: Dict[str, Array],
    cfg: MoGeConfig,
    image: Array,  # (B, 3, H, W), ImageNet-normalized; H,W % patch == 0
) -> List[Array]:
    """Returns the tapped intermediate patch-token maps, each
    (B, width, H/14, W/14) — get_intermediate_layers(reshape=True,
    norm=True) semantics (final-norm applied to every tap, as dinov2
    does with norm=True)."""
    B, _, H, W = image.shape
    ps = cfg.patch_size
    gh, gw = H // ps, W // ps
    w = params["backbone.patch_embed.proj.weight"].astype(image.dtype)
    b = params["backbone.patch_embed.proj.bias"].astype(image.dtype)
    x = jax.lax.conv_general_dilated(
        image, w, window_strides=(ps, ps), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ) + b[None, :, None, None]
    x = x.reshape(B, cfg.width, gh * gw).transpose(0, 2, 1)
    cls = jnp.broadcast_to(
        params["backbone.cls_token"], (B, 1, cfg.width)
    ).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _interp_pos_embed(
        params["backbone.pos_embed"].astype(x.dtype), cfg.pos_grid, gh, gw
    )

    taps = {}
    want = set(cfg.intermediate_layers)
    for i in range(cfg.depth):
        base = f"backbone.blocks.{i}"
        x = x + params[f"{base}.ls1.gamma"] * _attn(
            params, f"{base}.attn", _ln(params, f"{base}.norm1", x),
            cfg.heads,
        )
        h = _ln(params, f"{base}.norm2", x)
        h = jax.nn.gelu(
            h @ params[f"{base}.mlp.fc1.weight"].T
            + params[f"{base}.mlp.fc1.bias"],
            approximate=False,
        )
        h = h @ params[f"{base}.mlp.fc2.weight"].T + params[
            f"{base}.mlp.fc2.bias"
        ]
        x = x + params[f"{base}.ls2.gamma"] * h
        if i in want:
            taps[i] = x
    out = []
    for i in cfg.intermediate_layers:
        t = _ln(params, "backbone.norm", taps[i])[:, 1:]  # drop cls
        out.append(t.transpose(0, 2, 1).reshape(B, cfg.width, gh, gw))
    return out


# --------------------------------- head ---------------------------------


def _conv(p, base, x, padding=1):
    w = p[f"{base}.weight"].astype(x.dtype)
    b = p[f"{base}.bias"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + b[None, :, None, None]


def moge_head(params: Dict[str, Array], cfg: MoGeConfig,
              taps: List[Array], out_hw: Tuple[int, int]) -> Array:
    """Fuse tapped features -> (B, 4, H, W): xyz point map + mask logit."""
    fused = None
    for i, t in enumerate(taps):
        proj = _conv(params, f"head.proj.{i}", t, padding=0)
        fused = proj if fused is None else fused + proj
    h = fused
    B, C = h.shape[:2]
    for j in range(2):  # two x2 conv-upsample stages
        nh, nw = h.shape[2] * 2, h.shape[3] * 2
        h = jax.image.resize(h, (B, C, nh, nw), method="bilinear")
        h = jax.nn.relu(_conv(params, f"head.up.{j}", h))
    out = _conv(params, "head.out", h)
    return jax.image.resize(
        out, (B, cfg.out_channels) + tuple(out_hw), method="bilinear"
    )


# --------------------------- focal/shift recovery ---------------------------


def recover_focal_shift(
    points: Array,  # (H, W, 3) affine-invariant point map
    mask: Array,  # (H, W) bool validity
    num_candidates: int = 64,
    refine_iters: int = 3,
) -> Tuple[Array, Array]:
    """Solve min_{f, t} || f * (x, y) / (z + t) - (u, v) ||^2 over valid
    pixels (MoGe paper 3.2): per candidate t the optimal focal is closed
    form, so t is found by a vectorized grid search refined around the
    best cell. Returns (focal_px_normalized, shift). The pixel grid is
    centered and normalized by min(H, W)/2 (focal returned in the same
    units)."""
    H, W = points.shape[:2]
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    s = min(H, W) / 2.0
    u = (xx - (W - 1) / 2.0) / s
    v = (yy - (H - 1) / 2.0) / s
    # all-False masks (blank input / untrained head) would give
    # z_min = inf -> NaN focal+shift; fall back to all-valid so the
    # recovery stays finite (the caller's mask still gates the depth)
    any_valid = jnp.any(mask)
    mask = jnp.where(any_valid, mask, jnp.ones_like(mask))
    m = mask.astype(jnp.float32).reshape(-1)
    x = points[..., 0].reshape(-1)
    y = points[..., 1].reshape(-1)
    z = points[..., 2].reshape(-1)
    uv = jnp.stack([u.reshape(-1), v.reshape(-1)], 0)  # (2, N)
    xy = jnp.stack([x, y], 0)

    def residual_and_focal(t):
        denom = jnp.maximum(z + t, 1e-4)
        a = xy / denom  # (2, N)
        wa = a * m
        f = jnp.sum(wa * uv) / jnp.maximum(jnp.sum(wa * a), 1e-12)
        f = jnp.maximum(f, 1e-2)  # focal is physically positive
        r = jnp.sum(m * jnp.sum((f * a - uv) ** 2, axis=0)) / jnp.maximum(
            jnp.sum(m), 1.0
        )
        return r, f

    z_min = jnp.min(jnp.where(mask.reshape(-1) > 0, z, jnp.inf))
    lo = -z_min + 1e-2  # keep z + t > 0
    hi = -z_min + 10.0

    def search(lo, hi, _):
        ts = jnp.linspace(lo, hi, num_candidates)
        rs, fs = jax.vmap(residual_and_focal)(ts)
        i = jnp.argmin(rs)
        step = (hi - lo) / (num_candidates - 1)
        new_lo = jnp.maximum(ts[i] - step, -z_min + 1e-3)
        return new_lo, ts[i] + step, (ts[i], fs[i])

    best = None
    for _ in range(refine_iters):
        lo, hi, best = search(lo, hi, None)
    t, f = best
    return f, t


# --------------------------------- infer ---------------------------------


def _fit_resolution(h: int, w: int, patch: int, max_pixels: int) -> Tuple[int, int]:
    scale = min(1.0, (max_pixels / (h * w)) ** 0.5)
    fh = max(patch, int(round(h * scale / patch)) * patch)
    fw = max(patch, int(round(w * scale / patch)) * patch)
    return fh, fw


def moge_infer(
    params: Dict[str, Array],
    cfg: MoGeConfig,
    image: Array,  # (H, W, 3) float in [0, 1]
    max_pixels: int = 518 * 518,
) -> Tuple[Array, Array, Array]:
    """image -> (depth (H, W), intrinsics (3, 3) pixels, mask (H, W) bool).

    Mirrors the reference MoGe usage (gen3c_single_image.py:114-200):
    resize to the model's pixel budget (multiples of the patch), forward,
    recover focal/shift, lift z to depth."""
    H, W = image.shape[:2]
    fh, fw = _fit_resolution(H, W, cfg.patch_size, max_pixels)
    x = jax.image.resize(image, (fh, fw, 3), method="bilinear")
    x = (x - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
    x = x.transpose(2, 0, 1)[None].astype(cfg.dtype)

    taps = dinov2_forward(params, cfg, x)
    out = moge_head(params, cfg, taps, (fh, fw))[0]
    points = out[:3].transpose(1, 2, 0)  # (fh, fw, 3)
    mask = jax.nn.sigmoid(out[3]) > 0.5

    f, t = recover_focal_shift(points, mask)
    depth = points[..., 2] + t
    depth = jnp.where(mask & (depth > 0), depth, jnp.nan)

    # normalized focal -> pixel intrinsics at the ORIGINAL resolution
    s_out = min(H, W) / 2.0
    fx = f * s_out
    intrinsics = jnp.asarray(
        [[fx, 0.0, W / 2.0], [0.0, fx, H / 2.0], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    depth = jax.image.resize(depth, (H, W), method="nearest")
    mask_f = jax.image.resize(
        mask.astype(jnp.float32), (H, W), method="nearest"
    )
    return depth, intrinsics, mask_f > 0.5


def aot_memory_analysis(cfg: MoGeConfig = MOGE_VITL,
                        height: int = 720, width: int = 1280):
    """Compile-only memory check at the deployment resolution (the
    probe_sampler_memory.py recipe) — catches OOM before a real run."""
    pshapes = jax.eval_shape(
        lambda: init_moge_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    )
    fn = jax.jit(lambda p, img: moge_infer(p, cfg, img))
    img = jax.ShapeDtypeStruct((height, width, 3), jnp.float32)
    return fn.lower(pshapes, img).compile().memory_analysis()
