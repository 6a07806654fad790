"""RAFT-Large optical flow in JAX (checkpoint-gated on torchvision weights).

Parity target: the reference tokenizer FlowLoss runs torchvision's
pretrained RAFT-Large (cosmos_predict1/tokenizer/training/losses/
continuous.py:218-311) with two in-repo monkeypatches that pin the exact
numeric semantics this port implements:

  * make_coords_grid (continuous.py:236-246): absolute (x, y) pixel
    coordinate grids at 1/8 resolution;
  * CorrBlock.index_pyramid (continuous.py:252-291): a 9x9 linspace
    neighborhood per pyramid level, sampled from the correlation volume
    with torchvision's absolute-coordinate grid_sample
    (align_corners=True, bilinear, zero padding), centroid coordinates
    halved after every level.

The network topology is torchvision `raft_large`
(torchvision/models/optical_flow/raft.py @ b06ea39, the commit the
reference monkeypatch cites):

  feature encoder  : Conv7x7/2 + InstanceNorm (no affine) -> 3 stages of
                     2 residual blocks (64->64, ->96/2, ->128/2) -> 1x1
                     conv to 256.  All convs carry bias=True (a quirk of
                     the original RAFT kept by torchvision).
  context encoder  : same topology with BatchNorm (affine + running
                     stats, eval mode) -> 256 = 128 hidden + 128 context.
  correlation      : all-pairs <f1, f2>/sqrt(256) -> 4-level avg-pool2
                     pyramid, radius-4 lookup (4 * 9 * 9 = 324 channels).
  update block     : MotionEncoder (corr 1x1->256, 3x3->192; flow
                     7x7->128, 3x3->64; joint 3x3->126; cat flow -> 128)
                     -> two ConvGRUs (1x5 then 5x1, hidden 128, input
                     context(128) + motion(128)) -> FlowHead
                     (3x3->256, relu, 3x3->2).
  convex upsample  : MaskPredictor (3x3->256, relu, 1x1->576, x0.25)
                     -> softmax over 9 -> weighted 3x3 unfold of 8*flow.

The reference runs the model in bf16 on GPU; this port computes in fp32
(TPU bf16-default matmuls lose coordinate precision — every conv and the
correlation einsum pass Precision.HIGHEST per the repo's geometry rule,
since the flow head's outputs accumulate into pixel coordinates) and invokes
it as the reference does: `flow_model(f1, f2)[-1]` == 12 update
iterations, final prediction (continuous.py:311).

Params are a flat torch-name-keyed dict (the repo's VAE convention) so
the torchvision `Raft_Large_Weights.C_T_SKHT_V2` state dict converts by
identity modulo validation: `convert_raft_state_dict` consumes every
key strictly against `raft_state_spec()`.  Without a checkpoint the
Lucas-Kanade estimator (training/flow.py) remains the fallback.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS_IN = 1e-5   # InstanceNorm2d default eps
_EPS_BN = 1e-5   # BatchNorm2d default eps

NUM_LEVELS = 4
RADIUS = 4
CORR_CHANNELS = NUM_LEVELS * (2 * RADIUS + 1) ** 2  # 324
HIDDEN = 128
CONTEXT = 128


# ---------------------------------------------------------------------------
# state-dict spec (torchvision raft_large names -> shapes)
# ---------------------------------------------------------------------------

def _encoder_spec(prefix: str, batch_norm: bool) -> Dict[str, Tuple[int, ...]]:
    """Name->shape spec for one FeatureEncoder (layers 64,64,96,128,256).

    InstanceNorm2d(affine=False) contributes no state-dict entries; the
    BatchNorm context encoder adds weight/bias/running stats per norm.
    `num_batches_tracked` is intentionally absent (dropped on convert).
    """
    spec: Dict[str, Tuple[int, ...]] = {}

    def conv(name, cout, cin, kh, kw, norm=True):
        spec[f"{prefix}.{name}.weight"] = (cout, cin, kh, kw)
        spec[f"{prefix}.{name}.bias"] = (cout,)
        if norm and batch_norm:
            # Conv2dNormActivation index 1 = the norm layer
            base = f"{prefix}.{name[:-2]}.1"
            spec[f"{base}.weight"] = (cout,)
            spec[f"{base}.bias"] = (cout,)
            spec[f"{base}.running_mean"] = (cout,)
            spec[f"{base}.running_var"] = (cout,)

    conv("convnormrelu.0", 64, 3, 7, 7)
    chans = [(64, 64, "layer1", False), (64, 96, "layer2", True),
             (96, 128, "layer3", True)]
    for cin, cout, layer, downsample in chans:
        conv(f"{layer}.0.convnormrelu1.0", cout, cin, 3, 3)
        conv(f"{layer}.0.convnormrelu2.0", cout, cout, 3, 3)
        if downsample:
            conv(f"{layer}.0.downsample.0", cout, cin, 1, 1)
        conv(f"{layer}.1.convnormrelu1.0", cout, cout, 3, 3)
        conv(f"{layer}.1.convnormrelu2.0", cout, cout, 3, 3)
    # final 1x1 projection is a plain nn.Conv2d (no norm)
    spec[f"{prefix}.conv.weight"] = (256, 128, 1, 1)
    spec[f"{prefix}.conv.bias"] = (256,)
    return spec


def raft_state_spec() -> Dict[str, Tuple[int, ...]]:
    """Full torchvision raft_large state-dict spec (name -> shape)."""
    spec: Dict[str, Tuple[int, ...]] = {}
    spec.update(_encoder_spec("feature_encoder", batch_norm=False))
    spec.update(_encoder_spec("context_encoder", batch_norm=True))

    me = "update_block.motion_encoder"
    spec[f"{me}.convcorr1.0.weight"] = (256, CORR_CHANNELS, 1, 1)
    spec[f"{me}.convcorr1.0.bias"] = (256,)
    spec[f"{me}.convcorr2.0.weight"] = (192, 256, 3, 3)
    spec[f"{me}.convcorr2.0.bias"] = (192,)
    spec[f"{me}.convflow1.0.weight"] = (128, 2, 7, 7)
    spec[f"{me}.convflow1.0.bias"] = (128,)
    spec[f"{me}.convflow2.0.weight"] = (64, 128, 3, 3)
    spec[f"{me}.convflow2.0.bias"] = (64,)
    spec[f"{me}.conv.0.weight"] = (126, 256, 3, 3)  # out = 128 - 2
    spec[f"{me}.conv.0.bias"] = (126,)

    rb = "update_block.recurrent_block"
    for gru, (kh, kw) in (("convgru1", (1, 5)), ("convgru2", (5, 1))):
        for gate in ("convz", "convr", "convq"):
            spec[f"{rb}.{gru}.{gate}.weight"] = (
                HIDDEN, HIDDEN + HIDDEN + CONTEXT, kh, kw)
            spec[f"{rb}.{gru}.{gate}.bias"] = (HIDDEN,)

    fh = "update_block.flow_head"
    spec[f"{fh}.conv1.weight"] = (256, HIDDEN, 3, 3)
    spec[f"{fh}.conv1.bias"] = (256,)
    spec[f"{fh}.conv2.weight"] = (2, 256, 3, 3)
    spec[f"{fh}.conv2.bias"] = (2,)

    spec["mask_predictor.convrelu.0.weight"] = (256, HIDDEN, 3, 3)
    spec["mask_predictor.convrelu.0.bias"] = (256,)
    spec["mask_predictor.conv.weight"] = (8 * 8 * 9, 256, 1, 1)
    spec["mask_predictor.conv.bias"] = (8 * 8 * 9,)
    return spec


def init_raft_params(key: Array, dtype=jnp.float32) -> Dict[str, Array]:
    """Random-init params with exact torchvision shapes (testing /
    structure-only runs; random-weight RAFT flow is noise — real use is
    checkpoint-gated)."""
    spec = raft_state_spec()
    params: Dict[str, Array] = {}
    for i, (name, shape) in enumerate(sorted(spec.items())):
        if name.endswith("running_mean"):
            params[name] = jnp.zeros(shape, dtype)
        elif name.endswith("running_var"):
            params[name] = jnp.ones(shape, dtype)
        elif name.endswith(".1.weight"):  # batch-norm affine
            params[name] = jnp.ones(shape, dtype)
        elif name.endswith("bias") or len(shape) == 1:
            params[name] = jnp.zeros(shape, dtype)
        else:
            fan_in = int(np.prod(shape[1:]))
            params[name] = jax.random.normal(
                jax.random.fold_in(key, i), shape, dtype
            ) * (2.0 / fan_in) ** 0.5
    return params


def convert_raft_state_dict(sd: dict) -> Dict[str, Array]:
    """torchvision raft_large state dict -> params, strictly: every
    spec'd key must be present with the spec'd shape, and every input
    key must be consumed (num_batches_tracked dropped explicitly)."""
    spec = raft_state_spec()
    sd = {k: v for k, v in sd.items()
          if not k.endswith("num_batches_tracked")}
    missing = sorted(set(spec) - set(sd))
    extra = sorted(set(sd) - set(spec))
    if missing or extra:
        raise ValueError(
            f"RAFT state dict mismatch: missing={missing[:8]} "
            f"extra={extra[:8]} (of {len(missing)}/{len(extra)})"
        )
    params = {}
    for name, shape in spec.items():
        w = np.asarray(sd[name], np.float32)
        if w.shape != shape:
            raise ValueError(f"{name}: shape {w.shape} != spec {shape}")
        params[name] = jnp.asarray(w)
    return params


def load_raft_params(path: str) -> Dict[str, Array]:
    """Load RAFT-Large weights from a torch .pth (torchvision
    Raft_Large_Weights state dict) or a native .npz. Checkpoint-gated:
    raises with download instructions when absent."""
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"RAFT checkpoint not found: {path}. Download torchvision's "
            "Raft_Large_Weights.C_T_SKHT_V2 (raft_large_C_T_SKHT_V2-"
            "ff5fadd5.pth) and pass its path, or convert to .npz via "
            "scripts/convert_raft.py"
        )
    if path.endswith(".npz"):
        with np.load(path) as z:
            return convert_raft_state_dict({k: z[k] for k in z.files})
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return convert_raft_state_dict(
        {k: v.numpy() for k, v in sd.items()}
    )


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _conv(p: Dict[str, Array], name: str, x: Array, stride: int = 1,
          padding="SAME") -> Array:
    w = p[f"{name}.weight"].astype(jnp.float32)
    if isinstance(padding, str) and padding == "SAME":
        kh, kw = w.shape[2], w.shape[3]
        padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    # HIGHEST: flow-head conv outputs accumulate into pixel COORDINATES
    # (coords1 += delta) that drive grid-sample lookups — the repo's
    # geometry rule (TPU matmul/conv default is bf16; CLAUDE.md). CPU
    # tests can't catch a bf16 drift, so keep every conv at full
    # precision, matching the module docstring's fp32 claim.
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y + p[f"{name}.bias"].astype(jnp.float32)[None, :, None, None]


def _instance_norm(x: Array) -> Array:
    """InstanceNorm2d(affine=False, track_running_stats=False): per
    (N, C) normalization over (H, W) with the CURRENT statistics (eval
    mode included — instance norm never uses running stats here)."""
    mean = x.mean(axis=(2, 3), keepdims=True)
    var = x.var(axis=(2, 3), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + _EPS_IN)


def _batch_norm(p: Dict[str, Array], base: str, x: Array) -> Array:
    """BatchNorm2d eval mode: running stats + affine."""
    mean = p[f"{base}.running_mean"].astype(jnp.float32)
    var = p[f"{base}.running_var"].astype(jnp.float32)
    w = p[f"{base}.weight"].astype(jnp.float32)
    b = p[f"{base}.bias"].astype(jnp.float32)
    scale = w * jax.lax.rsqrt(var + _EPS_BN)
    return x * scale[None, :, None, None] + (
        b - mean * scale)[None, :, None, None]


def _norm(p, prefix: str, conv_name: str, x: Array,
          batch_norm: bool) -> Array:
    if batch_norm:
        return _batch_norm(p, f"{prefix}.{conv_name[:-2]}.1", x)
    return _instance_norm(x)


def _encoder_forward(p: Dict[str, Array], prefix: str, x: Array,
                     batch_norm: bool) -> Array:
    """FeatureEncoder forward (raft.py FeatureEncoder.forward): 1/8-res
    256-channel features."""
    def cnr(name, x, stride=1, act=True):
        y = _conv(p, f"{prefix}.{name}", x, stride)
        y = _norm(p, prefix, name, y, batch_norm)
        return jax.nn.relu(y) if act else y

    x = cnr("convnormrelu.0", x, stride=2)
    for layer, stride in (("layer1", 1), ("layer2", 2), ("layer3", 2)):
        for blk in (0, 1):
            s = stride if blk == 0 else 1
            y = cnr(f"{layer}.{blk}.convnormrelu1.0", x, stride=s)
            y = cnr(f"{layer}.{blk}.convnormrelu2.0", y)
            if s != 1:
                x = cnr(f"{layer}.{blk}.downsample.0", x, stride=s,
                        act=False)
            x = jax.nn.relu(x + y)
    return _conv(p, f"{prefix}.conv", x)


# ---------------------------------------------------------------------------
# correlation pyramid
# ---------------------------------------------------------------------------

def compute_corr_pyramid(fmap1: Array, fmap2: Array,
                         num_levels: int = NUM_LEVELS) -> List[Array]:
    """CorrBlock.build_pyramid (raft.py:352-376): all-pairs correlation
    <f1[y,x], f2[v,u]> / sqrt(C), reshaped to (N*h*w, h, w), then
    avg-pool-2 per level (floor semantics on odd dims, like torch)."""
    N, C, h, w = fmap1.shape
    corr = jnp.einsum(
        "nchw,ncvu->nhwvu",
        fmap1.astype(jnp.float32), fmap2.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ) / math.sqrt(C)
    corr = corr.reshape(N * h * w, h, w)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        m, hl, wl = corr.shape
        if hl < 2 or wl < 2:
            # below the reference's operating regime (torch avg_pool2d
            # would crash / grid_sample would divide by zero on a 1-wide
            # level); keep the volume so tiny-scale tests stay runnable
            pyramid.append(corr)
            continue
        corr = corr[:, : hl // 2 * 2, : wl // 2 * 2].reshape(
            m, hl // 2, 2, wl // 2, 2
        ).mean(axis=(2, 4))
        pyramid.append(corr)
    return pyramid


def _grid_sample_zeros(vol: Array, x: Array, y: Array) -> Array:
    """torchvision's absolute-coordinate grid_sample with
    align_corners=True / bilinear / zero padding (continuous.py:275-278:
    normalize x to 2x/(w-1)-1 then F.grid_sample(align_corners=True) —
    which is exactly bilinear at the ABSOLUTE coordinate, out-of-range
    corners contributing zero).

    vol (M, h, w); x, y (M, K) absolute pixel coords -> (M, K)."""
    M, h, w = vol.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    flat = vol.reshape(M, h * w)

    def corner(yi, xi, wgt):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        idx = (jnp.clip(yi, 0, h - 1) * w
               + jnp.clip(xi, 0, w - 1)).astype(jnp.int32)
        return jnp.take_along_axis(flat, idx, axis=1) * wgt * valid

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    return (
        corner(y0i, x0i, (1 - wy) * (1 - wx))
        + corner(y0i, x0i + 1, (1 - wy) * wx)
        + corner(y0i + 1, x0i, wy * (1 - wx))
        + corner(y0i + 1, x0i + 1, wy * wx)
    )


def index_pyramid(pyramid: List[Array], coords: Array,
                  radius: int = RADIUS) -> Array:
    """The reference's monkeypatched CorrBlock.index_pyramid
    (continuous.py:252-291): for each level, sample a (2r+1)x(2r+1)
    linspace neighborhood around the centroid (x gets the FIRST meshgrid
    axis di, y the second — 'ij' indexing, stacked last), centroid
    halved after every level; concat levels channel-last then permute.

    coords (N, 2, h, w) in (x, y) order -> (N, 324, h, w)."""
    N, _, h, w = coords.shape
    side = 2 * radius + 1
    d = jnp.linspace(-radius, radius, side, dtype=jnp.float32)
    di, dj = jnp.meshgrid(d, d, indexing="ij")
    dx = di.reshape(-1)  # offsets added to x (delta[..., 0])
    dy = dj.reshape(-1)  # offsets added to y (delta[..., 1])

    # (N, 2, h, w) -> (N*h*w, 2) centroids, matching the reference's
    # permute(0, 2, 3, 1).reshape(B*h*w, 1, 1, 2)
    cx = coords[:, 0].reshape(N * h * w, 1)
    cy = coords[:, 1].reshape(N * h * w, 1)

    per_level = []
    for lvl, vol in enumerate(pyramid):
        scale = 0.5 ** lvl
        sx = cx * scale + dx[None, :]
        sy = cy * scale + dy[None, :]
        sampled = _grid_sample_zeros(vol, sx, sy)  # (N*h*w, side*side)
        per_level.append(sampled.reshape(N, h, w, side * side))
    feat = jnp.concatenate(per_level, axis=-1)  # (N, h, w, 324)
    return feat.transpose(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# update block
# ---------------------------------------------------------------------------

def _motion_encoder(p: Dict[str, Array], flow: Array,
                    corr_features: Array) -> Array:
    """MotionEncoder.forward (raft.py:206-216): conv stacks on corr and
    flow, joint conv to 126 channels, raw flow appended -> 128."""
    me = "update_block.motion_encoder"
    corr = jax.nn.relu(_conv(p, f"{me}.convcorr1.0", corr_features))
    corr = jax.nn.relu(_conv(p, f"{me}.convcorr2.0", corr))
    f = jax.nn.relu(_conv(p, f"{me}.convflow1.0", flow))
    f = jax.nn.relu(_conv(p, f"{me}.convflow2.0", f))
    joint = jax.nn.relu(
        _conv(p, f"{me}.conv.0", jnp.concatenate([corr, f], axis=1)))
    return jnp.concatenate([joint, flow], axis=1)


def conv_gru(p: Dict[str, Array], base: str, h: Array, x: Array) -> Array:
    """ConvGRU.forward (raft.py:141-149)."""
    hx = jnp.concatenate([h, x], axis=1)
    z = jax.nn.sigmoid(_conv(p, f"{base}.convz", hx))
    r = jax.nn.sigmoid(_conv(p, f"{base}.convr", hx))
    rhx = jnp.concatenate([r * h, x], axis=1)
    q = jnp.tanh(_conv(p, f"{base}.convq", rhx))
    return (1 - z) * h + z * q


def _update_block(p: Dict[str, Array], hidden: Array, context: Array,
                  corr_features: Array, flow: Array
                  ) -> Tuple[Array, Array]:
    """UpdateBlock.forward (raft.py:241-248): context is concatenated
    FIRST; two ConvGRUs (1x5 then 5x1) share the same input x."""
    motion = _motion_encoder(p, flow, corr_features)
    x = jnp.concatenate([context, motion], axis=1)
    rb = "update_block.recurrent_block"
    hidden = conv_gru(p, f"{rb}.convgru1", hidden, x)
    hidden = conv_gru(p, f"{rb}.convgru2", hidden, x)
    fh = "update_block.flow_head"
    delta = _conv(p, f"{fh}.conv2",
                  jax.nn.relu(_conv(p, f"{fh}.conv1", hidden)))
    return hidden, delta


def _unfold3x3(x: Array) -> Array:
    """F.unfold(kernel_size=3, padding=1) channel layout: (N, C, 9, h, w)
    with the 9 in (ky, kx) raster order, zero-padded borders."""
    N, C, h, w = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    patches = [
        xp[:, :, ky:ky + h, kx:kx + w]
        for ky in range(3) for kx in range(3)
    ]
    return jnp.stack(patches, axis=2)


def upsample_flow(flow: Array, up_mask: Array, factor: int = 8) -> Array:
    """Convex upsampling (raft.py upsample_flow): softmax over the 9
    unfold taps of factor*flow, per 8x8 subpixel position."""
    N, C, h, w = flow.shape
    mask = up_mask.reshape(N, 1, 9, factor, factor, h, w)
    mask = jax.nn.softmax(mask, axis=2)
    taps = _unfold3x3(factor * flow).reshape(N, C, 9, 1, 1, h, w)
    up = jnp.sum(mask * taps, axis=2)  # (N, C, f, f, h, w)
    return up.transpose(0, 1, 4, 2, 5, 3).reshape(
        N, C, h * factor, w * factor)


def _coords_grid(N: int, h: int, w: int) -> Array:
    """make_coords_grid (continuous.py:236-246): (N, 2, h, w), channel 0
    = x, channel 1 = y."""
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xx, yy], axis=0)
    return jnp.broadcast_to(grid, (N, 2, h, w))


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def raft_forward(params: Dict[str, Array], image1: Array, image2: Array,
                 num_flow_updates: int = 12) -> Array:
    """RAFT.forward (raft.py:490-543), final prediction only — the
    reference takes `flow_model(input1, input2)[-1]`
    (continuous.py:311). Images (N, 3, H, W) with H, W divisible by 8;
    output (N, 2, H, W) flow in pixels (u = x, v = y displacement).

    The 12 GRU iterations run as a lax.scan (static corr pyramid closed
    over); the convex upsample runs ONCE on the final state — identical
    to the last element of torchvision's per-iteration prediction list.
    """
    N, _, H, W = image1.shape
    assert H % 8 == 0 and W % 8 == 0, (H, W)
    image1 = image1.astype(jnp.float32)
    image2 = image2.astype(jnp.float32)

    both = jnp.concatenate([image1, image2], axis=0)
    fmaps = _encoder_forward(params, "feature_encoder", both,
                             batch_norm=False)
    fmap1, fmap2 = fmaps[:N], fmaps[N:]
    pyramid = compute_corr_pyramid(fmap1, fmap2)

    ctx_out = _encoder_forward(params, "context_encoder", image1,
                               batch_norm=True)
    hidden = jnp.tanh(ctx_out[:, :HIDDEN])
    context = jax.nn.relu(ctx_out[:, HIDDEN:])

    h, w = H // 8, W // 8
    coords0 = _coords_grid(N, h, w)

    def step(carry, _):
        hidden, coords1 = carry
        corr_features = index_pyramid(pyramid, coords1)
        flow = coords1 - coords0
        hidden, delta = _update_block(params, hidden, context,
                                      corr_features, flow)
        return (hidden, coords1 + delta), None

    (hidden, coords1), _ = jax.lax.scan(
        step, (hidden, coords0), None, length=num_flow_updates)

    mp = "mask_predictor"
    up_mask = 0.25 * _conv(
        params, f"{mp}.conv",
        jax.nn.relu(_conv(params, f"{mp}.convrelu.0", hidden)))
    return upsample_flow(coords1 - coords0, up_mask)


def raft_flow(params: Dict[str, Array], frames1: Array, frames2: Array,
              num_flow_updates: int = 12) -> Array:
    """flow_fn-contract wrapper (training/flow.py): (N, C, H, W) pairs ->
    (N, 2, H, W). Pads H/W up to multiples of 8 with edge replication
    and crops the flow back (the reference relies on its training crops
    being divisible by 16; this wrapper removes that footgun)."""
    N, C, H, W = frames1.shape
    if C == 1:
        frames1 = jnp.repeat(frames1, 3, axis=1)
        frames2 = jnp.repeat(frames2, 3, axis=1)
    ph = (-H) % 8
    pw = (-W) % 8
    if ph or pw:
        pad = ((0, 0), (0, 0), (0, ph), (0, pw))
        frames1 = jnp.pad(frames1, pad, mode="edge")
        frames2 = jnp.pad(frames2, pad, mode="edge")
    flow = raft_forward(params, frames1, frames2, num_flow_updates)
    return flow[:, :, :H, :W]


def make_raft_flow_fn(params: Dict[str, Array],
                      num_flow_updates: int = 12):
    """Bind params into the FlowLoss `flow_fn` slot."""
    return partial(raft_flow, params, num_flow_updates=num_flow_updates)
