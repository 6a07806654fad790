"""LPIPS perceptual loss in JAX (checkpoint-gated VGG16 features).

Parity: cosmos_predict1/tokenizer/training/losses/lpips.py — the
reference's LPIPS variant is ScalingLayer -> torchvision VGG16 feature
slices (relu1_2/2_2/3_3/4_3/5_3) -> unit-normalize each feature map over
channels -> per-slice mean of squared differences -> sum (lpips.py:
71-128; note the classic LPIPS "lin" 1x1 layers are DROPPED by the
strict=False checkpoint load at :90, so the loss is the plain summed
feature-space MSE).

Weights: converted from a torchvision-layout VGG16 state dict
("features.N.{weight,bias}") — the same tensors torchvision downloads
for models.vgg16(pretrained=True). Checkpoint-gated like the guardrail
stacks: with no weights the caller gets a clear error (tokenizer
training falls back to the gradient proxy, tokenizer_train.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array

# torchvision VGG16 `features` layout: (layer_index, C_in, C_out) for
# each conv; ReLU follows every conv; MaxPool2d(2) sits at 4/9/16/23/30
VGG16_CONVS: List[Tuple[int, int, int]] = [
    (0, 3, 64), (2, 64, 64),
    (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]
_POOL_AT = {4, 9, 16, 23}  # pools BEFORE the tapped slices 2..5
# feature taps = outputs after the ReLU at these conv indices
_TAP_AFTER = {2, 7, 14, 21, 28}

# ScalingLayer constants (lpips.py:115-123)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_vgg16_params(key: Array, dtype=jnp.float32) -> Dict[str, Array]:
    """Random-init VGG16 feature params (testing / shape template)."""
    params = {}
    for i, (idx, cin, cout) in enumerate(VGG16_CONVS):
        k = jax.random.fold_in(key, i)
        fan_in = cin * 9
        params[f"features.{idx}.weight"] = (
            jax.random.normal(k, (cout, cin, 3, 3), dtype)
            * (2.0 / fan_in) ** 0.5
        )
        params[f"features.{idx}.bias"] = jnp.zeros((cout,), dtype)
    return params


def convert_vgg16_state_dict(sd: dict) -> Dict[str, Array]:
    """torchvision VGG16 state dict -> LPIPS params (features.* only;
    classifier.* and the vgg.pth 'lin*' keys are dropped exactly as the
    reference's strict=False load does)."""
    params = {}
    for idx, cin, cout in VGG16_CONVS:
        w = np.asarray(sd[f"features.{idx}.weight"], np.float32)
        b = np.asarray(sd[f"features.{idx}.bias"], np.float32)
        assert w.shape == (cout, cin, 3, 3), (idx, w.shape)
        params[f"features.{idx}.weight"] = jnp.asarray(w)
        params[f"features.{idx}.bias"] = jnp.asarray(b)
    return params


def load_lpips_params(path: str) -> Dict[str, Array]:
    """Load VGG16 weights from a torch .pth (torchvision layout or the
    reference vgg.pth) or a native .npz. Checkpoint-gated: raises
    FileNotFoundError with instructions when absent."""
    import os

    if not os.path.exists(path):
        raise FileNotFoundError(
            f"LPIPS VGG16 checkpoint not found at {path}. Provide a "
            "torchvision vgg16 state dict (.pth) or an npz of it."
        )
    if path.endswith(".npz"):
        data = np.load(path)
        return convert_vgg16_state_dict({k: data[k] for k in data.files})
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_vgg16_state_dict(
        {k: v.numpy() for k, v in sd.items() if k.startswith("features.")}
    )


def _conv(params, idx: int, x: Array) -> Array:
    w = params[f"features.{idx}.weight"].astype(x.dtype)
    b = params[f"features.{idx}.bias"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + b[None, :, None, None]


def _maxpool2(x: Array) -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, 2, 2), window_strides=(1, 1, 2, 2),
        padding="VALID",
    )


def vgg16_features(params: Dict[str, Array], x: Array) -> List[Array]:
    """(B, 3, H, W) -> the five tapped ReLU feature maps
    (lpips.py:131-189 vgg16.forward)."""
    taps = []
    h = x
    for idx, _, _ in VGG16_CONVS:
        if idx - 1 in _POOL_AT:  # a MaxPool2d(2) sits before this conv
            h = _maxpool2(h)
        h = jax.nn.relu(_conv(params, idx, h))
        if idx in _TAP_AFTER:
            taps.append(h)
    return taps


def _normalize(x: Array, eps: float = 1e-10) -> Array:
    """Unit-normalize over channels (lpips.py normalize_tensor)."""
    norm = jnp.sqrt(jnp.sum(x**2, axis=1, keepdims=True))
    return x / (norm + eps)


def lpips(params: Dict[str, Array], x: Array, y: Array) -> Array:
    """(B, 3, H, W) pairs in [-1, 1] -> per-sample LPIPS (B, 1, 1, 1)
    (lpips.py LPIPS.forward:102-113)."""
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]
    fx = vgg16_features(params, (x - shift) / scale)
    fy = vgg16_features(params, (y - shift) / scale)
    val = None
    for a, b in zip(fx, fy):
        d = (_normalize(a) - _normalize(b)) ** 2
        r = jnp.mean(d, axis=(1, 2, 3), keepdims=True)
        val = r if val is None else val + r
    return val


def lpips_video(params: Dict[str, Array], x: Array, y: Array) -> Array:
    """(B, 3, T, H, W) videos -> scalar mean LPIPS over all frames
    (the tokenizer training applies the perceptual term per frame,
    tokenizer/training/losses/continuous.py)."""
    B, C, T, H, W = x.shape
    xf = x.transpose(0, 2, 1, 3, 4).reshape(B * T, C, H, W)
    yf = y.transpose(0, 2, 1, 3, 4).reshape(B * T, C, H, W)
    return jnp.mean(lpips(params, xf, yf))


# ------------------- production PerceptualLoss variant -------------------

# pyramid layer weights (continuous.py PerceptualLoss docstring + config)
LAYER_WEIGHTS = (1 / 2.6, 1 / 4.8, 1 / 3.7, 1 / 5.6, 10 / 1.5)


def perceptual_loss(
    params: Dict[str, Array],
    x: Array,  # (B, 3, H, W) input images
    y: Array,  # (B, 3, H, W) reconstructions
    mask: Optional[Array] = None,  # (B, 1, H, W) pixel weights
    layer_weights: Tuple[float, ...] = LAYER_WEIGHTS,
    gram: bool = False,
) -> Tuple[Array, Optional[Array]]:
    """The PRODUCTION tokenizer perceptual term
    (continuous.py PerceptualLoss.forward:155-209): RAW (pre-normalize)
    VGG features, masked L1 diffs with pyramid layer weights, plus the
    optional gram-matrix term (masked features' gram, squared diff).
    Note the reference's corr_enabled flag is config-only — no corr
    branch exists in its forward; none is implemented here either.

    Returns (lpips_val (B,1,1,1), gram_val (B,1,1) or None) — the
    per-sample values before the WeightScheduler multipliers."""
    B = x.shape[0]
    if mask is None:
        mask = jnp.ones((B, 1) + tuple(x.shape[2:]), x.dtype)
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]
    fx = vgg16_features(params, (x - shift) / scale)
    fy = vgg16_features(params, (y - shift) / scale)

    def _nearest_torch(m, hw):
        # torch F.interpolate mode='nearest': src = floor(dst * in/out)
        # (jax.image.resize 'nearest' rounds half-pixel centers — off by
        # one row/col at non-integer scales)
        H, W = m.shape[-2:]
        h2, w2 = hw
        ri = jnp.floor(jnp.arange(h2) * (H / h2)).astype(jnp.int32)
        ci = jnp.floor(jnp.arange(w2) * (W / w2)).astype(jnp.int32)
        return m[..., ri[:, None], ci[None, :]]

    val = None
    gram_val = None
    for lw, a, b in zip(layer_weights, fx, fy):
        # torch F.interpolate(weights[:, :1], size) default mode=nearest
        wm = _nearest_torch(mask[:, :1], a.shape[-2:]).astype(a.dtype)
        d = wm * jnp.abs(a - b)
        r = lw * jnp.mean(d, axis=(1, 2, 3), keepdims=True)
        val = r if val is None else val + r
        if gram:
            def _gram(f):
                c = f.shape[1]
                hw = f.shape[2] * f.shape[3]
                m = (wm * f).reshape(B, c, hw)
                return (m @ m.transpose(0, 2, 1)) / float(hw)

            gd = (_gram(a) - _gram(b)) ** 2
            gr = lw * jnp.mean(gd, axis=(1, 2), keepdims=True)
            gram_val = gr if gram_val is None else gram_val + gr
    return val, gram_val


def perceptual_video(
    params: Dict[str, Array],
    x: Array,  # (B, 3, T, H, W)
    y: Array,
    mask: Optional[Array] = None,  # (B, 1, T, H, W)
    gram: bool = False,
) -> Tuple[Array, Optional[Array]]:
    """Video wrapper (time2batch semantics, continuous.py:161-166):
    scalar means of the per-frame perceptual / gram terms."""
    B, C, T, H, W = x.shape
    to_b = lambda v: v.transpose(0, 2, 1, 3, 4).reshape(  # noqa: E731
        B * T, v.shape[1], H, W
    )
    m = None if mask is None else to_b(mask)
    val, gval = perceptual_loss(params, to_b(x), to_b(y), m, gram=gram)
    return jnp.mean(val), (None if gval is None else jnp.mean(gval))
