"""RetinaFace (ResNet-50) face detector + pixelation blur, TPU-native.

Replaces the reference's `retinaface` pip dependency + CUDA inference
(auxiliary/guardrail/face_blur_filter/face_blur_filter.py:43-192,
retinaface_utils.py:24-73): ResNet-50 backbone -> FPN -> SSH context
modules -> class/box heads, SSD-style prior boxes, box decode + NMS in
numpy, and the pixelate postprocess. Weights convert from the public
Resnet50_Final.pth state dict (biubug6/Pytorch_Retinaface layout) —
checkpoint-gated, like every guardrail model.

Detection semantics match the reference CLI: BGR mean-subtracted input,
confidence 0.7, NMS 0.4, top-5000/keep-750, min face 20x20, 5x5-block
pixelation.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict[str, Any]

# cfg_re50 constants (Pytorch_Retinaface data/config.py)
MIN_SIZES = ((16, 32), (64, 128), (256, 512))
STEPS = (8, 16, 32)
VARIANCES = (0.1, 0.2)
OUT_CHANNEL = 256
IN_CHANNELS = (512, 1024, 2048)  # resnet50 C3, C4, C5
NUM_ANCHORS = 2
TOP_K = 5000
KEEP_TOP_K = 750
NMS_THRESHOLD = 0.4
CONFIDENCE_THRESHOLD = 0.7

_DN = ("NCHW", "OIHW", "NCHW")


def _conv(x: Array, p: Params, stride: int = 1, pad: int = 0) -> Array:
    out = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=_DN,
    )
    if "b" in p:
        out = out + p["b"][None, :, None, None]
    return out


def _bn(x: Array, p: Params, eps: float = 1e-5) -> Array:
    inv = jax.lax.rsqrt(p["var"] + eps) * p["scale"]
    return x * inv[None, :, None, None] + (
        p["bias"] - p["mean"] * inv
    )[None, :, None, None]


def _conv_bn(x, p, stride=1, pad=1, act=True, leaky=0.0):
    out = _bn(_conv(x, p["conv"], stride, pad), p["bn"])
    if act:
        out = jnp.where(out >= 0, out, leaky * out)
    return out


# ------------------------------ ResNet-50 ------------------------------


def _bottleneck(x: Array, p: Params, stride: int) -> Array:
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"], stride, 1), p["bn2"]))
    out = _bn(_conv(out, p["conv3"]), p["bn3"])
    if "downsample" in p:
        x = _bn(_conv(x, p["downsample"]["conv"], stride),
                p["downsample"]["bn"])
    return jax.nn.relu(out + x)


def _resnet_stage(x: Array, blocks: List[Params], stride: int) -> Array:
    x = _bottleneck(x, blocks[0], stride)
    for b in blocks[1:]:
        x = _bottleneck(x, b, 1)
    return x


def _max_pool(x: Array, size: int, stride: int, pad: int) -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, size, size), (1, 1, stride, stride),
        [(0, 0), (0, 0), (pad, pad), (pad, pad)],
    )


def _backbone(params: Params, x: Array) -> Tuple[Array, Array, Array]:
    """torchvision resnet50 through layer4; returns (C3, C4, C5)."""
    x = jax.nn.relu(_bn(_conv(x, params["conv1"], 2, 3), params["bn1"]))
    x = _max_pool(x, 3, 2, 1)
    x = _resnet_stage(x, params["layer1"], 1)
    c3 = _resnet_stage(x, params["layer2"], 2)
    c4 = _resnet_stage(c3, params["layer3"], 2)
    c5 = _resnet_stage(c4, params["layer4"], 2)
    return c3, c4, c5


# ------------------------------ FPN + SSH ------------------------------


def _upsample_nearest(x: Array, h: int, w: int) -> Array:
    B, C, h0, w0 = x.shape
    ri = (jnp.arange(h) * h0 // h).astype(jnp.int32)
    ci = (jnp.arange(w) * w0 // w).astype(jnp.int32)
    return x[:, :, ri][:, :, :, ci]


def _fpn(params: Params, c3: Array, c4: Array, c5: Array):
    o1 = _conv_bn(c3, params["output1"], pad=0)
    o2 = _conv_bn(c4, params["output2"], pad=0)
    o3 = _conv_bn(c5, params["output3"], pad=0)
    o2 = o2 + _upsample_nearest(o3, o2.shape[2], o2.shape[3])
    o2 = _conv_bn(o2, params["merge2"])
    o1 = o1 + _upsample_nearest(o2, o1.shape[2], o1.shape[3])
    o1 = _conv_bn(o1, params["merge1"])
    return o1, o2, o3


def _ssh(params: Params, x: Array) -> Array:
    c3 = _conv_bn(x, params["conv3X3"], act=False)
    c5_1 = _conv_bn(x, params["conv5X5_1"])
    c5 = _conv_bn(c5_1, params["conv5X5_2"], act=False)
    c7 = _conv_bn(c5_1, params["conv7X7_2"])
    c7 = _conv_bn(c7, params["conv7x7_3"], act=False)
    return jax.nn.relu(jnp.concatenate([c3, c5, c7], axis=1))


def retinaface_forward(params: Params, images: Array):
    """images (B, 3, H, W) BGR mean-subtracted float32 ->
    (loc (B, P, 4), conf (B, P, 2) softmaxed)."""
    feats = _fpn(params["fpn"], *_backbone(params["body"], images))
    feats = [_ssh(params[f"ssh{i+1}"], f) for i, f in enumerate(feats)]
    locs, confs = [], []
    B = images.shape[0]
    for i, f in enumerate(feats):
        loc = _conv(f, params["BboxHead"][i], pad=0)  # (B, A*4, h, w)
        conf = _conv(f, params["ClassHead"][i], pad=0)  # (B, A*2, h, w)
        locs.append(loc.transpose(0, 2, 3, 1).reshape(B, -1, 4))
        confs.append(conf.transpose(0, 2, 3, 1).reshape(B, -1, 2))
    loc = jnp.concatenate(locs, axis=1)
    conf = jax.nn.softmax(jnp.concatenate(confs, axis=1), axis=-1)
    return loc, conf


# --------------------------- priors / decode ---------------------------


def prior_boxes(height: int, width: int) -> np.ndarray:
    """SSD prior boxes in center-offset form (PriorBox.forward parity:
    cfg_re50 min_sizes/steps, clip=False). Returns (P, 4) [cx, cy, w, h]
    normalized."""
    anchors = []
    for k, step in enumerate(STEPS):
        fh = math.ceil(height / step)
        fw = math.ceil(width / step)
        for i in range(fh):
            for j in range(fw):
                for min_size in MIN_SIZES[k]:
                    s_kx = min_size / width
                    s_ky = min_size / height
                    cx = (j + 0.5) * step / width
                    cy = (i + 0.5) * step / height
                    anchors.append([cx, cy, s_kx, s_ky])
    return np.asarray(anchors, np.float32)


def decode_boxes(loc: np.ndarray, priors: np.ndarray) -> np.ndarray:
    """Decode (B, P, 4) predictions -> corner-form boxes (normalized)
    (retinaface_utils.decode_batch parity)."""
    pr = priors[None]
    cxcy = pr[..., :2] + loc[..., :2] * VARIANCES[0] * pr[..., 2:]
    # clip the log-size offset: keeps garbage predictions finite (boxes
    # beyond e^10 prior sizes are meaningless anyway)
    wh = pr[..., 2:] * np.exp(np.clip(loc[..., 2:] * VARIANCES[1], -10, 10))
    boxes = np.concatenate([cxcy - wh / 2, cxcy + wh / 2], axis=-1)
    return boxes


def nms(dets: np.ndarray, thresh: float) -> List[int]:
    """Pure-numpy NMS (py_cpu_nms parity)."""
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        ovr = w * h / (areas[i] + areas[order[1:]] - w * h)
        order = order[1:][ovr <= thresh]
    return keep


def filter_detected_boxes(
    boxes: np.ndarray,
    scores: np.ndarray,
    confidence_threshold: float = CONFIDENCE_THRESHOLD,
    nms_threshold: float = NMS_THRESHOLD,
    top_k: int = TOP_K,
    keep_top_k: int = KEEP_TOP_K,
) -> np.ndarray:
    """retinaface_utils.filter_detected_boxes parity."""
    inds = np.where(scores > confidence_threshold)[0]
    boxes, scores = boxes[inds], scores[inds]
    order = scores.argsort()[::-1][:top_k]
    boxes, scores = boxes[order], scores[order]
    dets = np.hstack([boxes, scores[:, None]]).astype(np.float32)
    keep = nms(dets, nms_threshold)
    return dets[keep, :4][:keep_top_k]


# ------------------------------ pixelate ------------------------------


def pixelate_face(face_img: np.ndarray, blocks: int = 5) -> np.ndarray:
    """blur_utils.pixelate_face parity: shrink to blocks x blocks
    (bilinear) and upscale back (nearest)."""
    import cv2

    h, w = face_img.shape[:2]
    temp = cv2.resize(face_img, (blocks, blocks),
                      interpolation=cv2.INTER_LINEAR)
    return cv2.resize(temp, (w, h), interpolation=cv2.INTER_NEAREST)


def blur_faces_in_frames(
    params: Params,
    frames: np.ndarray,  # (T, H, W, 3) uint8 RGB
    batch_size: int = 4,
    confidence_threshold: float = CONFIDENCE_THRESHOLD,
    min_size: Tuple[int, int] = (20, 20),
) -> np.ndarray:
    """Full face-blur postprocess (face_blur_filter.py:78-192 parity):
    BGR mean-subtract -> detect -> decode+NMS -> pixelate boxes."""
    T, H, W = frames.shape[:3]
    priors = prior_boxes(H, W)
    scale = np.array([W, H, W, H], np.float32)
    fwd = jax.jit(lambda x: retinaface_forward(params, x))
    out = frames.copy()
    means = np.array([104.0, 117.0, 123.0], np.float32)
    for s in range(0, T, batch_size):
        batch = frames[s : s + batch_size].astype(np.float32)
        batch = batch[..., ::-1] - means  # RGB -> BGR, mean-subtract
        batch = jnp.asarray(batch.transpose(0, 3, 1, 2))
        loc, conf = jax.device_get(fwd(batch))
        boxes = decode_boxes(loc, priors) * scale
        for i in range(len(loc)):
            filtered = filter_detected_boxes(
                boxes[i], conf[i, :, 1],
                confidence_threshold=confidence_threshold,
            )
            frame = out[s + i]
            for box in filtered:
                if not np.isfinite(box).all():
                    continue
                x1, y1, x2, y2 = map(int, np.clip(box, -1e6, 1e6))
                # clamp FIRST, then size-check: a box hanging off the
                # left/top edge must not pass the check and then slice
                # with a negative index (pixelating the wrong region)
                x1, y1 = max(x1, 0), max(y1, 0)
                x2, y2 = min(x2, W), min(y2, H)
                if x2 - x1 < min_size[0] or y2 - y1 < min_size[1]:
                    continue
                frame[y1:y2, x1:x2] = pixelate_face(frame[y1:y2, x1:x2])
    return out


# --------------------------- init / convert ---------------------------


def _conv_p(key, cin, cout, k, bias=False):
    w = jax.random.normal(key, (cout, cin, k, k), jnp.float32) * 0.05
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def _bn_p(c):
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def init_retinaface_params(key) -> Params:
    """Random-init full parameter tree (tests / shape checks)."""
    keys = iter(jax.random.split(key, 400))

    def cbn(cin, cout, k=3):
        return {"conv": _conv_p(next(keys), cin, cout, k), "bn": _bn_p(cout)}

    def bottleneck(cin, cmid, cout, downsample):
        p = {
            "conv1": _conv_p(next(keys), cin, cmid, 1),
            "bn1": _bn_p(cmid),
            "conv2": _conv_p(next(keys), cmid, cmid, 3),
            "bn2": _bn_p(cmid),
            "conv3": _conv_p(next(keys), cmid, cout, 1),
            "bn3": _bn_p(cout),
        }
        if downsample:
            p["downsample"] = {
                "conv": _conv_p(next(keys), cin, cout, 1),
                "bn": _bn_p(cout),
            }
        return p

    def stage(cin, cmid, cout, n):
        return [bottleneck(cin, cmid, cout, True)] + [
            bottleneck(cout, cmid, cout, False) for _ in range(n - 1)
        ]

    oc = OUT_CHANNEL
    params: Params = {
        "body": {
            "conv1": _conv_p(next(keys), 3, 64, 7),
            "bn1": _bn_p(64),
            "layer1": stage(64, 64, 256, 3),
            "layer2": stage(256, 128, 512, 4),
            "layer3": stage(512, 256, 1024, 6),
            "layer4": stage(1024, 512, 2048, 3),
        },
        "fpn": {
            "output1": cbn(IN_CHANNELS[0], oc, 1),
            "output2": cbn(IN_CHANNELS[1], oc, 1),
            "output3": cbn(IN_CHANNELS[2], oc, 1),
            "merge1": cbn(oc, oc),
            "merge2": cbn(oc, oc),
        },
        "ClassHead": [
            _conv_p(next(keys), oc, NUM_ANCHORS * 2, 1, bias=True)
            for _ in range(3)
        ],
        "BboxHead": [
            _conv_p(next(keys), oc, NUM_ANCHORS * 4, 1, bias=True)
            for _ in range(3)
        ],
    }
    for i in range(3):
        params[f"ssh{i+1}"] = {
            "conv3X3": cbn(oc, oc // 2),
            "conv5X5_1": cbn(oc, oc // 4),
            "conv5X5_2": cbn(oc // 4, oc // 4),
            "conv7X7_2": cbn(oc // 4, oc // 4),
            "conv7x7_3": cbn(oc // 4, oc // 4),
        }
    return params


def convert_retinaface(state_dict) -> Params:
    """Convert the public Resnet50_Final.pth state dict (after the
    reference's 'module.' prefix strip) to the JAX tree."""

    def get(name):
        v = state_dict[name]
        return jnp.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v,
            jnp.float32,
        )

    def conv(name, bias=False):
        p = {"w": get(f"{name}.weight")}
        if bias:
            p["b"] = get(f"{name}.bias")
        return p

    def bn(name):
        return {
            "scale": get(f"{name}.weight"),
            "bias": get(f"{name}.bias"),
            "mean": get(f"{name}.running_mean"),
            "var": get(f"{name}.running_var"),
        }

    def cbn_seq(name):
        # nn.Sequential(conv, bn[, leakyrelu]) -> indices 0, 1
        return {"conv": conv(f"{name}.0"), "bn": bn(f"{name}.1")}

    def bottleneck(name):
        p = {
            "conv1": conv(f"{name}.conv1"),
            "bn1": bn(f"{name}.bn1"),
            "conv2": conv(f"{name}.conv2"),
            "bn2": bn(f"{name}.bn2"),
            "conv3": conv(f"{name}.conv3"),
            "bn3": bn(f"{name}.bn3"),
        }
        if f"{name}.downsample.0.weight" in state_dict:
            p["downsample"] = {
                "conv": conv(f"{name}.downsample.0"),
                "bn": bn(f"{name}.downsample.1"),
            }
        return p

    def stage(name, n):
        return [bottleneck(f"{name}.{i}") for i in range(n)]

    params: Params = {
        "body": {
            "conv1": conv("body.conv1"),
            "bn1": bn("body.bn1"),
            "layer1": stage("body.layer1", 3),
            "layer2": stage("body.layer2", 4),
            "layer3": stage("body.layer3", 6),
            "layer4": stage("body.layer4", 3),
        },
        "fpn": {k: cbn_seq(f"fpn.{k}") for k in
                ("output1", "output2", "output3", "merge1", "merge2")},
        "ClassHead": [conv(f"ClassHead.{i}.conv1x1", bias=True)
                      for i in range(3)],
        "BboxHead": [conv(f"BboxHead.{i}.conv1x1", bias=True)
                     for i in range(3)],
    }
    for i in range(3):
        params[f"ssh{i+1}"] = {
            k: cbn_seq(f"ssh{i+1}.{k}")
            for k in ("conv3X3", "conv5X5_1", "conv5X5_2", "conv7X7_2",
                      "conv7x7_3")
        }
    return params
