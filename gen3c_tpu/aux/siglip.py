"""SigLIP vision encoder + video safety classifier, TPU-native (JAX).

Replaces the reference's torch/transformers inference path
(auxiliary/guardrail/video_content_safety_filter/vision_encoder.py:21-44,
model.py:30-60): the SigLIP so400m-patch14-384 vision tower computes
`get_image_features` (attention-pooled, later L2-normalized), a 3-layer
MLP classifier (1152 -> 512 -> 256 -> 7, BatchNorm+ReLU) scores each
frame. Weights convert from the HuggingFace SiglipVisionModel state dict
(tested for parity against transformers' torch implementation on a tiny
random-init config — tests/test_vision_safety.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SiglipVisionConfig:
    """google/siglip-so400m-patch14-384 defaults."""

    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    image_size: int = 384
    patch_size: int = 14
    layer_norm_eps: float = 1e-6


def _ln(x: Array, p: Params, eps: float) -> Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


def _mha(p: Params, q_in: Array, kv_in: Array, num_heads: int) -> Array:
    """Standard multi-head attention with bias projections.
    q_in: (B, Lq, D), kv_in: (B, Lk, D)."""
    B, Lq, D = q_in.shape
    Lk = kv_in.shape[1]
    hd = D // num_heads
    q = (q_in @ p["q"]["w"] + p["q"]["b"]).reshape(B, Lq, num_heads, hd)
    k = (kv_in @ p["k"]["w"] + p["k"]["b"]).reshape(B, Lk, num_heads, hd)
    v = (kv_in @ p["v"]["w"] + p["v"]["b"]).reshape(B, Lk, num_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, Lq, D)
    return out @ p["out"]["w"] + p["out"]["b"]


def _mlp(p: Params, x: Array) -> Array:
    h = x @ p["fc1"]["w"] + p["fc1"]["b"]
    h = jax.nn.gelu(h, approximate=True)  # gelu_pytorch_tanh
    return h @ p["fc2"]["w"] + p["fc2"]["b"]


def siglip_image_features(
    params: Params, cfg: SiglipVisionConfig, pixels: Array
) -> Array:
    """pixels (B, 3, H, W) normalized [(x/255 - 0.5) / 0.5] ->
    pooled image features (B, D) (= SiglipModel.get_image_features).
    """
    B = pixels.shape[0]
    ps = cfg.patch_size
    # conv patch embed (valid padding) == reshape + matmul on patches
    x = pixels.reshape(
        B, 3, cfg.image_size // ps, ps, cfg.image_size // ps, ps
    )
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(
        B, (cfg.image_size // ps) ** 2, 3 * ps * ps
    )
    x = x @ params["patch"]["w"] + params["patch"]["b"]
    x = x + params["pos_emb"]  # (L, D)

    eps = cfg.layer_norm_eps
    for blk in params["layers"]:
        h = _ln(x, blk["ln1"], eps)
        x = x + _mha(blk["attn"], h, h, cfg.num_attention_heads)
        h = _ln(x, blk["ln2"], eps)
        x = x + _mlp(blk["mlp"], h)
    x = _ln(x, params["post_ln"], eps)

    # MultiheadAttentionPoolingHead: learned probe cross-attends the tokens
    head = params["head"]
    probe = jnp.broadcast_to(head["probe"], (B,) + head["probe"].shape[1:])
    pooled = _mha(head["attn"], probe, x, cfg.num_attention_heads)
    h = _ln(pooled, head["ln"], eps)
    pooled = pooled + _mlp(head["mlp"], h)
    return pooled[:, 0]


def convert_hf_siglip_vision(state_dict, cfg: SiglipVisionConfig) -> Params:
    """Convert a HF SiglipVisionModel state dict (torch tensors or numpy)
    to the JAX param tree. Handles both 'vision_model.'-prefixed (full
    SiglipModel) and bare keys."""

    def get(name):
        for k in (f"vision_model.{name}", name):
            if k in state_dict:
                v = state_dict[k]
                return np.asarray(
                    v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                    np.float32,
                )
        raise KeyError(name)

    def linear(name):
        return {"w": jnp.asarray(get(f"{name}.weight").T),
                "b": jnp.asarray(get(f"{name}.bias"))}

    def lnorm(name):
        return {"scale": jnp.asarray(get(f"{name}.weight")),
                "bias": jnp.asarray(get(f"{name}.bias"))}

    conv_w = get("embeddings.patch_embedding.weight")  # (D, 3, ps, ps)
    D = cfg.hidden_size
    params: Params = {
        "patch": {
            # (D,3,ps,ps) -> (3*ps*ps, D) matching the reshape order (c,h,w)
            "w": jnp.asarray(conv_w.reshape(D, -1).T),
            "b": jnp.asarray(get("embeddings.patch_embedding.bias")),
        },
        "pos_emb": jnp.asarray(get("embeddings.position_embedding.weight")),
        "layers": [],
        "post_ln": lnorm("post_layernorm"),
    }
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layers.{i}"
        params["layers"].append(
            {
                "ln1": lnorm(f"{pre}.layer_norm1"),
                "ln2": lnorm(f"{pre}.layer_norm2"),
                "attn": {
                    "q": linear(f"{pre}.self_attn.q_proj"),
                    "k": linear(f"{pre}.self_attn.k_proj"),
                    "v": linear(f"{pre}.self_attn.v_proj"),
                    "out": linear(f"{pre}.self_attn.out_proj"),
                },
                "mlp": {
                    "fc1": linear(f"{pre}.mlp.fc1"),
                    "fc2": linear(f"{pre}.mlp.fc2"),
                },
            }
        )
    # pooling head: torch.nn.MultiheadAttention packs qkv in in_proj_weight
    in_w = get("head.attention.in_proj_weight")  # (3D, D)
    in_b = get("head.attention.in_proj_bias")
    params["head"] = {
        "probe": jnp.asarray(get("head.probe")),  # (1, 1, D)
        "attn": {
            "q": {"w": jnp.asarray(in_w[:D].T), "b": jnp.asarray(in_b[:D])},
            "k": {"w": jnp.asarray(in_w[D : 2 * D].T),
                  "b": jnp.asarray(in_b[D : 2 * D])},
            "v": {"w": jnp.asarray(in_w[2 * D :].T),
                  "b": jnp.asarray(in_b[2 * D :])},
            "out": linear("head.attention.out_proj"),
        },
        "ln": lnorm("head.layernorm"),
        "mlp": {
            "fc1": linear("head.mlp.fc1"),
            "fc2": linear("head.mlp.fc2"),
        },
    }
    return params


# ---------------------- safety classifier head ----------------------


def safety_classifier_apply(params: Params, feats: Array) -> Array:
    """3-layer MLP with eval-mode BatchNorm (model.py:30-46).
    feats (B, 1152) -> logits (B, 7)."""

    def bn(p, x):
        inv = jax.lax.rsqrt(p["var"] + 1e-5)
        return (x - p["mean"]) * inv * p["scale"] + p["bias"]

    h = feats @ params["fc1"]["w"] + params["fc1"]["b"]
    h = jax.nn.relu(bn(params["bn1"], h))
    h = h @ params["fc2"]["w"] + params["fc2"]["b"]
    h = jax.nn.relu(bn(params["bn2"], h))
    return h @ params["fc3"]["w"] + params["fc3"]["b"]


def convert_safety_classifier(state_dict) -> Params:
    """Convert the reference's safety_filter.pt state dict
    (network.layers.{0,1,3,4,6} Linear/BatchNorm1d torch modules)."""

    def get(name):
        for k in (f"network.layers.{name}", f"layers.{name}", name):
            if k in state_dict:
                v = state_dict[k]
                return np.asarray(
                    v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                    np.float32,
                )
        raise KeyError(name)

    def linear(idx):
        return {"w": jnp.asarray(get(f"{idx}.weight").T),
                "b": jnp.asarray(get(f"{idx}.bias"))}

    def bnorm(idx):
        return {
            "scale": jnp.asarray(get(f"{idx}.weight")),
            "bias": jnp.asarray(get(f"{idx}.bias")),
            "mean": jnp.asarray(get(f"{idx}.running_mean")),
            "var": jnp.asarray(get(f"{idx}.running_var")),
        }

    return {
        "fc1": linear(0), "bn1": bnorm(1),
        "fc2": linear(3), "bn2": bnorm(4),
        "fc3": linear(6),
    }


def preprocess_frame(frame: np.ndarray, image_size: int = 384) -> np.ndarray:
    """uint8 (H, W, 3) -> normalized (3, S, S) float32 (SiglipProcessor
    semantics: bicubic resize to SxS, rescale 1/255, normalize mean/std
    0.5)."""
    from PIL import Image

    img = Image.fromarray(frame).resize(
        (image_size, image_size), Image.BICUBIC
    )
    x = np.asarray(img, np.float32) / 255.0
    x = (x - 0.5) / 0.5
    return x.transpose(2, 0, 1)
