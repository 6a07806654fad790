"""PyTorch -> JAX weight conversion for GeneralDIT checkpoints.

Maps the reference state-dict naming (reference: general_dit.py:147-213,
blocks.py, attention.py) onto the gen3c_tpu.models.dit parameter pytree:

  torch key                                      -> pytree path
  x_embedder.proj.1.weight        (D, Cin)       -> x_embedder.w  (Cin, D)
  t_embedder.1.linear_1.weight    (D, D)         -> t_embedder.linear_1.w
  t_embedder.1.linear_2.weight    (3D, D)        -> t_embedder.linear_2.w
  affline_norm.weight             (D,)           -> affline_norm.scale
  extra_pos_embedder.pos_emb_{t,h,w}  (len, D)   -> extra_pos_emb.{t,h,w}
  blocks.block{i}.blocks.0.*  (full attention)   -> blocks[i].fa.*
  blocks.block{i}.blocks.1.*  (cross attention)  -> blocks[i].ca.*
  blocks.block{i}.blocks.2.*  (MLP)              -> blocks[i].mlp.*
    .block.attn.to_q.0.weight   (D, D)           ->   q.w (transposed)
    .block.attn.to_q.1.weight   (head_dim,)      ->   q_norm.scale
    .block.attn.to_k.0.weight   (D, ctx)         ->   k.w (transposed)
    .block.attn.to_k.1.weight   (head_dim,)      ->   k_norm.scale
    .block.attn.to_v.0.weight                    ->   v.w (transposed)
    .block.attn.to_out.0.weight (D, D)           ->   out.w (transposed)
    .block.layer1.weight        (4D, D)          ->   fc1.w (transposed)
    .block.layer2.weight        (D, 4D)          ->   fc2.w (transposed)
    .adaLN_modulation.1.weight  (lora, D)        ->   adaln.w1 (transposed)
    .adaLN_modulation.2.weight  (3D, lora)       ->   adaln.w2 (transposed)
  final_layer.linear.weight                      -> final.linear.w
  final_layer.adaLN_modulation.{1,2}.weight      -> final.adaln.{w1,w2}

TransformerEngine "_extra_state" keys (FP8 metadata) and the logvar head
are skipped, mirroring non_strict_load_model (inference_utils.py:217-292).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from gen3c_tpu.models.dit import DiTConfig


def _t(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x).T)


def _a(x) -> np.ndarray:
    return np.asarray(x)


def normalize_reference_checkpoint(
    ckpt: Mapping[str, Any], use_ema: bool = False
) -> Dict[str, Any]:
    """Unwrap a reference checkpoint dict to a flat state dict.

    Mirrors load_network_model (inference_utils.py:327-346): a checkpoint
    may be {"model": sd, "ema": ema_sd} where EMA keys are "-"-mangled
    ("net.blocks.block0..." saved as "net-blocks-block0..."). The default
    returns the "model" weights; use_ema=True overlays the de-mangled EMA
    weights on top (the reference does this only on the PEFT path,
    inference_utils.py:337-341)."""
    if "model" in ckpt and isinstance(ckpt["model"], Mapping):
        sd = dict(ckpt["model"])
        if use_ema and isinstance(ckpt.get("ema"), Mapping):
            sd.update(
                {k.replace("-", "."): v for k, v in ckpt["ema"].items()}
            )
        return sd
    return dict(ckpt)


def _skippable(key: str) -> bool:
    """State-dict keys with no JAX-side parameter: TE FP8 metadata, the
    EDM logvar head (training-only), and RoPE position buffers
    (pos_embedder.seq — computed on the fly via rope_3d_table; NOT the
    learnable extra_pos_embedder, which does convert)."""
    if "_extra_state" in key:
        return True
    k = key[4:] if key.startswith("net.") else key
    return k.startswith(("logvar", "pos_embedder."))


def convert_logvar_state_dict(
    state_dict: Mapping[str, Any], dtype=jnp.float32,
) -> Dict[str, Any] | None:
    """Extract the EDM logvar head (model_t2w.py:111-113:
    Sequential(FourierFeatures(128, normalize=True),
    Linear(128, 1, bias=False))) into the pytree consumed by
    training.losses.logvar_fn. Returns None when the checkpoint has no
    logvar keys (inference-only exports strip it). Keys may carry a
    leading "model." as stored by the reference trainer."""
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("model."):
            k = k[len("model.") :]
        if k.startswith("logvar."):
            sd[k] = v
    if not sd:
        return None
    return {
        "freqs": jnp.asarray(_a(sd["logvar.0.freqs"]), dtype),
        "phases": jnp.asarray(_a(sd["logvar.0.phases"]), dtype),
        # torch Linear stores (out, in) = (1, 128); ours is (128, 1)
        "w": jnp.asarray(_t(sd["logvar.1.weight"]), dtype),
    }


def convert_dit_state_dict(
    state_dict: Mapping[str, Any], cfg: DiTConfig, dtype=jnp.float32,
    strict: bool = False,
) -> Dict[str, Any]:
    """Convert a (numpy-valued) reference DiT state dict to a param pytree.

    Accepts keys with or without a leading "net." prefix; values may be
    torch tensors (must implement __array__) or numpy arrays.

    strict=True raises if any checkpoint key is neither consumed nor
    recognized-skippable (the converter-side analogue of
    non_strict_load_model's unexpected_keys report,
    inference_utils.py:217-292) — the guard that catches key-mapping
    drift before real weights arrive.
    """
    sd = {}
    for k, v in state_dict.items():
        if _skippable(k):
            continue
        if k.startswith("net."):
            k = k[len("net.") :]
        sd[k] = v

    if "x_embedder.proj.weight" in sd:
        # legacy_patch_emb Conv3d (training/module/blocks.py:121-129):
        # weight (D, C, pt, ph, pw) flattened over (C, pt, ph, pw) equals
        # the Rearrange "(c r m n)" + Linear layout used at inference —
        # a pure reshape converts between them.
        w = np.asarray(sd.pop("x_embedder.proj.weight"))
        sd["x_embedder.proj.1.weight"] = w.reshape(w.shape[0], -1)

    consumed = set()

    def get(key):
        consumed.add(key)
        return sd[key]

    def attn(prefix):
        out = {
            "q": {"w": _t(get(f"{prefix}.to_q.0.weight"))},
            "k": {"w": _t(get(f"{prefix}.to_k.0.weight"))},
            "v": {"w": _t(get(f"{prefix}.to_v.0.weight"))},
            "out": {"w": _t(get(f"{prefix}.to_out.0.weight"))},
            "q_norm": {"scale": _a(get(f"{prefix}.to_q.1.weight"))},
            "k_norm": {"scale": _a(get(f"{prefix}.to_k.1.weight"))},
        }
        return out

    def adaln(prefix):
        return {
            "w1": _t(get(f"{prefix}.1.weight")),
            "w2": _t(get(f"{prefix}.2.weight")),
        }

    blocks = []
    for i in range(cfg.num_blocks):
        base = f"blocks.block{i}.blocks"
        fa = attn(f"{base}.0.block.attn")
        fa["adaln"] = adaln(f"{base}.0.adaLN_modulation")
        ca = attn(f"{base}.1.block.attn")
        ca["adaln"] = adaln(f"{base}.1.adaLN_modulation")
        mlp = {
            "fc1": {"w": _t(get(f"{base}.2.block.layer1.weight"))},
            "fc2": {"w": _t(get(f"{base}.2.block.layer2.weight"))},
            "adaln": adaln(f"{base}.2.adaLN_modulation"),
        }
        blocks.append({"fa": fa, "ca": ca, "mlp": mlp})

    params = {
        "x_embedder": {"w": _t(get("x_embedder.proj.1.weight"))},
        "t_embedder": {
            "linear_1": {"w": _t(get("t_embedder.1.linear_1.weight"))},
            "linear_2": {"w": _t(get("t_embedder.1.linear_2.weight"))},
        },
        "affline_norm": {"scale": _a(get("affline_norm.weight"))},
        "extra_pos_emb": {
            "t": _a(get("extra_pos_embedder.pos_emb_t")),
            "h": _a(get("extra_pos_embedder.pos_emb_h")),
            "w": _a(get("extra_pos_embedder.pos_emb_w")),
        },
        "blocks": blocks,
        "final": {
            "linear": {"w": _t(get("final_layer.linear.weight"))},
            "adaln": adaln("final_layer.adaLN_modulation"),
        },
    }
    if "augment_sigma_embedder.1.linear_1.weight" in sd:
        # add_augment_sigma_embedding nets (general_dit_lvg.py:37-58):
        # Sequential(SDXLTimesteps, SDXLTimestepEmbedding). Under
        # AdaLN-LoRA the linears are forward-dead (the call site keeps
        # only the raw-sincos emb) but must be consumed/carried.
        params["augment_sigma_embedder"] = {
            "linear_1": {
                "w": _t(get("augment_sigma_embedder.1.linear_1.weight"))
            },
            "linear_2": {
                "w": _t(get("augment_sigma_embedder.1.linear_2.weight"))
            },
        }
        for b in ("linear_1", "linear_2"):
            bk = f"augment_sigma_embedder.1.{b}.bias"
            if bk in sd:  # non-lora variant keeps biases
                params["augment_sigma_embedder"][b]["b"] = _a(get(bk))
    if "action_embedder_B_3D.fc1.weight" in sd:
        # ActionConditionalVideoExtendGeneralDIT
        # (general_dit_action.py:290-304): two timm Mlps with biases
        def mlp(prefix):
            return {
                "fc1": {"w": _t(get(f"{prefix}.fc1.weight")),
                        "b": _a(get(f"{prefix}.fc1.bias"))},
                "fc2": {"w": _t(get(f"{prefix}.fc2.weight")),
                        "b": _a(get(f"{prefix}.fc2.bias"))},
            }

        params["action_embedder_B_D"] = mlp("action_embedder_B_D")
        params["action_embedder_B_3D"] = mlp("action_embedder_B_3D")

    if strict:
        leftover = sorted(set(sd) - consumed)
        if leftover:
            raise ValueError(
                f"{len(leftover)} unconsumed checkpoint keys (key-mapping "
                f"drift?): {leftover[:8]}{'...' if len(leftover) > 8 else ''}"
            )
    import jax

    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)


def convert_hf_llama(state_dict, cfg, dtype=None) -> dict:
    """HF LlamaForCausalLM state dict -> gen3c_tpu.models.ar_transformer
    param tree (raw arrays; linears transposed to (in, out)). Params are
    stored as `dtype` (default: cfg.dtype — fp32 would not fit an 8B on
    a 16 GB chip).

    Works for the Llama-3 family (Llama-Guard-3-8B: the guardrail LLM,
    auxiliary/guardrail/llamaGuard3/ in the reference). HF stores q/k in
    rotate-half layout, matching ar_transformer._apply_rope — no head
    permutation needed. Tied-embedding checkpoints (no lm_head) reuse
    embed_tokens as the output projection.
    """
    import jax.numpy as jnp

    if dtype is None:
        dtype = getattr(cfg, "dtype", jnp.float32)

    def get(name, transpose=False):
        v = state_dict[name]
        if hasattr(v, "detach"):
            # .float(): numpy cannot represent torch bf16 checkpoints
            v = v.detach().float().cpu().numpy()
        arr = np.asarray(v)
        if transpose:
            arr = arr.T
        return jnp.asarray(np.ascontiguousarray(arr), dtype)

    layers = []
    for i in range(cfg.n_layers):
        pre = f"model.layers.{i}"
        layers.append(
            {
                "wq": get(f"{pre}.self_attn.q_proj.weight", True),
                "wk": get(f"{pre}.self_attn.k_proj.weight", True),
                "wv": get(f"{pre}.self_attn.v_proj.weight", True),
                "wo": get(f"{pre}.self_attn.o_proj.weight", True),
                "w1": get(f"{pre}.mlp.gate_proj.weight", True),
                "w2": get(f"{pre}.mlp.down_proj.weight", True),
                "w3": get(f"{pre}.mlp.up_proj.weight", True),
                "attention_norm": {
                    "scale": get(f"{pre}.input_layernorm.weight")
                },
                "ffn_norm": {
                    "scale": get(f"{pre}.post_attention_layernorm.weight")
                },
            }
        )
    out_key = (
        "lm_head.weight"
        if "lm_head.weight" in state_dict
        else "model.embed_tokens.weight"
    )
    return {
        "tok_embeddings": get("model.embed_tokens.weight"),
        "layers": layers,
        "norm": {"scale": get("model.norm.weight")},
        "output": get(out_key, True),
    }


def convert_multiview_dit_state_dict(
    state_dict: Mapping[str, Any], cfg, dtype=jnp.float32
) -> Dict[str, Any]:
    """Convert a reference MultiviewGeneralDIT state dict (Sample-AV
    models, general_dit_multiview.py) to the dit_multiview param tree:
    the GeneralDIT mapping plus view_embeddings (nn.Embedding) and the
    optional repeat_frame_embedding (nn.Linear(1, vc)). The multiview
    net's sincos pos-emb buffers are non-persistent (absent from the
    state dict) — computed on the fly in multiview_dit_forward."""
    sd = {}
    for k, v in state_dict.items():
        if "_extra_state" in k or k.startswith("logvar"):
            continue
        if k.startswith("net."):
            k = k[len("net.") :]
        sd[k] = v
    # satisfy convert_dit_state_dict's learnable-extra-pos-emb slots (the
    # multiview forward ignores them)
    D = cfg.model_channels
    for name, n in (("t", cfg.len_t), ("h", cfg.len_h), ("w", cfg.len_w)):
        sd.setdefault(
            f"extra_pos_embedder.pos_emb_{name}", np.zeros((n, D), np.float32)
        )
    params = convert_dit_state_dict(sd, cfg, dtype)
    params["view_embeddings"] = jnp.asarray(
        _a(sd["view_embeddings.weight"]), dtype
    )
    if "repeat_frame_embedding.weight" in sd:
        params["repeat_frame_embedding"] = {
            "w": jnp.asarray(_t(sd["repeat_frame_embedding.weight"]), dtype),
            "b": jnp.asarray(_a(sd["repeat_frame_embedding.bias"]), dtype),
        }
    return params


def shard_ar_tp_state_dict(
    state_dict: Mapping[str, Any],
    tp: int,
    rank: int,
    n_heads: int,
    n_kv_heads: int,
    dim: int,
    context_dim: int | None = None,
) -> Dict[str, np.ndarray]:
    """Megatron-TP shard of a Cosmos AR (llama-naming) state dict —
    obtain_tensor_parallel_state_dict parity (autoregressive/utils/
    checkpoint.py:87-177, pytorch backend): wq/wk/wv chunk head-major on
    the output dim, w1/w3/embeddings/output column-split, w2/wo
    row-split, norms replicated."""
    out = {}
    for full_key, v in state_dict.items():
        prefix = "model." if full_key.startswith("model.") else ""
        key = full_key[len(prefix):]
        v = np.asarray(v)
        if key.startswith("layers."):
            if ".attention.wq.weight" in key or "cross_attention.wq.weight" in key:
                v = np.split(v.reshape(n_heads, -1, dim), tp, axis=0)[rank]
                v = v.reshape(-1, dim)
            elif ".attention.wk.weight" in key or ".attention.wv.weight" in key:
                v = np.split(v.reshape(n_kv_heads, -1, dim), tp, axis=0)[rank]
                v = v.reshape(-1, dim)
            elif ("cross_attention.wk.weight" in key
                  or "cross_attention.wv.weight" in key):
                assert context_dim is not None
                v = np.split(
                    v.reshape(n_kv_heads, -1, context_dim), tp, axis=0
                )[rank]
                v = v.reshape(-1, context_dim)
            elif ("feed_forward.w1.weight" in key
                  or "feed_forward.w3.weight" in key):
                v = np.split(v, tp, axis=0)[rank]
            elif ("feed_forward.w2.weight" in key
                  or ".attention.wo.weight" in key
                  or "cross_attention.wo.weight" in key):
                v = np.split(v, tp, axis=1)[rank]
        elif key in ("tok_embeddings.weight", "output.weight"):
            v = np.split(v, tp, axis=0)[rank]
        out[full_key] = v
    return out


def merge_ar_tp_state_dicts(
    shards: list,
    n_heads: int,
    n_kv_heads: int,
    dim: int,
    context_dim: int | None = None,
    head_dim: int | None = None,
) -> Dict[str, np.ndarray]:
    """Inverse of shard_ar_tp_state_dict — merge_tensor_parallel_
    state_dicts parity (autoregressive/utils/checkpoint.py:179-262):
    head-major concat for q/k/v, column/row concat for the rest, norms
    averaged with a shard-0 closeness assert."""
    tp = len(shards)
    if head_dim is None:
        head_dim = dim // n_heads
    n_local_heads = n_heads // tp
    n_local_kv = n_kv_heads // tp
    merged = {}
    for full_key in shards[0]:
        prefix = "model." if full_key.startswith("model.") else ""
        key = full_key[len(prefix):]
        vals = [np.asarray(s[full_key]) for s in shards]
        if key in ("tok_embeddings.weight", "output.weight"):
            merged[full_key] = np.concatenate(vals, axis=0)
        elif ".attention.wq.weight" in key or "cross_attention.wq.weight" in key:
            chunks = [v.reshape(n_local_heads, head_dim, dim) for v in vals]
            merged[full_key] = np.concatenate(chunks, axis=0).reshape(
                head_dim * n_heads, dim)
        elif ".attention.wk.weight" in key or ".attention.wv.weight" in key:
            chunks = [v.reshape(n_local_kv, head_dim, dim) for v in vals]
            merged[full_key] = np.concatenate(chunks, axis=0).reshape(
                head_dim * n_kv_heads, dim)
        elif ("cross_attention.wk.weight" in key
              or "cross_attention.wv.weight" in key):
            assert context_dim is not None
            chunks = [
                v.reshape(n_local_kv, head_dim, context_dim) for v in vals
            ]
            merged[full_key] = np.concatenate(chunks, axis=0).reshape(
                head_dim * n_kv_heads, context_dim)
        elif ("feed_forward.w1.weight" in key
              or "feed_forward.w3.weight" in key):
            merged[full_key] = np.concatenate(vals, axis=0)
        elif ("feed_forward.w2.weight" in key
              or ".attention.wo.weight" in key
              or "cross_attention.wo.weight" in key):
            merged[full_key] = np.concatenate(vals, axis=1)
        else:
            avg = np.mean(np.stack(vals), axis=0)
            if not np.allclose(vals[0], avg, atol=5e-2, rtol=0.1):
                raise ValueError(
                    f"replicated tensor {full_key} differs across shards"
                )
            assert "norm" in key or vals[0].ndim <= 1, (
                f"unexpected replicated key {full_key}"
            )
            merged[full_key] = avg
    return merged


def convert_cosmos_ar_state_dict(state_dict, cfg, dtype=None) -> dict:
    """Reference Cosmos AR transformer state dict
    (autoregressive/networks/transformer.py: llama naming + per-head
    q_norm/k_norm) -> gen3c_tpu.models.ar_transformer param tree.
    Parity-tested against the reference torch net at tiny scale
    (tests/test_ar_parity.py)."""
    import jax.numpy as jnp

    if dtype is None:
        dtype = getattr(cfg, "dtype", jnp.float32)

    def get(name, transpose=False):
        v = state_dict[name]
        if hasattr(v, "detach"):
            v = v.detach().float().cpu().numpy()
        arr = np.asarray(v)
        if transpose:
            arr = arr.T
        return jnp.asarray(np.ascontiguousarray(arr), dtype)

    layers = []
    for i in range(cfg.n_layers):
        pre = f"layers.{i}"
        lp = {
            "wq": get(f"{pre}.attention.wq.weight", True),
            "wk": get(f"{pre}.attention.wk.weight", True),
            "wv": get(f"{pre}.attention.wv.weight", True),
            "wo": get(f"{pre}.attention.wo.weight", True),
            "w1": get(f"{pre}.feed_forward.w1.weight", True),
            "w2": get(f"{pre}.feed_forward.w2.weight", True),
            "w3": get(f"{pre}.feed_forward.w3.weight", True),
            "attention_norm": {
                "scale": get(f"{pre}.attention_norm.weight")
            },
            "ffn_norm": {"scale": get(f"{pre}.ffn_norm.weight")},
        }
        if cfg.use_qk_normalization:
            lp["q_norm"] = {"scale": get(f"{pre}.attention.q_norm.weight")}
            lp["k_norm"] = {"scale": get(f"{pre}.attention.k_norm.weight")}
        if cfg.context_dim:
            lp["cross_norm"] = {
                "scale": get(f"{pre}.cross_attention_norm.weight")
            }
            lp["cwq"] = get(f"{pre}.cross_attention.wq.weight", True)
            lp["cwk"] = get(f"{pre}.cross_attention.wk.weight", True)
            lp["cwv"] = get(f"{pre}.cross_attention.wv.weight", True)
            lp["cwo"] = get(f"{pre}.cross_attention.wo.weight", True)
        layers.append(lp)
    return {
        "tok_embeddings": get("tok_embeddings.weight"),
        "layers": layers,
        "norm": {"scale": get("norm.weight")},
        "output": get("output.weight", True),
    }
