"""T5 text encoding for prompt conditioning.

Parity: cosmos_predict1/auxiliary/t5_text_encoder.py — T5-11B ("google-t5/
t5-11b") encoder-only, 512-token padding, embeddings zeroed past each
prompt's length (:48-108); DummyT5TextEncoder returns zeros when the
prompt encoder is disabled (:111-132, the GEN3C CLI default path).

The real encoder runs via HF transformers on the host (text encoding is a
once-per-prompt preprocessing step, not a TPU hot path); embeddings can
also be precomputed offline and passed in directly.
"""

from __future__ import annotations

from typing import List, Optional, Union

import numpy as np


class DummyT5TextEncoder:
    """Zero embeddings (auxiliary/t5_text_encoder.py:111-132 parity)."""

    def __init__(self, max_length: int = 512, embed_dim: int = 1024):
        self.max_length = max_length
        self.embed_dim = embed_dim

    def encode_prompts(self, prompts: Union[str, List[str]], max_length=None):
        if isinstance(prompts, str):
            prompts = [prompts]
        n = max_length or self.max_length
        emb = np.zeros((len(prompts), n, self.embed_dim), np.float32)
        mask = np.zeros((len(prompts), n), np.int64)
        return emb, mask


class CosmosT5TextEncoder:
    """HF transformers T5 encoder (auxiliary/t5_text_encoder.py:28-108)."""

    def __init__(self, model_name: str = "google-t5/t5-11b",
                 cache_dir: Optional[str] = None):
        import torch
        from transformers import T5EncoderModel, T5TokenizerFast

        self._torch = torch
        self.tokenizer = T5TokenizerFast.from_pretrained(
            model_name, cache_dir=cache_dir
        )
        self.text_encoder = T5EncoderModel.from_pretrained(
            model_name, cache_dir=cache_dir
        ).eval()

    def encode_prompts(self, prompts: Union[str, List[str]], max_length=512):
        if isinstance(prompts, str):
            prompts = [prompts]
        assert all(p for p in prompts), "prompts must be non-empty"
        torch = self._torch
        batch = self.tokenizer.batch_encode_plus(
            prompts,
            return_tensors="pt",
            truncation=True,
            padding="max_length",
            max_length=max_length,
            return_length=True,
            return_offsets_mapping=False,
        )
        input_ids = batch.input_ids
        attn_mask = batch.attention_mask
        with torch.no_grad():
            out = self.text_encoder(
                input_ids=input_ids, attention_mask=attn_mask
            ).last_hidden_state
        lengths = attn_mask.sum(dim=1).cpu()
        for i, n_tokens in enumerate(lengths):
            out[i][n_tokens:] = 0  # zero past each prompt's length
        return out.cpu().numpy().astype(np.float32), attn_mask.cpu().numpy()


# ----------------------- TPU-native JAX encoder -----------------------


def t5_encoder_forward(params, ids, mask, num_heads: int,
                       rel_buckets: int = 32, rel_max_dist: int = 128):
    """Original-T5 encoder stack in JAX (the architecture behind
    google-t5/t5-11b: pre-RMSNorm blocks, unscaled attention with a
    shared bucketed relative-position bias on layer 0, ReLU FFN, no
    biases anywhere). ids/mask: (B, L) int. Returns (B, L, D) fp32.

    Parity-tested against transformers' torch T5EncoderModel
    (tests/test_vision_safety.py::test_t5_encoder_parity).
    """
    import jax
    import jax.numpy as jnp

    def rms(x, scale):
        # T5LayerNorm: no mean subtraction, fp32 variance
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x.astype(jnp.float32) * jax.lax.rsqrt(var + 1e-6)
                ) * scale.astype(jnp.float32)

    def rel_bucket(rel):
        # bidirectional bucketing (transformers T5Attention
        #._relative_position_bucket semantics)
        nb = rel_buckets // 2
        big = rel > 0
        rel = jnp.abs(rel)
        max_exact = nb // 2
        is_small = rel < max_exact
        val_large = max_exact + (
            jnp.log(rel.astype(jnp.float32) / max_exact + 1e-9)
            / np.log(rel_max_dist / max_exact)
            * (nb - max_exact)
        ).astype(jnp.int32)
        val_large = jnp.minimum(val_large, nb - 1)
        bucket = jnp.where(is_small, rel, val_large)
        return bucket + jnp.where(big, nb, 0)

    B, L = ids.shape
    h = params["embed"][ids]  # (B, L, D)
    pos = jnp.arange(L)
    rel = pos[None, :] - pos[:, None]  # memory - query
    buckets = rel_bucket(rel)  # (L, L)
    # (L, L, H) -> (1, H, L, L)
    bias = params["rel_bias"][buckets].transpose(2, 0, 1)[None]
    neg = (1.0 - mask[:, None, None, :].astype(jnp.float32)) * -1e9
    bias = bias + neg

    D = h.shape[-1]
    for lp in params["layers"]:
        x = rms(h, lp["ln1"])
        q = (x @ lp["q"]).reshape(B, L, num_heads, -1)
        k = (x @ lp["k"]).reshape(B, L, num_heads, -1)
        v = (x @ lp["v"]).reshape(B, L, num_heads, -1)
        # NOTE: no 1/sqrt(d) — T5 folds the scale into initialization
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) + bias
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, -1)
        h = h + attn @ lp["o"]
        x = rms(h, lp["ln2"])
        h = h + jax.nn.relu(x @ lp["wi"]) @ lp["wo"]
    return rms(h, params["final_ln"])


def convert_hf_t5_encoder(state_dict, dtype=None) -> dict:
    """transformers T5EncoderModel state dict -> JAX param tree. dtype
    defaults to bfloat16 (t5-11b's encoder is ~19 GB in fp32 — over one
    v5e's HBM; norm statistics stay fp32 at runtime regardless)."""
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.bfloat16

    def get(name, transpose=False):
        v = state_dict[name]
        if hasattr(v, "detach"):
            v = v.detach().float().cpu().numpy()
        arr = np.asarray(v)
        return jnp.asarray(arr.T if transpose else arr, dtype)

    n_layers = 0
    while f"encoder.block.{n_layers}.layer.0.SelfAttention.q.weight" in \
            state_dict:
        n_layers += 1
    layers = []
    for i in range(n_layers):
        a = f"encoder.block.{i}.layer.0"
        f = f"encoder.block.{i}.layer.1"
        layers.append({
            "q": get(f"{a}.SelfAttention.q.weight", True),
            "k": get(f"{a}.SelfAttention.k.weight", True),
            "v": get(f"{a}.SelfAttention.v.weight", True),
            "o": get(f"{a}.SelfAttention.o.weight", True),
            "ln1": get(f"{a}.layer_norm.weight"),
            "wi": get(f"{f}.DenseReluDense.wi.weight", True),
            "wo": get(f"{f}.DenseReluDense.wo.weight", True),
            "ln2": get(f"{f}.layer_norm.weight"),
        })
    return {
        "embed": get("shared.weight"),
        "rel_bias": get(
            "encoder.block.0.layer.0.SelfAttention"
            ".relative_attention_bias.weight"
        ),
        "layers": layers,
        "final_ln": get("encoder.final_layer_norm.weight"),
    }


class JaxT5TextEncoder:
    """CosmosT5TextEncoder with the encoder stack on the TPU: HF
    tokenizer on host, T5 transformer as a jitted JAX function (the
    TPU-native alternative to the torch path above)."""

    def __init__(self, model_name: str = "google-t5/t5-11b",
                 cache_dir: Optional[str] = None):
        import jax
        from transformers import T5EncoderModel, T5TokenizerFast

        self.tokenizer = T5TokenizerFast.from_pretrained(
            model_name, cache_dir=cache_dir
        )
        model = T5EncoderModel.from_pretrained(
            model_name, cache_dir=cache_dir
        ).eval()
        self.num_heads = model.config.num_heads
        self.params = convert_hf_t5_encoder(model.state_dict())
        del model
        self._fwd = jax.jit(
            lambda p, ids, mask: t5_encoder_forward(
                p, ids, mask, self.num_heads
            )
        )

    def encode_prompts(self, prompts: Union[str, List[str]], max_length=512):
        import jax
        import jax.numpy as jnp

        if isinstance(prompts, str):
            prompts = [prompts]
        assert all(p for p in prompts), "prompts must be non-empty"
        batch = self.tokenizer.batch_encode_plus(
            prompts,
            return_tensors="np",
            truncation=True,
            padding="max_length",
            max_length=max_length,
        )
        ids = jnp.asarray(batch["input_ids"], jnp.int32)
        mask = jnp.asarray(batch["attention_mask"], jnp.int32)
        out = np.asarray(jax.device_get(self._fwd(self.params, ids, mask)),
                         np.float32)
        out = out * np.asarray(batch["attention_mask"])[..., None]
        return out, np.asarray(batch["attention_mask"], np.int64)


def make_t5_encoder(backend: str = "jax"):
    """T5 encoder factory: 'jax' = TPU-native JAX stack (default),
    'torch' = HF transformers on host, 'dummy' = zeros."""
    from gen3c_tpu.models import t5 as t5mod

    if backend == "dummy":
        return t5mod.DummyT5TextEncoder()
    if backend == "torch":
        return t5mod.CosmosT5TextEncoder()
    return t5mod.JaxT5TextEncoder()
