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
