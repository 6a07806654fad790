"""Prompt upsampler interface (Pixtral-12B in the reference).

Parity: cosmos_predict1/diffusion/prompt_upsampler/ — a 12B VLM rewrites
short prompts into detailed ones (text2world: text-only; video2world:
conditioned on frames). Disabled by default for GEN3C
(gen3c_single_image.py:492). Here:

  * PromptUpsampler: the interface
  * PassthroughUpsampler: identity (the default / disabled behavior)
  * TemplateUpsampler: dependency-free heuristic enrichment for smoke use
  * HFPromptUpsampler: any HF causal LM as the upsampler when its
    checkpoint is available (replaces the in-repo AutoRegressiveModel
    chat-completion plumbing, text2world_prompt_upsampler_inference.py)
"""

from __future__ import annotations

from typing import Optional


class PromptUpsampler:
    def upsample(self, prompt: str, frames=None) -> str:
        raise NotImplementedError


class PassthroughUpsampler(PromptUpsampler):
    def upsample(self, prompt: str, frames=None) -> str:
        return prompt


class TemplateUpsampler(PromptUpsampler):
    """Heuristic enrichment (keeps CLI flows exercisable w/o a 12B VLM)."""

    TEMPLATE = (
        "{prompt}. The video is photorealistic with natural lighting, "
        "consistent geometry and smooth, stable camera motion."
    )

    def upsample(self, prompt: str, frames=None) -> str:
        prompt = prompt.strip().rstrip(".")
        if not prompt:
            return "A photorealistic scene with natural lighting."
        return self.TEMPLATE.format(prompt=prompt)


class HFPromptUpsampler(PromptUpsampler):
    """Causal-LM-based upsampling via transformers (chat-completion
    pattern of run_chat_completion, text2world_prompt_upsampler_
    inference.py:26-149)."""

    SYSTEM = (
        "You are a prompt engineer. Expand the user's short video prompt "
        "into one detailed, photorealistic description. Reply with the "
        "expanded prompt only."
    )

    def __init__(self, model_path: str, max_new_tokens: int = 256):
        from transformers import AutoModelForCausalLM, AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.model = AutoModelForCausalLM.from_pretrained(model_path)
        self.max_new_tokens = max_new_tokens

    def upsample(self, prompt: str, frames=None) -> str:
        import torch

        chat = [
            {"role": "system", "content": self.SYSTEM},
            {"role": "user", "content": prompt},
        ]
        ids = self.tokenizer.apply_chat_template(
            chat, return_tensors="pt", add_generation_prompt=True
        )
        with torch.no_grad():
            out = self.model.generate(
                ids,
                max_new_tokens=self.max_new_tokens,
                do_sample=False,
                pad_token_id=self.tokenizer.eos_token_id,
            )
        return self.tokenizer.decode(
            out[0][ids.shape[-1]:], skip_special_tokens=True
        ).strip()


class JaxPromptUpsampler(PromptUpsampler):
    """Upsampler LLM on the in-house JAX llama stack (TPU-native; works
    for llama/mistral-architecture text checkpoints — Pixtral-12B's text
    tower is mistral-arch). Same chat-completion semantics as
    HFPromptUpsampler; conversion via models.convert.convert_hf_llama."""

    SYSTEM = HFPromptUpsampler.SYSTEM

    def __init__(self, model_path: str, max_new_tokens: int = 256,
                 max_seq_len: int = 1024):
        import jax.numpy as jnp
        from transformers import AutoConfig, AutoModelForCausalLM, AutoTokenizer

        from gen3c_tpu.models.ar_transformer import ARConfig
        from gen3c_tpu.models.convert import convert_hf_llama

        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        hf = AutoConfig.from_pretrained(model_path)
        if hasattr(hf, "text_config"):  # multimodal wrapper (Pixtral)
            hf = hf.text_config
        rs = getattr(hf, "rope_scaling", None)
        self.cfg = ARConfig(
            dim=hf.hidden_size,
            n_layers=hf.num_hidden_layers,
            n_heads=hf.num_attention_heads,
            n_kv_heads=hf.num_key_value_heads,
            vocab_size=hf.vocab_size,
            ffn_hidden_size=hf.intermediate_size,
            norm_eps=hf.rms_norm_eps,
            rope_theta=hf.rope_theta,
            max_seq_len=max_seq_len,
            use_qk_normalization=False,
            rope_scaling=(
                (rs["factor"], rs["low_freq_factor"],
                 rs["high_freq_factor"],
                 rs["original_max_position_embeddings"])
                if isinstance(rs, dict) and rs.get("rope_type") == "llama3"
                else None
            ),
            dtype=jnp.bfloat16,
        )
        model = AutoModelForCausalLM.from_pretrained(model_path)
        self.params = convert_hf_llama(model.state_dict(), self.cfg)
        del model
        self.max_new_tokens = max_new_tokens

    def upsample(self, prompt: str, frames=None) -> str:
        import numpy as np

        import jax
        import jax.numpy as jnp

        from gen3c_tpu.models.ar_transformer import generate_bucketed

        chat = [
            {"role": "system", "content": self.SYSTEM},
            {"role": "user", "content": prompt},
        ]
        ids = np.asarray(
            self.tokenizer.apply_chat_template(
                chat, return_tensors="np", add_generation_prompt=True
            )
        )
        limit = self.cfg.max_seq_len - self.max_new_tokens
        if ids.shape[1] > limit:
            # keep head + tail: the chat template's generation prompt is
            # at the end and must survive truncation
            head = limit // 2
            ids = np.concatenate(
                [ids[:, :head], ids[:, -(limit - head):]], axis=1
            )
        # bucketed left-padding: one compiled trace per 128-token bucket
        # instead of one per distinct prompt length
        out = generate_bucketed(
            self.params, self.cfg, jnp.asarray(ids, jnp.int32),
            jax.random.PRNGKey(0), max_new_tokens=self.max_new_tokens,
            temperature=0.0,
            pad_id=int(self.tokenizer.eos_token_id or 0),
        )
        text = self.tokenizer.decode(
            np.asarray(out)[0][out.shape[1] - self.max_new_tokens:],
            skip_special_tokens=True,
        ).strip()
        return text or prompt


def create_prompt_upsampler(
    checkpoint_dir: Optional[str] = None, enabled: bool = False,
    backend: str = "jax",
) -> PromptUpsampler:
    if not enabled:
        return PassthroughUpsampler()
    if checkpoint_dir:
        import os

        path = os.path.join(checkpoint_dir, "Pixtral-12B")
        if os.path.isdir(path):
            if backend != "jax":
                return HFPromptUpsampler(path)
            try:
                return JaxPromptUpsampler(path)
            except (KeyError, AttributeError, ValueError,
                    OSError, RuntimeError) as e:
                # non-llama-architecture checkpoint: fall back to torch
                from gen3c_tpu.utils import log

                log.warning(
                    f"JAX upsampler unavailable ({e}); torch fallback"
                )
                return HFPromptUpsampler(path)
    return TemplateUpsampler()
