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
  * JaxPromptUpsampler: the TPU-native text-only path — the JAX
    ar_transformer running a Mistral/Pixtral-style chat LM
    (checkpoint-gated, int8-quantizable for single-chip 12B serving)
  * VLMPromptUpsampler: the frames-conditioned reference behavior —
    the JAX Pixtral vision tower (aux/vision_encoder.py) splices image
    embeddings into the chat stream at the [IMG] placeholder and
    generation runs on embeddings-prefill (video2world parity)
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
        from gen3c_tpu.models.quantize import maybe_quantized_convert

        self.params = maybe_quantized_convert(
            lambda: convert_hf_llama(model.state_dict(), self.cfg)
        )
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


class VLMPromptUpsampler(PromptUpsampler):
    """Frames-conditioned (video2world) prompt upsampler: the TPU-native
    equivalent of the reference's Pixtral-12B path
    (video2world_prompt_upsampler_inference.py:40-105). The LAST frame is
    resized (resize_image parity, :62-70), encoded by the JAX Pixtral
    vision tower (aux/vision_encoder.py), projected into the text
    embedding space, and spliced into the chat stream at the [IMG]
    placeholder (prepare_dialog parity, :73-95); generation runs on the
    in-house JAX AR stack from the spliced embeddings."""

    # prepare_dialog's instruction, verbatim semantics
    INSTRUCTION = (
        "Your task is to transform a given prompt into a refined and "
        "concise video description, no more than 150 words. Focus only "
        "on the content, no filler words or descriptions on the style. "
        "Never mention things outside the video."
    )
    # HF Pixtral processor normalization (OpenAI-CLIP statistics)
    IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
    IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)

    def __init__(self, text_params, text_cfg, vision_params, vision_cfg,
                 tokenizer, image_token_id: int,
                 max_new_tokens: int = 400, image_max_size: int = 1024):
        self.text_params = text_params
        self.text_cfg = text_cfg
        self.vision_params = vision_params
        self.vision_cfg = vision_cfg
        self.tokenizer = tokenizer
        self.image_token_id = int(image_token_id)
        self.max_new_tokens = max_new_tokens
        self.image_max_size = image_max_size

    def _prepare_frame(self, frames):
        """Last frame -> (3, H, W) normalized, H/W multiples of the
        vision patch size, longest side <= image_max_size."""
        import numpy as np

        fr = np.asarray(frames)
        if fr.ndim == 4:  # (T, H, W, 3): condition on the LAST frame
            fr = fr[-1]
        if fr.dtype == np.uint8:
            fr = fr.astype(np.float32) / 255.0
        h, w = fr.shape[:2]
        ratio = max(h / self.image_max_size, w / self.image_max_size, 1.0)
        P = self.vision_cfg.patch_size
        nh = max(P, int(round(h / ratio / P)) * P)
        nw = max(P, int(round(w / ratio / P)) * P)
        if (nh, nw) != (h, w):
            import jax.image

            fr = np.asarray(
                jax.image.resize(jnp_asarray(fr), (nh, nw, 3), "bilinear")
            )
        mean = np.asarray(self.IMAGE_MEAN, np.float32)
        std = np.asarray(self.IMAGE_STD, np.float32)
        fr = (fr - mean) / std
        return np.ascontiguousarray(fr.transpose(2, 0, 1))

    def _chat_ids(self, prompt: str):
        import numpy as np

        user = "[IMG]\n" + self.INSTRUCTION + "\n" + prompt
        tok = self.tokenizer
        if getattr(tok, "chat_template", None):
            ids = tok.apply_chat_template(
                [{"role": "user", "content": user}],
                return_tensors="np", add_generation_prompt=True,
            )
            return np.asarray(ids).reshape(-1)
        return np.asarray(tok.encode(user), np.int32).reshape(-1)

    def upsample(self, prompt: str, frames=None) -> str:
        import numpy as np

        import jax
        import jax.numpy as jnp

        from gen3c_tpu.aux.vision_encoder import vision_encode
        from gen3c_tpu.models.ar_transformer import (
            generate_bucketed,
            generate_with_embeddings_bucketed,
        )

        ids = self._chat_ids(prompt)
        if frames is None:
            # text-only fallback (text2world semantics)
            ids = ids[ids != self.image_token_id]
            out = generate_bucketed(
                self.text_params, self.text_cfg,
                ids[None], jax.random.PRNGKey(0),
                max_new_tokens=self.max_new_tokens, temperature=0.0,
                pad_id=int(getattr(self.tokenizer, "eos_token_id", 0) or 0),
            )
            new = np.asarray(out)[0][out.shape[1] - self.max_new_tokens:]
        else:
            frame = self._prepare_frame(frames)
            img_emb = vision_encode(
                self.vision_params, self.vision_cfg, jnp.asarray(frame)
            )  # (Lv, D_text)
            from gen3c_tpu.models.ar_transformer import _embed

            tok_emb = _embed(
                self.text_params["tok_embeddings"],
                jnp.asarray(ids, jnp.int32), jnp.float32,
            )  # (L, D_text) — handles int8-quantized tables too
            where = np.nonzero(ids == self.image_token_id)[0]
            if where.size:
                # replace the [IMG] placeholder token with the image
                pos = int(where[0])
                parts = [tok_emb[:pos], img_emb.astype(tok_emb.dtype),
                         tok_emb[pos + 1:]]
            else:
                # no placeholder id (e.g. a tokenizer that encodes
                # "[IMG]" as plain text): PREPEND the image tokens —
                # never drop a real token
                parts = [img_emb.astype(tok_emb.dtype), tok_emb]
            spliced = jnp.concatenate(parts, axis=0)[None]
            budget = self.text_cfg.max_seq_len - self.max_new_tokens
            if spliced.shape[1] > budget:
                raise ValueError(
                    f"spliced prompt {spliced.shape[1]} tokens exceeds "
                    f"max_seq_len budget {budget}; resize the image down"
                )
            new = np.asarray(
                generate_with_embeddings_bucketed(
                    self.text_params, self.text_cfg, spliced,
                    jax.random.PRNGKey(0),
                    max_new_tokens=self.max_new_tokens, temperature=0.0,
                )
            )[0]
        eos = getattr(self.tokenizer, "eos_token_id", None)
        if eos is not None:
            stop = np.nonzero(new == eos)[0]
            if stop.size:
                new = new[: stop[0]]
        text = self.tokenizer.decode(
            new.tolist(), skip_special_tokens=True
        ).strip()
        return text or prompt

    @classmethod
    def from_pretrained(cls, model_path: str, max_new_tokens: int = 400):
        """Load an HF Llava-style Pixtral checkpoint: language_model.*
        through convert_hf_llama, vision_tower.* + multi_modal_projector.*
        through convert_hf_pixtral_vision."""
        import jax.numpy as jnp
        from transformers import AutoConfig, AutoTokenizer

        from gen3c_tpu.aux.vision_encoder import (
            VisionConfig,
            convert_hf_pixtral_vision,
        )
        from gen3c_tpu.models.ar_transformer import ARConfig
        from gen3c_tpu.models.convert import convert_hf_llama

        tokenizer = AutoTokenizer.from_pretrained(model_path)
        hf = AutoConfig.from_pretrained(model_path)
        text_hf = getattr(hf, "text_config", hf)
        vis_hf = getattr(hf, "vision_config", None)
        if vis_hf is None:
            raise ValueError(f"{model_path} has no vision tower")
        from transformers import AutoModelForImageTextToText

        model = AutoModelForImageTextToText.from_pretrained(model_path)
        sd = model.state_dict()
        del model
        text_sd = {
            k[len("language_model."):]: v
            for k, v in sd.items()
            if k.startswith("language_model.")
        }
        text_cfg = ARConfig(
            dim=text_hf.hidden_size,
            n_layers=text_hf.num_hidden_layers,
            n_heads=text_hf.num_attention_heads,
            n_kv_heads=text_hf.num_key_value_heads,
            vocab_size=text_hf.vocab_size,
            ffn_hidden_size=text_hf.intermediate_size,
            norm_eps=text_hf.rms_norm_eps,
            rope_theta=text_hf.rope_theta,
            max_seq_len=4300,  # reference max_seq_len, :53
            use_qk_normalization=False,
            dtype=jnp.bfloat16,
        )
        from gen3c_tpu.models.quantize import maybe_quantized_convert

        text_params = maybe_quantized_convert(
            lambda: convert_hf_llama(text_sd, text_cfg)
        )
        vision_cfg = VisionConfig(
            hidden_size=vis_hf.hidden_size,
            num_layers=vis_hf.num_hidden_layers,
            num_heads=vis_hf.num_attention_heads,
            intermediate_size=vis_hf.intermediate_size,
            patch_size=vis_hf.patch_size,
            image_size=vis_hf.image_size,
            rope_theta=getattr(vis_hf, "rope_theta", 10000.0),
            text_hidden_size=text_hf.hidden_size,
            dtype=jnp.bfloat16,
        )
        vision_params = convert_hf_pixtral_vision(sd, vision_cfg)
        return cls(
            text_params, text_cfg, vision_params, vision_cfg, tokenizer,
            image_token_id=getattr(hf, "image_token_index", 10),
            max_new_tokens=max_new_tokens,
        )


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


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
            from gen3c_tpu.utils import log

            try:
                # frames-conditioned VLM path (video2world semantics)
                return VLMPromptUpsampler.from_pretrained(path)
            except (KeyError, AttributeError, ValueError,
                    OSError, RuntimeError) as e:
                log.warning(
                    f"VLM upsampler unavailable ({e}); text-only JAX path"
                )
            try:
                return JaxPromptUpsampler(path)
            except (KeyError, AttributeError, ValueError,
                    OSError, RuntimeError) as e:
                # non-llama-architecture checkpoint: fall back to torch
                log.warning(
                    f"JAX upsampler unavailable ({e}); torch fallback"
                )
                return HFPromptUpsampler(path)
    return TemplateUpsampler()
