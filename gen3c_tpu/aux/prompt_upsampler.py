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


def create_prompt_upsampler(
    checkpoint_dir: Optional[str] = None, enabled: bool = False
) -> PromptUpsampler:
    if not enabled:
        return PassthroughUpsampler()
    if checkpoint_dir:
        import os

        path = os.path.join(checkpoint_dir, "Pixtral-12B")
        if os.path.isdir(path):
            return HFPromptUpsampler(path)
    return TemplateUpsampler()
