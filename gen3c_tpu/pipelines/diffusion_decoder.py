"""Latent diffusion decoder for the AR world-model stack.

Parity: cosmos_predict1/autoregressive/diffusion_decoder/
({model,network,inference}.py) — the AR pipeline's discrete tokens decode
to a coarse video which a latent diffusion model refines: the coarse
video's CV-latent conditions a video diffusion denoiser (channel-concat,
like video2world conditioning) and the refined latent is decoded by the
continuous tokenizer.

Net layout here: in_channels = 16 (noisy latent) + 16 (coarse-video
latent) + 1 (condition mask) = 33.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from gen3c_tpu.diffusion.sampler import arch_invariant_randn, generate_samples
from gen3c_tpu.models.dit import DiTConfig, dit_forward
from gen3c_tpu.models.fsq import DiscreteVideoFSQTokenizer
from gen3c_tpu.models.vae import VideoTokenizer
from gen3c_tpu.utils import log

Array = jax.Array

DIFFUSION_DECODER_7B = DiTConfig(in_channels=16 + 16 + 1)
DIFFUSION_DECODER_TINY = DiTConfig(
    in_channels=16 + 16 + 1,
    model_channels=96,
    num_blocks=2,
    num_heads=4,
    adaln_lora_dim=8,
    dtype=jnp.float32,
)


def _net(bundle, x, t, ctx):
    params, cfg = bundle
    return dit_forward(params, cfg, x, t, ctx, fps=24.0)


@dataclasses.dataclass
class DiffusionDecoderPipeline:
    """tokens -> coarse video -> diffusion-refined video."""

    dit_params: dict
    dit_cfg: DiTConfig
    discrete_tokenizer: DiscreteVideoFSQTokenizer
    continuous_tokenizer: VideoTokenizer
    sigma_data: float = 0.5
    num_steps: int = 15
    guidance: float = 0.0

    def refine(
        self,
        token_indices: Array,  # (B, T', H', W') int
        t5_embeddings: Optional[Array] = None,
        seed: int = 0,
    ) -> Array:
        """Returns refined video (B, 3, T, H, W) in [-1, 1]."""
        log.info("diffusion decoder: decoding discrete tokens...")
        coarse = self.discrete_tokenizer.decode(token_indices)
        log.info("diffusion decoder: encoding coarse conditioning latent...")
        cond_latent = (
            self.continuous_tokenizer.encode(coarse) * self.sigma_data
        )
        B, C, T, H, W = cond_latent.shape
        if t5_embeddings is None:
            t5_embeddings = jnp.zeros((B, 512, 1024), jnp.float32)

        init_noise = np.random.RandomState(seed).standard_normal(
            (B, C, T, H, W)
        ).astype(np.float32)
        # the coarse latent conditions every frame (indicator = 0: no
        # replacement; conditioning is purely channel-concat)
        samples = generate_samples(
            net_fn=_net,
            net_params=(self.dit_params, self.dit_cfg),
            init_noise=jnp.asarray(init_noise),
            augment_noise=jnp.asarray(
                arch_invariant_randn((B, C, T, H, W), seed)
            ),
            crossattn_cond=t5_embeddings,
            crossattn_uncond=jnp.zeros_like(t5_embeddings),
            gt_latent=jnp.zeros_like(cond_latent),
            condition_video_indicator=jnp.zeros((1, 1, T, 1, 1)),
            condition_video_input_mask=jnp.ones(
                (B, 1, T, H, W), jnp.float32
            ),
            pose_latent_cond=cond_latent,
            pose_latent_uncond=jnp.zeros_like(cond_latent),
            num_steps=self.num_steps,
            guidance=self.guidance,
        )
        log.info("diffusion decoder: decoding refined latent...")
        return self.continuous_tokenizer.decode(samples / self.sigma_data)
