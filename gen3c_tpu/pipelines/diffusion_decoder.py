"""Latent diffusion decoder for the AR world-model stack.

Parity: cosmos_predict1/autoregressive/diffusion_decoder/
{model,network,inference,utils}.py + the production experiment node
config/inference/cosmos_diffusiondecoder_7b.py
("DD_FT_7Bv1_003_002_tokenizer888_spatch2_discrete_cond_on_token"):

  * the model is DISCRETE-TOKEN conditioned
    (condition_on_tokenizer_corruptor_token=True): the AR tokens are
    embedded by a learned table (vocab 64000, dim 32,
    network.py:61-63,145-148), bilinearly resized from the token grid
    (H/16) to the latent grid (H/8) and channel-concatenated to the
    noisy latent (network.py:178-191) — the coarse DV-decoded video is
    never re-encoded;
  * corruption is OFF at inference (cond_sigma_low/high=0,
    corrupt_prob=0 in the experiment node; apply_corruptor=False at
    inference.py:100) and the sigma channel is absent
    (diffusion_decoder_condition_on_sigma=False), so latent_condition
    reaches the net unmodified;
  * CFG uncondition DROPS the token conditioning (conditioner
    latent_condition dropout_rate=0.2 -> zeroed tokens -> embedding
    row 0; conditioner.py:260-262, config node line 72-74);
  * scheduler EDMEulerScheduler(sigma_max=80, sigma_min=0.02)
    (model.py:84), plain T2W EDM-Euler CFG loop with NO re-noise /
    frame replacement (model.py:100-146);
  * long videos: token-T split into latent chunks of
    (57-1)/8+1 = 8 frames with overlap 2 (reflect-padded tail,
    utils.py:19-58), each refined independently, pixel outputs
    linear-blended over the overlap (utils.py:61-119; note the
    reference blends D=overlap PIXEL frames even though the chunk
    overlap was in latent frames — replicated as-is);
  * sampling defaults from DiffusionDecoderSamplingConfig
    (configs/inference/inference_config.py:53-77): guidance 1.8,
    num_steps 15, 57-frame chunks, max_iter 99.

Oracle: tests/test_diffusion_decoder_parity.py runs the reference
LatentDiffusionDecoderModel.generate_samples_from_batch (torch CPU)
against refine() with shared converted weights.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from gen3c_tpu.diffusion.sampler import arch_invariant_randn, generate_samples
from gen3c_tpu.diffusion.scheduler import EDMEulerSchedule
from gen3c_tpu.models.dit import DiTConfig, dit_forward
from gen3c_tpu.models.vae import VideoTokenizer
from gen3c_tpu.utils import log

Array = jax.Array

TOKEN_VOCAB_SIZE = 64000  # diffusion_decoder_token_condition_voc_size
TOKEN_CONDITION_DIM = 32  # diffusion_decoder_token_condition_dim

# x (16) + token embedding (32); dit_forward appends the padding-mask
# channel itself (concat_padding_mask), matching the reference
# build_patch_embed arithmetic 16+32+1=49 (network.py:124-136)
DIFFUSION_DECODER_7B = DiTConfig(
    in_channels=16 + TOKEN_CONDITION_DIM,
    rope_h_extrapolation_ratio=1.5,
    rope_w_extrapolation_ratio=1.5,
    rope_t_extrapolation_ratio=1.0,
)
DIFFUSION_DECODER_TINY = DiTConfig(
    in_channels=16 + TOKEN_CONDITION_DIM,
    model_channels=96,
    num_blocks=2,
    num_heads=4,
    adaln_lora_dim=8,
    dtype=jnp.float32,
)


@dataclasses.dataclass
class DDSamplingConfig:
    """DiffusionDecoderSamplingConfig parity (inference_config.py:53-77)."""

    guidance: float = 1.8
    sigma_min: float = 0.02
    num_steps: int = 15
    overlap: int = 2  # latent-frame overlap between token chunks
    dd_train_num_video_frames: int = 57
    max_iter: int = 99
    fps: int = 24


def split_with_overlap(
    tokens: Array, num_frames: int, overlap: int = 2
) -> List[Array]:
    """Split (B, C, T, H, W) along T into num_frames chunks with overlap;
    the last chunk is REFLECT-padded to full length (utils.py:19-58)."""
    assert overlap < num_frames
    T = tokens.shape[2]
    step = num_frames - overlap
    chunks = []
    for start in range(0, max(T - overlap, 1), step):
        end = start + num_frames
        if end > T:
            pad = end - T
            body_len = T - start
            if pad >= body_len:
                # torch F.pad(mode="reflect") raises for pad >= dim —
                # fail loudly instead of silently producing a short chunk
                raise ValueError(
                    f"split_with_overlap: reflect pad {pad} >= chunk "
                    f"body {body_len} (T={T}, num_frames={num_frames}, "
                    f"overlap={overlap})"
                )
            body = tokens[:, :, start:T]
            # torch F.pad mode="reflect" on the T axis
            refl = body[:, :, -2 : -2 - pad : -1]
            chunks.append(jnp.concatenate([body, refl], axis=2))
        else:
            chunks.append(tokens[:, :, start:end])
    return chunks


def linear_blend_video_list(videos: List[Array], d: int) -> Array:
    """Blend N equal-length (B, C, t, H, W) videos with linspace weights
    over d overlapping frames (utils.py:61-119)."""
    assert len(videos) >= 2
    b, c, t, h, w = videos[0].shape
    out = [videos[0][:, :, : t - d]]
    weights = jnp.linspace(0.0, 1.0, d).reshape(1, 1, d, 1, 1)
    for i in range(1, len(videos)):
        prev_tail = videos[i - 1][:, :, t - d :]
        curr_head = videos[i][:, :, :d]
        out.append(prev_tail * (1 - weights) + curr_head * weights)
        if i < len(videos) - 1:
            if t - 2 * d > 0:
                out.append(videos[i][:, :, d : t - d])
        else:
            out.append(videos[i][:, :, d:])
    return jnp.concatenate(out, axis=2)


def embed_tokens(
    token_embedding: Array,  # (vocab, dim)
    token_indices: Array,  # (B, T', H', W') int
    latent_hw: tuple,  # (H, W) of the continuous latent grid
) -> Array:
    """Reference token conditioning (network.py:178-187): embed, then
    bilinearly resize each (H', W') frame to the latent grid ->
    (B, dim, T', H, W)."""
    emb = token_embedding[token_indices]  # (B, T', H', W', D)
    emb = jnp.transpose(emb, (0, 1, 4, 2, 3))  # (B, T', D, H', W')
    B, T, D, Hs, Ws = emb.shape
    resized = jax.image.resize(
        emb.reshape(B * T, D, Hs, Ws),
        (B * T, D) + tuple(latent_hw),
        method="bilinear",
    )
    return jnp.transpose(
        resized.reshape(B, T, D, *latent_hw), (0, 2, 1, 3, 4)
    )


def init_dd_params(
    key: Array,
    cfg: DiTConfig,
    vocab_size: int = TOKEN_VOCAB_SIZE,
    token_dim: int = TOKEN_CONDITION_DIM,
    dtype=jnp.float32,
) -> dict:
    """DiT params + the token-embedding table. (The reference inits the
    table to ZERO before fine-tuning, network.py:49-52; random here so
    tests exercise a non-degenerate conditioning path.)"""
    from gen3c_tpu.models.dit import init_dit_params

    params = init_dit_params(key, cfg, dtype)
    params["token_embedder.weight"] = (
        jax.random.normal(jax.random.fold_in(key, 101),
                          (vocab_size, token_dim), dtype) * 0.02
    )
    return params


def _net(bundle, x, t, ctx):
    params, cfg = bundle
    return dit_forward(params, cfg, x, t, ctx, fps=24.0)


@dataclasses.dataclass
class DiffusionDecoderPipeline:
    """AR tokens -> diffusion-refined video (the reference
    diffusion_decoder_process_tokens flow, inference.py:30-117)."""

    dit_params: dict  # includes "token_embedder.weight" (vocab, dim)
    dit_cfg: DiTConfig
    continuous_tokenizer: VideoTokenizer
    sigma_data: float = 0.5
    sampling: DDSamplingConfig = dataclasses.field(
        default_factory=DDSamplingConfig
    )
    # latent-grid / token-grid spatial ratio: 2 in production (DV8x16x16
    # tokens vs CV8x8x8 latents; the reference resizes to whatever the
    # noisy latent's spatial dims are, network.py:182-186)
    token_to_latent_scale: int = 2

    def _refine_chunk(
        self,
        token_chunk: Array,  # (B, 1, T', H', W') int
        t5_embeddings: Array,
        seed: int,
    ) -> Array:
        """One chunk through the EDM loop; returns the refined LATENT."""
        cfg = self.sampling
        B = token_chunk.shape[0]
        T = token_chunk.shape[2]
        H = token_chunk.shape[3] * self.token_to_latent_scale
        W = token_chunk.shape[4] * self.token_to_latent_scale
        C = self.continuous_tokenizer.latent_ch

        emb_table = self.dit_params["token_embedder.weight"]
        cond = embed_tokens(emb_table, token_chunk[:, 0], (H, W))
        # CFG drops the token conditioning: zeroed tokens -> embedding
        # row 0 (conditioner latent_condition dropout; NOT zero channels)
        uncond = embed_tokens(
            emb_table, jnp.zeros_like(token_chunk[:, 0]), (H, W)
        )

        init_noise = np.random.RandomState(seed).standard_normal(
            (B, C, T, H, W)
        ).astype(np.float32)
        return generate_samples(
            net_fn=_net,
            net_params=(self.dit_params, self.dit_cfg),
            init_noise=jnp.asarray(init_noise),
            augment_noise=jnp.asarray(
                arch_invariant_randn((B, C, T, H, W), seed)
            ),
            crossattn_cond=t5_embeddings,
            crossattn_uncond=t5_embeddings * 0.0,
            gt_latent=jnp.zeros((B, C, T, H, W), jnp.float32),
            # indicator 0 = plain T2W loop, no re-noise/replacement
            condition_video_indicator=jnp.zeros((1, 1, T, 1, 1)),
            condition_video_input_mask=None,  # DD net has no mask channel
            pose_latent_cond=cond,
            pose_latent_uncond=uncond,
            num_steps=cfg.num_steps,
            guidance=cfg.guidance,
            schedule=EDMEulerSchedule(sigma_min=cfg.sigma_min),
        )

    def refine(
        self,
        token_indices: Array,  # (B, T', H', W') int — AR tokens
        t5_embeddings: Optional[Array] = None,
        seed: int = 0,
    ) -> Array:
        """Returns refined video (B, 3, T, H, W) in [-1, 1]."""
        cfg = self.sampling
        B = token_indices.shape[0]
        if t5_embeddings is None:
            t5_embeddings = jnp.zeros((B, 512, 1024), jnp.float32)

        latent_frames = (cfg.dd_train_num_video_frames - 1) // 8 + 1
        token_5d = token_indices[:, None]  # (B, 1, T', H', W')
        if token_indices.shape[1] == latent_frames:
            chunks = [token_5d]
        else:
            # ALWAYS run the split: a short T' (< latent_frames) must
            # still be reflect-padded to the full chunk, or the refined
            # latent's T breaks the CV tokenizer's chunk arithmetic
            # (decode asserts T % latent_chunk_duration == 0); callers
            # trim the decoded pixels back to their true length like the
            # reference's [:T] (inference.py:108-111)
            chunks = split_with_overlap(
                token_5d, latent_frames, overlap=cfg.overlap
            )[: cfg.max_iter]

        pixel_chunks = []
        for i, chunk in enumerate(chunks):
            log.info(
                f"diffusion decoder: refining chunk {i + 1}/{len(chunks)}"
            )
            latent = self._refine_chunk(chunk, t5_embeddings, seed)
            pixel = self.continuous_tokenizer.decode(
                latent / self.sigma_data
            )
            pixel_chunks.append(jnp.clip(pixel, -1.0, 1.0))

        if len(pixel_chunks) == 1:
            return pixel_chunks[0]
        # reference blends D=overlap PIXEL frames (inference.py:108-111)
        return linear_blend_video_list(pixel_chunks, cfg.overlap)


def build_dd_pipeline(
    preset: str, key: Array, checkpoint_dir: Optional[str] = None
) -> DiffusionDecoderPipeline:
    """Preset DD pipelines for the AR CLI (reference _load_diffusion_decoder,
    world_generation_pipeline.py:222-244).

    'ar_tiny' pairs the tiny DD net with a tiny CV tokenizer at the same
    8x spatial compression as DV_TINY (token_to_latent_scale=1), random
    init allowed. Full-size presets are CHECKPOINT-GATED: the 7B DD net
    needs a converted checkpoint (<checkpoint_dir>/gen3c_tpu/dd_dit.npz
    from the reference Cosmos-1.0-Diffusion-7B-Decoder torch ckpt) —
    a random 7B DD would be ~14 GB of noise weights, so construction
    raises and the AR CLI falls back to the plain DV decode."""
    import os

    from gen3c_tpu.models.vae import CV8x8x8, VAEConfig, init_vae_params

    if preset == "ar_tiny":
        dit_cfg = DIFFUSION_DECODER_TINY
        cv_cfg = VAEConfig(
            channels=16, channels_mult=(2, 4, 4), num_res_blocks=1,
            attn_resolutions=(), resolution=256, patch_size=4,
            latent_channels=16, z_channels=16,
        )
        sampling = DDSamplingConfig(dd_train_num_video_frames=9, overlap=1)
        scale, vocab = 1, 64000
        dit_params = init_dd_params(key, dit_cfg, vocab_size=vocab)
        cv_params = init_vae_params(jax.random.fold_in(key, 7), cv_cfg)
    else:
        dit_cfg = DIFFUSION_DECODER_7B
        cv_cfg = CV8x8x8
        sampling = DDSamplingConfig()
        scale, vocab = 2, TOKEN_VOCAB_SIZE
        dd_native = os.path.join(
            checkpoint_dir or "", "gen3c_tpu", "dd_dit.npz"
        )
        if not (checkpoint_dir and os.path.exists(dd_native)):
            raise FileNotFoundError(
                "diffusion-decoder checkpoint not found "
                f"({dd_native}); the full-size DD is checkpoint-gated "
                "(convert the reference Cosmos-1.0-Diffusion-7B-Decoder "
                "weights with models.convert + save_params_npz)"
            )
        from gen3c_tpu.utils import checkpoint as ckpt

        dit_params = ckpt.load_params_npz_tree(dd_native)
        vae_native = os.path.join(checkpoint_dir, "gen3c_tpu", "vae.npz")
        if os.path.exists(vae_native):
            cv_params = {
                k2: jnp.asarray(a)
                for k2, a in ckpt.load_flat_npz(vae_native).items()
            }
        else:
            log.warning("DD continuous tokenizer: RANDOM init (no vae.npz)")
            cv_params = init_vae_params(jax.random.fold_in(key, 7), cv_cfg)
    return DiffusionDecoderPipeline(
        dit_params=dit_params,
        dit_cfg=dit_cfg,
        continuous_tokenizer=VideoTokenizer(
            cv_params, cv_cfg,
            pixel_chunk_duration=sampling.dd_train_num_video_frames,
        ),
        sampling=sampling,
        token_to_latent_scale=scale,
    )
