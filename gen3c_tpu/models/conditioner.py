"""Condition containers + CFG pairing for video-extend / GEN3C models.

Parity targets (reference: cosmos_predict1/diffusion/conditioner.py):
  * ``VideoExtendCondition`` dataclass fields — conditioner.py:123-134
  * CFG pairing (get_condition_uncondition semantics) — conditioner.py:234-292:
    at inference the conditioned pass uses the real text embeddings; the
    unconditioned pass zeroes them (text dropout_rate=0.2 -> rate 1.0) or
    uses negative-prompt embeddings; the GEN3C pose latents are zeroed for
    the unconditioned pass (model_gen3c.py:104, 126-128).
  * condition_video_indicator / input_mask construction —
    model_v2w.py:32-82 (first num_condition_t latent frames).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass
class VideoExtendCondition:
    """Everything the denoiser consumes besides (x, t)."""

    crossattn_emb: Array  # (B, M, 1024)
    gt_latent: Optional[Array] = None  # (B, C, T, H, W)
    condition_video_indicator: Optional[Array] = None  # (B, 1, T, 1, 1)
    condition_video_input_mask: Optional[Array] = None  # (B, 1, T, H, W)
    condition_video_pose: Optional[Array] = None  # (B, 64, T, H, W)
    video_cond_bool: bool = True


def add_condition_video_indicator_and_input_mask(
    latent_state: Array,
    condition: VideoExtendCondition,
    num_condition_t: int,
    condition_location: str = "first_n",
) -> VideoExtendCondition:
    """Mark the condition region in latent time.

    Parity: DiffusionV2WModel.add_condition_video_indicator_and_video_input_mask
    (model_v2w.py:32-82) for "first_n"; "first_and_last_1" is the
    world-interpolator variant (model_world_interpolator.py): both the
    first num_condition_t and the last latent frame are conditioned.
    """
    B, C, T, H, W = latent_state.shape
    dtype = latent_state.dtype
    indicator = jnp.zeros((1, 1, T, 1, 1), dtype)
    indicator = indicator.at[:, :, :num_condition_t].set(1.0)
    if condition_location == "first_and_last_1":
        indicator = indicator.at[:, :, -1:].set(1.0)
    elif condition_location != "first_n":
        raise ValueError(f"Unknown condition_location {condition_location}")
    condition.gt_latent = latent_state
    condition.condition_video_indicator = indicator
    if condition.video_cond_bool:
        condition.condition_video_input_mask = jnp.broadcast_to(
            indicator, (B, 1, T, H, W)
        ).astype(dtype)
    else:
        condition.condition_video_input_mask = jnp.zeros((B, 1, T, H, W), dtype)
    return condition


def make_condition_pair(
    latent_state: Array,
    t5_embeddings: Array,
    num_condition_t: int,
    pose_latent: Optional[Array] = None,
    neg_t5_embeddings: Optional[Array] = None,
    add_input_frames_guidance: bool = False,
):
    """Build (condition, uncondition) for CFG.

    Parity: DiffusionGen3CModel._get_conditions (model_gen3c.py:59-113):
    uncond text = zeros (or negative prompt), uncond pose = zeros.
    """
    cond = VideoExtendCondition(crossattn_emb=t5_embeddings, video_cond_bool=True)
    cond = add_condition_video_indicator_and_input_mask(
        latent_state, cond, num_condition_t
    )
    if pose_latent is not None:
        cond.condition_video_pose = pose_latent

    uncond_text = (
        jnp.zeros_like(t5_embeddings)
        if neg_t5_embeddings is None
        else neg_t5_embeddings
    )
    uncond = VideoExtendCondition(
        crossattn_emb=uncond_text,
        video_cond_bool=not add_input_frames_guidance,
    )
    uncond = add_condition_video_indicator_and_input_mask(
        latent_state, uncond, num_condition_t
    )
    if pose_latent is not None:
        uncond.condition_video_pose = jnp.zeros_like(pose_latent)
    return cond, uncond
