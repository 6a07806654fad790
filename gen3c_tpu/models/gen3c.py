"""DiffusionGen3CModel: the GEN3C denoiser wrapper, TPU-native.

Parity target: cosmos_predict1/diffusion/model/model_gen3c.py (+ the
model_t2w/v2w base classes it inherits):

  * encode/decode scale latents by sigma_data=0.5 (model_t2w.py:123-145)
  * encode_warped_frames: per-buffer VAE encode of the warped RGB video
    and its mask video (mask*2-1, repeated to 3 channels), 16+16 latent
    channels per buffer, zero-padded to frame_buffer_max buffers
    (model_gen3c.py:32-57)
  * generate_samples_from_batch: EDM-Euler loop with CFG and
    conditioned-region replacement (model_v2w.py:84-155), via
    gen3c_tpu.diffusion.sampler (whole loop in one jit)
  * condition-latent creation: last k seed frames zero-padded to the
    121-frame pixel chunk, then encoded (inference_utils.py:696-758)
  * num-latent-frame arithmetic (inference_utils.py:667-694)

The CFG condition broadcast of the reference (broadcast_condition,
NCCL) is unnecessary here: conditions are replicated by sharding
annotations when a mesh is active (gen3c_tpu.parallel).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gen3c_tpu.diffusion.sampler import arch_invariant_randn, generate_samples
from gen3c_tpu.diffusion.scheduler import EDMEulerSchedule
from gen3c_tpu.models.dit import DiTConfig, dit_forward
from gen3c_tpu.models.vae import VideoTokenizer

Array = jax.Array

DEFAULT_AUGMENT_SIGMA = 0.001


def _dit_net_fn(bundle, x, t, ctx):
    """Stable net_fn for the jitted sampler. bundle = (params, cfg-free)."""
    params, cfg = bundle
    return dit_forward(params, cfg, x, t, ctx, fps=24.0)


def _dit_net_fn_span_refresh(bundle, x, t, ctx):
    """Delta-DiT span caching refresh path: full forward that also
    returns the cfg.cache_block_span residual delta."""
    params, cfg = bundle
    return dit_forward(params, cfg, x, t, ctx, fps=24.0,
                       return_span_delta=True)


def _dit_net_fn_span_skip(bundle, x, t, ctx, delta):
    """Delta-DiT span caching skip path: runs only the blocks outside
    cfg.cache_block_span, re-applying the cached delta."""
    params, cfg = bundle
    return dit_forward(params, cfg, x, t, ctx, fps=24.0, span_delta=delta)


@dataclasses.dataclass
class Gen3CModel:
    """GEN3C-Cosmos-7B wrapper: DiT + tokenizer + schedule."""

    dit_params: dict
    dit_cfg: DiTConfig
    tokenizer: VideoTokenizer
    sigma_data: float = 0.5
    frame_buffer_max: int = 2
    chunk_size: int = 121  # pixel frames per diffusion call (model_gen3c.py:30)
    state_shape: Tuple[int, int, int, int] = (16, 16, 88, 160)
    schedule: EDMEulerSchedule = dataclasses.field(
        default_factory=EDMEulerSchedule
    )
    mesh: Optional[object] = None  # jax.sharding.Mesh -> CP denoising
    # Megatron-SP in the cp x tp shard_map denoise (needs mesh tp>1)
    sequence_parallel: bool = False
    # offload_dit=True: dit_params rest off-device (pinned_host) and are
    # staged into HBM only for the denoise phase (reference
    # --offload_diffusion_transformer, gen3c_pipeline.py:186-225) — on a
    # 16 GB chip the W8A8 7B and the full-res VAE phases fit alone but
    # not together
    offload_dit: bool = False
    # block-streamed bf16 net (models/dit_streaming.py) for UNQUANTIZED
    # single-chip serving; when set, dit_params is empty and the
    # streaming net replaces the sampler's jitted net
    streaming_net: Optional[object] = None

    def __post_init__(self):
        # stable closure identity so the jitted sampler doesn't retrace
        self._net_fn = _dit_net_fn
        # set by warm_denoise_compiles; generate_samples warns when the
        # real denoise config differs from the warmed one (ADVICE r3)
        self._warmed_denoise: Optional[dict] = None

    # ----- tokenizer plumbing (model_t2w.py:123-145) -----

    def encode(self, state: Array) -> Array:
        return self.tokenizer.encode(state) * self.sigma_data

    def decode(self, latent: Array) -> Array:
        return self.tokenizer.decode(latent / self.sigma_data)

    # ----- latent frame arithmetic (inference_utils.py:667-694) -----

    def compute_num_latent_frames(self, num_input_frames: int) -> int:
        pcd = self.tokenizer.pixel_chunk_duration
        lcd = self.tokenizer.latent_chunk_duration
        n = num_input_frames // pcd * lcd
        rem = num_input_frames % lcd
        if rem == 1:
            n += 1
        elif rem > 1:
            n += 1 + (num_input_frames % pcd - 1) // 8
        return n

    # ----- condition latent (inference_utils.py:696-758) -----

    def create_condition_latent_from_input_frames(
        self, input_frames: Array, num_frames_condition: int = 1
    ) -> Array:
        """Last num_frames_condition frames -> zero-pad to the pixel chunk
        -> encode. input_frames: (B, 3, T, H, W) in [-1, 1]."""
        B, C, T, H, W = input_frames.shape
        num_frames_encode = self.tokenizer.pixel_chunk_duration
        assert T >= num_frames_condition
        cond = input_frames[:, :, -num_frames_condition:]
        pad = jnp.zeros(
            (B, C, num_frames_encode - num_frames_condition, H, W),
            input_frames.dtype,
        )
        return self.encode(jnp.concatenate([cond, pad], axis=2))

    # ----- warped-buffer conditioning (model_gen3c.py:32-57) -----

    def encode_warped_frames(
        self, condition_state: Array, condition_state_mask: Array
    ) -> Array:
        """(B, F, N, C, H, W) warped RGB + (B, F, N, 1, H, W) masks ->
        (B, 16*2*frame_buffer_max, T_latent, H/8, W/8) pose latent."""
        assert condition_state.ndim == 6
        B, F, N = condition_state.shape[:3]
        mask3 = jnp.repeat(condition_state_mask * 2.0 - 1.0, 3, axis=3)
        latents = []
        # stage the (possibly offloaded) VAE params ONCE for all 2N
        # encodes instead of per call
        with self.tokenizer.resident():
            for i in range(N):
                video = jnp.transpose(
                    condition_state[:, :, i], (0, 2, 1, 3, 4)
                )
                mvideo = jnp.transpose(mask3[:, :, i], (0, 2, 1, 3, 4))
                latents.append(self.encode(video))
                latents.append(self.encode(mvideo))
        for _ in range(self.frame_buffer_max - N):
            latents.append(jnp.zeros_like(latents[-2]))
            latents.append(jnp.zeros_like(latents[-1]))
        return jnp.concatenate(latents, axis=1)

    # ----- speculative denoise-step compile warming -----

    def warm_denoise_compiles(
        self,
        *,
        batch: int = 1,
        num_steps: int = 35,
        guidance: float = 1.0,
        condition_augment_sigma: float = DEFAULT_AUGMENT_SIGMA,
        step_cache_interval: int = 1,
        cfg_sequential: bool = False,
        solver: str = "euler",
        guidance_interval=None,
        cfg_rescale: float = 0.0,
        t5_tokens: int = 512,
    ) -> int:
        """AOT-compile the host-loop denoise step programs this config
        will run (abstract shapes — zero HBM, zero state); returns the
        program count, 0 when the config doesn't use the host-loop
        sampler (resident whole-loop, mesh/CP, block-streamed, and span
        caching have their own compile profiles). Same speculative
        warming as Cache3DBuffer.warm_update_compiles — intended for a
        background thread during model/pipeline setup, so a cold
        process's first denoise hits the persistent compilation cache
        instead of paying 20-300 s/program remote compiles (~2.5 min of
        chunk 1's denoise on the measured cold 241-frame AR run)."""
        if (
            not self.offload_dit
            or self.streaming_net is not None
            or self.mesh is not None
            or self.dit_cfg.cache_block_span is not None
        ):
            return 0
        from gen3c_tpu.diffusion.sampler import warm_host_loop_compiles

        # record what was warmed so generate_samples can warn when the
        # real denoise requests different shapes/statics — a silent
        # mismatch compiles never-used variants concurrently with the
        # real cold compiles warming was meant to hide (ADVICE r3)
        self._warmed_denoise = dict(
            batch=int(batch),
            t5_tokens=int(t5_tokens),
            num_steps=int(num_steps),
            guidance=float(guidance),
            condition_augment_sigma=float(condition_augment_sigma),
            step_cache_interval=int(step_cache_interval),
            cfg_sequential=bool(cfg_sequential),
            solver=str(solver),
            guidance_interval=(
                tuple(float(v) for v in guidance_interval)
                if guidance_interval is not None else None
            ),
            cfg_rescale=float(cfg_rescale),
        )
        return warm_host_loop_compiles(
            self._net_fn,
            (self.dit_params, self.dit_cfg),
            batch=batch,
            state_shape=tuple(self.state_shape),
            crossattn_shape=(t5_tokens, self.dit_cfg.crossattn_emb_channels),
            pose_channels=16 * 2 * self.frame_buffer_max,
            num_steps=num_steps,
            guidance=guidance,
            condition_augment_sigma=condition_augment_sigma,
            schedule=self.schedule,
            step_cache_interval=step_cache_interval,
            cfg_sequential=cfg_sequential,
            net_in_dtype=self.dit_cfg.dtype,
            solver=solver,
            guidance_interval=guidance_interval,
            cfg_rescale=cfg_rescale,
        )

    # ----- sampling (model_v2w.py:84-155 + model_gen3c conditioning) -----

    def generate_samples(
        self,
        t5_embeddings: Array,  # (B, 512, 1024)
        condition_latent: Array,  # (B, 16, T, H, W) (sigma_data-scaled)
        condition_state: Optional[Array] = None,  # (B,F,N,3,H,W) warps
        condition_state_mask: Optional[Array] = None,  # (B,F,N,1,H,W)
        pose_latent: Optional[Array] = None,  # pre-encoded warp latent
        num_condition_t: int = 1,
        guidance: float = 1.0,
        num_steps: int = 35,
        seed: int = 1,
        neg_t5_embeddings: Optional[Array] = None,
        condition_augment_sigma: float = DEFAULT_AUGMENT_SIGMA,
        init_noise: Optional[np.ndarray] = None,
        step_cache_interval: int = 1,
        step_cache_threshold: float = 0.0,
        cfg_sequential: Optional[bool] = None,
        solver: str = "euler",
        guidance_interval=None,
        cfg_rescale: float = 0.0,
    ) -> Array:
        """Run the full GEN3C denoise; returns latent (B, 16, T, H', W').

        Callers may pass pre-encoded `pose_latent` instead of the
        pixel-space condition_state(+mask) — the pipeline does this so
        the ~1.7 GB warp buffers can be freed before the denoise phase
        (see utils/offload.py memory budget).

        guidance_interval=(sigma_lo, sigma_hi) restricts CFG to steps
        whose sigma lies in the interval (arXiv:2404.07724); outside it
        only the conditioned forward runs (~half the step cost). The
        reference runs CFG every step (model_v2w.py:130-149)."""
        if guidance_interval is not None:
            guidance_interval = tuple(
                float(v) for v in guidance_interval
            )
        from gen3c_tpu.models.conditioner import make_condition_pair

        if pose_latent is None:
            if condition_state is None or condition_state_mask is None:
                raise ValueError(
                    "pass either pose_latent or condition_state + "
                    "condition_state_mask"
                )
            pose_latent = self.encode_warped_frames(
                condition_state, condition_state_mask
            )

        B = condition_latent.shape[0]
        state_shape = tuple(self.state_shape)
        if condition_latent.shape[2] < state_shape[1]:
            pad_t = state_shape[1] - condition_latent.shape[2]
            condition_latent = jnp.concatenate(
                [
                    condition_latent,
                    jnp.zeros(
                        condition_latent.shape[:2]
                        + (pad_t,)
                        + condition_latent.shape[3:],
                        condition_latent.dtype,
                    ),
                ],
                axis=2,
            )

        cond, uncond = make_condition_pair(
            condition_latent,
            t5_embeddings,
            num_condition_t,
            pose_latent=pose_latent,
            neg_t5_embeddings=neg_t5_embeddings,
        )

        if init_noise is None:
            init_noise = np.random.RandomState(seed).standard_normal(
                (B,) + state_shape
            ).astype(np.float32)
        augment_noise = arch_invariant_randn((B,) + state_shape, seed)

        if self.mesh is not None and (
    self.mesh.shape.get("cp", 1) > 1
    or self.mesh.shape.get("tp", 1) > 1
    or self.mesh.shape.get("cfg", 1) > 1
):
            # context-parallel denoise over the mesh (torchrun --num_gpus
            # parity; gen3c_tpu.parallel.cp — bit-exact vs single device)
            from gen3c_tpu.parallel.cp import cp_generate_samples

            return cp_generate_samples(
                self.mesh,
                self.dit_params,
                self.dit_cfg,
                init_noise=jnp.asarray(init_noise),
                augment_noise=jnp.asarray(augment_noise),
                crossattn_cond=cond.crossattn_emb,
                crossattn_uncond=uncond.crossattn_emb,
                gt_latent=cond.gt_latent,
                condition_video_indicator=cond.condition_video_indicator,
                condition_video_input_mask=cond.condition_video_input_mask,
                pose_latent_cond=cond.condition_video_pose,
                pose_latent_uncond=uncond.condition_video_pose,
                num_steps=num_steps,
                guidance=guidance,
                condition_augment_sigma=condition_augment_sigma,
                schedule=self.schedule,
                step_cache_interval=step_cache_interval,
                step_cache_threshold=step_cache_threshold,
                net_in_dtype=self.dit_cfg.dtype,
                solver=solver,
                sequence_parallel=self.sequence_parallel,
                guidance_interval=guidance_interval,
                cfg_rescale=float(cfg_rescale),
            )

        if (self.dit_cfg.cache_block_span is not None
                and step_cache_interval > 1
                and step_cache_threshold > 0):
            raise ValueError(
                "step_cache_block_span and step_cache_threshold are "
                "mutually exclusive caching policies; pick one"
            )
        use_span = (
            self.dit_cfg.cache_block_span is not None
            and step_cache_interval > 1
        )
        if use_span and self.streaming_net is not None:
            raise ValueError(
                "span caching is not available with the block-streamed "
                "DiT; use step_cache_interval"
            )
        if use_span and self.offload_dit:
            # the host-loop sampler has no span path, and the whole-loop
            # span program does not fit HBM beside the staged params
            # (scripts/probe_sampler_memory.py) — fail fast instead of
            # staging for minutes and dying at compile time
            raise ValueError(
                "span caching (cache_block_span) is not available in the "
                "memory-constrained single-chip offload mode; use "
                "step_cache_interval/threshold caching, or run span "
                "caching under cp>=2 (docs/STATUS.md)"
            )
        from gen3c_tpu.diffusion.sampler import generate_samples_auto

        if self.offload_dit and self._warmed_denoise is not None:
            actual = dict(
                batch=int(B),
                t5_tokens=int(t5_embeddings.shape[1]),
                num_steps=int(num_steps),
                guidance=float(guidance),
                condition_augment_sigma=float(condition_augment_sigma),
                step_cache_interval=int(step_cache_interval),
                cfg_sequential=bool(cfg_sequential),
                solver=str(solver),
                guidance_interval=guidance_interval,
                cfg_rescale=float(cfg_rescale),
            )
            drift = {
                k: (self._warmed_denoise[k], actual[k])
                for k in actual
                if self._warmed_denoise.get(k) != actual[k]
            }
            if drift:
                from gen3c_tpu.utils import log

                log.warning(
                    "denoise compile warming covered a DIFFERENT config "
                    "than this run — the warmed programs will not be hit "
                    f"(warmed vs actual: {drift})"
                )

        return generate_samples_auto(
            net_fn=(
                _dit_net_fn_span_refresh if use_span else self._net_fn
            ),
            net_fn_skip=(_dit_net_fn_span_skip if use_span else None),
            net_params=(self.dit_params, self.dit_cfg),
            offload=self.offload_dit,
            streaming_net=self.streaming_net,
            init_noise=jnp.asarray(init_noise),
            augment_noise=jnp.asarray(augment_noise),
            crossattn_cond=cond.crossattn_emb,
            crossattn_uncond=uncond.crossattn_emb,
            gt_latent=cond.gt_latent,
            condition_video_indicator=cond.condition_video_indicator,
            condition_video_input_mask=cond.condition_video_input_mask,
            pose_latent_cond=cond.condition_video_pose,
            pose_latent_uncond=uncond.condition_video_pose,
            num_steps=num_steps,
            guidance=guidance,
            condition_augment_sigma=condition_augment_sigma,
            schedule=self.schedule,
            step_cache_interval=step_cache_interval,
            step_cache_threshold=step_cache_threshold,
            net_in_dtype=self.dit_cfg.dtype,
            cfg_sequential=bool(cfg_sequential),
            solver=solver,
            guidance_interval=guidance_interval,
            cfg_rescale=float(cfg_rescale),
        )
