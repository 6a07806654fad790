"""Serving-side inference models: the abstract interface, a deterministic
debug model, and the GEN3C persistent model.

Parity targets:
  * InferenceModel interface + request queue semantics —
    gui/api/server_base.py:121-203, server_cosmos_base.py:46-226
  * DebugInferenceModel (deterministic fake: gradient test frames, ones
    depth) — gui/api/server_debug.py:22-114 (the reference's only
    mock-backend pattern; enables full API integration tests without a
    TPU or checkpoints)
  * Gen3cPersistentModel: load-once, seed from 1 image (depth estimator)
    or N posed RGBD frames, inference_on_cameras AR loop —
    cosmos_predict1/diffusion/inference/gen3c_persistent.py:55-569
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from gen3c_tpu.serving.api_types import (
    InferenceRequest,
    InferenceResult,
    SeedingRequest,
    SeedingResult,
)
from gen3c_tpu.utils import log


def _resize_images_bhwc(images: np.ndarray, h: int, w: int) -> np.ndarray:
    """Bicubic antialiased resize of (B, H, W, C) float images — parity
    with the reference's seeding resize (gen3c_persistent.py:250-258:
    torchvision resize, BICUBIC, antialias=True; Pillow's convolution
    resamplers antialias on downscale the same way)."""
    from PIL import Image

    b, _, _, c = images.shape
    out = np.empty((b, h, w, c), np.float32)
    for i in range(b):
        for ch in range(c):
            im = Image.fromarray(images[i, :, :, ch].astype(np.float32), mode="F")
            out[i, :, :, ch] = np.asarray(im.resize((w, h), Image.BICUBIC))
    return out


def _resize_depths_bhw(depths: np.ndarray, h: int, w: int) -> np.ndarray:
    """Bilinear resize of (B, H, W) float depth maps to the inference
    resolution (depth is metric — interpolation, not antialiased decimation,
    keeps edges closer to the reference MoGe-resized output)."""
    from PIL import Image

    out = np.empty((depths.shape[0], h, w), np.float32)
    for i in range(depths.shape[0]):
        im = Image.fromarray(depths[i].astype(np.float32), mode="F")
        out[i] = np.asarray(im.resize((w, h), Image.BILINEAR))
    return out


class InferenceModel:
    """Abstract serving model."""

    def seed_model(self, req: SeedingRequest) -> SeedingResult:
        raise NotImplementedError

    def run_inference(
        self,
        req: InferenceRequest,
        on_chunk=None,  # (chunks_done, num_chunks, frames_so_far uint8)
        cancel_event=None,  # threading.Event; honored at chunk boundaries
    ) -> InferenceResult:
        raise NotImplementedError

    def clear_cache(self) -> None:
        pass

    def metadata(self) -> dict:
        return {"model": type(self).__name__}

    def get_latest_rgb(self) -> Optional[np.ndarray]:
        return getattr(self, "_latest_rgb", None)

    def get_point_cloud(self, max_points: int = 200_000):
        """(points (N,3) float32 world-space, colors (N,3) uint8) of the
        seeded 3D cache — the web viewer's preview geometry (replaces the
        C++ testbed's point-cloud display, gui/src/testbed.cu:380-386)."""
        raise NotImplementedError


class DebugInferenceModel(InferenceModel):
    """Deterministic in-memory fake (server_debug.py parity): returns a
    gradient test image per frame, ones-depth seeding results."""

    def __init__(self, resolution=(64, 96)):
        self.h, self.w = resolution
        self.seeded = False
        self._latest_rgb = None

    def seed_model(self, req: SeedingRequest) -> SeedingResult:
        self.seeded = True
        n = len(req)
        h, w = req.images.shape[1:3]
        depths = np.ones((n, h, w), np.float32)
        self._latest_rgb = np.asarray(req.images[0])
        return SeedingResult.from_request(req, fallback_depths=depths)

    def run_inference(
        self, req: InferenceRequest, on_chunk=None, cancel_event=None
    ) -> InferenceResult:
        from gen3c_tpu.pipelines.chunked import GenerationCancelled

        if cancel_event is not None and cancel_event.is_set():
            raise GenerationCancelled()
        n = len(req)
        w, h = req.resolution()
        t = np.linspace(0, 1, n)[:, None, None]
        yy = np.linspace(0, 1, h)[None, :, None]
        xx = np.linspace(0, 1, w)[None, None, :]
        frames = np.stack(
            [xx + 0 * yy + 0 * t, yy + 0 * xx + 0 * t, t + 0 * xx + 0 * yy],
            axis=-1,
        )
        frames = np.broadcast_to(frames, (n, h, w, 3))
        images = (frames * 255).astype(np.uint8)
        if on_chunk is not None:  # single "chunk": full progress report
            on_chunk(1, 1, images)
        self._latest_rgb = images[-1]
        return InferenceResult(
            request_id=req.request_id,
            cameras_to_world=req.cameras_to_world,
            focal_lengths=req.focal_lengths,
            principal_points=req.principal_points,
            resolutions=req.resolutions,
            images=images,
            depths=(
                np.ones((n, h, w), np.float32) if req.return_depths else None
            ),
        )

    def get_point_cloud(self, max_points: int = 200_000):
        return _subsample(*_debug_point_cloud(), max_points)

    def metadata(self) -> dict:
        return {
            "model": "DebugInferenceModel",
            "seeded": self.seeded,
            "inference_resolution": [self.w, self.h],
            "mean_inference_time_per_frame": 0.0,
        }


class Gen3cPersistentModel(InferenceModel):
    """Load-once GEN3C model serving many seeding/inference requests.

    Parity: gen3c_persistent.py:55-569 — seeding from a single image
    (depth estimated) or N posed RGBD frames; inference runs the chunked
    AR loop over the user-authored camera path.
    """

    def __init__(
        self,
        model_preset: str = "gen3c_7b",
        checkpoint_dir: Optional[str] = "checkpoints",
        num_steps: int = 35,
        guidance: float = 1.0,
        seed: int = 0,
        depth_source: str = "auto",
        quantize: bool | str = False,
        step_cache_interval: int = 1,
        step_cache_threshold: float = 0.0,
        num_devices: int = 1,
        parallel: str = "cp",
        offload_dit: Optional[bool] = None,
        attn_temporal_window: Optional[int] = None,
        cp_attn: Optional[str] = None,
        guidance_interval: Optional[tuple] = None,
        cfg_rescale: float = 0.0,
    ):
        import threading
        import time as _time

        from gen3c_tpu.pipelines.depth import make_depth_estimator
        from gen3c_tpu.pipelines.factory import build_gen3c_model
        from gen3c_tpu.pipelines.gen3c_pipeline import Gen3cPipeline

        _t0 = _time.perf_counter()
        # depth-estimator construction (MoGe JAX: checkpoint load +
        # device puts) overlaps the model build — its weights ride the
        # same tunnel the DiT upload saturates, but the build's slow arm
        # also includes device-side init/quantize time, so the overlap
        # is still net-positive (serving start-to-ready, VERDICT r4 #5)
        _depth_box: dict = {}

        def _build_depth():
            try:
                _depth_box["result"] = make_depth_estimator(depth_source)
            except BaseException as e:  # noqa: BLE001 — re-raised on join
                _depth_box["error"] = e

        _depth_thread = threading.Thread(
            target=_build_depth, name="gen3c-depth-build", daemon=True
        )
        _depth_thread.start()

        if offload_dit is None:
            # same auto-enable as the single-image CLI: 7B + full-res
            # VAE phases don't fit one 16 GB chip together
            # (utils/offload.py)
            offload_dit = model_preset == "gen3c_7b" and num_devices == 1
            if offload_dit and not quantize:
                from gen3c_tpu.utils import log

                log.info(
                    "unquantized 7B on one chip: serving will run the "
                    "block-streamed bf16 DiT (set GEN3C_QUANTIZE=w8a8 "
                    "for resident-weight int8 denoising)"
                )
        try:
            self.model, self.preset = build_gen3c_model(
                model_preset, checkpoint_dir=checkpoint_dir, seed=seed,
                quantize=quantize, num_devices=num_devices, parallel=parallel,
                offload_dit=offload_dit,
                attn_temporal_window=attn_temporal_window,
                cp_attn=cp_attn,
                # VAE params (0.42 GB) would otherwise sit in the ~0.5 GB
                # slack the host-loop denoise step leaves (docs/STATUS.md)
                offload_tokenizer=offload_dit,
            )
            self.pipeline = Gen3cPipeline(
                model=self.model,
                guidance=guidance,
                guidance_interval=(tuple(float(v) for v in guidance_interval)
                                   if guidance_interval else None),
                cfg_rescale=float(cfg_rescale),
                num_steps=num_steps,
                step_cache_interval=step_cache_interval,
                step_cache_threshold=step_cache_threshold,
                height=self.preset.height,
                width=self.preset.width,
                seed=seed,
            )
        finally:
            # join even when the build raises: otherwise the daemon
            # thread keeps pushing MoGe weights through the tunnel (and
            # holding HBM) with no consumer, degrading whatever the
            # caller does next (e.g. a constructor retry)
            _depth_thread.join()
        if "error" in _depth_box:
            raise _depth_box["error"]
        self.depth_estimator = _depth_box["result"]
        from gen3c_tpu.utils import log as _log

        _log.info(
            "serving model ready in %.1fs (build + pipeline + depth, "
            "compile warming continues in background)"
            % (_time.perf_counter() - _t0)
        )
        self.cache = None
        self._native_pc = None  # (points, colors) memo for previews
        self.seeding_request: Optional[SeedingRequest] = None
        self._latest_rgb = None
        self._inference_times = []

    # -- seeding (gen3c_persistent.py:138-270) --

    def seed_model(self, req: SeedingRequest) -> SeedingResult:
        import jax.numpy as jnp

        from gen3c_tpu.cache import Cache3DBuffer, Cache4D

        h, w = self.preset.height, self.preset.width
        images = req.images.astype(np.float32)
        if images.max() > 1.5:
            images = images / 255.0
        n = len(req)
        w2cs = req.world_to_cameras().astype(np.float32)
        # The cache, depths, and intrinsics must all live at the model's
        # inference resolution: resize the seeds like the reference
        # (gen3c_persistent.py:250-262) and scale K to (w, h). Without
        # this, a native-resolution seed builds a cache whose VAE latents
        # disagree with the preset's state_shape at denoise time.
        ks = req.intrinsics_matrix(
            for_resolutions=np.tile([[w, h]], (n, 1))
        ).astype(np.float32)
        if images.shape[1] != h or images.shape[2] != w:
            images = _resize_images_bhwc(images, h, w)
        depths_in = None
        if req.depths is not None:
            depths_in = req.depths.astype(np.float32)
            if depths_in.shape[1:] != (h, w):
                depths_in = _resize_depths_bhw(depths_in, h, w)
        masks_in = None
        if getattr(req, "masks", None) is not None:
            masks_in = req.masks.astype(np.float32)
            if masks_in.shape[1:] != (h, w):
                # binary validity: resize then re-threshold
                masks_in = (_resize_depths_bhw(masks_in, h, w) > 0.5)
            masks_in = masks_in.astype(np.float32)

        if depths_in is None:
            depths = []
            for i in range(n):
                d, k_est, _ = self.depth_estimator(images[i])
                depths.append(d)
            depths = np.stack(depths)
        else:
            depths = depths_in

        imgs_bchw = images.transpose(0, 3, 1, 2) * 2 - 1
        mask_arg = (
            None if masks_in is None else jnp.asarray(masks_in[:, None])
        )
        if n == 1:
            self.cache = Cache3DBuffer(
                frame_buffer_max=self.preset.frame_buffer_max,
                input_image=jnp.asarray(imgs_bchw),
                input_depth=jnp.asarray(depths[:, None]),
                input_mask=mask_arg,
                input_w2c=jnp.asarray(w2cs),
                input_intrinsics=jnp.asarray(ks),
            )
        else:
            self.cache = Cache4D(
                input_image=jnp.asarray(imgs_bchw),
                input_depth=jnp.asarray(depths[:, None]),
                input_mask=mask_arg,
                input_w2c=jnp.asarray(w2cs),
                input_intrinsics=jnp.asarray(ks),
                input_format=["F", "C", "H", "W"],
            )
        self.seeding_request = req
        self._native_pc = None
        self._latest_rgb = (images[0] * 255).astype(np.uint8)
        self._seed_frame = imgs_bchw[0:1][:, :, None]  # (1, 3, 1, H, W)
        return SeedingResult.from_request(req, fallback_depths=depths)

    # -- inference (gen3c_persistent.py:272-470) --

    def run_inference(
        self, req: InferenceRequest, on_chunk=None, cancel_event=None
    ) -> InferenceResult:
        assert self.cache is not None, "seed the model first"
        import jax.numpy as jnp

        from gen3c_tpu.pipelines.chunked import run_chunked_generation

        t0 = time.perf_counter()
        chunk = self.model.chunk_size
        n_req = len(req)
        # pad the camera path so (n-1) % (chunk-1) == 0 (server pads,
        # result is trimmed back: api_types pad/trim parity)
        n_padded = max(chunk, ((n_req - 1 + chunk - 2) // (chunk - 1)) * (chunk - 1) + 1)
        req.pad_to_frame_count(n_padded)

        target_res = np.tile(
            [[self.preset.width, self.preset.height]], (len(req), 1)
        )
        w2cs = jnp.asarray(req.world_to_cameras().astype(np.float32))[None]
        ks = jnp.asarray(
            req.intrinsics_matrix(for_resolutions=target_res).astype(
                np.float32
            )
        )[None]

        update = (
            self.depth_estimator
            if hasattr(self.cache, "update_cache")
            and type(self.cache).__name__ == "Cache3DBuffer"
            else None
        )
        video, _ = run_chunked_generation(
            self.pipeline,
            self.cache,
            w2cs,
            ks,
            self._seed_frame,
            prompt=req.prompt or "",
            update_cache_with_depth=update,
            use_start_frame_idx=type(self.cache).__name__ == "Cache4D",
            on_chunk=on_chunk,
            cancel_event=cancel_event,
        )
        video = video[:n_padded]
        depths_out = None
        if req.return_depths:
            depths_out = np.stack(
                [self.depth_estimator(f / 255.0)[0] for f in video]
            )
        result = InferenceResult(
            request_id=req.request_id,
            cameras_to_world=req.cameras_to_world,
            focal_lengths=req.focal_lengths,
            principal_points=req.principal_points,
            resolutions=req.resolutions,
            images=video,
            depths=depths_out,
            runtime_ms=(time.perf_counter() - t0) * 1000,
        )
        result.trim_to_original_frame_count(req.frame_count_without_padding)
        self._latest_rgb = result.images[-1]
        self._inference_times.append(
            (time.perf_counter() - t0) / max(len(result), 1)
        )
        return result

    def render_preview(self, req: InferenceRequest) -> InferenceResult:
        """Instant point-cloud preview along the camera path: the splat
        render of the seeded cache WITHOUT diffusion — the live preview
        the C++ viewer displays (testbed.cu cache-rendering display,
        gui/src/testbed.cu:380-386)."""
        assert self.cache is not None, "seed the model first"
        import os as _os

        import jax.numpy as jnp

        t0 = time.perf_counter()
        target_res = np.tile(
            [[self.preset.width, self.preset.height]], (len(req), 1)
        )
        if _os.environ.get("GEN3C_PREVIEW_NATIVE", "0") == "1":
            # host-side z-buffered point rasterizer (native/point_raster):
            # instant previews with zero TPU occupancy. Falls back to the
            # fidelity-grade TPU splat when the library can't build.
            from gen3c_tpu.native import point_raster as pr

            if pr.available():
                # the cache geometry only changes on seeding: memoize the
                # host-side point-cloud extraction across preview calls
                if self._native_pc is None:
                    self._native_pc = self.get_point_cloud(
                        max_points=2_000_000
                    )
                pts, cols = self._native_pc
                w2c_np = req.world_to_cameras().astype(np.float32)
                ks_np = req.intrinsics_matrix(
                    for_resolutions=target_res
                ).astype(np.float32)
                radius = float(
                    _os.environ.get("GEN3C_PREVIEW_POINT_RADIUS", "1.0")
                )
                spp = int(_os.environ.get("GEN3C_PREVIEW_SPP", "1"))
                frames = pr.raster_points(
                    pts, cols, w2c_np, ks_np,
                    self.preset.height, self.preset.width,
                    point_radius=radius,
                )
                if spp > 1:
                    # progressive anti-aliasing: accumulate sub-pixel
                    # jittered re-renders in the native render buffer
                    # (render_buffer.cu accumulation role)
                    from gen3c_tpu.native import render_buffer as rbuf

                    if rbuf.available():
                        acc = rbuf.RenderBuffer.for_shape(frames.shape)
                        acc.accumulate(frames.astype(np.float32) / 255.0)
                        rng = np.random.RandomState(0)
                        for _ in range(spp - 1):
                            kj = ks_np.copy()
                            kj[:, 0, 2] += rng.uniform(-0.5, 0.5)
                            kj[:, 1, 2] += rng.uniform(-0.5, 0.5)
                            f = pr.raster_points(
                                pts, cols, w2c_np, kj,
                                self.preset.height, self.preset.width,
                                point_radius=radius,
                            )
                            acc.accumulate(f.astype(np.float32) / 255.0)
                        frames = acc.readout(srgb_transfer=False)
                return InferenceResult(
                    request_id=req.request_id,
                    cameras_to_world=req.cameras_to_world,
                    focal_lengths=req.focal_lengths,
                    principal_points=req.principal_points,
                    resolutions=req.resolutions,
                    images=frames,
                    runtime_ms=(time.perf_counter() - t0) * 1000,
                )
        w2cs = jnp.asarray(req.world_to_cameras().astype(np.float32))[None]
        ks = jnp.asarray(
            req.intrinsics_matrix(for_resolutions=target_res).astype(
                np.float32
            )
        )[None]
        px, _ = self.cache.render_cache(w2cs, ks)
        frames = np.asarray(px)[0, :, 0].transpose(0, 2, 3, 1)
        frames = ((frames + 1) / 2 * 255).clip(0, 255).astype(np.uint8)
        return InferenceResult(
            request_id=req.request_id,
            cameras_to_world=req.cameras_to_world,
            focal_lengths=req.focal_lengths,
            principal_points=req.principal_points,
            resolutions=req.resolutions,
            images=frames,
            runtime_ms=(time.perf_counter() - t0) * 1000,
        )

    def get_point_cloud(self, max_points: int = 200_000):
        assert self.cache is not None, "seed the model first"
        img = np.asarray(self.cache.input_image[0])  # (F, N, V, C, H, W)
        pts = np.asarray(self.cache.input_points[0])  # (F, N, V, H, W, 3)
        f, n, v, c, h, w = img.shape
        colors = img.transpose(0, 1, 2, 4, 5, 3).reshape(-1, c)[:, :3]
        colors = ((colors * 0.5 + 0.5) * 255).clip(0, 255).astype(np.uint8)
        points = pts.reshape(-1, 3).astype(np.float32)
        if self.cache.input_mask is not None:
            m = np.asarray(self.cache.input_mask[0]).reshape(-1) > 0.5
            if m.shape[0] == points.shape[0]:
                points, colors = points[m], colors[m]
        return _subsample(points, colors, max_points)

    def clear_cache(self) -> None:
        self.cache = None
        self._native_pc = None
        self.seeding_request = None

    def metadata(self) -> dict:
        mean_t = (
            float(np.mean(self._inference_times))
            if self._inference_times
            else 4.0  # server_cosmos_base.py:246-248 placeholder parity
        )
        cfg = self.model.dit_cfg
        return {
            "model": "Gen3cPersistentModel",
            "preset": self.preset.name,
            "seeded": self.cache is not None,
            "inference_resolution": [self.preset.width, self.preset.height],
            "chunk_size": self.model.chunk_size,
            "mean_inference_time_per_frame": mean_t,
            # active performance configuration (observability)
            "perf": {
                "quantize": getattr(self.model, "quantized", False),
                "offload_dit": getattr(self.model, "offload_dit", False),
                "streaming": getattr(self.model, "streaming_net", None)
                is not None,
                "attn_temporal_window": cfg.attn_temporal_window,
                "cp_attn_impl": cfg.cp_attn_impl,
                "step_cache_interval": self.pipeline.step_cache_interval,
                "step_cache_threshold": self.pipeline.step_cache_threshold,
                "guidance_interval": (
                    list(self.pipeline.guidance_interval)
                    if self.pipeline.guidance_interval else None
                ),
                "cfg_rescale": self.pipeline.cfg_rescale,
                "solver": self.pipeline.solver,
            },
        }


def _subsample(points: np.ndarray, colors: np.ndarray, max_points: int):
    if len(points) > max_points:
        idx = np.linspace(0, len(points) - 1, max_points).astype(np.int64)
        points, colors = points[idx], colors[idx]
    return points, colors


def _debug_point_cloud(n: int = 5000):
    """Synthetic sphere (DebugInferenceModel counterpart of the seeded
    cache's point cloud)."""
    rng = np.random.RandomState(0)
    v = rng.randn(n, 3).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-9
    colors = ((v * 0.5 + 0.5) * 255).astype(np.uint8)
    return v, colors
