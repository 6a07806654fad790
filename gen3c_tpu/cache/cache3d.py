"""The GEN3C 3D cache: point clouds splatted into warped condition buffers.

TPU-native re-design of the reference cache
(reference: cosmos_predict1/diffusion/inference/cache_3d.py):

  * ``Cache3DBase``           — cache_3d.py:26-236
  * ``Cache3DBuffer``         — :239-343 (ring buffer of newest frames,
    per-buffer noise augmentation, depth-aligned update)
  * ``Cache3DBufferSelector`` — :346-421 (top-K buffer selection by
    rendered-mask overlap + near-full-mask exclusivity)
  * ``Cache4D``               — :424-433 (per-frame caches for dynamic
    scenes, indexed by start_frame_idx)

Instead of the reference's chunk-of-2 CPU<->GPU staging loop
(cache_3d.py:162-223), the cache lives in device memory and the renderer
is a single jit-compiled ``lax.map`` over target frames (vectorized over
buffers), so the splat runs fully on-device.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gen3c_tpu.ops import geometry
from gen3c_tpu.ops.camera import align_depth

Array = jax.Array


def _canonicalize(
    x: Array, input_format: Optional[list], n_channels_last3: bool = False
) -> Array:
    """Permute/expand an input tensor into canonical B F N V C H W order.

    Mirrors the input_format handling of Cache3D_Base.__init__
    (cache_3d.py:52-94): missing dims are inserted with size 1.
    """
    if input_format is None:
        assert x.ndim == 4
        input_format = ["B", "C", "H", "W"]
    desired = ["B", "F", "N", "V", "C", "H", "W"]
    fmt_idx = {d: i for i, d in enumerate(input_format)}
    perm = [fmt_idx[d] for d in desired if d in fmt_idx]
    x = jnp.transpose(x, perm)
    for i, d in enumerate(desired):
        if d not in fmt_idx:
            x = jnp.expand_dims(x, i)
    return x


@partial(jax.jit, static_argnames=("render_depth", "chunk"))
def _render_frames(
    images: Array,  # (FS, N, C, H, W) source buffers (FS=1 static cache)
    points: Array,  # (FS, N, H, W, 3)
    masks: Array,  # (FS, N, 1, H, W)
    w2cs: Array,  # (F, N, 4, 4) per-target poses
    ks: Array,  # (F, N, 3, 3)
    frame_idx: Array,  # (F,) int32 — source frame per target (Cache4D)
    render_depth: bool = False,
    chunk: int = 4,
):
    """Jitted splat of F targets x N buffers.

    Broadcasting of the (shared) source buffers over targets happens HERE,
    inside the jit, so nothing F-sized is ever materialized in HBM — the
    reference instead staged CPU copies in chunks of 2 (cache_3d.py:162-223).
    """

    def one(args):
        w2c, k, fi = args  # (N,4,4), (N,3,3), ()
        img = images[fi]  # (N, C, H, W)
        pts = points[fi]
        msk = masks[fi]
        warped, mask2, depth, _ = geometry.forward_warp(
            img, msk, w2c, k, pts, is_image=True, render_depth=render_depth
        )
        if render_depth:
            return warped, mask2, depth
        return warped, mask2, jnp.zeros_like(img[:, 0])

    return jax.lax.map(one, (w2cs, ks, frame_idx), batch_size=chunk)


class Cache3DBase:
    """Holds source frames + world points; renders warped buffers per target.

    Args mirror Cache3D_Base (cache_3d.py:26-134). Depth maps are clamped
    to [0, 100] with NaN->100 before unprojection, as in the reference
    (:107-108).
    """

    def __init__(
        self,
        input_image: Array,
        input_depth: Optional[Array] = None,
        input_w2c: Optional[Array] = None,
        input_intrinsics: Optional[Array] = None,
        input_mask: Optional[Array] = None,
        input_format: Optional[list] = None,
        input_points: Optional[Array] = None,
        is_depth: bool = True,
        filter_points_threshold: float = 1.0,
        foreground_masking: bool = False,
    ):
        self.is_depth = is_depth
        self.filter_points_threshold = filter_points_threshold
        self.foreground_masking = foreground_masking

        img = _canonicalize(jnp.asarray(input_image, jnp.float32), input_format)
        self.input_image = img
        B, F, N, V, C, H, W = img.shape

        self.input_mask = (
            _canonicalize(jnp.asarray(input_mask, jnp.float32), input_format)
            if input_mask is not None
            else None
        )

        self.boundary_mask = None
        if input_points is not None:
            self.input_points = jnp.asarray(input_points, jnp.float32).reshape(
                B, F, N, V, H, W, 3
            )
        else:
            depth = jnp.nan_to_num(jnp.asarray(input_depth, jnp.float32), nan=100.0)
            depth = jnp.clip(depth, 0.0, 100.0)
            pts = geometry.unproject_points(
                depth.reshape(-1, 1, H, W),
                jnp.asarray(input_w2c, jnp.float32).reshape(-1, 4, 4),
                jnp.asarray(input_intrinsics, jnp.float32).reshape(-1, 3, 3),
                is_depth=self.is_depth,
            )
            self.input_points = pts.reshape(B, F, N, V, H, W, 3)

            if self.filter_points_threshold < 1.0:
                dmask = geometry.reliable_depth_mask(
                    depth.reshape(-1, 1, H, W),
                    ratio_thresh=self.filter_points_threshold,
                ).reshape(B, F, N, V, 1, H, W)
                if self.input_mask is None:
                    self.input_mask = dmask.astype(jnp.float32)
                else:
                    self.input_mask = self.input_mask * dmask.astype(jnp.float32)

            if foreground_masking:
                dmask = geometry.reliable_depth_mask(depth.reshape(-1, 1, H, W))
                self.boundary_mask = (~dmask).reshape(B, F, N, V, 1, H, W)

    @property
    def shape(self):
        return self.input_image.shape

    def input_frame_count(self) -> int:
        return self.input_image.shape[1]

    def _render_base(
        self,
        target_w2cs: Array,  # (B, F_target, 4, 4)
        target_intrinsics: Array,  # (B, F_target, 3, 3)
        render_depth: bool = False,
        start_frame_idx: int = 0,
    ) -> Tuple[Array, Array]:
        """Render all buffers to all target poses.

        Returns (pixels (B,F,N,C,H,W) or depth (B,F,N,H,W), masks
        (B,F,N,1,H,W)). Parity: Cache3D_Base.render_cache
        (cache_3d.py:151-236), with the staging loop replaced by a jitted
        lax.map over targets.
        """
        B, F, N, V, C, H, W = self.input_image.shape
        bs, F_t = target_w2cs.shape[:2]
        assert bs == B == 1 and V == 1, (
            "multi-view aggregation handled by selector; B=1 per render"
        )

        w2cs = jnp.broadcast_to(
            target_w2cs.reshape(F_t, 1, 4, 4), (F_t, N, 4, 4)
        )
        ks = jnp.broadcast_to(
            target_intrinsics.reshape(F_t, 1, 3, 3), (F_t, N, 3, 3)
        )

        # source frame per target: static caches (F==1) always use frame 0;
        # Cache4D indexes frame start_frame_idx + t (cache_3d.py:163-165)
        if F == 1:
            frame_idx = jnp.zeros((F_t,), jnp.int32)
        else:
            frame_idx = jnp.arange(
                start_frame_idx, start_frame_idx + F_t, dtype=jnp.int32
            )

        images = self.input_image[0, :, :, 0]  # (F, N, C, H, W)
        points = self.input_points[0, :, :, 0]
        if self.input_mask is not None:
            masks = self.input_mask[0, :, :, 0]
        else:
            masks = jnp.ones((F, N, 1, H, W), jnp.float32)

        warped, mask2, depth = _render_frames(
            images, points, masks, w2cs, ks, frame_idx,
            render_depth=render_depth or self.foreground_masking,
        )
        # shapes out of lax.map: (F_t, N, C, H, W)

        if self.foreground_masking and self.boundary_mask is not None:
            from gen3c_tpu.ops.raycast import apply_foreground_masking

            bmask = jnp.broadcast_to(
                self.boundary_mask[0, :, :, 0],
                (F, N, 1, H, W),
            )
            bmask_f = bmask[np.asarray(frame_idx)].reshape(-1, H, W)
            pts_f = points[np.asarray(frame_idx)].reshape(-1, H, W, 3)
            warped, mask2, depth = apply_foreground_masking(
                warped.reshape(-1, C, H, W),
                mask2.reshape(-1, 1, H, W),
                depth.reshape(-1, H, W),
                pts_f,
                bmask_f,
                w2cs.reshape(-1, 4, 4),
                ks.reshape(-1, 3, 3),
            )

        pixels = warped.reshape(B, F_t, N, C, H, W)
        masks_out = mask2.reshape(B, F_t, N, 1, H, W)
        if render_depth:
            return depth.reshape(B, F_t, N, H, W), masks_out
        return pixels, masks_out

    def render_cache(self, target_w2cs, target_intrinsics, render_depth=False,
                     start_frame_idx=0):
        return self._render_base(
            jnp.asarray(target_w2cs, jnp.float32),
            jnp.asarray(target_intrinsics, jnp.float32),
            render_depth,
            start_frame_idx,
        )

    def update_cache(self, *args, **kwargs):
        raise NotImplementedError


class Cache3DBuffer(Cache3DBase):
    """Ring buffer of the newest frames (newest-first along N).

    Parity: Cache3D_Buffer (cache_3d.py:239-343).
    """

    def __init__(self, frame_buffer_max: int = 0, noise_aug_strength: float = 0.0,
                 seed: int = 0, **kwargs):
        super().__init__(**kwargs)
        self.frame_buffer_max = frame_buffer_max
        self.noise_aug_strength = noise_aug_strength
        self._rng = jax.random.PRNGKey(seed)

    def render_cache(self, target_w2cs, target_intrinsics, render_depth=False,
                     start_frame_idx=0):
        assert start_frame_idx == 0, "start_frame_idx must be 0 for Cache3DBuffer"
        pixels, masks = super().render_cache(
            target_w2cs, target_intrinsics, render_depth
        )
        if not render_depth and self.noise_aug_strength > 0:
            # Per-buffer noise, coefficient (N-1-i)*strength: buffer 0
            # (the NEWEST, ring is newest-first) gets the strongest noise
            # (cache_3d.py:337-342).
            self._rng, sub = jax.random.split(self._rng)
            noise = jax.random.normal(sub, pixels.shape, pixels.dtype)
            n = pixels.shape[2]
            per_buffer = (
                jnp.arange(n - 1, -1, -1, dtype=pixels.dtype)
                * self.noise_aug_strength
            )
            pixels = pixels + noise * per_buffer.reshape(1, 1, -1, 1, 1, 1)
        return pixels, masks

    def update_cache(
        self,
        new_image: Array,  # (B, C, H, W)
        new_depth: Array,  # (B, 1, H, W)
        new_w2c: Array,  # (B, 4, 4)
        new_mask: Optional[Array] = None,
        new_intrinsics: Optional[Array] = None,
        depth_alignment: bool = True,
        alignment_method: str = "non_rigid",
    ) -> None:
        """Insert a newly generated frame, aligning its depth to the cache.

        Parity: Cache3D_Buffer.update_cache (cache_3d.py:246-316).
        """
        new_image = jnp.asarray(new_image, jnp.float32)
        new_depth = jnp.clip(
            jnp.nan_to_num(jnp.asarray(new_depth, jnp.float32), nan=1e4), 0, 1e4
        )
        new_w2c = jnp.asarray(new_w2c, jnp.float32)
        new_intrinsics = jnp.asarray(new_intrinsics, jnp.float32)

        if depth_alignment:
            target_depth, target_mask = self.render_cache(
                new_w2c[:, None], new_intrinsics[:, None], render_depth=True
            )
            target_depth = target_depth[:, 0, 0]  # (B,H,W) from buffer 0
            target_mask = target_mask[:, 0, 0, 0]
            new_depth = align_depth(
                new_depth[0, 0],
                target_depth[0],
                target_mask[0] > 0,
                k=new_intrinsics[0],
                c2w=jnp.linalg.inv(new_w2c[0]),
                alignment_method=alignment_method,
            ).reshape(new_depth.shape)

        new_points = geometry.unproject_points(
            new_depth, new_w2c, new_intrinsics, is_depth=self.is_depth
        )

        if self.filter_points_threshold < 1.0:
            dmask = geometry.reliable_depth_mask(
                new_depth, ratio_thresh=self.filter_points_threshold
            ).astype(jnp.float32)
            new_mask = dmask if new_mask is None else new_mask * dmask

        if self.frame_buffer_max > 1:
            ni = new_image[:, None, None, None]
            npts = new_points[:, None, None, None]
            if self.input_image.shape[2] < self.frame_buffer_max:
                self.input_image = jnp.concatenate([ni, self.input_image], axis=2)
                self.input_points = jnp.concatenate([npts, self.input_points], axis=2)
                if self.input_mask is not None:
                    nm = new_mask[:, None, None, None]
                    self.input_mask = jnp.concatenate([nm, self.input_mask], axis=2)
            else:
                self.input_image = self.input_image.at[:, :, 0].set(ni[:, 0])
                self.input_points = self.input_points.at[:, :, 0].set(npts[:, 0])
                if self.input_mask is not None:
                    self.input_mask = self.input_mask.at[:, :, 0].set(
                        new_mask[:, None, None, :]
                    )
        else:
            self.input_image = new_image[:, None, None, None]
            self.input_points = new_points[:, None, None, None]

    def warm_update_compiles(
        self, num_targets: int, alignment_method: str = "non_rigid"
    ) -> None:
        """AOT-compile (abstract shapes only — zero HBM, no state) the
        programs the NEXT update_cache + render_cache will need after a
        frame insert grows the buffer ring:

          1. the F_t=1 render_depth=True alignment render (current N),
          2. the non-rigid align_depth scale-map optimizer,
          3. the num_targets-frame warp re-render at N+1 buffers.

        Intended to run on a background thread while the current chunk
        denoises: on the cold 241-frame AR run of 2026-08-19 these
        first-shape remote compiles were ~22 of 34 generation minutes
        (the persistent compile cache hides them on later runs — this
        hides them on the FIRST). Duplicate concurrent compiles of the
        same program are safe (jax deduplicates/caches internally).
        """
        import jax as _jax

        B, F, N, V, C, H, W = self.input_image.shape
        n_next = min(N + 1, max(self.frame_buffer_max, 1))
        sds = _jax.ShapeDtypeStruct
        f32 = jnp.float32

        def _warm_render(f_t, n, render_depth):
            _render_frames.lower(
                sds((F, n, C, H, W), f32),
                sds((F, n, H, W, 3), f32),
                sds((F, n, 1, H, W), f32),
                sds((f_t, n, 4, 4), f32),
                sds((f_t, n, 3, 3), f32),
                sds((f_t,), jnp.int32),
                render_depth=render_depth,
            ).compile()

        _warm_render(1, N, True)  # depth-alignment render
        if alignment_method == "non_rigid":
            from gen3c_tpu.ops.camera import _nonrigid_scale_map

            _nonrigid_scale_map.lower(
                sds((H, W), f32),
                sds((H, W, 3), f32),
                sds((H, W), jnp.bool_),
                sds((3, 3), f32),
                sds((4, 4), f32),
            ).compile()
        # post-insert chunk re-render (render_cache passes
        # render_depth or foreground_masking as the static)
        _warm_render(num_targets, n_next, bool(self.foreground_masking))


class Cache3DBufferSelector(Cache3DBase):
    """Many init frames along N; select top-K by rendered-mask overlap.

    Parity: Cache3D_BufferSelector (cache_3d.py:346-421).
    """

    def __init__(self, frame_buffer_max: int = 1,
                 mask_for_max_buffer_model: bool = True,
                 mask_full_threshold: float = 0.9, **kwargs):
        super().__init__(**kwargs)
        self.frame_buffer_max = max(int(frame_buffer_max), 1)
        self.mask_for_max_buffer_model = bool(mask_for_max_buffer_model)
        self.mask_full_threshold = float(mask_full_threshold)

    def update_cache(self, *args, **kwargs):
        raise NotImplementedError("Cache3DBufferSelector does not support update")

    def render_cache(self, target_w2cs, target_intrinsics, render_depth=False,
                     start_frame_idx=0):
        pixels_all, masks_all = super().render_cache(
            target_w2cs, target_intrinsics, render_depth, start_frame_idx
        )
        B, F, N = pixels_all.shape[:3]
        if N <= self.frame_buffer_max:
            pixels_sel, masks_sel = pixels_all, masks_all
        else:
            k = min(self.frame_buffer_max, N)
            overlap = masks_all.sum(axis=(1, 3, 4, 5))  # (B, N)
            _, top_idx = jax.lax.top_k(overlap, k)  # (B, k), sorted desc
            pixels_sel = jnp.take_along_axis(
                pixels_all, top_idx[:, None, :, None, None, None], axis=2
            )
            masks_sel = jnp.take_along_axis(
                masks_all, top_idx[:, None, :, None, None, None], axis=2
            )
        if self.mask_for_max_buffer_model and not render_depth:
            # If any buffer covers >= threshold of the frame, keep only the
            # first such buffer; else keep all (cache_3d.py:399-420).
            cover = masks_sel.mean(axis=(3, 4, 5))  # (B, F, k)
            near_full = cover >= self.mask_full_threshold
            has_full = near_full.any(axis=2, keepdims=True)  # (B,F,1)
            first_idx = jnp.argmax(near_full, axis=2)  # (B,F)
            onehot = jax.nn.one_hot(first_idx, cover.shape[2], dtype=cover.dtype)
            keep = jnp.where(has_full, onehot, jnp.ones_like(onehot))  # (B,F,k)
            keep = keep[:, :, :, None, None, None]
            pixels_sel = (pixels_sel + 1) * keep - 1
            masks_sel = masks_sel * keep
        return pixels_sel, masks_sel


class Cache4D(Cache3DBase):
    """Per-frame caches for dynamic scenes (depth known for all frames).

    Parity: Cache4D (cache_3d.py:424-433): render uses the cache frame at
    start_frame_idx + t for target frame t.
    """

    def update_cache(self, *args, **kwargs):
        raise NotImplementedError
