"""Golden tests: 3D cache render/update vs reference Cache3D (torch CPU)."""

import numpy as np
import torch

import jax.numpy as jnp

from gen3c_tpu.cache import Cache3DBuffer, Cache3DBufferSelector, Cache4D
from tests.reference_oracle import load_reference_geometry
from tests.test_geometry import _rand_scene

fwu, cam_utils, cache_3d = load_reference_geometry()


def _psnr(a, b, peak=2.0):
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(peak**2 / max(mse, 1e-12))


def _targets(k, n_frames=3):
    # include rotation + x/y translation: pure-axis moves put projected
    # points exactly on integer pixel rows, where the reference splat
    # double-counts (floor==ceil) and parity is fp-noise-sensitive.
    w2cs, ks = [], []
    for i in range(n_frames):
        th = 0.02 * i
        m = np.array(
            [
                [np.cos(th), 0, np.sin(th), 0.05 * i],
                [0, 1, 0, 0.03 * i],
                [-np.sin(th), 0, np.cos(th), 0],
                [0, 0, 0, 1],
            ],
            np.float32,
        )
        w2cs.append(m)
        ks.append(k[0])
    return np.stack(w2cs)[None], np.stack(ks)[None]


def test_cache3d_buffer_render_matches_reference():
    image, depth, k, w2c, _ = _rand_scene(b=1, smooth_depth=True)
    t_w2cs, t_ks = _targets(k)

    ref_cache = cache_3d.Cache3D_Buffer(
        frame_buffer_max=2,
        noise_aug_strength=0.0,
        input_image=torch.from_numpy(image),
        input_depth=torch.from_numpy(depth),
        input_w2c=torch.from_numpy(w2c),
        input_intrinsics=torch.from_numpy(k),
        device="cpu",
        weight_dtype=torch.float32,
    )
    ref_px, ref_mask = ref_cache.render_cache(
        torch.from_numpy(t_w2cs), torch.from_numpy(t_ks)
    )

    ours = Cache3DBuffer(
        frame_buffer_max=2,
        noise_aug_strength=0.0,
        input_image=jnp.asarray(image),
        input_depth=jnp.asarray(depth),
        input_w2c=jnp.asarray(w2c),
        input_intrinsics=jnp.asarray(k),
    )
    px, mask = ours.render_cache(jnp.asarray(t_w2cs), jnp.asarray(t_ks))

    assert px.shape == tuple(ref_px.shape), (px.shape, ref_px.shape)
    assert np.mean(np.asarray(mask) != ref_mask.numpy()) < 0.01
    assert _psnr(np.asarray(px), ref_px.numpy()) > 35.0


def test_cache3d_update_and_rerender():
    """Fast smoke of the update+re-render path. The NUMERIC oracle for
    the composed chain (update_cache -> align -> ring insert -> re-render
    -> conditioning latents, both alignment methods) is
    tests/test_ar_chain_parity.py (slow tier)."""
    image, depth, k, w2c, w2c_tgt = _rand_scene(b=1, smooth_depth=True)
    ours = Cache3DBuffer(
        frame_buffer_max=2,
        input_image=jnp.asarray(image),
        input_depth=jnp.asarray(depth),
        input_w2c=jnp.asarray(w2c),
        input_intrinsics=jnp.asarray(k),
    )
    assert ours.input_image.shape[2] == 1
    new_img = jnp.asarray(image * 0.5)
    new_depth = jnp.asarray(depth * 1.2)
    ours.update_cache(
        new_img,
        new_depth,
        jnp.asarray(w2c_tgt),
        new_intrinsics=jnp.asarray(k),
        depth_alignment=True,
        alignment_method="rigid",
    )
    assert ours.input_image.shape[2] == 2  # ring buffer grew
    t_w2cs, t_ks = _targets(k)
    px, mask = ours.render_cache(jnp.asarray(t_w2cs), jnp.asarray(t_ks))
    assert px.shape == (1, 3, 2, 3, 24, 32)
    assert np.isfinite(np.asarray(px)).all()


def test_buffer_selector_picks_best_overlap():
    # two source frames: one facing the targets, one far off to the side
    image, depth, k, w2c, _ = _rand_scene(b=1, smooth_depth=True)
    far = np.eye(4, dtype=np.float32)
    far[0, 3] = 50.0  # way off — warps out of frame
    images = np.stack([image[0], image[0] * 0.3])[None]  # (1,2,C,H,W) as N dim
    depths = np.stack([depth[0], depth[0]])[None]
    w2cs = np.stack([w2c[0], far])[None]
    ks = np.stack([k[0], k[0]])[None]

    sel = Cache3DBufferSelector(
        frame_buffer_max=1,
        input_image=jnp.asarray(images),
        input_depth=jnp.asarray(depths),
        input_w2c=jnp.asarray(w2cs),
        input_intrinsics=jnp.asarray(ks),
        input_format=["B", "N", "C", "H", "W"],
    )
    t_w2cs, t_ks = _targets(k)
    px, mask = sel.render_cache(jnp.asarray(t_w2cs), jnp.asarray(t_ks))
    assert px.shape[2] == 1  # selected top-1 buffer
    # selected buffer must be the on-axis one => decent coverage
    assert np.asarray(mask).mean() > 0.5

    # reference comparison
    ref_sel = cache_3d.Cache3D_BufferSelector(
        frame_buffer_max=1,
        input_image=torch.from_numpy(images),
        input_depth=torch.from_numpy(depths),
        input_w2c=torch.from_numpy(w2cs),
        input_intrinsics=torch.from_numpy(ks),
        input_format=["B", "N", "C", "H", "W"],
        device="cpu",
        weight_dtype=torch.float32,
    )
    ref_px, ref_mask = ref_sel.render_cache(
        torch.from_numpy(t_w2cs), torch.from_numpy(t_ks)
    )
    assert _psnr(np.asarray(px), ref_px.numpy()) > 35.0


def test_cache4d_per_frame_rendering():
    # 3-frame dynamic cache; frame f renders from cache frame f
    rng = np.random.RandomState(0)
    image, depth, k, w2c, _ = _rand_scene(b=1, smooth_depth=True)
    images = np.stack([image[0] * (1 - 0.3 * f) for f in range(3)])[None]
    depths = np.stack([depth[0]] * 3)[None]
    w2cs = np.stack([w2c[0]] * 3)[None]
    ks = np.stack([k[0]] * 3)[None]
    c4 = Cache4D(
        input_image=jnp.asarray(images),
        input_depth=jnp.asarray(depths),
        input_w2c=jnp.asarray(w2cs),
        input_intrinsics=jnp.asarray(ks),
        input_format=["B", "F", "C", "H", "W"],
    )
    t_w2cs, t_ks = _targets(k, n_frames=3)
    px, _ = c4.render_cache(jnp.asarray(t_w2cs), jnp.asarray(t_ks))

    ref = cache_3d.Cache4D(
        input_image=torch.from_numpy(images),
        input_depth=torch.from_numpy(depths),
        input_w2c=torch.from_numpy(w2cs),
        input_intrinsics=torch.from_numpy(ks),
        input_format=["B", "F", "C", "H", "W"],
        device="cpu",
        weight_dtype=torch.float32,
    )
    ref_px, _ = ref.render_cache(torch.from_numpy(t_w2cs), torch.from_numpy(t_ks))
    assert _psnr(np.asarray(px), ref_px.numpy()) > 35.0


def test_cache4d_start_frame_idx_chunks():
    """Later AR chunks index later cache frames (cache_3d.py:163-165)."""
    image, depth, k, w2c, _ = _rand_scene(b=1, smooth_depth=True)
    images = np.stack([image[0] * (1 - 0.2 * f) for f in range(5)])[None]
    depths = np.stack([depth[0]] * 5)[None]
    w2cs_src = np.stack([w2c[0]] * 5)[None]
    ks_src = np.stack([k[0]] * 5)[None]
    c4 = Cache4D(
        input_image=jnp.asarray(images),
        input_depth=jnp.asarray(depths),
        input_w2c=jnp.asarray(w2cs_src),
        input_intrinsics=jnp.asarray(ks_src),
        input_format=["B", "F", "C", "H", "W"],
    )
    t_w2cs, t_ks = _targets(k, n_frames=2)
    px0, _ = c4.render_cache(jnp.asarray(t_w2cs), jnp.asarray(t_ks),
                             start_frame_idx=0)
    px3, _ = c4.render_cache(jnp.asarray(t_w2cs), jnp.asarray(t_ks),
                             start_frame_idx=3)
    # identity first pose: rendering frame f reproduces source frame f
    src0 = images[0, 0]
    src3 = images[0, 3]
    got0 = np.asarray(px0)[0, 0, 0]
    got3 = np.asarray(px3)[0, 0, 0]
    assert np.abs(got0 - src0).mean() < np.abs(got0 - src3).mean()
    assert np.abs(got3 - src3).mean() < np.abs(got3 - src0).mean()


def test_noise_augmentation_ordering():
    """Older buffers get stronger noise (cache_3d.py:337-342)."""
    image, depth, k, w2c, _ = _rand_scene(b=1, smooth_depth=True)
    cache = Cache3DBuffer(
        frame_buffer_max=2,
        noise_aug_strength=0.5,
        input_image=jnp.asarray(image),
        input_depth=jnp.asarray(depth),
        input_w2c=jnp.asarray(w2c),
        input_intrinsics=jnp.asarray(k),
    )
    cache.update_cache(
        jnp.asarray(image * 0.5), jnp.asarray(depth), jnp.asarray(w2c),
        new_intrinsics=jnp.asarray(k), depth_alignment=False,
    )
    t_w2cs, t_ks = _targets(k, n_frames=1)
    noisy, _ = cache.render_cache(jnp.asarray(t_w2cs), jnp.asarray(t_ks))
    cache.noise_aug_strength = 0.0
    clean, _ = cache.render_cache(jnp.asarray(t_w2cs), jnp.asarray(t_ks))
    d = np.abs(np.asarray(noisy) - np.asarray(clean))[0, 0]  # (N,C,H,W)
    # newest-first: buffer 0 (newest) noise strength = 1*0.5, buffer 1 = 0
    assert d[1].mean() < 1e-6 <= d[0].mean()


def test_frame_buffer_max_one_replaces():
    image, depth, k, w2c, _ = _rand_scene(b=1, smooth_depth=True)
    cache = Cache3DBuffer(
        frame_buffer_max=1,
        input_image=jnp.asarray(image),
        input_depth=jnp.asarray(depth),
        input_w2c=jnp.asarray(w2c),
        input_intrinsics=jnp.asarray(k),
    )
    cache.update_cache(
        jnp.asarray(image * 0.1), jnp.asarray(depth), jnp.asarray(w2c),
        new_intrinsics=jnp.asarray(k), depth_alignment=False,
    )
    assert cache.input_image.shape[2] == 1  # replaced, not grown


def test_warm_update_compiles_is_stateless_and_matches():
    """Speculative compile warming (AR inter-chunk): AOT-lowers the
    alignment render, the non-rigid scale-map optimizer, and the
    post-insert re-render on abstract shapes — it must not touch cache
    state, and a subsequent REAL update+render must be bitwise the same
    as on an unwarmed twin."""
    image, depth, k, w2c, _ = _rand_scene(b=1, smooth_depth=True)

    def build():
        return Cache3DBuffer(
            frame_buffer_max=2,
            input_image=jnp.asarray(image),
            input_depth=jnp.asarray(depth),
            input_w2c=jnp.asarray(w2c),
            input_intrinsics=jnp.asarray(k),
        )

    warmed, plain = build(), build()
    warmed.warm_update_compiles(num_targets=3)
    # state untouched by warming
    np.testing.assert_array_equal(
        np.asarray(warmed.input_image), np.asarray(plain.input_image)
    )
    assert warmed.input_image.shape[2] == 1  # still 1 buffer

    t_w2cs, t_ks = _targets(k, n_frames=3)
    for c in (warmed, plain):
        c.update_cache(
            jnp.asarray(image * 0.5), jnp.asarray(depth * 1.1),
            jnp.asarray(w2c), new_intrinsics=jnp.asarray(k),
            depth_alignment=True, alignment_method="non_rigid",
        )
    a, am = warmed.render_cache(jnp.asarray(t_w2cs), jnp.asarray(t_ks))
    b, bm = plain.render_cache(jnp.asarray(t_w2cs), jnp.asarray(t_ks))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(am), np.asarray(bm))
