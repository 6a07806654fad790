"""Mesh-sharded cache rendering: target frames distributed over devices.

The splat render of each target frame is independent, so the 121-frame
warp render shards embarrassingly across the mesh (the reference instead
renders serially on one GPU with CPU staging, cache_3d.py:162-223).
Frames are padded to a multiple of the device count; sources/params are
replicated (one seed image per cache — small).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gen3c_tpu.ops import geometry


def sharded_render_cache(
    cache,
    mesh: Mesh,
    target_w2cs,  # (1, F, 4, 4)
    target_intrinsics,  # (1, F, 3, 3)
    axis: str = "cp",
):
    """Cache3DBuffer.render_cache with target frames sharded over `axis`.

    Returns (pixels (1, F, N, C, H, W), masks (1, F, N, 1, H, W)).
    """
    B, F_t = target_w2cs.shape[:2]
    assert B == 1
    n_dev = mesh.shape[axis]
    pad = (-F_t) % n_dev
    w2cs = jnp.concatenate(
        [jnp.asarray(target_w2cs, jnp.float32)]
        + [jnp.asarray(target_w2cs[:, -1:], jnp.float32)] * pad,
        axis=1,
    )
    ks = jnp.concatenate(
        [jnp.asarray(target_intrinsics, jnp.float32)]
        + [jnp.asarray(target_intrinsics[:, -1:], jnp.float32)] * pad,
        axis=1,
    )

    images = cache.input_image[0, 0, :, 0]  # (N, C, H, W) static cache
    points = cache.input_points[0, 0, :, 0]
    if cache.input_mask is not None:
        masks = cache.input_mask[0, 0, :, 0]
    else:
        masks = jnp.ones(
            (images.shape[0], 1) + images.shape[2:], jnp.float32
        )

    def body(w2cs_l, ks_l, images, points, masks):
        # w2cs_l: (1, F/n, 4, 4) local shard
        def one(args):
            w2c, k = args
            n = images.shape[0]
            w2c_n = jnp.broadcast_to(w2c[None], (n, 4, 4))
            k_n = jnp.broadcast_to(k[None], (n, 3, 3))
            warped, mask2, _, _ = geometry.forward_warp(
                images, masks, w2c_n, k_n, points, is_image=True
            )
            return warped, mask2

        return jax.lax.map(one, (w2cs_l[0], ks_l[0]), batch_size=2)

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(), P(), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    px, mk = mapped(w2cs, ks, images, points, masks)
    return px[None, :F_t], mk[None, :F_t]
