"""Multiview DiT tests."""

import numpy as np

import jax
import jax.numpy as jnp

from gen3c_tpu.models.dit_multiview import (
    MultiviewDiTConfig,
    init_multiview_dit_params,
    multiview_dit_forward,
)

TINY_MV = MultiviewDiTConfig(
    max_img_h=16,
    max_img_w=16,
    max_frames=8,
    in_channels=16,
    out_channels=16,
    model_channels=96,
    num_blocks=2,
    num_heads=4,
    crossattn_emb_channels=32,
    adaln_lora_dim=8,
    n_views=3,
    view_condition_dim=4,
    add_repeat_frame_embedding=True,
    dtype=jnp.float32,
)


def test_multiview_forward_shape():
    params = init_multiview_dit_params(jax.random.PRNGKey(0), TINY_MV)
    B, V, T, H, W = 1, 3, 2, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 16, V * T, H, W))
    t = jnp.asarray([0.5])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, V * 4, 32))
    out = multiview_dit_forward(params, TINY_MV, x, t, ctx, fps=24.0)
    assert out.shape == (B, 16, V * T, H, W)
    assert np.isfinite(np.asarray(out)).all()


def test_view_embedding_differentiates_views():
    """Identical per-view inputs must give different outputs per view
    (the view embedding breaks the symmetry)."""
    params = init_multiview_dit_params(jax.random.PRNGKey(3), TINY_MV)
    # randomize the zero-init layers so outputs are non-trivial
    params = jax.tree.map(
        lambda x: x
        + 0.02 * jax.random.normal(jax.random.PRNGKey(9), x.shape, x.dtype)
        if x.ndim >= 2 and float(jnp.abs(x).sum()) == 0.0
        else x,
        params,
    )
    B, V, T, H, W = 1, 3, 2, 8, 8
    one_view = jax.random.normal(jax.random.PRNGKey(4), (B, 16, T, H, W))
    x = jnp.tile(one_view, (1, 1, V, 1, 1))
    ctx = jnp.tile(
        jax.random.normal(jax.random.PRNGKey(5), (B, 4, 32)), (1, V, 1)
    )
    out = multiview_dit_forward(
        params, TINY_MV, x, jnp.asarray([1.0]), ctx, fps=24.0
    )
    v0 = np.asarray(out[:, :, :T])
    v1 = np.asarray(out[:, :, T : 2 * T])
    assert np.abs(v0 - v1).max() > 1e-6
