"""Block-streamed DiT (models/dit_streaming.py): must reproduce
dit_forward, and the staged block copies must be freed."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from gen3c_tpu.models.dit import (
    DiTConfig,
    dit_forward,
    init_dit_params,
    randomize_degenerate_inits,
)
from gen3c_tpu.models.dit_streaming import StreamingDiT


def _cfg():
    return DiTConfig(
        in_channels=17,
        model_channels=64,
        num_blocks=3,
        num_heads=2,
        adaln_lora_dim=8,
        rope_t_extrapolation_ratio=2.0,
        dtype=jnp.float32,
    )


def test_streaming_matches_dit_forward():
    cfg = _cfg()
    params = randomize_degenerate_inits(
        init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 17, 4, 8, 16), jnp.float32)
    t = jnp.asarray([0.3, 0.7], jnp.float32)
    ctx = jnp.asarray(rng.randn(2, 6, 1024), jnp.float32)

    ref = np.asarray(dit_forward(params, cfg, x, t, ctx, fps=24.0))
    net = StreamingDiT(params, cfg, prefetch=2)
    # spy on the staged copies so the free-after-use contract is checked
    staged_seen = []
    orig_stage = net._stage

    def spy_stage(block):
        dev = orig_stage(block)
        staged_seen.append(dev)
        return dev

    net._stage = spy_stage
    out = np.asarray(net(x, t, ctx, fps=24.0))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    # every staged HBM copy was freed...
    assert staged_seen and all(
        leaf.is_deleted()
        for dev in staged_seen
        for leaf in jax.tree.leaves(dev)
        if isinstance(leaf, jax.Array)
    )
    # ...and the pinned sources survived
    assert all(
        not leaf.is_deleted()
        for b in net.blocks
        for leaf in jax.tree.leaves(b)
        if isinstance(leaf, jax.Array)
    )

    # repeat call works (pinned blocks still valid after deletion pass)
    out2 = np.asarray(net(x, t, ctx, fps=24.0))
    np.testing.assert_allclose(out2, out, rtol=0, atol=0)


def test_streaming_prefetch_one_and_large():
    cfg = _cfg()
    params = randomize_degenerate_inits(
        init_dit_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    )
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 17, 4, 8, 16), jnp.float32)
    t = jnp.asarray([0.5], jnp.float32)
    ctx = jnp.asarray(rng.randn(1, 6, 1024), jnp.float32)
    ref = np.asarray(dit_forward(params, cfg, x, t, ctx, fps=24.0))
    for prefetch in (1, 8):
        out = np.asarray(
            StreamingDiT(params, cfg, prefetch=prefetch)(x, t, ctx)
        )
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_streaming_with_temporal_band_matches_dit_forward():
    """cfg.attn_temporal_window flows through the block-streamed path
    and matches the resident dit_forward with the same band."""
    import dataclasses

    cfg = dataclasses.replace(_cfg(), attn_temporal_window=1)
    params = randomize_degenerate_inits(
        init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    )
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 17, 4, 8, 16), jnp.float32)
    t = jnp.asarray([0.5], jnp.float32)
    ctx = jnp.asarray(rng.randn(1, 6, 1024), jnp.float32)
    ref = np.asarray(dit_forward(params, cfg, x, t, ctx, fps=24.0))
    out = np.asarray(StreamingDiT(params, cfg, prefetch=2)(x, t, ctx))
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # and the band actually bites vs full attention
    full_cfg = dataclasses.replace(cfg, attn_temporal_window=None)
    full = np.asarray(dit_forward(params, full_cfg, x, t, ctx, fps=24.0))
    assert np.abs(full - ref).max() > 1e-5
