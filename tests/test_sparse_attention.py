"""Temporal-band sparse self-attention (cfg.attn_temporal_window):
mask structure, XLA-path numerics, and full-window equivalence."""

import numpy as np

import jax
import jax.numpy as jnp

from gen3c_tpu.models.dit import (
    DiTConfig,
    _dense_band_mask,
    attention_op,
    dit_forward,
    init_dit_params,
    make_temporal_band_mask,
)


def test_mask_matches_dense():
    L, hw, win, pre = 64, 8, 2, 1
    lazy = make_temporal_band_mask(L, hw, win, pre)
    dense = np.asarray(_dense_band_mask(L, L, hw, win, pre))
    np.testing.assert_array_equal(lazy[0:L, 0:L], dense)
    # block slices too (the access pattern the splash MaskInfo uses)
    np.testing.assert_array_equal(lazy[16:32, 40:64], dense[16:32, 40:64])


def test_attention_op_band_numerics():
    rng = np.random.RandomState(0)
    B, L, H, D = 1, 32, 2, 8
    q = jnp.asarray(rng.randn(B, L, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, L, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, L, H, D), jnp.float32)
    hw, win, pre = 8, 1, 1
    out = attention_op(q, k, v, temporal_band=(hw, win, pre))
    # manual masked softmax
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(D)
    mask = np.asarray(_dense_band_mask(L, L, hw, win, pre))
    logits = np.where(mask[None, None], logits, -1e30)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bkhd->bqhd", p, v)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def _cfg(**kw):
    return DiTConfig(
        max_img_h=16, max_img_w=16, max_frames=8,
        in_channels=16, out_channels=16, model_channels=96,
        num_blocks=2, num_heads=4, crossattn_emb_channels=32,
        adaln_lora_dim=8, dtype=jnp.float32, **kw,
    )


def test_full_window_equals_full_attention():
    """A window covering every frame == full attention bit-for-bit (the
    mask is all-true), and a narrow window changes the output."""
    params = init_dit_params(jax.random.PRNGKey(0), _cfg())
    # zero-initialized leaves (final linear, adaLN w2) would zero the
    # output; fill them so the band actually shows
    leaves, treedef = jax.tree.flatten(params)
    rng = np.random.RandomState(7)
    leaves = [
        jnp.asarray(rng.randn(*l.shape) * 0.02, l.dtype)
        if float(jnp.sum(jnp.abs(l))) == 0.0 else l
        for l in leaves
    ]
    params = jax.tree.unflatten(treedef, leaves)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 16, 4, 16, 16), jnp.float32)
    t = jnp.asarray([0.7])
    ctx = jnp.asarray(rng.randn(1, 6, 32), jnp.float32)

    full = dit_forward(params, _cfg(), x, t, ctx, fps=24.0)
    wide = dit_forward(
        params, _cfg(attn_temporal_window=4), x, t, ctx, fps=24.0)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(wide))

    narrow = dit_forward(
        params, _cfg(attn_temporal_window=0), x, t, ctx, fps=24.0)
    assert np.abs(np.asarray(narrow) - np.asarray(full)).max() > 1e-5


def test_factory_and_pipeline_with_band():
    """build_gen3c_model(attn_temporal_window=...) threads the knob into
    the DiT config and generation still runs end-to-end (tiny, CPU)."""
    from gen3c_tpu.pipelines.factory import build_gen3c_model
    from gen3c_tpu.pipelines.gen3c_pipeline import Gen3cPipeline

    model, preset = build_gen3c_model(
        "gen3c_tiny", checkpoint_dir=None, seed=0, attn_temporal_window=1)
    assert model.dit_cfg.attn_temporal_window == 1
    h, w, chunk = preset.height, preset.width, preset.chunk_size
    rng = np.random.RandomState(0)
    image = rng.rand(1, 3, 1, h, w).astype(np.float32) * 2 - 1
    warps = rng.rand(1, chunk, 1, 3, h, w).astype(np.float32) * 2 - 1
    masks = (rng.rand(1, chunk, 1, 1, h, w) > 0.3).astype(np.float32)
    pipe = Gen3cPipeline(model=model, num_steps=2, height=h, width=w)
    video, _ = pipe.generate(
        prompt="x", image_frames=image,
        rendered_warp_images=jnp.asarray(warps),
        rendered_warp_masks=jnp.asarray(masks),
    )
    assert video.shape == (chunk, h, w, 3)


def test_allgather_cp_band_rejected():
    """allgather CP + temporal band must raise (ADVICE r2: was a bare
    assert, stripped under python -O — the band would silently drop)."""
    import pytest

    from gen3c_tpu.models.dit import _attn_block, init_dit_params

    params = init_dit_params(jax.random.PRNGKey(0), _cfg())
    p = params["blocks"][0]["fa"]
    x = jnp.zeros((1, 16, 96), jnp.float32)
    with pytest.raises(ValueError, match="program-static"):
        _attn_block(
            p, x, None, 4, None, cp_axis="cp",
            cp_attn_impl="allgather", temporal_band=(4, 1, 1),
        )


def test_band_training_grads():
    """cfg.attn_temporal_window trains: full-window band grads equal
    full-attention grads exactly (mask all-true), narrow window trains
    finitely. (The TPU splash-kernel backward with the computed mask is
    probed separately: band-masked grad verified on v5e 2026-08-18.)"""
    from gen3c_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        train_step,
    )

    rng = np.random.RandomState(0)
    batch = {
        "x0": jnp.asarray(rng.randn(1, 16, 4, 8, 8), jnp.float32),
        "crossattn_emb": jnp.asarray(rng.randn(1, 4, 32), jnp.float32),
        "extra_channels": jnp.zeros((1, 1, 4, 8, 8), jnp.float32),
    }
    import dataclasses

    def cfg17(**kw):
        return dataclasses.replace(_cfg(**kw), in_channels=16 + 1)

    opt = make_optimizer(lr=1e-3, warmup_steps=1)
    params = init_dit_params(jax.random.PRNGKey(0), cfg17())
    # zero-init final/adaLN leaves make the loss attention-independent
    params = jax.tree.map(
        lambda x: (
            0.02 * jax.random.normal(jax.random.PRNGKey(3), x.shape, x.dtype)
            if float(jnp.sum(jnp.abs(x))) == 0.0 else x
        ),
        params,
    )
    key = jax.random.PRNGKey(5)

    s_full, m_full = train_step(
        init_train_state(params, opt), batch, key, cfg17(), opt)
    s_wide, m_wide = train_step(
        init_train_state(params, opt), batch, key,
        cfg17(attn_temporal_window=4), opt)
    np.testing.assert_array_equal(
        np.asarray(m_full["loss"]), np.asarray(m_wide["loss"]))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        s_full.params, s_wide.params)

    _, m_narrow = train_step(
        init_train_state(params, opt), batch, key,
        cfg17(attn_temporal_window=0), opt)
    assert np.isfinite(float(m_narrow["loss"]))
    assert float(m_narrow["loss"]) != float(m_full["loss"])
