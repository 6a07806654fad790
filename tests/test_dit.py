"""DiT network tests: shapes, RoPE table parity vs reference, block math."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gen3c_tpu.models import dit as dit_mod
from gen3c_tpu.models.dit import (
    DiTConfig,
    build_extra_pos_emb,
    dit_forward,
    init_dit_params,
    rope_3d_table,
    timestep_sincos,
)

TINY = DiTConfig(
    max_img_h=16,
    max_img_w=16,
    max_frames=8,
    in_channels=81,
    out_channels=16,
    model_channels=96,
    num_blocks=2,
    num_heads=4,
    crossattn_emb_channels=32,
    adaln_lora_dim=8,
    rope_t_extrapolation_ratio=2.0,
    dtype=jnp.float32,
)


def test_dit_forward_shape():
    key = jax.random.PRNGKey(0)
    params = init_dit_params(key, TINY)
    B, C, T, H, W = 2, 81, 4, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (B, C, T, H, W))
    t = jnp.asarray([0.5, 1.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 6, 32))
    out = dit_forward(params, TINY, x, t, ctx)
    assert out.shape == (B, 16, T, H, W)
    assert np.isfinite(np.asarray(out)).all()


def test_dit_zero_init_adaln_makes_gates_zero():
    # with zero-init adaLN w2 + zero-init final linear, output must be 0
    params = init_dit_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 81, 2, 8, 8))
    out = dit_forward(params, TINY, x, jnp.asarray([1.0]),
                      jnp.zeros((1, 4, 32)))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_timestep_sincos_matches_reference():
    import sys

    sys.path.insert(0, "/root/reference")
    from tests.reference_oracle import stub_cuda_stack

    stub_cuda_stack()
    from cosmos_predict1.diffusion.module.blocks import Timesteps

    ts = Timesteps(96)
    t = torch.tensor([0.25, -1.1, 3.0])
    ref = ts(t).numpy()
    ours = np.asarray(timestep_sincos(jnp.asarray([0.25, -1.1, 3.0]), 96))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_rope_table_matches_reference():
    import sys

    sys.path.insert(0, "/root/reference")
    from tests.reference_oracle import stub_cuda_stack

    stub_cuda_stack()
    # reference pos-emb registers cuda buffers; patch .cuda() to no-op
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        from cosmos_predict1.diffusion.module.position_embedding import (
            VideoRopePosition3DEmb,
        )

        emb = VideoRopePosition3DEmb(
            head_dim=24,
            len_h=8,
            len_w=8,
            len_t=4,
            h_extrapolation_ratio=1.0,
            w_extrapolation_ratio=1.0,
            t_extrapolation_ratio=2.0,
        )
        ref_angles = emb.generate_embeddings(
            (1, 4, 8, 8, 96), fps=torch.tensor([24.0])
        ).numpy()[:, 0, 0, :]  # (L, 24) — half-angle table
    finally:
        torch.Tensor.cuda = orig_cuda

    cfg = DiTConfig(
        max_img_h=16,
        max_img_w=16,
        max_frames=4,
        model_channels=96,
        num_heads=4,
        rope_t_extrapolation_ratio=2.0,
    )
    cos, sin = rope_3d_table(cfg, 4, 8, 8, fps=24.0)
    np.testing.assert_allclose(np.asarray(cos), np.cos(ref_angles), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), np.sin(ref_angles), rtol=1e-5, atol=1e-6)


def test_extra_pos_emb_rms_normalized():
    params = init_dit_params(jax.random.PRNGKey(3), TINY)
    emb = build_extra_pos_emb(params, 4, 8, 8)
    assert emb.shape == (4, 8, 8, 96)
    # reference normalize(): x / (eps + ||x||/sqrt(D)) => RMS ~= 1
    rms = np.sqrt(np.mean(np.asarray(emb) ** 2, axis=-1))
    np.testing.assert_allclose(rms, 1.0, atol=1e-3)


def test_patchify_unpatchify_roundtrip_layout():
    # unpatchify(patch tokens) must invert patchify's layout when the
    # embedder weight is identity-like
    cfg = TINY
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 2, 8, 8))
    ps = cfg.patch_spatial
    # tokens: b t h w (c m n) with patch 2x2
    xt = x.reshape(1, 16, 2, 4, ps, 4, ps)
    tokens_manual = xt.transpose(0, 2, 3, 5, 1, 4, 6).reshape(1, 2, 4, 4, 16 * 4)
    # the reference unpatchify layout is (p1 p2 t C); build it accordingly
    perm = tokens_manual.reshape(1, 2, 4, 4, 16, ps, ps)  # c m n
    perm = perm.transpose(0, 1, 2, 3, 5, 6, 4).reshape(1, 2, 4, 4, ps * ps * 16)
    out = dit_mod.unpatchify(cfg, perm, 2, 8, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_apply_rope_rotates_pairs():
    # RoPE with angle 0 is identity
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 2, 8))
    cos = jnp.ones((5, 8))
    sin = jnp.zeros((5, 8))
    out = dit_mod.apply_rope(x, cos, sin)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
    # 90 degrees: x1 -> -x2, x2 -> x1
    cos = jnp.zeros((5, 8))
    sin = jnp.ones((5, 8))
    out = np.asarray(dit_mod.apply_rope(x, cos, sin))
    xn = np.asarray(x)
    np.testing.assert_allclose(out[..., :4], -xn[..., 4:], atol=1e-6)
    np.testing.assert_allclose(out[..., 4:], xn[..., :4], atol=1e-6)


from gen3c_tpu.models.dit import (  # noqa: E402 (shared bench/test util)
    randomize_degenerate_inits as _randomize_degenerate_inits,
)


def test_span_delta_refresh_then_skip_identical():
    """Delta-DiT span caching: on the SAME input, the skip path (blocks
    outside the span + cached delta) reproduces the full forward
    exactly."""
    import dataclasses

    cfg = dataclasses.replace(TINY, num_blocks=3, cache_block_span=(1, 2))
    params = _randomize_degenerate_inits(
        init_dit_params(jax.random.PRNGKey(0), cfg)
    )
    B, C, T, H, W = 1, 81, 2, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (B, C, T, H, W))
    t = jnp.asarray([0.4])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 6, 32))

    full, delta = dit_forward(params, cfg, x, t, ctx, fps=24.0,
                              return_span_delta=True)
    plain = dit_forward(params, cfg, x, t, ctx, fps=24.0)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(plain))
    skipped = dit_forward(params, cfg, x, t, ctx, fps=24.0,
                          span_delta=delta)
    np.testing.assert_allclose(
        np.asarray(skipped), np.asarray(full), rtol=1e-5, atol=1e-6
    )
    # the delta really carries the span's contribution: zeroing it
    # changes the output
    broken = dit_forward(params, cfg, x, t, ctx, fps=24.0,
                         span_delta=jnp.zeros_like(delta))
    assert float(jnp.max(jnp.abs(broken - full))) > 1e-4


def test_span_delta_requires_config():
    params = init_dit_params(jax.random.PRNGKey(0), TINY)
    x = jnp.zeros((1, 81, 2, 8, 8))
    with pytest.raises(ValueError, match="cache_block_span"):
        dit_forward(params, TINY, x, jnp.asarray([0.1]),
                    jnp.zeros((1, 4, 32)), return_span_delta=True)


def test_sampler_span_cache_empty_span_is_uncached():
    """span=(k,k): the cached delta is identically zero and the skip
    path runs every block -> the span-cached sampler trajectory equals
    the uncached one bitwise for ANY interval."""
    import dataclasses

    from gen3c_tpu.diffusion.sampler import generate_samples
    from gen3c_tpu.models.gen3c import (
        _dit_net_fn,
        _dit_net_fn_span_refresh,
        _dit_net_fn_span_skip,
    )

    cfg = dataclasses.replace(TINY, in_channels=17, cache_block_span=(1, 1))
    params = _randomize_degenerate_inits(
        init_dit_params(jax.random.PRNGKey(0), cfg)
    )
    B, C, T, H, W = 1, 16, 2, 8, 8
    rng = np.random.RandomState(0)
    kwargs = dict(
        init_noise=jnp.asarray(rng.randn(B, C, T, H, W), jnp.float32),
        augment_noise=jnp.zeros((B, C, T, H, W)),
        crossattn_cond=jnp.asarray(rng.randn(B, 6, 32), jnp.float32),
        crossattn_uncond=jnp.zeros((B, 6, 32)),
        gt_latent=jnp.zeros((B, C, T, H, W)),
        condition_video_indicator=jnp.zeros((1, 1, T, 1, 1)),
        condition_video_input_mask=jnp.zeros((B, 1, T, H, W)),
        num_steps=6,
        guidance=0.0,
    )
    ref = generate_samples(
        net_fn=_dit_net_fn, net_params=(params, cfg), **kwargs
    )
    out = generate_samples(
        net_fn=_dit_net_fn_span_refresh,
        net_fn_skip=_dit_net_fn_span_skip,
        net_params=(params, cfg),
        step_cache_interval=3,
        **kwargs,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sampler_span_cache_real_span_diverges_but_finite():
    import dataclasses

    from gen3c_tpu.diffusion.sampler import generate_samples
    from gen3c_tpu.models.gen3c import (
        _dit_net_fn,
        _dit_net_fn_span_refresh,
        _dit_net_fn_span_skip,
    )

    cfg = dataclasses.replace(TINY, in_channels=17, cache_block_span=(0, 1))
    params = _randomize_degenerate_inits(
        init_dit_params(jax.random.PRNGKey(0), cfg)
    )
    B, C, T, H, W = 1, 16, 2, 8, 8
    rng = np.random.RandomState(1)
    kwargs = dict(
        init_noise=jnp.asarray(rng.randn(B, C, T, H, W), jnp.float32),
        augment_noise=jnp.zeros((B, C, T, H, W)),
        crossattn_cond=jnp.asarray(rng.randn(B, 6, 32), jnp.float32),
        crossattn_uncond=jnp.zeros((B, 6, 32)),
        gt_latent=jnp.zeros((B, C, T, H, W)),
        condition_video_indicator=jnp.zeros((1, 1, T, 1, 1)),
        condition_video_input_mask=jnp.zeros((B, 1, T, H, W)),
        num_steps=8,
        guidance=0.0,
    )
    ref = generate_samples(
        net_fn=_dit_net_fn, net_params=(params, cfg), **kwargs
    )
    out = generate_samples(
        net_fn=_dit_net_fn_span_refresh,
        net_fn_skip=_dit_net_fn_span_skip,
        net_params=(params, cfg),
        step_cache_interval=3,
        **kwargs,
    )
    assert np.isfinite(np.asarray(out)).all()
    assert float(jnp.max(jnp.abs(out - ref))) > 1e-7


def test_span_delta_int8_carry_close():
    """int8 span-delta carry (cache_span_dtype='int8'): the skip path on
    unchanged input stays within quantization tolerance of the full
    forward, with a 4x smaller carry."""
    import dataclasses

    cfg = dataclasses.replace(TINY, num_blocks=3, cache_block_span=(1, 2),
                              cache_span_dtype="int8")
    params = _randomize_degenerate_inits(
        init_dit_params(jax.random.PRNGKey(0), cfg)
    )
    B, C, T, H, W = 1, 81, 2, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (B, C, T, H, W))
    t = jnp.asarray([0.4])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 6, 32))

    full, delta = dit_forward(params, cfg, x, t, ctx, fps=24.0,
                              return_span_delta=True)
    codes, scales = delta
    assert codes.dtype == jnp.int8 and scales.dtype == jnp.float32
    skipped = dit_forward(params, cfg, x, t, ctx, fps=24.0,
                          span_delta=delta)
    err = float(jnp.max(jnp.abs(skipped - full)))
    ref = float(jnp.max(jnp.abs(full))) + 1e-8
    assert err / ref < 0.05, (err, ref)
