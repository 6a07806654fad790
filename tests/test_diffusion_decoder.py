"""AR latent diffusion decoder tests (tiny, random weights).

Numeric oracle vs the reference torch model lives in
tests/test_diffusion_decoder_parity.py (slow tier); these are the fast
behavioral checks of the token-conditioned flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gen3c_tpu.models import vae as jvae
from gen3c_tpu.pipelines.diffusion_decoder import (
    DDSamplingConfig,
    DIFFUSION_DECODER_TINY,
    DiffusionDecoderPipeline,
    init_dd_params,
    linear_blend_video_list,
    split_with_overlap,
)

CV_TINY = jvae.VAEConfig(
    channels=16, channels_mult=(2, 4, 4), num_res_blocks=1,
    attn_resolutions=(), resolution=256, patch_size=4,
    latent_channels=16, z_channels=16,
)


def _randomize_zero_leaves(params, key):
    """DiT init zero-inits the final/adaLN projections (standard DiT
    convention) — with them zero, the net output is identically 0 and
    token conditioning can't reach the video. Same recipe as the loop
    parity tests' reference-net setup."""
    leaves, treedef = jax.tree.flatten(params)
    out = []
    for i, leaf in enumerate(leaves):
        if jnp.abs(leaf).sum() == 0:
            leaf = (
                jax.random.normal(jax.random.fold_in(key, i), leaf.shape,
                                  leaf.dtype) * 0.02
            )
        out.append(leaf)
    return jax.tree.unflatten(treedef, out)


@pytest.fixture(scope="module")
def tiny_pipe():
    key = jax.random.PRNGKey(0)
    cv_params = jvae.init_vae_params(jax.random.fold_in(key, 1), CV_TINY)
    dit_params = init_dd_params(
        jax.random.fold_in(key, 2), DIFFUSION_DECODER_TINY, vocab_size=64
    )
    dit_params = _randomize_zero_leaves(dit_params, jax.random.fold_in(key, 3))
    return DiffusionDecoderPipeline(
        dit_params=dit_params,
        dit_cfg=DIFFUSION_DECODER_TINY,
        continuous_tokenizer=jvae.VideoTokenizer(
            cv_params, CV_TINY, pixel_chunk_duration=9,
        ),
        sampling=DDSamplingConfig(
            num_steps=2, dd_train_num_video_frames=9, overlap=1
        ),
    )


def test_diffusion_decoder_refines_tokens(tiny_pipe):
    # token grid 8x8 (16x compression) -> latent 16x16 -> pixel 128x128
    tokens = jnp.asarray(
        np.random.RandomState(0).randint(0, 64, (1, 2, 8, 8)), jnp.int32
    )
    video = tiny_pipe.refine(tokens)
    assert video.shape == (1, 3, 9, 128, 128)
    assert np.isfinite(np.asarray(video)).all()
    # token conditioning is live: different tokens -> different video
    tokens2 = jnp.asarray(
        np.random.RandomState(1).randint(0, 64, (1, 2, 8, 8)), jnp.int32
    )
    video2 = tiny_pipe.refine(tokens2)
    assert np.abs(np.asarray(video) - np.asarray(video2)).max() > 1e-4


def test_diffusion_decoder_chunked_long_video(tiny_pipe):
    """token T > chunk -> split_with_overlap + pixel linear blend
    (inference.py:41-117)."""
    tokens = jnp.asarray(
        np.random.RandomState(2).randint(0, 64, (1, 4, 8, 8)), jnp.int32
    )
    video = tiny_pipe.refine(tokens)
    # 3 chunks of 2 latent frames (overlap 1) -> 3 x 9 pixel frames,
    # blended with d=1: total 3*9 - 2*1 = 25
    assert video.shape == (1, 3, 25, 128, 128)
    assert np.isfinite(np.asarray(video)).all()


def test_split_with_overlap_matches_reference():
    import torch
    import torch.nn.functional as F

    x = np.random.RandomState(3).rand(1, 1, 7, 2, 2).astype(np.float32)
    ours = split_with_overlap(jnp.asarray(x), 3, overlap=1)
    # reference loop (utils.py:19-58)
    ref = []
    xt = torch.from_numpy(x)
    step = 3 - 1
    for start in range(0, 7 - 1, step):
        end = start + 3
        if end > 7:
            pad = end - 7
            ref.append(
                F.pad(xt[:, :, start:7], (0, 0, 0, 0, 0, pad), mode="reflect")
            )
        else:
            ref.append(xt[:, :, start:end])
    assert len(ours) == len(ref)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=1e-6)


def test_linear_blend_matches_reference():
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch

    from cosmos_predict1.autoregressive.diffusion_decoder.utils import (
        linear_blend_video_list as ref_blend,
    )

    rng = np.random.RandomState(4)
    vids = [rng.rand(1, 3, 6, 4, 4).astype(np.float32) for _ in range(3)]
    ours = np.asarray(
        linear_blend_video_list([jnp.asarray(v) for v in vids], 2)
    )
    ref = ref_blend([torch.from_numpy(v) for v in vids], 2).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_refine_pads_short_token_clips(tiny_pipe):
    """T' < latent_frames must reflect-pad to a full chunk (the default
    ar_4b geometry hits this: 5 token frames vs 8-frame chunks) — the
    refined video still decodes and callers trim to the true length."""
    import dataclasses as _dc

    from gen3c_tpu.pipelines.diffusion_decoder import DDSamplingConfig

    tok17 = jvae.VideoTokenizer(
        tiny_pipe.continuous_tokenizer.params, CV_TINY,
        pixel_chunk_duration=17,
    )
    pipe = _dc.replace(
        tiny_pipe,
        continuous_tokenizer=tok17,
        sampling=DDSamplingConfig(
            num_steps=2, dd_train_num_video_frames=17, overlap=1
        ),
    )
    tokens = jnp.asarray(
        np.random.RandomState(5).randint(0, 64, (1, 2, 8, 8)), jnp.int32
    )  # T'=2 < latent_frames=3 -> reflect-padded single chunk
    video = pipe.refine(tokens)
    assert video.shape == (1, 3, 17, 128, 128)
    assert np.isfinite(np.asarray(video)).all()


def test_split_with_overlap_unpaddable_raises():
    from gen3c_tpu.pipelines.diffusion_decoder import split_with_overlap

    tokens = jnp.zeros((1, 1, 1, 4, 4), jnp.int32)
    with pytest.raises(ValueError, match="reflect pad"):
        split_with_overlap(tokens, 8, overlap=2)


def test_build_dd_pipeline_checkpoint_gated(tmp_path):
    """Full-size DD without a converted checkpoint must raise (a random
    7B DD is ~14 GB of noise weights), and the AR CLI falls back to the
    DV decode on that error."""
    from gen3c_tpu.pipelines.diffusion_decoder import build_dd_pipeline

    with pytest.raises(FileNotFoundError, match="checkpoint-gated"):
        build_dd_pipeline("ar_4b", jax.random.PRNGKey(0),
                          checkpoint_dir=str(tmp_path))
