"""AR world-model CLI e2e (tiny preset, random weights)."""

import os

import numpy as np


import pytest


@pytest.mark.parametrize("dd", ["dd", "no_dd"])
def test_ar_cli_end_to_end(tmp_path, dd):
    """Both output paths: the latent diffusion decoder refine (the
    reference default, world_generation_pipeline.py:222-244) and the
    plain DV decode behind --disable_diffusion_decoder."""
    import imageio

    from gen3c_tpu.pipelines import autoregressive as cli

    frames = (np.random.RandomState(0).rand(9, 64, 64, 3) * 255).astype(
        np.uint8
    )
    src = tmp_path / "in.gif"
    imageio.mimsave(str(src), list(frames))

    argv = [
        "--input_video", str(src),
        "--model_preset", "ar_tiny",
        "--video_save_folder", str(tmp_path / "out"),
        "--temperature", "0.9",
        "--diffusion_decoder_steps", "2",
    ]
    if dd == "no_dd":
        argv.append("--disable_diffusion_decoder")
    args = cli.create_parser().parse_args(argv)
    path = cli.demo(args)
    assert os.path.exists(path) or os.path.isdir(os.path.splitext(path)[0])


def test_fsq_tokenizer_video_roundtrip():
    import jax
    import jax.numpy as jnp

    from gen3c_tpu.models import vae as jvae
    from gen3c_tpu.pipelines.autoregressive import DV_TINY
    from gen3c_tpu.models.fsq import DiscreteVideoFSQTokenizer

    params = jvae.init_vae_params(jax.random.PRNGKey(0), DV_TINY)
    tok = DiscreteVideoFSQTokenizer(params, DV_TINY, pixel_chunk_duration=9)
    video = jnp.asarray(
        np.random.RandomState(0).rand(1, 3, 9, 64, 64).astype(np.float32) * 2
        - 1
    )
    codes, idx = tok.encode(video)
    assert idx.shape == (1, 2, 8, 8)
    assert int(jnp.max(idx)) < DV_TINY.vocab_size
    out = tok.decode(idx)
    assert out.shape == (1, 3, 9, 64, 64)
    assert np.isfinite(np.asarray(out)).all()
