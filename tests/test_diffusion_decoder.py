"""AR latent diffusion decoder test (tiny, random weights)."""

import numpy as np

import jax
import jax.numpy as jnp


def test_diffusion_decoder_refines_tokens():
    from gen3c_tpu.models import vae as jvae
    from gen3c_tpu.models.dit import init_dit_params
    from gen3c_tpu.models.fsq import DiscreteVideoFSQTokenizer
    from gen3c_tpu.pipelines.autoregressive import DV_TINY
    from gen3c_tpu.pipelines.diffusion_decoder import (
        DIFFUSION_DECODER_TINY,
        DiffusionDecoderPipeline,
    )

    key = jax.random.PRNGKey(0)
    dv_params = jvae.init_vae_params(key, DV_TINY)
    cv_cfg = jvae.VAEConfig(
        channels=16, channels_mult=(2, 4, 4), num_res_blocks=1,
        attn_resolutions=(), resolution=256, patch_size=4,
        latent_channels=16, z_channels=16,
    )
    cv_params = jvae.init_vae_params(jax.random.fold_in(key, 1), cv_cfg)
    dit_params = init_dit_params(
        jax.random.fold_in(key, 2), DIFFUSION_DECODER_TINY
    )

    pipe = DiffusionDecoderPipeline(
        dit_params=dit_params,
        dit_cfg=DIFFUSION_DECODER_TINY,
        discrete_tokenizer=DiscreteVideoFSQTokenizer(
            dv_params, DV_TINY, pixel_chunk_duration=9
        ),
        continuous_tokenizer=jvae.VideoTokenizer(
            cv_params, cv_cfg, pixel_chunk_duration=9
        ),
        num_steps=2,
    )
    tokens = jnp.asarray(
        np.random.RandomState(0).randint(0, DV_TINY.vocab_size, (1, 2, 8, 8)),
        jnp.int32,
    )
    video = pipe.refine(tokens)
    assert video.shape == (1, 3, 9, 64, 64)
    assert np.isfinite(np.asarray(video)).all()
