"""VideoTokenizer.warm_compiles must cover the generation encode phase.

Same drift-guard family as tests/test_warm_compiles.py (denoise step
programs): record the (shape, dtype) signature of every _encode/_decode
lowering the warmer produces and every call the real generation phases
make (seed-latent encode, 2N warp-buffer encodes, final decode), and
assert warm covers drive EXACTLY — a silent mismatch would compile
never-used variants while the real run stays cold, quietly losing the
encode-phase win (VERDICT r3 'weak #3')."""

import numpy as np

import jax
import jax.numpy as jnp

from gen3c_tpu.models import vae as jvae
from gen3c_tpu.models.gen3c import Gen3CModel
from tests.test_vae import TINY_CFG

H, W = 24, 32
T_CHUNK = 9


def _sig_of(kwargs):
    x = kwargs.get("x", kwargs.get("z"))
    return (tuple(x.shape), np.dtype(x.dtype).name)


class _Recorder:
    """Wraps a jitted fn; records .lower() (warm) and call (drive)
    signatures while still executing for real."""

    def __init__(self, real):
        self.real = real
        self.lowered = set()
        self.called = set()

    def lower(self, **kwargs):
        self.lowered.add(_sig_of(kwargs))
        return self.real.lower(**kwargs)

    def __call__(self, **kwargs):
        self.called.add(_sig_of(kwargs))
        return self.real(**kwargs)


def _tiny_tok():
    params = jvae.init_vae_params(jax.random.PRNGKey(0), TINY_CFG)
    tok = jvae.VideoTokenizer(
        params, TINY_CFG, pixel_chunk_duration=T_CHUNK,
        spatial_resolution=(H, W),
    )
    tok._encode = _Recorder(tok._encode)
    tok._decode = _Recorder(tok._decode)
    return tok


def test_warm_compiles_covers_generation_encode_phase():
    tok = _tiny_tok()
    n = tok.warm_compiles()
    assert n == 2  # one encode + one decode program

    model = Gen3CModel(dit_params={}, dit_cfg=None, tokenizer=tok,
                       frame_buffer_max=2)

    # the three encode-phase consumers (gen3c_pipeline.generate)
    rng = np.random.RandomState(0)
    seed_frames = jnp.asarray(
        rng.rand(1, 3, 1, H, W).astype(np.float32) * 2 - 1
    )
    model.create_condition_latent_from_input_frames(
        seed_frames, num_frames_condition=1
    )
    warps = jnp.asarray(
        rng.rand(1, T_CHUNK, 2, 3, H, W).astype(np.float32) * 2 - 1
    )
    masks = jnp.ones((1, T_CHUNK, 2, 1, H, W), jnp.float32)
    model.encode_warped_frames(warps, masks)

    # decode phase
    lat = jnp.zeros(
        (1, TINY_CFG.latent_channels, tok.latent_chunk_duration,
         H // 8, W // 8),
        jnp.float32,
    )
    model.decode(lat)

    assert tok._encode.called, "drive made no encode calls"
    assert tok._decode.called, "drive made no decode calls"
    missing_enc = tok._encode.called - tok._encode.lowered
    missing_dec = tok._decode.called - tok._decode.lowered
    assert not missing_enc, f"encode calls not warmed: {missing_enc}"
    assert not missing_dec, f"decode calls not warmed: {missing_dec}"
    # and the warmer compiles nothing the drive never requests
    extra_enc = tok._encode.lowered - tok._encode.called
    extra_dec = tok._decode.lowered - tok._decode.called
    assert not extra_enc, f"never-used encode variants warmed: {extra_enc}"
    assert not extra_dec, f"never-used decode variants warmed: {extra_dec}"


def test_warm_compiles_is_stateless():
    tok = _tiny_tok()
    before = jax.tree.map(np.asarray, tok.params)
    tok.warm_compiles()
    after = jax.tree.map(np.asarray, tok.params)
    for k in before:
        np.testing.assert_array_equal(before[k], after[k])
