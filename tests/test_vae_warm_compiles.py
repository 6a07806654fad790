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


def _tiny_tok():
    params = jvae.init_vae_params(jax.random.PRNGKey(0), TINY_CFG)
    tok = jvae.VideoTokenizer(
        params, TINY_CFG, pixel_chunk_duration=T_CHUNK,
        spatial_resolution=(H, W),
    )
    # record every dispatch: (signature, hit-a-warmed-executable?)
    tok._enc_calls, tok._dec_calls = [], []
    orig_re, orig_rd = tok._run_encode, tok._run_decode

    def run_encode(p, x):
        key = (tuple(x.shape), np.dtype(x.dtype).name)
        tok._enc_calls.append((key, key in tok._compiled_encode))
        return orig_re(p, x)

    def run_decode(p, z):
        key = (tuple(z.shape), np.dtype(z.dtype).name)
        tok._dec_calls.append((key, key in tok._compiled_decode))
        return orig_rd(p, z)

    tok._run_encode, tok._run_decode = run_encode, run_decode
    return tok


def test_warm_compiles_covers_generation_encode_phase():
    tok = _tiny_tok()
    n = tok.warm_compiles()
    assert n == 2  # one encode + one decode program
    assert len(tok._compiled_encode) == 1 and len(tok._compiled_decode) == 1

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

    assert tok._enc_calls, "drive made no encode calls"
    assert tok._dec_calls, "drive made no decode calls"
    # every drive dispatch must hit a warmed AOT executable — a miss
    # falls back to the cold jit path, silently losing the encode win
    cold_enc = [k for k, hit in tok._enc_calls if not hit]
    cold_dec = [k for k, hit in tok._dec_calls if not hit]
    assert not cold_enc, f"encode calls missed the warmed set: {cold_enc}"
    assert not cold_dec, f"decode calls missed the warmed set: {cold_dec}"
    # and the warmer compiles nothing the drive never requests
    called_enc = {k for k, _ in tok._enc_calls}
    called_dec = {k for k, _ in tok._dec_calls}
    extra_enc = set(tok._compiled_encode) - called_enc
    extra_dec = set(tok._compiled_decode) - called_dec
    assert not extra_enc, f"never-used encode variants warmed: {extra_enc}"
    assert not extra_dec, f"never-used decode variants warmed: {extra_dec}"


def test_warm_compiles_is_stateless():
    tok = _tiny_tok()
    before = jax.tree.map(np.asarray, tok.params)
    tok.warm_compiles()
    after = jax.tree.map(np.asarray, tok.params)
    for k in before:
        np.testing.assert_array_equal(before[k], after[k])
