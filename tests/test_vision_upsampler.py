"""Frames-conditioned (VLM) prompt upsampler: vision tower parity vs HF
Pixtral + embedding-splice generation (reference
video2world_prompt_upsampler_inference.py semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gen3c_tpu.aux.vision_encoder import (
    VisionConfig,
    convert_hf_pixtral_vision,
    init_vision_params,
    vision_encode,
    vision_tower_features,
)
from gen3c_tpu.models.ar_transformer import (
    ARConfig,
    generate,
    generate_with_embeddings,
    init_ar_params,
)

VCFG = VisionConfig(
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    intermediate_size=64,
    patch_size=4,
    image_size=32,
    text_hidden_size=48,
    dtype=jnp.float32,
)

TCFG = ARConfig(
    dim=48,
    n_layers=2,
    n_heads=4,
    n_kv_heads=2,
    vocab_size=64,
    ffn_hidden_size=96,
    max_seq_len=512,
    use_qk_normalization=False,
    dtype=jnp.float32,
)


def test_vision_tower_matches_hf_pixtral():
    """JAX tower == HF PixtralVisionModel last_hidden_state (converted
    random weights, 2D RoPE + RMSNorms + gated-SiLU MLPs)."""
    torch = pytest.importorskip("torch")
    from transformers import PixtralVisionConfig
    from transformers.models.pixtral.modeling_pixtral import (
        PixtralVisionModel,
    )

    hf_cfg = PixtralVisionConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        patch_size=4,
        image_size=32,
        head_dim=8,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = PixtralVisionModel(hf_cfg).eval()
    x = torch.randn(1, 3, 16, 24)
    with torch.no_grad():
        ref = hf(x).last_hidden_state[0].numpy()

    params = convert_hf_pixtral_vision(hf.state_dict(), VCFG)
    ours = np.asarray(
        vision_tower_features(params, VCFG, jnp.asarray(x[0].numpy()))
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_generate_with_embeddings_matches_token_generate():
    """Embedding-space prefill of the exact token embeddings must sample
    the same continuation as the token path."""
    params = init_ar_params(jax.random.PRNGKey(0), TCFG, jnp.float32)
    ids = jnp.asarray(
        np.random.RandomState(0).randint(0, 64, (1, 12)), jnp.int32
    )
    ref = np.asarray(
        generate(params, TCFG, ids, jax.random.PRNGKey(1),
                 max_new_tokens=8, temperature=0.0)
    )[0, 12:]
    emb = params["tok_embeddings"][ids]
    out = np.asarray(
        generate_with_embeddings(params, TCFG, emb, jax.random.PRNGKey(1),
                                 max_new_tokens=8, temperature=0.0)
    )[0]
    np.testing.assert_array_equal(out, ref)


class _StubTokenizer:
    """Deterministic char-level tokenizer; '[IMG]' -> image token 5."""

    eos_token_id = 1
    chat_template = None
    IMG_ID = 5

    def encode(self, text):
        ids = []
        i = 0
        while i < len(text):
            if text[i:i + 5] == "[IMG]":
                ids.append(self.IMG_ID)
                i += 5
            else:
                ids.append(6 + (ord(text[i]) % 50))
                i += 1
        return ids

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + int(i) % 26) for i in ids if int(i) > 5)


def _make_upsampler(max_new_tokens=6):
    from gen3c_tpu.aux.prompt_upsampler import VLMPromptUpsampler

    text_params = init_ar_params(jax.random.PRNGKey(0), TCFG, jnp.float32)
    vision_params = init_vision_params(jax.random.PRNGKey(1), VCFG)
    return VLMPromptUpsampler(
        text_params, TCFG, vision_params, VCFG, _StubTokenizer(),
        image_token_id=_StubTokenizer.IMG_ID,
        max_new_tokens=max_new_tokens, image_max_size=32,
    )


def test_vlm_upsampler_frames_change_output():
    """upsample(prompt, frames) must (a) run, (b) be deterministic, and
    (c) provably depend on the frames — different frames or no frames
    give different completions."""
    up = _make_upsampler()
    rng = np.random.RandomState(0)
    frames_a = (rng.rand(3, 24, 32, 3) * 255).astype(np.uint8)
    frames_b = np.zeros((3, 24, 32, 3), np.uint8)

    out_text = up.upsample("a red car")
    out_a = up.upsample("a red car", frames=frames_a)
    out_a2 = up.upsample("a red car", frames=frames_a)
    out_b = up.upsample("a red car", frames=frames_b)

    assert out_a == out_a2  # deterministic (temperature 0)
    assert out_a != out_text  # frames change the output vs text-only
    assert out_a != out_b  # and the CONTENT of the frames matters


def test_vlm_upsampler_resizes_to_patch_multiple():
    """Frames whose size is not a patch multiple (or too large) are
    resized; last frame is the conditioning frame (prepare_dialog
    parity)."""
    up = _make_upsampler()
    frames = (np.random.RandomState(1).rand(2, 37, 53, 3) * 255).astype(
        np.uint8
    )
    out = up.upsample("a boat", frames=frames)
    assert isinstance(out, str) and out


def test_generate_with_embeddings_bucketed_matches_unpadded():
    """Bucketed left-zero-padded embeddings prefill == unpadded (the
    trace-sharing fix for the VLM's variable spliced lengths)."""
    from gen3c_tpu.models.ar_transformer import (
        generate_with_embeddings,
        generate_with_embeddings_bucketed,
        init_ar_params,
    )

    params = init_ar_params(jax.random.PRNGKey(0), TCFG, jnp.float32)
    rng = np.random.RandomState(5)
    for L0 in (9, 17):
        emb = jnp.asarray(rng.randn(1, L0, 48).astype(np.float32)) * 0.1
        ref = np.asarray(
            generate_with_embeddings(params, TCFG, emb,
                                     jax.random.PRNGKey(1),
                                     max_new_tokens=6, temperature=0.0)
        )
        got = np.asarray(
            generate_with_embeddings_bucketed(params, TCFG, emb,
                                              jax.random.PRNGKey(1),
                                              max_new_tokens=6,
                                              temperature=0.0, bucket=32)
        )
        np.testing.assert_array_equal(got, ref)
