"""AR transformer + FSQ tokenizer tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gen3c_tpu.models.ar_transformer import (
    AR_TINY,
    ar_forward,
    generate,
    init_ar_params,
    init_kv_cache,
    rope_tables,
    sample_logits,
)
from gen3c_tpu.models.fsq import (
    DEFAULT_LEVELS,
    fsq_indices_to_codes,
    fsq_quantize,
)


def test_fsq_roundtrip_indices():
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(2, 7, len(DEFAULT_LEVELS)).astype(np.float32))
    codes, idx = fsq_quantize(z, DEFAULT_LEVELS)
    assert idx.dtype == jnp.int64 or idx.dtype == jnp.int32
    assert int(jnp.max(idx)) < int(np.prod(DEFAULT_LEVELS))
    back = fsq_indices_to_codes(idx, DEFAULT_LEVELS)
    np.testing.assert_allclose(np.asarray(back), np.asarray(codes), atol=1e-6)


def test_fsq_codes_bounded():
    z = jnp.asarray(np.linspace(-100, 100, 60).reshape(10, 6), jnp.float32)
    codes, idx = fsq_quantize(z, DEFAULT_LEVELS)
    assert float(jnp.max(jnp.abs(codes))) <= 1.0 + 1e-5
    assert int(jnp.min(idx)) >= 0


def test_ar_forward_shapes():
    params = init_ar_params(jax.random.PRNGKey(0), AR_TINY)
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 512, (2, 10)))
    rope = rope_tables(AR_TINY)
    logits, _ = ar_forward(params, AR_TINY, tokens, rope)
    assert logits.shape == (2, 10, 512)
    assert np.isfinite(np.asarray(logits)).all()


def test_kv_cache_matches_full_forward():
    """Incremental decode with the KV cache == full causal forward."""
    params = init_ar_params(jax.random.PRNGKey(0), AR_TINY)
    rng = np.random.RandomState(1)
    tokens = jnp.asarray(rng.randint(0, 512, (1, 12)))
    rope = rope_tables(AR_TINY)
    full_logits, _ = ar_forward(params, AR_TINY, tokens, rope)

    cache = init_kv_cache(AR_TINY, 1, dtype=jnp.float32)
    logits_p, cache = ar_forward(params, AR_TINY, tokens[:, :8], rope, cache)
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full_logits[:, :8]),
        rtol=2e-4, atol=2e-4,
    )
    outs = [logits_p[:, -1]]
    for i in range(8, 12):
        step_logits, cache = ar_forward(
            params, AR_TINY, tokens[:, i : i + 1], rope, cache
        )
        outs.append(step_logits[:, -1])
    np.testing.assert_allclose(
        np.asarray(jnp.stack(outs[1:], 1)),
        np.asarray(full_logits[:, 8:12]),
        rtol=2e-3, atol=2e-3,
    )


def test_generate_runs_and_extends():
    params = init_ar_params(jax.random.PRNGKey(0), AR_TINY)
    prompt = jnp.asarray(np.random.RandomState(0).randint(0, 512, (2, 5)))
    out = generate(
        params, AR_TINY, prompt, jax.random.PRNGKey(1),
        max_new_tokens=7, temperature=1.0, top_k=50,
    )
    assert out.shape == (2, 12)
    np.testing.assert_array_equal(np.asarray(out[:, :5]), np.asarray(prompt))
    assert int(jnp.max(out)) < 512


def test_greedy_sampling_deterministic():
    logits = jnp.asarray([[1.0, 5.0, 2.0]])
    tok = sample_logits(jax.random.PRNGKey(0), logits, temperature=0.0)
    assert int(tok[0]) == 1


def test_top_p_restricts_support():
    logits = jnp.log(jnp.asarray([[0.6, 0.3, 0.05, 0.05]]))
    picks = set()
    for i in range(50):
        t = sample_logits(
            jax.random.PRNGKey(i), logits, temperature=1.0, top_p=0.8
        )
        picks.add(int(t[0]))
    assert picks <= {0, 1}


def test_padded_prefill_matches_unpadded():
    """Left-padded ar_forward == unpadded forward of each row (the
    bucketed-prompt-length fix): last-token logits must agree."""
    from gen3c_tpu.models.ar_transformer import generate_bucketed  # noqa

    params = init_ar_params(jax.random.PRNGKey(0), AR_TINY)
    rope = rope_tables(AR_TINY)
    rng = np.random.RandomState(2)
    row_a = rng.randint(0, 512, (7,))
    row_b = rng.randint(0, 512, (13,))
    lpad = 16
    padded = np.zeros((2, lpad), np.int32)
    padded[0, lpad - 7:] = row_a
    padded[1, lpad - 13:] = row_b
    pads = jnp.asarray([lpad - 7, lpad - 13], jnp.int32)

    logits_p, _ = ar_forward(
        params, AR_TINY, jnp.asarray(padded), rope, pad_lens=pads
    )
    la, _ = ar_forward(params, AR_TINY, jnp.asarray(row_a[None]), rope)
    lb, _ = ar_forward(params, AR_TINY, jnp.asarray(row_b[None]), rope)
    np.testing.assert_allclose(
        np.asarray(logits_p[0, -1]), np.asarray(la[0, -1]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(logits_p[1, -1]), np.asarray(lb[0, -1]),
        rtol=1e-5, atol=1e-5,
    )


def test_generate_bucketed_matches_generate_greedy():
    """Greedy bucketed generation == per-row unpadded generate()."""
    from gen3c_tpu.models.ar_transformer import generate_bucketed

    params = init_ar_params(jax.random.PRNGKey(0), AR_TINY)
    rng = np.random.RandomState(3)
    rows = [rng.randint(0, 512, (n,)) for n in (5, 11)]
    new = 8
    out = generate_bucketed(
        params, AR_TINY, rows, jax.random.PRNGKey(0),
        max_new_tokens=new, temperature=0.0, bucket=16,
    )
    lpad = out.shape[1] - new
    for i, row in enumerate(rows):
        ref = generate(
            params, AR_TINY, jnp.asarray(row[None]),
            jax.random.PRNGKey(0), max_new_tokens=new, temperature=0.0,
        )
        np.testing.assert_array_equal(
            np.asarray(out[i, lpad:]), np.asarray(ref[0, len(row):])
        )
        # the real prompt survives in place
        np.testing.assert_array_equal(
            np.asarray(out[i, lpad - len(row):lpad]), row
        )


def test_generate_bucketed_trace_sharing():
    """Different prompt lengths inside one bucket reuse one trace."""
    from gen3c_tpu.models.ar_transformer import generate_padded

    params = init_ar_params(jax.random.PRNGKey(0), AR_TINY)
    from gen3c_tpu.models.ar_transformer import generate_bucketed

    n0 = generate_padded._cache_size()
    for n in (3, 9, 14):
        rng = np.random.RandomState(n)
        generate_bucketed(
            params, AR_TINY, [rng.randint(0, 512, (n,))],
            jax.random.PRNGKey(0), max_new_tokens=4, temperature=0.0,
            bucket=16,
        )
    assert generate_padded._cache_size() == n0 + 1


def test_quantized_kv_cache_logits_close():
    """int8 KV cache decode stays close to the exact-cache logits
    (~0.4% per-entry KV quantization error)."""
    params = init_ar_params(jax.random.PRNGKey(0), AR_TINY)
    rng = np.random.RandomState(11)
    tokens = jnp.asarray(rng.randint(0, 512, (1, 12)))
    rope = rope_tables(AR_TINY)

    exact = init_kv_cache(AR_TINY, 1, dtype=jnp.float32)
    logits_e, cache_e = ar_forward(params, AR_TINY, tokens, rope, exact)
    quant = init_kv_cache(AR_TINY, 1, quantized=True)
    logits_q, cache_q = ar_forward(params, AR_TINY, tokens, rope, quant)

    assert cache_q.k.dtype == jnp.int8
    assert cache_q.k_scale is not None
    np.testing.assert_allclose(
        np.asarray(logits_q), np.asarray(logits_e), rtol=0.05, atol=0.05
    )

    # incremental decode step stays close too
    nxt = jnp.asarray(rng.randint(0, 512, (1, 1)))
    le, _ = ar_forward(params, AR_TINY, nxt, rope, cache_e)
    lq, _ = ar_forward(params, AR_TINY, nxt, rope, cache_q)
    np.testing.assert_allclose(
        np.asarray(lq), np.asarray(le), rtol=0.05, atol=0.05
    )


def test_generate_quantize_kv_runs_and_matches_greedy():
    """Greedy generation with the int8 KV cache: right shape, finite,
    and (at tiny scale) token-identical to the exact cache."""
    params = init_ar_params(jax.random.PRNGKey(0), AR_TINY)
    rng = np.random.RandomState(12)
    prompt = jnp.asarray(rng.randint(0, 512, (1, 9)))
    ref = generate(params, AR_TINY, prompt, jax.random.PRNGKey(0),
                   max_new_tokens=6, temperature=0.0)
    out = generate(params, AR_TINY, prompt, jax.random.PRNGKey(0),
                   max_new_tokens=6, temperature=0.0, quantize_kv=True)
    assert out.shape == ref.shape
    # ~0.4% KV error rarely flips a greedy argmax at this scale; require
    # at least the first half of the completion to agree
    agree = np.mean(np.asarray(out[0, 9:]) == np.asarray(ref[0, 9:]))
    assert agree >= 0.5, agree
