"""Pre-quantized native checkpoint roundtrip (serving cold-start path).

The offline persist flow (scripts/persist_quantized_dit.py: host-side
numpy quantization -> dit_w8a8.npz) must hand build_gen3c_model the SAME
quantized tree that quantize-on-build produces from the bf16 checkpoint,
and the factory must take the fast path (no re-quantization)."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from gen3c_tpu.models.dit import init_dit_params
from gen3c_tpu.models.quantize import quantize_dit_params_numpy
from gen3c_tpu.pipelines.factory import PRESETS, build_gen3c_model
from gen3c_tpu.utils import checkpoint as ckpt


def _flat(tree):
    return {
        "/".join(str(k) for k in kp): np.asarray(leaf)
        for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_prequantized_checkpoint_matches_quantize_on_build(tmp_path, monkeypatch):
    import gen3c_tpu.models.quantize as quantize_mod

    # tiny-preset matrices are below the production _MIN_SIZE cutoff;
    # drop it so the quantized fast path is actually exercised
    monkeypatch.setattr(quantize_mod, "_MIN_SIZE", 0)
    preset = PRESETS["gen3c_tiny"]
    key = jax.random.PRNGKey(0)
    params = init_dit_params(key, preset.dit, jnp.float32)

    # both checkpoint dirs share the same bf16-native dit.npz
    dir_plain = tmp_path / "plain"
    dir_preq = tmp_path / "preq"
    for d in (dir_plain, dir_preq):
        ckpt.save_params_npz(str(d / "gen3c_tpu" / "dit.npz"), params)

    # offline persist: load as bf16 (like the script), quantize on host
    template = jax.eval_shape(
        lambda: init_dit_params(jax.random.PRNGKey(0), preset.dit)
    )
    bf16_params = ckpt.load_params_npz(
        str(dir_preq / "gen3c_tpu" / "dit.npz"), template, jnp.bfloat16
    )
    qnp = quantize_dit_params_numpy(
        jax.tree.map(np.asarray, bf16_params), act_quant=True
    )
    ckpt.save_params_npz(str(dir_preq / "gen3c_tpu" / "dit_w8a8.npz"), qnp)

    model_a, _ = build_gen3c_model(
        "gen3c_tiny", checkpoint_dir=str(dir_plain), quantize="w8a8"
    )
    model_b, _ = build_gen3c_model(
        "gen3c_tiny", checkpoint_dir=str(dir_preq), quantize="w8a8"
    )

    fa, fb = _flat(model_a.dit_params), _flat(model_b.dit_params)
    assert set(fa) == set(fb), (
        set(fa) ^ set(fb),
        "pre-quantized tree structure drifted from quantize-on-build",
    )
    q8_keys = [k for k in fa if k.endswith("['q8']")]
    assert q8_keys, "no quantized entries — fast path not exercised"
    for k in sorted(fa):
        a, b = fa[k], fb[k]
        assert a.shape == b.shape and a.dtype == b.dtype, k
        if a.dtype == np.int8:
            # numpy vs jit rounding may differ by 1 ulp on exact-half
            # ties under the forced excess-precision flags
            assert np.mean(a != b) < 1e-3, k
            assert np.abs(a.astype(np.int32) - b.astype(np.int32)).max() <= 1, k
        elif a.dtype in (np.float32,):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8, err_msg=k)


def test_load_params_npz_tree_roundtrip(tmp_path):
    tree = {
        "blocks": [
            {"attn": {"q8": np.ones((4, 4), np.int8),
                      "scale": np.ones((1, 4), np.float32)}},
            {"mlp": {"w": np.zeros((2, 3), np.float32)}},
        ],
        "final": {"b": np.arange(3, dtype=np.float32)},
    }
    path = str(tmp_path / "t.npz")
    ckpt.save_params_npz(path, tree)
    back = ckpt.load_params_npz_tree(path)
    fa, fb = _flat(tree), _flat(back)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(fa[k], np.asarray(fb[k]), err_msg=k)
        assert fa[k].dtype == np.asarray(fb[k]).dtype, k
