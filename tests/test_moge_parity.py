"""MoGe JAX: DINOv2 backbone oracle parity + recovery + estimator tests.

The backbone numerics are verified against the REAL torch DINOv2
implementation (transformers Dinov2Model) at random weights — the
SigLIP/Aegis recipe (VERDICT r3 'next #2'). The head is a documented
re-design (the official MoGe head is not vendored in the reference), so
it gets contract tests; the focal/shift recovery gets a synthetic
ground-truth inversion test."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gen3c_tpu.aux import moge

pytestmark = pytest.mark.slow

TINY = moge.MoGeConfig(
    width=64, depth=3, heads=4, pos_grid=6,
    intermediate_layers=(0, 1, 2), head_dim=32,
)


def _hf_model():
    from transformers import Dinov2Config, Dinov2Model

    torch.manual_seed(0)
    cfg = Dinov2Config(
        hidden_size=TINY.width,
        num_hidden_layers=TINY.depth,
        num_attention_heads=TINY.heads,
        intermediate_size=TINY.width * TINY.mlp_ratio,
        image_size=TINY.pos_grid * TINY.patch_size,
        patch_size=TINY.patch_size,
        hidden_act="gelu",
        layerscale_value=1.0,
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
        drop_path_rate=0.0,
    )
    m = Dinov2Model(cfg)
    m.eval()
    # randomize the degenerate inits so parity is non-trivial
    with torch.no_grad():
        for n, p in m.named_parameters():
            if p.abs().sum() == 0 or "lambda1" in n:
                p.copy_(torch.randn_like(p) * 0.05 + (1.0 if "lambda1" in n else 0.0))
    return m


def _convert_hf_to_moge(m) -> dict:
    """transformers Dinov2 naming -> the MoGe/dinov2-orig naming our
    converter expects (test-side glue; the deployment converter maps the
    'Ruicheng/moge-vitl' layout which already uses the orig names)."""
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    out = {
        "backbone.cls_token": sd["embeddings.cls_token"],
        "backbone.pos_embed": sd["embeddings.position_embeddings"],
        "backbone.patch_embed.proj.weight": sd[
            "embeddings.patch_embeddings.projection.weight"
        ],
        "backbone.patch_embed.proj.bias": sd[
            "embeddings.patch_embeddings.projection.bias"
        ],
        "backbone.norm.weight": sd["layernorm.weight"],
        "backbone.norm.bias": sd["layernorm.bias"],
    }
    for i in range(TINY.depth):
        src = f"encoder.layer.{i}"
        dst = f"backbone.blocks.{i}"
        out[f"{dst}.norm1.weight"] = sd[f"{src}.norm1.weight"]
        out[f"{dst}.norm1.bias"] = sd[f"{src}.norm1.bias"]
        qkv_w = np.concatenate(
            [
                sd[f"{src}.attention.attention.query.weight"],
                sd[f"{src}.attention.attention.key.weight"],
                sd[f"{src}.attention.attention.value.weight"],
            ],
            axis=0,
        )
        qkv_b = np.concatenate(
            [
                sd[f"{src}.attention.attention.query.bias"],
                sd[f"{src}.attention.attention.key.bias"],
                sd[f"{src}.attention.attention.value.bias"],
            ],
            axis=0,
        )
        out[f"{dst}.attn.qkv.weight"] = qkv_w
        out[f"{dst}.attn.qkv.bias"] = qkv_b
        out[f"{dst}.attn.proj.weight"] = sd[
            f"{src}.attention.output.dense.weight"
        ]
        out[f"{dst}.attn.proj.bias"] = sd[f"{src}.attention.output.dense.bias"]
        out[f"{dst}.ls1.gamma"] = sd[f"{src}.layer_scale1.lambda1"]
        out[f"{dst}.norm2.weight"] = sd[f"{src}.norm2.weight"]
        out[f"{dst}.norm2.bias"] = sd[f"{src}.norm2.bias"]
        out[f"{dst}.mlp.fc1.weight"] = sd[f"{src}.mlp.fc1.weight"]
        out[f"{dst}.mlp.fc1.bias"] = sd[f"{src}.mlp.fc1.bias"]
        out[f"{dst}.mlp.fc2.weight"] = sd[f"{src}.mlp.fc2.weight"]
        out[f"{dst}.mlp.fc2.bias"] = sd[f"{src}.mlp.fc2.bias"]
        out[f"{dst}.ls2.gamma"] = sd[f"{src}.layer_scale2.lambda1"]
    return out


def _moge_params_from_hf(m):
    """Full MoGe tree: HF backbone weights + random head (converter
    template requires the head keys too)."""
    backbone = _convert_hf_to_moge(m)
    rnd = moge.init_moge_params(jax.random.PRNGKey(1), TINY)
    full = {k: np.asarray(v) for k, v in rnd.items()}
    full.update(backbone)
    return moge.convert_moge_state_dict(full, TINY)


def test_dinov2_backbone_matches_transformers_native_grid():
    m = _hf_model()
    params = _moge_params_from_hf(m)
    side = TINY.pos_grid * TINY.patch_size
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, side, side).astype(np.float32)

    with torch.no_grad():
        hf = m(torch.from_numpy(x), output_hidden_states=True)
    ln = m.layernorm
    taps = moge.dinov2_forward(params, TINY, jnp.asarray(x))
    for tap, layer_idx in zip(taps, TINY.intermediate_layers):
        # hidden_states[k] is the input of block k; +1 = its output
        with torch.no_grad():
            ref = ln(hf.hidden_states[layer_idx + 1])[:, 1:]
        g = TINY.pos_grid
        ref = (
            ref.numpy()
            .transpose(0, 2, 1)
            .reshape(1, TINY.width, g, g)
        )
        np.testing.assert_allclose(
            np.asarray(tap), ref, rtol=2e-4, atol=2e-5,
            err_msg=f"layer {layer_idx}",
        )


def test_dinov2_backbone_interpolated_pos_embed():
    """Non-native grid: HF interpolates pos-embs bicubically (antialias
    semantics differ slightly from jax.image.resize, so the gate is
    loose but the structure must track)."""
    m = _hf_model()
    params = _moge_params_from_hf(m)
    h, w = 4 * TINY.patch_size, 9 * TINY.patch_size
    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, h, w).astype(np.float32)
    with torch.no_grad():
        hf = m(torch.from_numpy(x), output_hidden_states=True)
        ref = m.layernorm(hf.hidden_states[TINY.depth])[:, 1:].numpy()
    tap = np.asarray(
        moge.dinov2_forward(params, TINY, jnp.asarray(x))[-1]
    ).reshape(1, TINY.width, -1).transpose(0, 2, 1)
    corr = np.corrcoef(tap.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999, corr
    assert np.abs(tap - ref).mean() < 0.02


def test_recover_focal_shift_inverts_synthetic_scene():
    h, w = 48, 64
    f_true, t_true = 1.3, 0.7
    s = min(h, w) / 2.0
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    u = (xx - (w - 1) / 2.0) / s
    v = (yy - (h - 1) / 2.0) / s
    z = 2.0 + 0.5 * np.sin(3 * u) + 0.3 * np.cos(2 * v)
    X = u * z / f_true
    Y = v * z / f_true
    points = np.stack([X, Y, z - t_true], axis=-1).astype(np.float32)
    mask = np.ones((h, w), bool)
    mask[:4] = False  # partial mask
    f, t = moge.recover_focal_shift(
        jnp.asarray(points), jnp.asarray(mask)
    )
    assert abs(float(f) - f_true) / f_true < 0.02, float(f)
    assert abs(float(t) - t_true) < 0.05, float(t)


def test_moge_infer_contract():
    params = moge.init_moge_params(jax.random.PRNGKey(0), TINY)
    img = jnp.asarray(
        np.random.RandomState(2).rand(60, 90, 3).astype(np.float32)
    )
    depth, k, mask = moge.moge_infer(params, TINY, img,
                                     max_pixels=TINY.patch_size**2 * 24)
    assert depth.shape == (60, 90) and mask.shape == (60, 90)
    assert k.shape == (3, 3)
    assert float(k[0, 0]) != 0.0 and np.isfinite(np.asarray(k)).all()
    d = np.asarray(depth)
    m = np.asarray(mask)
    assert np.isfinite(d[m]).all()


def test_moge_jax_depth_estimator_end_to_end(tmp_path):
    """Estimator wiring: npz checkpoint -> estimator -> (depth, K, mask)
    with masked depth = 1000 (gen3c_single_image.py:114-200 parity)."""
    from gen3c_tpu.pipelines.depth import MoGeJaxDepthEstimator
    from gen3c_tpu.utils.checkpoint import save_params_npz

    params = moge.init_moge_params(jax.random.PRNGKey(0), TINY)
    path = str(tmp_path / "moge.npz")
    # flat dict -> npz with the exact keys
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
    est = MoGeJaxDepthEstimator(checkpoint=path, cfg=TINY)
    img = (np.random.RandomState(3).rand(56, 84, 3) * 255).astype(np.uint8)
    depth, k, mask = est(img)
    assert depth.shape == (56, 84) and mask.shape == (56, 84)
    assert np.isfinite(depth).all()  # masked-out set to 1000, not nan
    assert (depth[~mask] == 1000.0).all()
    assert k[0, 0] > 0
    # converter strictness: an extra key raises loudly
    bad = {k2: np.asarray(v) for k2, v in params.items()}
    bad["backbone.blocks.0.attn.qkv.weight_extra"] = np.zeros(1)
    with pytest.raises(ValueError):
        moge.convert_moge_state_dict(bad, TINY)
