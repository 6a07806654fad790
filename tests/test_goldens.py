"""Golden regression snapshots: deterministic tiny-model outputs.

Detect unintended numeric drift across refactors/rounds: fixed-seed tiny
DiT forward + sampler outputs are frozen to tests/goldens/*.npz. If a
change INTENTIONALLY alters numerics, regenerate with:
  python -m tests.test_goldens regen
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

TINY = None  # constructed lazily so conftest's CPU forcing applies first


def _tiny_cfg():
    from gen3c_tpu.models.dit import DiTConfig

    return DiTConfig(
        in_channels=81,
        model_channels=64,
        num_blocks=2,
        num_heads=4,
        adaln_lora_dim=8,
        rope_t_extrapolation_ratio=2.0,
        dtype=jnp.float32,
    )


def _dit_output():
    from gen3c_tpu.models.dit import dit_forward, init_dit_params

    cfg = _tiny_cfg()
    params = init_dit_params(jax.random.PRNGKey(7), cfg, jnp.float32)
    # de-zero gated layers deterministically
    params = jax.tree.map(
        lambda x: 0.01 * jax.random.normal(jax.random.PRNGKey(3), x.shape)
        if x.ndim >= 2 and float(jnp.abs(x).sum()) == 0.0
        else x,
        params,
    )
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 81, 2, 8, 16), jnp.float32)
    t = jnp.asarray([0.37], jnp.float32)
    ctx = jnp.asarray(rng.randn(1, 8, 1024), jnp.float32)
    return np.asarray(dit_forward(params, cfg, x, t, ctx, fps=24.0)), params


def _sampler_output(params):
    from gen3c_tpu.diffusion.sampler import (
        arch_invariant_randn,
        generate_samples,
    )
    from gen3c_tpu.models.dit import dit_forward

    cfg = _tiny_cfg()

    def net(bundle, x, t, ctx):
        p, c = bundle
        return dit_forward(p, c, x, t, ctx, fps=24.0)

    rng = np.random.RandomState(13)
    out = generate_samples(
        net_fn=net,
        net_params=(params, cfg),
        init_noise=jnp.asarray(rng.randn(1, 16, 2, 8, 16), jnp.float32),
        augment_noise=jnp.asarray(arch_invariant_randn((1, 16, 2, 8, 16), 5)),
        crossattn_cond=jnp.asarray(rng.randn(1, 8, 1024), jnp.float32),
        crossattn_uncond=jnp.zeros((1, 8, 1024), jnp.float32),
        gt_latent=jnp.asarray(rng.randn(1, 16, 2, 8, 16), jnp.float32),
        condition_video_indicator=jnp.zeros((1, 1, 2, 1, 1))
        .at[:, :, :1]
        .set(1.0),
        condition_video_input_mask=jnp.zeros((1, 1, 2, 8, 16)),
        pose_latent_cond=jnp.asarray(
            rng.randn(1, 64, 2, 8, 16), jnp.float32
        ),
        pose_latent_uncond=jnp.zeros((1, 64, 2, 8, 16)),
        num_steps=5,
        guidance=1.0,
    )
    return np.asarray(out)


def _compute():
    dit_out, params = _dit_output()
    return {"dit_forward": dit_out, "sampler": _sampler_output(params)}


def test_golden_outputs_stable():
    path = os.path.join(GOLDEN_DIR, "tiny_outputs.npz")
    if not os.path.exists(path):
        import pytest

        pytest.skip("goldens not generated (run: python -m tests.test_goldens regen)")
    golden = np.load(path)
    current = _compute()
    for k in golden.files:
        np.testing.assert_allclose(
            current[k], golden[k], rtol=2e-4, atol=2e-5,
            err_msg=f"golden drift in {k}; regenerate if intentional",
        )


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez(os.path.join(GOLDEN_DIR, "tiny_outputs.npz"), **_compute())
        print("goldens regenerated")
