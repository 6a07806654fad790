"""CFG-rescale tests (Lin et al., arXiv:2305.08891).

phi>0 rescales the combined CFG output so its per-sample std matches
the conditioned branch's, then blends. The reference pipeline has no
such knob (model_v2w.py:130-149 is the plain combine), so semantics are
pinned against the exact loop and the paper's formula.
"""

import numpy as np

import jax.numpy as jnp

from gen3c_tpu.diffusion.sampler import (
    apply_cfg,
    generate_samples,
    generate_samples_host_loop,
    generate_samples_streaming,
)

from tests.test_guidance_interval import _harness, _mid_interval


def test_apply_cfg_phi0_is_reference_combine():
    rng = np.random.RandomState(0)
    c = jnp.asarray(rng.randn(2, 4, 3, 5, 5), jnp.float32)
    u = jnp.asarray(rng.randn(2, 4, 3, 5, 5), jnp.float32)
    out = apply_cfg(c, u, 1.5, 0.0)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(c + 1.5 * (c - u))
    )


def test_apply_cfg_phi1_matches_cond_std():
    rng = np.random.RandomState(1)
    c = jnp.asarray(rng.randn(2, 4, 3, 5, 5), jnp.float32)
    u = jnp.asarray(rng.randn(2, 4, 3, 5, 5), jnp.float32)
    out = np.asarray(apply_cfg(c, u, 10.0, 1.0))
    std_c = np.asarray(c).reshape(2, -1).std(axis=1)
    std_o = out.reshape(2, -1).std(axis=1)
    np.testing.assert_allclose(std_o, std_c, rtol=1e-4)


def test_rescale_changes_loop_and_host_matches():
    _, kwargs = _harness()
    ref = np.asarray(generate_samples(**kwargs))
    res = np.asarray(generate_samples(cfg_rescale=0.7, **kwargs))
    assert np.abs(res - ref).mean() > 1e-6
    host = np.asarray(
        generate_samples_host_loop(cfg_rescale=0.7, **kwargs)
    )
    np.testing.assert_allclose(host, res, rtol=1e-5, atol=1e-6)


def test_rescale_composes_with_interval_and_streaming():
    net_fn, kwargs = _harness()
    gi = _mid_interval(kwargs["num_steps"])
    ref = np.asarray(
        generate_samples(cfg_rescale=0.7, guidance_interval=gi, **kwargs)
    )
    host = np.asarray(
        generate_samples_host_loop(
            cfg_rescale=0.7, guidance_interval=gi, **kwargs
        )
    )
    np.testing.assert_allclose(host, ref, rtol=1e-5, atol=1e-6)

    def net_py(x_in, t_in, crossattn):
        return net_fn(None, x_in, t_in, crossattn)

    skw = dict(kwargs)
    skw.pop("net_fn")
    skw.pop("net_params")
    stream = np.asarray(
        generate_samples_streaming(
            net_py, cfg_rescale=0.7, guidance_interval=gi, **skw
        )
    )
    np.testing.assert_allclose(stream, ref, rtol=1e-5, atol=1e-6)
