"""Speculative compile warming must cover EXACTLY the program variants
the drive loop requests (ADVICE r3, medium).

warm_host_loop_compiles and generate_samples_host_loop share
_host_loop_schedule, but drift in _host_loop_step's call signature or
abstract shapes would make warming silently compile the wrong program
set, quietly losing the measured 2.1x cold-start win (docs/STATUS.md).
These tests record the (aval, static-kwarg) signature of every
_host_loop_step lowering (warm side) and call (drive side) and assert
set equality, and prove that identical signatures produce identical
HLO (so the persistent-cache fingerprints the warmer writes are the
ones the drive loop reads)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gen3c_tpu.diffusion import sampler as sampler_mod
from gen3c_tpu.diffusion.sampler import (
    generate_samples_host_loop,
    warm_host_loop_compiles,
)


def _sig(args, kwargs):
    """Abstract signature of a _host_loop_step invocation: array leaves
    -> (shape, dtype); callables -> name; statics -> repr. Identical
    signatures into the same jit function mean identical programs."""

    def leaf(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return (tuple(x.shape), str(jnp.result_type(x)))
        if callable(x):
            return getattr(x, "__name__", "fn")
        return repr(x)

    flat = jax.tree_util.tree_map(
        leaf, args, is_leaf=lambda x: x is None or callable(x)
    )
    statics = tuple(sorted((k, repr(v)) for k, v in kwargs.items()))
    return (str(flat), statics)


class _Recorder:
    """Proxy for sampler._host_loop_step that records warm-side
    .lower() signatures and drive-side __call__ signatures."""

    def __init__(self, real, lower_passthrough=False):
        self._real = real
        self._lower_passthrough = lower_passthrough
        self.warm = set()
        self.drive = set()
        self.drive_calls = []  # (args, kwargs) for HLO re-lowering

    def lower(self, *args, **kwargs):
        self.warm.add(_sig(args, kwargs))
        if self._lower_passthrough:
            return self._real.lower(*args, **kwargs)

        class _NoCompile:
            def compile(self):
                return None

        return _NoCompile()

    def __call__(self, *args, **kwargs):
        self.drive.add(_sig(args, kwargs))
        self.drive_calls.append((args, kwargs))
        return self._real(*args, **kwargs)


def _tiny_host_loop_kwargs(num_steps):
    B, C, T, H, W, P = 1, 3, 4, 4, 6, 2
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(C + 1 + P, C) * 0.05, jnp.float32)

    def net_fn(bundle, x_in, t, crossattn):
        params, _cfg = bundle
        h = jnp.einsum("bcthw,cd->bdthw", x_in, params["w"])
        bias = jnp.mean(crossattn, axis=(1, 2))[:, None, None, None, None]
        return jnp.tanh(h + bias + t[:, None, None, None, None] * 0.01)

    t5_tokens, t5_dim = 2, 4
    drive = dict(
        net_fn=net_fn,
        net_params=({"w": w}, None),
        init_noise=jnp.asarray(rng.randn(B, C, T, H, W), jnp.float32),
        augment_noise=jnp.asarray(rng.randn(B, C, T, H, W), jnp.float32),
        crossattn_cond=jnp.asarray(
            rng.randn(B, t5_tokens, t5_dim), jnp.float32
        ),
        crossattn_uncond=jnp.zeros((B, t5_tokens, t5_dim), jnp.float32),
        gt_latent=jnp.asarray(rng.randn(B, C, T, H, W), jnp.float32),
        condition_video_indicator=jnp.zeros((1, 1, T, 1, 1))
        .at[:, :, :2]
        .set(1.0),
        condition_video_input_mask=jnp.zeros((B, 1, T, H, W)),
        pose_latent_cond=jnp.asarray(
            rng.randn(B, P, T, H, W), jnp.float32
        ),
        pose_latent_uncond=jnp.zeros((B, P, T, H, W), jnp.float32),
        num_steps=num_steps,
        guidance=1.5,
    )
    warm = dict(
        net_fn=net_fn,
        net_params=({"w": w}, None),
        batch=B,
        state_shape=(C, T, H, W),
        crossattn_shape=(t5_tokens, t5_dim),
        pose_channels=P,
        num_steps=num_steps,
        guidance=1.5,
        condition_augment_sigma=0.001,
    )
    return warm, drive


@pytest.mark.parametrize(
    "extra",
    [
        {},
        {"step_cache_interval": 2},
        {"guidance_interval": (0.5, 10.0)},
        {"step_cache_interval": 2, "guidance_interval": (0.5, 10.0)},
        {"solver": "dpm2m"},
        {"cfg_rescale": 0.7},
    ],
    ids=["plain", "cached", "gi", "cached_gi", "multistep", "rescale"],
)
def test_host_loop_warm_covers_drive_combos(monkeypatch, extra):
    """warm_host_loop_compiles must lower EXACTLY the (aval, static)
    program set the drive loop then requests — no missing variant
    (real run stays cold) and no extra variant (wasted compiles)."""
    warm_kw, drive_kw = _tiny_host_loop_kwargs(num_steps=8)
    warm_kw.update(extra)
    drive_kw.update(extra)

    rec = _Recorder(sampler_mod._host_loop_step)
    monkeypatch.setattr(sampler_mod, "_host_loop_step", rec)

    n = warm_host_loop_compiles(**warm_kw)
    assert n == len(rec.warm) and n >= 1
    out = generate_samples_host_loop(**drive_kw)
    assert np.isfinite(np.asarray(out)).all()

    missing = rec.drive - rec.warm
    extra_progs = rec.warm - rec.drive
    assert not missing, f"drive requested unwarmed programs: {missing}"
    assert not extra_progs, f"warmed never-requested programs: {extra_progs}"


def test_warm_lowering_hlo_matches_drive(monkeypatch):
    """Warming lowers from ShapeDtypeStructs, the drive loop from
    concrete arrays — prove both produce the SAME HLO module, i.e. the
    persistent-compile-cache entries the warmer writes are the ones the
    real denoise deserializes."""
    warm_kw, drive_kw = _tiny_host_loop_kwargs(num_steps=4)

    real = sampler_mod._host_loop_step
    rec = _Recorder(real, lower_passthrough=True)
    monkeypatch.setattr(sampler_mod, "_host_loop_step", rec)

    warm_texts = {}
    orig_lower = rec.lower

    def lower_and_keep(*args, **kwargs):
        lowered = real.lower(*args, **kwargs)
        warm_texts[_sig(args, kwargs)] = lowered.as_text()
        rec.warm.add(_sig(args, kwargs))

        class _NoCompile:
            def compile(self):
                return None

        return _NoCompile()

    rec.lower = lower_and_keep
    warm_host_loop_compiles(**warm_kw)
    generate_samples_host_loop(**drive_kw)

    assert rec.drive == set(warm_texts)
    for args, kwargs in rec.drive_calls:
        drive_text = real.lower(*args, **kwargs).as_text()
        assert drive_text == warm_texts[_sig(args, kwargs)]
    del orig_lower


def test_model_warm_records_and_warns_on_drift(monkeypatch):
    """Gen3CModel.warm_denoise_compiles records the warmed config;
    generate_samples warns when the real run's config differs (ADVICE
    r3: a silent mismatch compiles never-used variants concurrently
    with the real cold compiles warming was meant to hide)."""
    from gen3c_tpu.pipelines.factory import build_gen3c_model
    from gen3c_tpu.utils import log as log_mod

    # quantize so offload keeps the host-loop sampler (unquantized
    # offload auto-switches to the block-streamed net, which has its
    # own compile profile and warms nothing)
    model, preset = build_gen3c_model(
        "gen3c_tiny", checkpoint_dir=None, seed=0, offload_dit=True,
        quantize=True,
    )
    n = model.warm_denoise_compiles(num_steps=3, t5_tokens=8)
    assert n >= 1 and model._warmed_denoise is not None

    warnings = []
    monkeypatch.setattr(
        log_mod, "warning", lambda msg, **kw: warnings.append(msg)
    )

    rng = np.random.RandomState(3)
    h, w = preset.height, preset.width
    chunk = preset.chunk_size
    frames = jnp.asarray(rng.rand(1, 3, 1, h, w) * 2 - 1, jnp.float32)
    warps = jnp.asarray(rng.rand(1, chunk, 1, 3, h, w) * 2 - 1, jnp.float32)
    masks = jnp.asarray((rng.rand(1, chunk, 1, 1, h, w) > 0.3), jnp.float32)
    cond_latent = model.create_condition_latent_from_input_frames(frames)
    t5 = jnp.asarray(rng.rand(1, 8, 1024), jnp.float32)

    def run(num_steps):
        return model.generate_samples(
            t5_embeddings=t5,
            condition_latent=cond_latent,
            condition_state=warps,
            condition_state_mask=masks,
            num_steps=num_steps,
            seed=3,
        )

    run(num_steps=3)  # matches the warmed config
    assert not [m for m in warnings if "DIFFERENT config" in m]
    run(num_steps=4)  # num_steps drift -> warn
    assert [m for m in warnings if "DIFFERENT config" in m]


def test_pipeline_warm_thread_exposed(monkeypatch):
    """The pipeline's background warm thread is joinable and respects
    the GEN3C_WARM_COMPILES kill switch (ADVICE r3)."""
    from gen3c_tpu.pipelines.factory import build_gen3c_model
    from gen3c_tpu.pipelines.gen3c_pipeline import Gen3cPipeline

    model, _preset = build_gen3c_model(
        "gen3c_tiny", checkpoint_dir=None, seed=0, offload_dit=True,
        quantize=True,
    )

    monkeypatch.setenv("GEN3C_WARM_COMPILES", "0")
    p0 = Gen3cPipeline(model=model, num_steps=3)
    assert p0._warm_thread is None
    p0.join_warm_thread()  # no-op

    monkeypatch.setenv("GEN3C_WARM_COMPILES", "1")
    p1 = Gen3cPipeline(model=model, num_steps=3)
    assert p1._warm_thread is not None
    p1.join_warm_thread(timeout=300)
    assert not p1._warm_thread.is_alive()
    assert model._warmed_denoise is not None
    assert model._warmed_denoise["num_steps"] == 3
