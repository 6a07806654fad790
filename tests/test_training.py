"""Training runtime tests: loss, sharded step, trainer loop + resume."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gen3c_tpu.models.dit import DiTConfig, init_dit_params
from gen3c_tpu.parallel.mesh import make_mesh
from gen3c_tpu.training.losses import edm_loss, sample_sigma
from gen3c_tpu.training.trainer import Trainer, TrainerConfig, synthetic_latent_dataset

TINY = DiTConfig(
    in_channels=81,
    model_channels=64,
    num_blocks=1,
    num_heads=2,
    adaln_lora_dim=8,
    dtype=jnp.float32,
)


def test_edm_loss_zero_for_perfect_denoiser():
    from gen3c_tpu.diffusion.scheduler import EDMEulerSchedule

    sched = EDMEulerSchedule()
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(2, 4, 2, 4, 4).astype(np.float32))
    sigma = jnp.asarray([0.5, 2.0])
    noise = jnp.asarray(rng.randn(2, 4, 2, 4, 4).astype(np.float32))

    def perfect_net(params, x_in, c_noise, ctx):
        s = jnp.exp(4.0 * c_noise)[:, None, None, None, None]
        xt = x_in[:, :4] / sched.c_in(s)
        return sched.reverse_precondition_output(x0, xt, s)

    loss, per = edm_loss(
        perfect_net, None, x0, sigma, noise,
        jnp.zeros((2, 4, 16)), jnp.zeros((2, 0, 2, 4, 4)),
    )
    assert float(loss) < 1e-8


def test_sigma_sampling_lognormal():
    s = np.asarray(sample_sigma(jax.random.PRNGKey(0), 4096))
    logs = np.log(s)
    assert abs(logs.mean()) < 0.1
    assert abs(logs.std() - 1.0) < 0.1


def test_trainer_loop_and_resume(tmp_path):
    mesh = make_mesh(dp=2, cp=2, tp=2)
    params = init_dit_params(jax.random.PRNGKey(0), TINY, jnp.float32)
    cfg = TrainerConfig(
        job_dir=str(tmp_path / "job"),
        max_iter=3,
        save_every=2,
        log_every=1,
        warmup_steps=2,
    )
    trainer = Trainer(cfg, mesh, TINY, params)
    data = synthetic_latent_dataset(2, 16, 4, 4, 8)
    state = trainer.train(data)
    assert int(jax.device_get(state.step)) == 3
    loss_metrics_exist = os.path.exists(tmp_path / "job" / "config.json")
    assert loss_metrics_exist

    # resume: a fresh trainer picks up step 3 and continues to 5
    cfg2 = TrainerConfig(
        job_dir=str(tmp_path / "job"),
        max_iter=5,
        save_every=5,
        warmup_steps=2,
    )
    params2 = init_dit_params(jax.random.PRNGKey(0), TINY, jnp.float32)
    trainer2 = Trainer(cfg2, mesh, TINY, params2)
    assert trainer2.maybe_resume() == 3
    state2 = trainer2.train(data)
    assert int(jax.device_get(state2.step)) == 5
    trainer2.checkpointer.close()
    trainer.checkpointer.close()


def test_training_reduces_loss():
    """A few steps on a fixed batch must reduce the EDM loss."""
    mesh = make_mesh(dp=1, cp=1, tp=1, devices=jax.devices()[:1])
    params = init_dit_params(jax.random.PRNGKey(0), TINY, jnp.float32)
    from gen3c_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        make_sharded_train_step,
    )

    opt = make_optimizer(lr=2e-3, warmup_steps=1)
    step_fn, _ = make_sharded_train_step(mesh, TINY, opt, params)
    state = init_train_state(params, opt)
    batch = next(synthetic_latent_dataset(1, 16, 2, 4, 8))
    losses = []
    for i in range(8):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_fsdp_remat_matches_baseline():
    """FSDP (params/opt/EMA sharded over dp) + per-block remat produce the
    same loss and updated params as the plain TP-sharded step."""
    from gen3c_tpu.parallel.sharding import shard_params
    from gen3c_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        make_sharded_train_step,
    )

    mesh = make_mesh(dp=2, cp=2, tp=2)
    rng = np.random.RandomState(0)
    batch = {
        "x0": jnp.asarray(rng.randn(2, 16, 4, 4, 8), jnp.float32),
        "crossattn_emb": jnp.asarray(rng.randn(2, 16, 1024), jnp.float32),
        "extra_channels": jnp.asarray(rng.randn(2, 65, 4, 4, 8), jnp.float32),
    }
    key = jax.random.PRNGKey(7)
    results = {}
    for name, kw in (
        ("base", dict()),
        ("fsdp_remat", dict(remat=True, fsdp_axis="dp")),
    ):
        params = init_dit_params(jax.random.PRNGKey(0), TINY, jnp.float32)
        params = shard_params(mesh, params, fsdp_axis=kw.get("fsdp_axis"))
        opt = make_optimizer(lr=1e-3, warmup_steps=1)
        step_fn, _ = make_sharded_train_step(mesh, TINY, opt, params, **kw)
        state = init_train_state(params, opt)
        state, metrics = step_fn(state, batch, key)
        results[name] = (
            float(jax.device_get(metrics["loss"])),
            jax.device_get(state.params["blocks"][0]["fa"]["q"]["w"]),
        )
    loss_a, w_a = results["base"]
    loss_b, w_b = results["fsdp_remat"]
    assert np.isfinite(loss_a)
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-5)
    np.testing.assert_allclose(w_a, w_b, rtol=1e-4, atol=1e-6)


def test_fsdp_param_specs_shard_large_leaves():
    from jax.sharding import PartitionSpec as P

    from gen3c_tpu.parallel.sharding import dit_param_pspecs

    params = init_dit_params(jax.random.PRNGKey(0), TINY, jnp.float32)
    specs = dit_param_pspecs(params, fsdp_axis="dp")
    blk = specs["blocks"][0]
    assert blk["fa"]["q"]["w"] == P("dp", "tp")
    assert blk["fa"]["out"]["w"] == P("tp", "dp")
    assert blk["mlp"]["fc1"]["w"] == P("dp", "tp")
    assert blk["mlp"]["fc2"]["w"] == P("tp", "dp")
    # small leaves stay replicated (TINY's embedders are under the
    # _FSDP_MIN_SIZE threshold)
    assert specs["x_embedder"]["w"] == P()
    assert specs["affline_norm"]["scale"] == P()
    # a production-size embedder leaf shards its larger dim over fsdp
    big = {"t_embedder": {"linear_2": {"w": np.zeros((4096, 12288))}}}
    spec = dit_param_pspecs(big, fsdp_axis="dp")
    assert spec["t_embedder"]["linear_2"]["w"] == P(None, "dp")
    big2 = {"final": {"linear": {"w": np.zeros((4096, 64))}}}
    assert dit_param_pspecs(big2, fsdp_axis="dp")["final"]["linear"][
        "w"
    ] == P("dp", None)


def test_sequence_parallel_train_step_matches_baseline():
    """Megatron-SP via GSPMD constraints (make_sharded_train_step
    sequence_parallel=True): same loss + updated params as the plain
    TP-sharded step (reference tensor_parallel.py:23-102 semantics)."""
    from gen3c_tpu.parallel.sharding import shard_params
    from gen3c_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        make_sharded_train_step,
    )

    mesh = make_mesh(dp=2, cp=2, tp=2)
    rng = np.random.RandomState(3)
    batch = {
        "x0": jnp.asarray(rng.randn(2, 16, 4, 4, 8), jnp.float32),
        "crossattn_emb": jnp.asarray(rng.randn(2, 16, 1024), jnp.float32),
        "extra_channels": jnp.asarray(rng.randn(2, 65, 4, 4, 8), jnp.float32),
    }
    key = jax.random.PRNGKey(11)
    results = {}
    for name, kw in (
        ("base", dict()),
        ("sp", dict(sequence_parallel=True)),
        ("sp_remat_fsdp", dict(sequence_parallel=True, remat=True,
                               fsdp_axis="dp")),
    ):
        params = init_dit_params(jax.random.PRNGKey(0), TINY, jnp.float32)
        params = shard_params(mesh, params, fsdp_axis=kw.get("fsdp_axis"))
        opt = make_optimizer(lr=1e-3, warmup_steps=1)
        step_fn, _ = make_sharded_train_step(mesh, TINY, opt, params, **kw)
        state = init_train_state(params, opt)
        state, metrics = step_fn(state, batch, key)
        results[name] = (
            float(jax.device_get(metrics["loss"])),
            jax.device_get(state.params["blocks"][0]["fa"]["q"]["w"]),
        )
    loss_a, w_a = results["base"]
    for name in ("sp", "sp_remat_fsdp"):
        loss_b, w_b = results[name]
        np.testing.assert_allclose(loss_a, loss_b, rtol=1e-5)
        np.testing.assert_allclose(w_a, w_b, rtol=1e-4, atol=1e-6)
