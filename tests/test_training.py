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
