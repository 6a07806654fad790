"""LoRA fine-tuning tests."""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax

from gen3c_tpu.models.dit import DiTConfig, dit_forward, init_dit_params
from gen3c_tpu.training.lora import apply_lora, init_lora_params, lora_train_step

TINY = DiTConfig(
    in_channels=81,
    model_channels=64,
    num_blocks=2,
    num_heads=2,
    adaln_lora_dim=8,
    dtype=jnp.float32,
)


def test_lora_init_targets_attention_only():
    params = init_dit_params(jax.random.PRNGKey(0), TINY)
    lora = init_lora_params(jax.random.PRNGKey(1), params, rank=4)
    # 2 blocks x (fa + ca) x (q, k, v, out) = 16 adapters
    assert len(lora) == 16
    assert all("/w" in k for k in lora)


def test_zero_b_means_identity():
    params = init_dit_params(jax.random.PRNGKey(0), TINY)
    lora = init_lora_params(jax.random.PRNGKey(1), params, rank=4)
    merged = apply_lora(params, lora)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 81, 2, 8, 8))
    t = jnp.asarray([0.5])
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 1024))
    a = dit_forward(params, TINY, x, t, ctx)
    b = dit_forward(merged, TINY, x, t, ctx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def _dezero(params, key=42):
    """Randomize zero-initialized layers (adaLN gates / final linear) so
    gradients flow through attention, as in a trained checkpoint."""
    return jax.tree.map(
        lambda x: (
            0.02 * jax.random.normal(jax.random.PRNGKey(key), x.shape, x.dtype)
            if x.ndim >= 2 and float(jnp.abs(x).sum()) == 0.0
            else x
        ),
        params,
    )


def test_lora_training_reduces_loss_and_freezes_base():
    params = _dezero(init_dit_params(jax.random.PRNGKey(0), TINY))
    base_copy = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    lora = init_lora_params(jax.random.PRNGKey(1), params, rank=4)
    opt = optax.adam(5e-3)
    opt_state = opt.init(lora)
    rng = np.random.RandomState(0)
    batch = {
        "x0": jnp.asarray(rng.randn(1, 16, 2, 4, 8), jnp.float32),
        "crossattn_emb": jnp.asarray(rng.randn(1, 4, 1024), jnp.float32),
        "extra_channels": jnp.asarray(rng.randn(1, 65, 2, 4, 8), jnp.float32),
    }
    step = jax.jit(
        partial(lora_train_step, cfg=TINY, optimizer=opt),
        static_argnames=(),
    )
    losses = []
    for i in range(6):
        lora, opt_state, metrics = step(
            lora, opt_state, params, batch, jax.random.PRNGKey(7)
        )
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    # base params untouched
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(base_copy)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), b)
