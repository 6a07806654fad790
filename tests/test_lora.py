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


def test_layer_control_plan_reference_config():
    """parse_layer_control on the reference's get_fa_ca_qv_lora_config
    shape (lora_config.py:17-45) selects exactly FA/CA to_q+to_v of the
    first N blocks."""
    from gen3c_tpu.training.peft_control import parse_layer_control

    first_n, rank = 2, 8
    blocks_regex = r"\b(" + "|".join(str(i) for i in range(first_n)) + r")\b"
    config = dict(
        enabled=True,
        customization_type="LoRA",
        rank=rank,
        scale=1,
        edits=[dict(blocks=blocks_regex, rank=rank, scale=1,
                    block_edit=["FA[to_q, to_v]", "CA[to_q, to_v]"])],
    )
    plan = parse_layer_control(config, num_blocks=4)
    expected = {
        f"blocks/{b}/{sb}/{l}/w"
        for b in range(first_n) for sb in ("fa", "ca") for l in ("q", "v")
    }
    assert set(plan) == expected
    assert all(v == (8, 1.0) for v in plan.values())


def test_layer_control_overrides_and_final_layer():
    from gen3c_tpu.training.peft_control import parse_layer_control

    config = dict(
        enabled=True,
        customization_type="LoRA",
        rank=8,
        scale=1.0,
        edits=[
            dict(blocks=r"\b(1)\b",
                 block_edit=["FA[to_q:4:0.5, to_out]", "MLP[l1]"]),
            dict(blocks="final_layer", block_edit=["FL[l1, ada2]"],
                 rank=2, scale=0.25),
        ],
    )
    plan = parse_layer_control(config, num_blocks=2)
    assert plan["blocks/1/fa/q/w"] == (4, 0.5)      # per-layer override
    assert plan["blocks/1/fa/out/w"] == (8, 1.0)    # global defaults
    assert plan["blocks/1/mlp/fc1/w"] == (8, 1.0)
    assert plan["final/linear/w"] == (2, 0.25)      # per-edit override
    assert plan["final/adaln/w2"] == (2, 0.25)
    assert "blocks/0/fa/q/w" not in plan            # block regex respected

    # disabled -> empty
    assert parse_layer_control({"enabled": False}) == {}


def test_plan_driven_lora_init_and_merge():
    """Adapters follow the plan's ranks; merge uses per-path scales;
    B=0 keeps the model unchanged."""
    from gen3c_tpu.training.lora import plan_scales
    from gen3c_tpu.training.peft_control import parse_layer_control

    params = init_dit_params(jax.random.PRNGKey(0), TINY)
    config = dict(
        enabled=True, customization_type="LoRA", rank=4, scale=0.5,
        edits=[dict(blocks=r"\b(0|1)\b",
                    block_edit=["FA[to_q:2:2.0, to_v]"])],
    )
    plan = parse_layer_control(config, num_blocks=TINY.num_blocks)
    lora = init_lora_params(jax.random.PRNGKey(1), params, plan=plan)
    assert set(lora) == set(plan)
    assert lora["blocks/0/fa/q/w"]["a"].shape[1] == 2   # per-layer rank
    assert lora["blocks/0/fa/v/w"]["a"].shape[1] == 4   # edit default

    merged0 = apply_lora(params, lora, scales=plan_scales(plan))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 81, 2, 8, 8))
    t = jnp.asarray([0.5])
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 1024))
    a = dit_forward(params, TINY, x, t, ctx)
    b = dit_forward(merged0, TINY, x, t, ctx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # per-path scale actually applied: perturb b, compare with manual
    name = "blocks/0/fa/q/w"
    lora[name]["b"] = jnp.ones_like(lora[name]["b"])
    merged = apply_lora(params, lora, scales=plan_scales(plan))
    flat = dict(
        (("/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                   for k in kp)), v)
        for kp, v in jax.tree_util.tree_flatten_with_path(merged)[0]
    )
    expect = params["blocks"][0]["fa"]["q"]["w"] + 2.0 * (
        lora[name]["a"] @ lora[name]["b"])
    np.testing.assert_allclose(
        np.asarray(flat[name]), np.asarray(expect), atol=1e-6)
