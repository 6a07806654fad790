"""Joint image+video training: the image-batch leg (DataType.IMAGE)
zero-pads condition channels, skips video-extend conditioning and CP
(model.py:155-163, 273-339; general_dit_lvg.py:112-117)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from gen3c_tpu.models.dit import DiTConfig, init_dit_params
from gen3c_tpu.parallel.mesh import make_mesh
from gen3c_tpu.training.train_step import (
    init_train_state,
    make_optimizer,
    make_sharded_train_step,
    train_step,
)

XATTN = 32


def _cfg():
    return DiTConfig(
        max_img_h=16,
        max_img_w=16,
        max_frames=8,
        in_channels=16 + 1,
        out_channels=16,
        model_channels=96,
        num_blocks=2,
        num_heads=4,
        crossattn_emb_channels=XATTN,
        adaln_lora_dim=8,
        dtype=jnp.float32,
    )


def test_image_step_zero_pad_matches_explicit_zeros():
    """data_type='image' without extra_channels == the same step with
    explicit zero extra_channels (the reference's zero-pad semantics)."""
    cfg = _cfg()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(lr=1e-3, warmup_steps=1)
    state = init_train_state(params, opt)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(2, 16, 1, 8, 8), jnp.float32)
    ctx = jnp.asarray(rng.randn(2, 4, XATTN), jnp.float32)
    key = jax.random.PRNGKey(7)

    _, m_img = train_step(
        state, {"x0": x0, "crossattn_emb": ctx}, key, cfg, opt,
        data_type="image",
    )
    _, m_vid = train_step(
        state,
        {
            "x0": x0,
            "crossattn_emb": ctx,
            "extra_channels": jnp.zeros((2, 1, 1, 8, 8), jnp.float32),
        },
        key, cfg, opt,
    )
    np.testing.assert_allclose(
        float(m_img["loss"]), float(m_vid["loss"]), rtol=1e-6)


def test_image_step_accepts_4d_and_skips_video_extend():
    cfg = _cfg()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(lr=1e-3, warmup_steps=1)
    state = init_train_state(params, opt)
    rng = np.random.RandomState(1)
    batch = {
        "x0": jnp.asarray(rng.randn(1, 16, 8, 8), jnp.float32),  # 4D
        "crossattn_emb": jnp.asarray(rng.randn(1, 4, XATTN), jnp.float32),
    }
    # video_extend=True is overridden for image batches
    state2, metrics = train_step(
        state, batch, jax.random.PRNGKey(0), cfg, opt,
        data_type="image", video_extend=True,
    )
    assert np.isfinite(float(metrics["loss"]))


def test_joint_training_through_trainer(tmp_path):
    """Interleaved image/video batches drive both compiled legs through
    Trainer.train on the CPU mesh; both update the same TrainState."""
    from gen3c_tpu.training.trainer import (
        Trainer,
        TrainerConfig,
        synthetic_joint_dataset,
    )

    cfg = _cfg()
    mesh = make_mesh(dp=2, cp=2, tp=2)
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    tc = TrainerConfig(
        job_dir=str(tmp_path), max_iter=4, save_every=0, log_every=1,
        warmup_steps=1, video_extend=True, first_random_n_max=1,
    )
    trainer = Trainer(tc, mesh, cfg, params)
    data = synthetic_joint_dataset(
        2, 16, 4, 8, 8, extra_channels=1, ctx_len=4, image_every=2)

    # patch ctx width to the tiny config
    def narrow(stream):
        for b in stream:
            b = dict(b)
            b["crossattn_emb"] = b["crossattn_emb"][:, :, :XATTN]
            yield b

    state = trainer.train(narrow(data))
    assert int(jax.device_get(state.step)) == 4
