"""AR + tokenizer training steps, image tokenizer path, double warp."""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax
import torch


def test_ar_training_reduces_loss():
    from gen3c_tpu.models.ar_transformer import AR_TINY, init_ar_params
    from gen3c_tpu.training.ar_train import ar_train_step

    params = init_ar_params(jax.random.PRNGKey(0), AR_TINY)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    tokens = jnp.asarray(
        np.random.RandomState(0).randint(0, 512, (2, 32)), jnp.int32
    )
    step = jax.jit(partial(ar_train_step, cfg=AR_TINY, optimizer=opt))
    losses = []
    for _ in range(8):
        params, opt_state, m = step(params, opt_state, tokens)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_tokenizer_training_reduces_loss():
    from gen3c_tpu.models import vae as jvae
    from gen3c_tpu.training.tokenizer_train import tokenizer_train_step

    cfg = jvae.VAEConfig(
        channels=8, channels_mult=(2, 4, 4), num_res_blocks=1,
        attn_resolutions=(), resolution=64, patch_size=4,
        latent_channels=4, z_channels=4,
    )
    params = jvae.init_vae_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    video = jnp.asarray(
        np.random.RandomState(0).rand(1, 3, 9, 32, 32) * 2 - 1, jnp.float32
    )
    step = jax.jit(partial(tokenizer_train_step, cfg=cfg, optimizer=opt))
    losses = []
    for _ in range(5):
        params, opt_state, m = step(params, opt_state, video)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_image_tokenizer_path():
    from gen3c_tpu.models import vae as jvae

    cfg = jvae.VAEConfig(
        channels=8, channels_mult=(2, 4, 4), num_res_blocks=1,
        attn_resolutions=(), resolution=64, patch_size=4,
        latent_channels=4, z_channels=4,
    )
    params = jvae.init_vae_params(jax.random.PRNGKey(0), cfg)
    tok = jvae.VideoTokenizer(params, cfg, pixel_chunk_duration=9)
    img = jnp.asarray(
        np.random.RandomState(1).rand(2, 3, 64, 64) * 2 - 1, jnp.float32
    )
    lat = tok.encode_image(img)
    assert lat.shape == (2, 4, 1, 8, 8)
    out = tok.decode_image(lat)
    assert out.shape == (2, 3, 64, 64)


def test_double_forward_warp_matches_reference():
    from gen3c_tpu.ops import geometry
    from tests.reference_oracle import load_reference_geometry
    from tests.test_geometry import _rand_scene

    fwu, _, _ = load_reference_geometry()
    image, depth, k, w2c, w2c_tgt = _rand_scene(b=1, smooth_depth=True)
    ref = fwu.double_forward_warp(
        torch.from_numpy(image),
        None,
        torch.from_numpy(depth),
        torch.from_numpy(k),
        torch.from_numpy(w2c_tgt),
    )
    ours = geometry.double_forward_warp(
        jnp.asarray(image), None, jnp.asarray(depth), jnp.asarray(k),
        jnp.asarray(w2c_tgt),
    )
    for a, b in zip(ours[:2], ref[:2]):
        a, b = np.asarray(a), b.numpy()
        diff = np.abs(a - b)
        assert np.quantile(diff, 0.95) < 1e-2, np.quantile(diff, 0.95)


def test_grad_accumulation_optimizer():
    """MultiSteps wrapper: params update only every k steps."""
    from gen3c_tpu.training.train_step import make_optimizer

    opt = make_optimizer(lr=1e-2, warmup_steps=1, grad_accum_steps=2)
    params = {"w": jnp.ones((4,))}
    state = opt.init(params)
    g = {"w": jnp.ones((4,))}
    up1, state = opt.update(g, state, params)
    p1 = optax.apply_updates(params, up1)
    np.testing.assert_array_equal(np.asarray(p1["w"]), np.asarray(params["w"]))
    # warmup lr is 0 at the first applied step; run two full accumulation
    # windows so the second applied update uses lr > 0
    p = p1
    for _ in range(3):
        up, state = opt.update(g, state, p)
        p = optax.apply_updates(p, up)
    assert np.abs(np.asarray(p["w"]) - np.asarray(params["w"])).max() > 0


def test_cli_accepts_reference_flags():
    from gen3c_tpu.pipelines import gen3c_single_image as cli

    args = cli.create_parser().parse_args(
        ["--input_image_path", "x.png", "--num_gpus", "4",
         "--offload_tokenizer", "--disable_guardrail"]
    )
    assert args.num_devices == 4
    assert args.offload_tokenizer is True


def test_metrics_jsonl_callback(tmp_path):
    import json

    from gen3c_tpu.training.callbacks import MetricsJsonl

    path = str(tmp_path / "metrics.jsonl")
    cb = MetricsJsonl(path, every_n=2)
    cb.on_train_start(None)
    for step in range(1, 5):
        cb.on_training_step_end(None, step, {"loss": 0.5 * step, "x": "str"})
    cb.on_train_end(None)
    rows = [json.loads(l) for l in open(path)]
    assert [r["step"] for r in rows] == [2, 4]
    assert rows[0]["loss"] == 1.0 and "x" not in rows[0]


def test_tokenizer_train_cli(tmp_path):
    from gen3c_tpu.training.tokenizer_train import main

    out = tmp_path / "tok.npz"
    main([
        "--synthetic", "--max_iter", "2", "--log_every", "1",
        "--resolution", "32", "--frames", "9", "--channels", "8",
        "--save", str(out),
    ])
    assert out.exists()


def test_tokenizer_train_cli_raft_flow(tmp_path):
    """--flow_estimator raft wires the RAFT graph (random weights, loud
    warning) through the FlowLoss slot end-to-end; LK stays the
    default."""
    from gen3c_tpu.training.tokenizer_train import main

    main([
        "--synthetic", "--max_iter", "1", "--log_every", "1",
        "--resolution", "32", "--frames", "9", "--channels", "8",
        "--w_flow", "0.1", "--flow_estimator", "raft",
        "--flow_iters", "2",
    ])


def test_hang_watchdog_kills_hung_step():
    """The SIGALRM watchdog interrupts a step that blocks past the
    timeout and is disarmed outside steps (utils/trainer.py:108-109,197
    parity)."""
    import signal
    import time

    import pytest

    from gen3c_tpu.training.callbacks import HangWatchdog, StepTimeout

    cb = HangWatchdog(timeout_s=1)
    cb.on_train_start(None)
    assert cb._installed
    # a fast step passes and disarms the alarm
    cb.on_training_step_start(None, 1)
    cb.on_training_step_end(None, 1, {})
    assert signal.alarm(0) == 0  # nothing pending after step end
    # a hung step gets killed
    cb.on_training_step_start(None, 2)
    with pytest.raises(StepTimeout):
        time.sleep(3)
    cb.on_train_end(None)
    # handler restored; alarm clear
    assert signal.getsignal(signal.SIGALRM) is not cb._handler


def test_piecewise_weight_scheduler():
    """WeightScheduler parity (continuous.py:63-74): value[i] for the
    first boundary the iteration is under, last value after."""
    import numpy as np
    import jax.numpy as jnp
    from gen3c_tpu.training.tokenizer_train import piecewise_weight

    b, v = [100, 1000], [0.0, 0.5, 1.0]
    for it, want in [(0, 0.0), (99, 0.0), (100, 0.5), (999, 0.5),
                     (1000, 1.0), (5000, 1.0)]:
        got = float(piecewise_weight(jnp.asarray(it), b, v))
        assert got == want, (it, got, want)
    # reference also allows len(values) == len(boundaries) (falls
    # through to values[-1])
    assert np.isclose(float(piecewise_weight(jnp.asarray(50), [100], [0.3])), 0.3)
    assert np.isclose(float(piecewise_weight(jnp.asarray(200), [100], [0.3])), 0.3)


def test_video_consistency_loss():
    """VideoConsistencyLoss (continuous.py:391-440): zero for a perfect
    time-invariant tokenizer on a static video, positive when windows
    reconstruct differently; windows fold to (B*n_win, C, nf, H, W)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gen3c_tpu.models import vae as jvae
    from gen3c_tpu.training.tokenizer_train import (
        video_consistency_loss,
        video_consistency_windows,
    )

    video = jnp.asarray(
        np.random.RandomState(0).rand(2, 3, 17, 16, 16).astype(np.float32)
    )
    wins = video_consistency_windows(video, num_frames=9, step=8)
    assert wins.shape == (4, 3, 9, 16, 16)
    # window contents line up with the slices
    np.testing.assert_array_equal(
        np.asarray(wins[0]), np.asarray(video[0, :, :9]))
    np.testing.assert_array_equal(
        np.asarray(wins[1]), np.asarray(video[0, :, 8:17]))

    cfg = jvae.VAEConfig(
        channels=16, channels_mult=(2, 4, 4), num_res_blocks=1,
        attn_resolutions=(), resolution=16, patch_size=4,
        latent_channels=4, z_channels=4,
    )
    params = jvae.init_vae_params(jax.random.PRNGKey(0), cfg)
    loss = float(video_consistency_loss(params, cfg, video, 9, 8))
    assert np.isfinite(loss) and loss >= 0.0


def test_tokenizer_loss_with_consistency_and_schedule():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gen3c_tpu.models import vae as jvae
    from gen3c_tpu.training.tokenizer_train import tokenizer_loss

    cfg = jvae.VAEConfig(
        channels=16, channels_mult=(2, 4, 4), num_res_blocks=1,
        attn_resolutions=(), resolution=16, patch_size=4,
        latent_channels=4, z_channels=4,
    )
    params = jvae.init_vae_params(jax.random.PRNGKey(0), cfg)
    video = jnp.asarray(
        np.random.RandomState(1).rand(1, 3, 17, 16, 16).astype(np.float32)
        * 2 - 1
    )
    loss, m = tokenizer_loss(
        params, cfg, video, w_consistency=0.5, consistency_frames=9,
        consistency_step=8, iteration=jnp.asarray(10),
        schedules={"l1": ([5], [0.0, 1.0])},
    )
    assert "consistency" in m and np.isfinite(float(loss))
    # schedule at iteration 0 zeroes the l1 term -> smaller loss
    loss0, _ = tokenizer_loss(
        params, cfg, video, w_consistency=0.5, consistency_frames=9,
        consistency_step=8, iteration=jnp.asarray(0),
        schedules={"l1": ([5], [0.0, 1.0])},
    )
    assert float(loss0) < float(loss)


def test_first_and_last_condition_location():
    """world-interpolator conditioning (interpolator.py:87-95): first
    and last n latent frames marked, deterministic."""
    import jax
    import numpy as np

    from gen3c_tpu.training.losses import sample_condition_indicator

    ind = sample_condition_indicator(
        jax.random.PRNGKey(0), 2, 8, location="first_and_last_1",
        n_max=1)
    ind = np.asarray(ind)[:, 0, :, 0, 0]
    expect = np.zeros((2, 8), np.float32)
    expect[:, 0] = expect[:, -1] = 1.0
    np.testing.assert_array_equal(ind, expect)

    ind2 = np.asarray(sample_condition_indicator(
        jax.random.PRNGKey(0), 1, 8, location="first_and_last_1",
        n_max=2))[:, 0, :, 0, 0]
    np.testing.assert_array_equal(ind2[0, :2], 1.0)
    np.testing.assert_array_equal(ind2[0, -2:], 1.0)
    np.testing.assert_array_equal(ind2[0, 2:-2], 0.0)
