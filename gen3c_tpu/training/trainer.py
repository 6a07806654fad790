"""Training loop: mesh-sharded EDM diffusion training with callbacks,
async checkpointing and resume.

Parity: utils/trainer.py:31-288 (+ training/train.py launch): distributed
init -> config snapshot -> checkpoint load -> train loop with grad accum
handled by optax, per-step callbacks, periodic async save, validation
under EMA. DDP/FSDP wrapping is replaced by the mesh shardings baked into
the jitted step (training/train_step.py).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable, Iterable, Optional

import jax
import numpy as np

from gen3c_tpu.training.callbacks import CallBackGroup, IterSpeed
from gen3c_tpu.training.checkpointing import Checkpointer
from gen3c_tpu.training.train_step import (
    TrainState,
    init_train_state,
    make_optimizer,
    make_sharded_train_step,
)
from gen3c_tpu.utils import log


@dataclasses.dataclass
class TrainerConfig:
    job_dir: str = "runs/debug"
    max_iter: int = 1000
    save_every: int = 500
    log_every: int = 10
    validation_every: int = 0  # 0 = off
    lr: float = 1e-4
    weight_decay: float = 0.1
    grad_clip: float = 1.0
    warmup_steps: int = 100
    seed: int = 0
    grad_accum_steps: int = 1
    remat: bool = False  # rematerialize DiT blocks (activation ckpt)
    fsdp: bool = False  # shard params/opt/EMA over 'dp' (ZeRO-3)
    # Megatron sequence parallelism: residual-stream tokens sharded over
    # ('cp','tp') between TP matmuls (train_step sp_sharding)
    sequence_parallel: bool = False
    # kill a hung step after this many seconds via SIGALRM
    # (utils/trainer.py:108-109 timeout_period parity); 0 = off
    step_timeout_s: float = 0.0
    # background-thread batch prefetch depth (the reference DataLoader
    # num_workers role); 0 = synchronous
    prefetch_batches: int = 2
    # Kendall uncertainty loss with a learned per-sigma logvar head
    # (reference config.loss_add_logvar, model_image.py:232-235)
    loss_add_logvar: bool = False
    # training-time CFG condition dropout (conditioner.py:74-81;
    # reference text_dropout=0.2). Text is dropped per sample, the
    # video conditioning per batch (BooleanFlag semantics)
    text_dropout_rate: float = 0.0
    video_cond_dropout_rate: float = 0.0
    # loss reduction/scale (model_image.py:291-296)
    loss_reduce: str = "mean"
    loss_scale: float = 1.0
    # video-extend conditioning training (extend_model.py:206-287):
    # per-step condition-region sampling + gt-latent replacement with
    # augment-sigma corruption; see train_step docstring
    video_extend: bool = False
    condition_location: str = "first_random_n"
    first_random_n_min: int = 0
    first_random_n_max: int = 4
    random_condition_rate: float = 0.5
    augment_sigma_multiplier: float = 4.0
    compute_loss_for_condition_region: bool = False


class Trainer:
    def __init__(
        self,
        config: TrainerConfig,
        mesh,
        dit_cfg,
        params,
        callbacks: Optional[CallBackGroup] = None,
    ):
        self.config = config
        self.mesh = mesh
        self.dit_cfg = dit_cfg
        os.makedirs(config.job_dir, exist_ok=True)
        # config snapshot (utils/trainer.py config pkl/yaml dump parity)
        with open(os.path.join(config.job_dir, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(config), f, indent=2, default=str)

        self.optimizer = make_optimizer(
            lr=config.lr,
            weight_decay=config.weight_decay,
            grad_clip=config.grad_clip,
            warmup_steps=config.warmup_steps,
            grad_accum_steps=config.grad_accum_steps,
        )
        from gen3c_tpu.utils.jax_setup import setup_jax

        setup_jax()  # persistent compile cache (remote compiles are slow)
        fsdp_axis = "dp" if config.fsdp else None
        if config.loss_add_logvar and (
            not isinstance(params, dict) or "logvar" not in params
        ):
            from gen3c_tpu.training.losses import init_logvar_params

            params = {
                "net": params,
                "logvar": init_logvar_params(
                    jax.random.PRNGKey(config.seed + 1)
                ),
            }
        # action-conditioned experiments carry batch["action"] (B,T,7)
        from gen3c_tpu.models.dit_action import ActionDiTConfig

        extra_specs = None
        if isinstance(dit_cfg, ActionDiTConfig):
            from jax.sharding import PartitionSpec as _P

            extra_specs = {"action": _P("dp")}
        self.step_fn, self.param_shardings = make_sharded_train_step(
            mesh, dit_cfg, self.optimizer, params,
            extra_batch_specs=extra_specs,
            remat=config.remat, fsdp_axis=fsdp_axis,
            sequence_parallel=config.sequence_parallel,
            loss_add_logvar=config.loss_add_logvar,
            text_dropout_rate=config.text_dropout_rate,
            video_cond_dropout_rate=config.video_cond_dropout_rate,
            loss_reduce=config.loss_reduce,
            loss_scale=config.loss_scale,
            video_extend=config.video_extend,
            condition_location=config.condition_location,
            first_random_n_min=config.first_random_n_min,
            first_random_n_max=config.first_random_n_max,
            random_condition_rate=config.random_condition_rate,
            augment_sigma_multiplier=config.augment_sigma_multiplier,
            compute_loss_for_condition_region=(
                config.compute_loss_for_condition_region),
        )
        # image-batch leg of joint image+video training, built lazily on
        # the first image batch (model.py:155-163 is_image_batch dispatch:
        # the reference model branches per batch on which data key is
        # present; here the jit signature is static so each leg is its
        # own compiled step sharing the same TrainState)
        self._image_step_fn = None
        from gen3c_tpu.parallel.sharding import shard_params

        params = shard_params(mesh, params, fsdp_axis=fsdp_axis)
        self.state = init_train_state(params, self.optimizer)
        self.checkpointer = Checkpointer(
            os.path.join(config.job_dir, "checkpoints")
        )
        self.callbacks = callbacks or CallBackGroup(
            [IterSpeed(config.log_every)]
        )
        if config.step_timeout_s > 0:
            from gen3c_tpu.training.callbacks import HangWatchdog

            self.callbacks.append(HangWatchdog(config.step_timeout_s))
        self._rng = jax.random.PRNGKey(config.seed)

    def _get_image_step_fn(self):
        """The image-batch train step (data_type='image': no CP on the
        unit temporal axis, zero-padded condition channels, no
        video-extend conditioning)."""
        if self._image_step_fn is None:
            cfg = self.config
            self._image_step_fn, _ = make_sharded_train_step(
                self.mesh, self.dit_cfg, self.optimizer, self.state.params,
                remat=cfg.remat,
                fsdp_axis="dp" if cfg.fsdp else None,
                sequence_parallel=cfg.sequence_parallel,
                loss_add_logvar=cfg.loss_add_logvar,
                text_dropout_rate=cfg.text_dropout_rate,
                video_cond_dropout_rate=cfg.video_cond_dropout_rate,
                loss_reduce=cfg.loss_reduce,
                loss_scale=cfg.loss_scale,
                data_type="image",
            )
        return self._image_step_fn

    def maybe_resume(self) -> int:
        self.callbacks.on_load_checkpoint_start(self)
        restored = self.checkpointer.restore(self.state)
        if restored is not None:
            # restore may land on one device; re-apply the mesh shardings
            # (leaves whose template sharding doesn't span the mesh — e.g.
            # eagerly-created optimizer scalars — are replicated)
            from jax.sharding import NamedSharding, PartitionSpec

            mesh_devices = set(np.asarray(self.mesh.devices).flat)
            replicated = NamedSharding(self.mesh, PartitionSpec())

            def reshard(cur, new):
                sh = cur.sharding if hasattr(cur, "sharding") else None
                if sh is None or set(sh.device_set) != mesh_devices:
                    sh = replicated
                return jax.device_put(new, sh)

            self.state = jax.tree.map(reshard, self.state, restored)
            step = int(jax.device_get(self.state.step))
            self.callbacks.on_load_checkpoint_end(self, step)
            return step
        return 0

    def train(
        self,
        dataloader: Iterable[dict],
        validate_fn: Optional[Callable[[TrainState, int], dict]] = None,
    ) -> TrainState:
        cfg = self.config
        start = self.maybe_resume()
        self.callbacks.on_train_start(self)
        if cfg.prefetch_batches > 0:
            from gen3c_tpu.training.datasets import PrefetchIterator

            dataloader = PrefetchIterator(
                dataloader, prefetch=cfg.prefetch_batches)
        it = iter(dataloader)
        metrics = {}
        for step in range(start + 1, cfg.max_iter + 1):
            self.callbacks.on_training_step_start(self, step)
            self.callbacks.on_before_dataloading(self, step)
            batch = next(it)
            self.callbacks.on_after_dataloading(self, step, batch)
            self._rng, sub = jax.random.split(self._rng)
            step_fn = (
                self._get_image_step_fn()
                if "extra_channels" not in batch
                else self.step_fn
            )
            # fwd/bwd/optimizer are ONE fused XLA program here: the
            # reference's sub-hooks fire adjacently around the call
            self.callbacks.on_before_forward(self, step)
            self.callbacks.on_before_backward(self, step)
            self.callbacks.on_before_optimizer_step(self, step)
            self.state, metrics = step_fn(self.state, batch, sub)
            self.callbacks.on_after_forward(self, step)
            self.callbacks.on_after_backward(self, step)
            self.callbacks.on_before_zero_grad(self, step)
            self.callbacks.on_training_step_end(self, step, metrics)
            if cfg.save_every and step % cfg.save_every == 0:
                self.callbacks.on_save_checkpoint_start(self, step)
                self.checkpointer.save(step, jax.device_get(self.state))
                self.callbacks.on_save_checkpoint_end(self, step)
            if (
                validate_fn is not None
                and cfg.validation_every
                and step % cfg.validation_every == 0
            ):
                # validation under EMA weights (utils/trainer.py:280 parity)
                self.callbacks.on_validation_start(self, step)
                self.callbacks.on_validation_step_start(self, step)
                val = validate_fn(self.state, step)
                self.callbacks.on_validation_step_end(self, step, val)
                self.callbacks.on_validation_end(self, step, val)
        self.checkpointer.save(cfg.max_iter, jax.device_get(self.state))
        self.checkpointer.wait()
        self.callbacks.on_train_end(self)
        self.callbacks.on_app_end(self)
        return self.state


def synthetic_latent_dataset(
    batch: int, channels: int, t: int, h: int, w: int,
    extra_channels: int = 65, ctx_len: int = 16, seed: int = 0,
):
    """Infinite synthetic batches in the train_step format (the pattern for
    dataset_3D: pre-encoded latents + condition channels + text emb)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    while True:
        yield {
            "x0": jnp.asarray(
                rng.randn(batch, channels, t, h, w), jnp.float32
            ),
            "crossattn_emb": jnp.asarray(
                rng.randn(batch, ctx_len, 1024), jnp.float32
            ),
            "extra_channels": jnp.asarray(
                rng.randn(batch, extra_channels, t, h, w), jnp.float32
            ),
        }


def synthetic_joint_dataset(
    batch: int, channels: int, t: int, h: int, w: int,
    extra_channels: int = 65, ctx_len: int = 16, seed: int = 0,
    image_every: int = 2,
):
    """Joint image+video stream: every `image_every`-th batch is an image
    batch (T=1 latents, no extra_channels) — the reference's
    images_1024/video two-key dataloader pattern (model.py:155-163)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    video = synthetic_latent_dataset(
        batch, channels, t, h, w, extra_channels, ctx_len, seed)
    i = 0
    while True:
        i += 1
        if image_every and i % image_every == 0:
            yield {
                "x0": jnp.asarray(
                    rng.randn(batch, channels, 1, h, w), jnp.float32
                ),
                "crossattn_emb": jnp.asarray(
                    rng.randn(batch, ctx_len, 1024), jnp.float32
                ),
            }
        else:
            yield next(video)
