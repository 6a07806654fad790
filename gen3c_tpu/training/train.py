"""Training CLI entry point.

Parity: cosmos_predict1/diffusion/training/train.py —
`python -m gen3c_tpu.training.train -- experiment=gen3c_tiny
trainer.max_iter=1000 ...` selects a registered experiment preset and
applies dotted overrides (config_helper.override parity via
utils.registry.apply_overrides).

Data: --data_root with packaged clips (Gen3CClipDataset) or --synthetic
for the synthetic latent stream.
"""

from __future__ import annotations

import argparse
import sys

import jax

from gen3c_tpu.parallel.mesh import make_mesh, maybe_distributed_init
from gen3c_tpu.training.trainer import (
    Trainer,
    TrainerConfig,
    synthetic_latent_dataset,
)
from gen3c_tpu.utils import log, registry


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    # split "--"-style overrides (training/train.py parity)
    overrides = [a for a in argv if "=" in a and not a.startswith("--")]
    flags = [a for a in argv if a not in overrides and a != "--"]

    p = argparse.ArgumentParser()
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--cp", type=int, default=None)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--fsdp", action="store_true",
                   help="shard params/opt/EMA over dp (ZeRO-3)")
    p.add_argument("--sequence_parallel", action="store_true",
                   help="Megatron-SP: token-sharded residual stream "
                        "between TP matmuls (needs tp>1 to have effect)")
    p.add_argument("--remat", action="store_true",
                   help="activation-checkpoint DiT blocks")
    p.add_argument("--loss_add_logvar", action="store_true",
                   help="Kendall uncertainty loss with a learned "
                        "per-sigma logvar head (reference "
                        "config.loss_add_logvar)")
    p.add_argument("--text_dropout_rate", type=float, default=0.0,
                   help="per-sample CFG text-condition dropout "
                        "(reference trains at 0.2); video-cond dropout "
                        "and loss_reduce/loss_scale are trainer.* "
                        "overrides")
    args = p.parse_args(flags)

    exp_overrides = {}
    exp_name = "gen3c_tiny"
    t_cfg = TrainerConfig()
    for ov in list(overrides):
        key, _, val = ov.partition("=")
        if key == "experiment":
            exp_name = val
            overrides.remove(ov)
        elif key.startswith("trainer."):
            t_cfg = registry.apply_overrides(
                t_cfg, [ov[len("trainer."):]]
            )
            overrides.remove(ov)
    preset = registry.get("experiment", exp_name)
    if overrides:
        preset = registry.apply_overrides(preset, overrides)
    if args.fsdp:
        t_cfg = registry.apply_overrides(t_cfg, ["fsdp=True"])
    if args.remat:
        t_cfg = registry.apply_overrides(t_cfg, ["remat=True"])
    if args.sequence_parallel:
        t_cfg = registry.apply_overrides(
            t_cfg, ["sequence_parallel=True"]
        )
    if args.loss_add_logvar:
        t_cfg = registry.apply_overrides(t_cfg, ["loss_add_logvar=True"])
    if args.text_dropout_rate:
        t_cfg = registry.apply_overrides(
            t_cfg, [f"text_dropout_rate={args.text_dropout_rate}"]
        )

    maybe_distributed_init()
    mesh = make_mesh(dp=args.dp, cp=args.cp, tp=args.tp)
    if args.batch_size % args.dp:
        raise SystemExit(
            f"--batch_size {args.batch_size} must be divisible by "
            f"--dp {args.dp}"
        )
    log.info(f"experiment={exp_name} mesh={dict(mesh.shape)}")

    from gen3c_tpu.models.dit import init_dit_params
    from gen3c_tpu.models.dit_multiview import (
        MultiviewDiTConfig,
        init_multiview_dit_params,
    )

    from gen3c_tpu.models.dit_action import (
        ActionDiTConfig,
        init_action_dit_params,
    )

    if isinstance(preset.dit, MultiviewDiTConfig):
        params = init_multiview_dit_params(
            jax.random.PRNGKey(t_cfg.seed), preset.dit
        )
    elif isinstance(preset.dit, ActionDiTConfig):
        params = init_action_dit_params(
            jax.random.PRNGKey(t_cfg.seed), preset.dit
        )
    else:
        params = init_dit_params(jax.random.PRNGKey(t_cfg.seed), preset.dit)
    trainer = Trainer(t_cfg, mesh, preset.dit, params)

    if args.data_root:
        from gen3c_tpu.pipelines.factory import build_gen3c_model
        from gen3c_tpu.training.datasets import Gen3CClipDataset

        model, _ = build_gen3c_model(preset, checkpoint_dir=None)
        data = iter(Gen3CClipDataset(args.data_root, model, args.batch_size))
    else:
        C, T, Hl, Wl = preset.state_shape
        extra = preset.dit.in_channels - C
        # multiview context stacks per-view text embeddings on M
        ctx_len = 16 * getattr(preset.dit, "n_views", 1)
        data = synthetic_latent_dataset(
            args.batch_size, C, T, Hl, Wl, extra_channels=extra,
            ctx_len=ctx_len,
        )
        if isinstance(preset.dit, ActionDiTConfig):
            # bridge-style robot action vectors per clip (B, 1, 7)
            import jax.numpy as _jnp
            import numpy as _np

            def with_actions(stream, dim=preset.dit.action_dim, seed=17):
                rng = _np.random.RandomState(seed)
                for b in stream:
                    b = dict(b)
                    b["action"] = _jnp.asarray(
                        rng.randn(args.batch_size, 1, dim), _jnp.float32)
                    yield b

            data = with_actions(data)

    state = trainer.train(data)
    log.info(f"training done at step {int(jax.device_get(state.step))}")


if __name__ == "__main__":
    main()
