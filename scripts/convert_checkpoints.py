"""Convert reference (torch) GEN3C checkpoints to native gen3c_tpu npz.

Parity: the reference's checkpoint handling (inference_utils.py:327-353
non_strict torch load; pretrained_vae.py TorchScript archives) plus the
TP shard/merge scripts (scripts/{merge,shard}_autoregressive_*): here
sharding is unnecessary — converted weights are resharded at load time by
the mesh PartitionSpecs.

Usage:
  python scripts/convert_checkpoints.py --checkpoint_dir checkpoints \
      [--preset gen3c_7b] [--dit] [--vae]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_dir", default="checkpoints")
    p.add_argument("--preset", default="gen3c_7b")
    p.add_argument("--dit", action="store_true", default=True)
    p.add_argument("--vae", action="store_true", default=True)
    args = p.parse_args()

    from gen3c_tpu.pipelines.factory import PRESETS
    from gen3c_tpu.utils import checkpoint as ckpt
    from gen3c_tpu.utils import log

    preset = PRESETS[args.preset]
    out_dir = os.path.join(args.checkpoint_dir, "gen3c_tpu")
    os.makedirs(out_dir, exist_ok=True)

    torch_dit = os.path.join(args.checkpoint_dir, "GEN3C-Cosmos-7B", "model.pt")
    if args.dit and os.path.exists(torch_dit):
        log.info(f"converting {torch_dit} ...")
        params = ckpt.load_torch_dit_checkpoint(torch_dit, preset.dit)
        ckpt.save_params_npz(os.path.join(out_dir, "dit.npz"), params)
    elif args.dit:
        log.warning(f"{torch_dit} not found; skipping DiT")

    # Sample-AV multiview DiT checkpoints (text2world/video2world
    # -multiview CLIs): torch state dict -> dit_multiview param tree
    for name, preset_name in (
        ("Cosmos-Predict1-7B-Text2World-Sample-AV-Multiview",
         "cosmos_t2w_mv_7b"),
        ("Cosmos-Predict1-7B-Video2World-Sample-AV-Multiview",
         "cosmos_v2w_mv_7b"),
    ):
        torch_mv = os.path.join(args.checkpoint_dir, name, "model.pt")
        if os.path.exists(torch_mv):
            import torch

            from gen3c_tpu.models.convert import (
                convert_multiview_dit_state_dict,
            )
            from gen3c_tpu.pipelines.text2world_multiview import MV_PRESETS

            log.info(f"converting {torch_mv} ...")
            sd = torch.load(torch_mv, map_location="cpu",
                            weights_only=True)
            if "model" in sd:
                sd = sd["model"]
            mv_params = convert_multiview_dit_state_dict(
                sd, MV_PRESETS[preset_name].dit
            )
            ckpt.save_params_npz(
                os.path.join(out_dir, f"{preset_name}.npz"), mv_params
            )

    vae_dir = os.path.join(args.checkpoint_dir, "Cosmos-Tokenize1-CV8x8x8-720p")
    if args.vae and os.path.isdir(vae_dir):
        import numpy as np

        log.info(f"converting {vae_dir} ...")
        params, mean, std = ckpt.load_torchscript_tokenizer(vae_dir)
        np.savez(
            os.path.join(out_dir, "vae.npz"),
            **{k: np.asarray(v) for k, v in params.items()},
        )
        if mean is not None:
            np.savez(
                os.path.join(out_dir, "vae_mean_std.npz"), mean=mean, std=std
            )
    elif args.vae:
        log.warning(f"{vae_dir} not found; skipping VAE")


if __name__ == "__main__":
    main()
