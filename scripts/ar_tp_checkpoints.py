"""Shard / merge Cosmos AR tensor-parallel torch checkpoints.

Parity: scripts/{merge_autoregressive_tp_checkpoints,
shard_autoregressive_base_checkpoints}.py + autoregressive/utils/
checkpoint.py:87-262 (pytorch backend). The reference stores TP shards
next to the base file as `<name>_model_mp_{rank}.pt`; this tool follows
the same naming so shards interop both ways.

  # split a merged checkpoint into 4 TP shards
  python scripts/ar_tp_checkpoints.py shard -c model.pt -t 4 \
      --n_heads 32 --n_kv_heads 8 --dim 4096

  # merge 4 shards (model_model_mp_{0..3}.pt) back into one
  python scripts/ar_tp_checkpoints.py merge -c model.pt -o merged.pt \
      -t 4 --n_heads 32 --n_kv_heads 8 --dim 4096

On the TPU side the merged dict feeds convert_cosmos_ar_state_dict and
runtime TP is done by NamedSharding over the mesh (parallel/sharding.py)
— these tools exist for interop with reference-produced shards.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gen3c_tpu.models.convert import (  # noqa: E402
    merge_ar_tp_state_dicts,
    shard_ar_tp_state_dict,
)


def _load(path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return {k: v.float().numpy() if hasattr(v, "numpy") else v
            for k, v in sd.items()}


def _save(sd, path):
    import torch

    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("mode", choices=["shard", "merge"])
    p.add_argument("--checkpoint_path", "-c", required=True,
                   help=".pt path; shards live at *_model_mp_{rank}.pt")
    p.add_argument("--output_path", "-o", default=None)
    p.add_argument("--tensor_parallel_size", "-t", type=int, required=True)
    p.add_argument("--n_heads", type=int, required=True)
    p.add_argument("--n_kv_heads", type=int, required=True)
    p.add_argument("--dim", type=int, required=True)
    p.add_argument("--context_dim", type=int, default=None)
    p.add_argument("--head_dim", type=int, default=None)
    args = p.parse_args(argv)

    base = args.checkpoint_path
    assert base.endswith(".pt"), "checkpoint path must end with .pt"
    tp = args.tensor_parallel_size
    shard_paths = [base.replace(".pt", f"_model_mp_{r}.pt")
                   for r in range(tp)]

    if args.mode == "shard":
        sd = _load(base)
        for r, path in enumerate(shard_paths):
            shard = shard_ar_tp_state_dict(
                sd, tp, r, args.n_heads, args.n_kv_heads, args.dim,
                args.context_dim)
            _save(shard, path)
            print(f"wrote {path}")
    else:
        shards = [_load(pth) for pth in shard_paths]
        merged = merge_ar_tp_state_dicts(
            shards, args.n_heads, args.n_kv_heads, args.dim,
            args.context_dim, args.head_dim)
        out = args.output_path or base.replace(".pt", "_merged.pt")
        _save(merged, out)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
