"""Precompute T5 text embeddings for training / offline inference.

Parity: scripts/get_t5_embeddings*.py in the reference — encodes prompts
with the T5-11B encoder and saves per-prompt .t5.npy files next to the
clips (the layout gen3c_tpu.training.datasets.Gen3CClipDataset reads).

Usage:
  python scripts/get_t5_embeddings.py --prompts prompts.jsonl \
      --output_dir dataset/ [--model google-t5/t5-11b]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--prompts", required=True,
                   help='JSONL: {"prompt": ..., "name": <clip name>}')
    p.add_argument("--output_dir", required=True)
    p.add_argument("--model", default="google-t5/t5-11b")
    p.add_argument("--max_length", type=int, default=512)
    args = p.parse_args()

    import numpy as np

    from gen3c_tpu.models.t5 import CosmosT5TextEncoder
    from gen3c_tpu.utils import log

    enc = CosmosT5TextEncoder(model_name=args.model)
    os.makedirs(args.output_dir, exist_ok=True)
    with open(args.prompts) as f:
        for i, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            emb, _ = enc.encode_prompts(d["prompt"], max_length=args.max_length)
            name = d.get("name", f"{i:06d}")
            out = os.path.join(args.output_dir, f"{name}.t5.npy")
            np.save(out, emb[0])
            log.info(f"{name}: {emb.shape} -> {out}")


if __name__ == "__main__":
    main()
