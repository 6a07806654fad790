"""Download GEN3C / Cosmos checkpoints from Hugging Face.

Parity: scripts/download_gen3c_checkpoints.py in the reference —
GEN3C-Cosmos-7B + the CV8x8x8 tokenizer + T5 + guardrail models into the
layout gen3c_tpu's --checkpoint_dir expects. Requires network access and
a HF token with access to the nvidia/GEN3C-Cosmos-7B gated repo.

Usage:
  python scripts/download_checkpoints.py --checkpoint_dir checkpoints \
      [--models gen3c tokenizer t5]
"""

from __future__ import annotations

import argparse
import os
import sys

MODELS = {
    "gen3c": ("nvidia/GEN3C-Cosmos-7B", "GEN3C-Cosmos-7B"),
    "tokenizer": (
        "nvidia/Cosmos-Tokenize1-CV8x8x8-720p",
        "Cosmos-Tokenize1-CV8x8x8-720p",
    ),
    "t5": ("google-t5/t5-11b", "google-t5/t5-11b"),
    "guardrail": ("nvidia/Cosmos-Guardrail1", "nvidia/Cosmos-Guardrail1"),
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_dir", default="checkpoints")
    p.add_argument(
        "--models", nargs="+", default=["gen3c", "tokenizer"],
        choices=sorted(MODELS),
    )
    args = p.parse_args()

    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        print(
            "huggingface_hub is required: pip install huggingface_hub\n"
            "(this environment has no network egress — run elsewhere and "
            "copy the checkpoints in)",
            file=sys.stderr,
        )
        raise SystemExit(1)

    for name in args.models:
        repo, subdir = MODELS[name]
        dest = os.path.join(args.checkpoint_dir, subdir)
        print(f"downloading {repo} -> {dest}")
        snapshot_download(repo_id=repo, local_dir=dest)

    print(
        "done. Optionally convert to native npz for faster loads:\n"
        f"  python scripts/convert_checkpoints.py "
        f"--checkpoint_dir {args.checkpoint_dir}"
    )


if __name__ == "__main__":
    main()
