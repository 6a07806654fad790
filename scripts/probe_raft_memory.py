"""AOT memory analysis of the RAFT-Large flow estimator at training res.

The tokenizer FlowLoss runs RAFT on the scale-2-downsampled training
crops, batched over the T-1 frame pairs (continuous.py:314-327). This
probe lowers + compiles raft_forward with ABSTRACT params (no weights,
no transfer — the probe_sampler_memory.py pattern) and prints XLA's
memory_analysis(), so the correlation-pyramid footprint

    (N * h * w) * h * w * 4 bytes   at  h = H/8, w = W/8

is measured, not guessed, before a training run is attempted.

Run: python scripts/probe_raft_memory.py [--frames 8] [--height 256]
     [--width 256] [--iters 12]

Measured (1x v5e, 2026-08-20): see docs/STATUS.md round-5 notes.
"""

from __future__ import annotations

import argparse
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8,
                    help="N = frame pairs per forward (T-1 of the crop)")
    ap.add_argument("--height", type=int, default=256,
                    help="pre-downsample crop height (flow runs at /2)")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--scale", type=int, default=2,
                    help="FlowLoss downsample factor")
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gen3c_tpu.aux import raft as R

    h = args.height // args.scale
    w = args.width // args.scale
    h8, w8 = h // 8, w // 8
    pyr_gb = sum(
        args.frames * h8 * w8 * max(1, h8 >> l) * max(1, w8 >> l) * 4
        for l in range(R.NUM_LEVELS)
    ) / 1e9
    print(f"flow input: N={args.frames} {h}x{w} "
          f"(1/8 grid {h8}x{w8}); analytic corr pyramid ~{pyr_gb:.3f} GB")

    spec = R.raft_state_spec()
    abstract = {
        k: jax.ShapeDtypeStruct(s, jnp.float32) for k, s in spec.items()
    }
    img = jax.ShapeDtypeStruct((args.frames, 3, h, w), jnp.float32)

    fn = lambda p, a, b: R.raft_forward(p, a, b, args.iters)  # noqa: E731
    lowered = jax.jit(fn).lower(abstract, img, img)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "generated_code_size_in_bytes"):
        v = getattr(mem, k, None)
        if v is not None:
            print(f"{k}: {v / 1e9:.3f} GB")
    total = (getattr(mem, "argument_size_in_bytes", 0)
             + getattr(mem, "temp_size_in_bytes", 0))
    print(f"peak (args + temp): {total / 1e9:.3f} GB")


if __name__ == "__main__":
    main()
