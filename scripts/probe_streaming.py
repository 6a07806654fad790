"""Measure the block-streamed bf16 7B denoise forward on the real chip.

Builds the UNQUANTIZED 7B (random weights), pins its blocks to
pinned_host via StreamingDiT, and times full 28-block forwards at the
production shape (B=2 CFG, the 81-channel GEN3C_7B input, 56,320
tokens — same shape bench.py measures). Compare to
bench.py's resident W8A8 step (29.5 s) — bf16 matmuls are ~1.5x slower
than W8A8 on the MLP shape, so the roofline expectation is ~33-36 s if
the block DMA hides behind compute.

Run: python scripts/probe_streaming.py [--iters 2] [--prefetch 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--prefetch", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gen3c_tpu.models.dit import GEN3C_7B, init_dit_params
    from gen3c_tpu.models.dit_streaming import StreamingDiT

    cfg = GEN3C_7B
    print("init bf16 7B on device...", file=sys.stderr, flush=True)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    t0 = time.perf_counter()
    net = StreamingDiT(params, cfg, prefetch=args.prefetch,
                       free_source=True)
    print(f"pinned {len(net.blocks)} blocks in "
          f"{time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

    B = 2  # batched CFG
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 81, 16, 88, 160),
                          jnp.bfloat16)
    t = jnp.ones((B,), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 512, 1024),
                            jnp.bfloat16)

    print("compile + warm...", file=sys.stderr, flush=True)
    out = net(x, t, ctx)
    print("warm sum", float(jnp.sum(out.astype(jnp.float32))),
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = net(x, t, ctx)
        float(jnp.sum(out.astype(jnp.float32)))  # force host read
    dt = (time.perf_counter() - t0) / args.iters
    print(f"streamed bf16 forward: {dt:.2f}s (prefetch {args.prefetch})",
          file=sys.stderr, flush=True)
    import json

    print(json.dumps({"streamed_bf16_step_s": round(dt, 2),
                      "prefetch": args.prefetch}))


if __name__ == "__main__":
    main()
