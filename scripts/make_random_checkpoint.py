"""Synthesize a random-weight native checkpoint for timing/pipeline tests.

The real GEN3C-Cosmos-7B weights are not distributable with this repo;
cold-start and end-to-end timing work still needs checkpoints with the
REAL byte footprint (the serving cold start is upload-bandwidth-bound —
docs/STATUS.md). This writes, entirely on host (no device traffic):

  <dir>/gen3c_tpu/dit.npz         bf16 random DiT (exact 7B tree)
  <dir>/gen3c_tpu/dit_w8a8.npz    int8 pre-quantized variant (optional)

Values are N(0, 0.02) — structurally exact, numerically meaningless.

Usage:
  python scripts/make_random_checkpoint.py --checkpoint_dir /tmp/ckpt \
      [--preset gen3c_7b] [--quantize w8a8|int8] [--skip_bf16] [--seed 0]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")  # host-side only
sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint_dir", required=True)
    ap.add_argument("--preset", default="gen3c_7b")
    ap.add_argument("--quantize", choices=["", "w8a8", "int8"], default="")
    ap.add_argument(
        "--skip_bf16", action="store_true",
        help="only write the quantized variant (saves ~15 GB of disk)",
    )
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import numpy as np

    import jax
    import ml_dtypes

    from gen3c_tpu.models.dit import init_dit_params
    from gen3c_tpu.pipelines.factory import PRESETS
    from gen3c_tpu.utils import checkpoint as ckpt
    from gen3c_tpu.utils import log

    preset = PRESETS[args.preset]
    template = jax.eval_shape(
        lambda: init_dit_params(jax.random.PRNGKey(0), preset.dit)
    )
    rng = np.random.default_rng(args.seed)
    n_params = 0

    def fill(leaf):
        nonlocal n_params
        n_params += int(np.prod(leaf.shape))
        # scale in float32 BEFORE the bf16 cast: ml_dtypes arithmetic is
        # scalar-slow on host, the float32 path is vectorized
        a = rng.standard_normal(leaf.shape, dtype=np.float32)
        a *= 0.02
        return a.astype(ml_dtypes.bfloat16)

    leaves, treedef = jax.tree_util.tree_flatten(template)
    params = jax.tree_util.tree_unflatten(
        treedef, [fill(leaf) for leaf in leaves]
    )
    log.info(f"synthesized {n_params / 1e9:.2f}B random bf16 params")

    out_dir = os.path.join(args.checkpoint_dir, "gen3c_tpu")
    os.makedirs(out_dir, exist_ok=True)
    if not args.skip_bf16:
        out = os.path.join(out_dir, "dit.npz")
        ckpt.save_params_npz(out, params)
        log.info(f"wrote {out} ({os.path.getsize(out) / 1e9:.2f} GB)")

    if args.quantize:
        from gen3c_tpu.models.quantize import quantize_dit_params_numpy

        qparams = quantize_dit_params_numpy(
            params, act_quant=args.quantize == "w8a8"
        )
        out = os.path.join(out_dir, f"dit_{args.quantize}.npz")
        ckpt.save_params_npz(out, qparams)
        log.info(f"wrote {out} ({os.path.getsize(out) / 1e9:.2f} GB)")


if __name__ == "__main__":
    main()
