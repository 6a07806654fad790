"""Persist the converted + quantized GEN3C DiT as a native checkpoint.

One-time offline step (VERDICT r3 'next #4' — serving cold start): the
torch model.pt (or a native bf16 dit.npz) is converted and int8-quantized
ENTIRELY ON HOST (forced CPU platform — zero device/tunnel traffic) and
saved as <checkpoint_dir>/gen3c_tpu/dit_{w8a8,int8}.npz. Subsequent
build_gen3c_model(quantize=...) calls load it directly: half the
host->device bytes of the bf16 checkpoint, no torch conversion, no
on-device quantization pass.

Usage:
  python scripts/persist_quantized_dit.py --checkpoint_dir checkpoints \
      [--mode w8a8|int8] [--preset gen3c_7b]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")  # host-side only
sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint_dir", required=True)
    ap.add_argument("--mode", choices=["w8a8", "int8"], default="w8a8")
    ap.add_argument("--preset", default="gen3c_7b")
    args = ap.parse_args()

    from gen3c_tpu.models.quantize import quantize_dit_params_numpy
    from gen3c_tpu.pipelines.factory import PRESETS
    from gen3c_tpu.utils import checkpoint as ckpt
    from gen3c_tpu.utils import log

    preset = PRESETS[args.preset]
    native = os.path.join(args.checkpoint_dir, "gen3c_tpu", "dit.npz")
    torch_ckpt = os.path.join(
        args.checkpoint_dir, "GEN3C-Cosmos-7B", "model.pt"
    )
    if os.path.exists(native):
        import jax
        import jax.numpy as jnp

        from gen3c_tpu.models.dit import init_dit_params

        template = jax.eval_shape(
            lambda: init_dit_params(jax.random.PRNGKey(0), preset.dit)
        )
        # load at bf16 — the dtype the serving build quantizes from, so
        # the persisted int8 is bit-identical to quantize-on-build
        params = ckpt.load_params_npz(native, template, jnp.bfloat16)
        log.info(f"Loaded native checkpoint {native} (as bf16)")
    elif os.path.exists(torch_ckpt):
        params = ckpt.load_torch_dit_checkpoint(torch_ckpt, preset.dit)
        log.info(f"Converted torch checkpoint {torch_ckpt}")
    else:
        raise SystemExit(
            f"no checkpoint found under {args.checkpoint_dir} "
            f"(looked for {native} and {torch_ckpt})"
        )

    log.info(f"Quantizing on host ({args.mode})...")
    qparams = quantize_dit_params_numpy(
        params, act_quant=args.mode == "w8a8"
    )
    out = os.path.join(
        args.checkpoint_dir, "gen3c_tpu", f"dit_{args.mode}.npz"
    )
    ckpt.save_params_npz(out, qparams)
    log.info(f"Persisted quantized DiT to {out}")


if __name__ == "__main__":
    main()
