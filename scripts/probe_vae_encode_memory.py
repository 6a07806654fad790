"""AOT memory probe: batched full-res VAE encode on one v5e chip.

Decides how far encode_warped_frames can batch its 2N per-buffer encode
calls into one program (VERDICT r3 'next #3': collapse the fast-preset
encode phase). Lowers + compiles vae_encode with ABSTRACT params
(jax.eval_shape of init_vae_params — no weights, no HBM) at
(B, 3, 121, 704, 1280) for B = 1, 2, 4 and prints the compiler's
memory analysis, exactly the probe_sampler_memory.py recipe that
AOT-rejected the whole-loop sampler before burning a TPU run.

Usage:  python scripts/probe_vae_encode_memory.py [--frames 121]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from gen3c_tpu.models.vae import CV8x8x8, init_vae_params, vae_encode
from gen3c_tpu.utils import jax_setup

GB = 1 << 30


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=121)
    ap.add_argument("--height", type=int, default=704)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4])
    args = ap.parse_args()

    jax_setup.setup_jax()
    cfg = CV8x8x8
    pshapes = jax.eval_shape(
        lambda: init_vae_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    )
    fn = jax.jit(lambda p, x: vae_encode(p, cfg, x))

    for b in args.batches:
        x = jax.ShapeDtypeStruct(
            (b, 3, args.frames, args.height, args.width), jnp.float32
        )
        try:
            compiled = fn.lower(pshapes, x).compile()
            m = compiled.memory_analysis()
            print(
                f"B={b}: args {m.argument_size_in_bytes / GB:.2f} GB, "
                f"temp {m.temp_size_in_bytes / GB:.2f} GB, "
                f"output {m.output_size_in_bytes / GB:.2f} GB, "
                f"peak ~{(m.argument_size_in_bytes + m.temp_size_in_bytes + m.output_size_in_bytes) / GB:.2f} GB"
            )
        except Exception as e:  # noqa: BLE001 — report compile rejects
            print(f"B={b}: REJECTED — {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
