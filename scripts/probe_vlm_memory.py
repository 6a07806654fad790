"""AOT memory probe: the Pixtral-12B prompt-upsampler path on one v5e.

VERDICT r3 'weak #5': the checkpoint-gated guardrail/upsampler stacks
were parity-tested only at tiny shapes — this probe compiles the REAL
12B-shape programs with abstract params (jax.eval_shape — no weights, no
HBM) and prints the compiler's memory analysis, catching OOM before a
deployment does (the probe_sampler_memory.py recipe):

  1. the Pixtral vision tower at the 1024-max-side image budget,
  2. the 12B text prefill (image tokens + chat prompt), and
  3. the per-token decode step against the full KV cache,

for both bf16 and int8-weight-only parameter trees.

Usage:  python scripts/probe_vlm_memory.py [--seq 1024] [--quantize]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

GB = 1 << 30

# Pixtral-12B text geometry (HF mistralai/Pixtral-12B text_config)
PIXTRAL_12B_TEXT = dict(
    dim=5120,
    n_layers=40,
    n_heads=32,
    n_kv_heads=8,
    vocab_size=131072,
    ffn_hidden_size=14336,
    rope_theta=1e9,
)


def _report(tag, compiled):
    m = compiled.memory_analysis()
    peak = (
        m.argument_size_in_bytes + m.temp_size_in_bytes
        + m.output_size_in_bytes
    )
    print(
        f"{tag}: args {m.argument_size_in_bytes / GB:.2f} GB, "
        f"temp {m.temp_size_in_bytes / GB:.2f} GB, "
        f"peak ~{peak / GB:.2f} GB"
        + (" [> 16 GB HBM!]" if peak > 16 * GB else "")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=1024,
                    help="prefill length (vision tokens + chat prompt)")
    ap.add_argument("--quantize", action="store_true",
                    help="int8 weight-only tree (maybe_quantized_convert)")
    args = ap.parse_args()

    from gen3c_tpu.aux.vision_encoder import VisionConfig, init_vision_params
    from gen3c_tpu.aux.vision_encoder import vision_encode
    from gen3c_tpu.models.ar_transformer import (
        ARConfig,
        ar_forward,
        init_ar_params,
        init_kv_cache,
        rope_tables,
    )
    from gen3c_tpu.utils.jax_setup import setup_jax

    setup_jax()
    sds = jax.ShapeDtypeStruct

    vcfg = VisionConfig(dtype=jnp.bfloat16)
    vshapes = jax.eval_shape(
        lambda: init_vision_params(jax.random.PRNGKey(0), vcfg, jnp.bfloat16)
    )
    try:
        compiled = (
            jax.jit(lambda p, x: vision_encode(p, vcfg, x))
            .lower(vshapes, sds((3, 1024, 1024), jnp.float32))
            .compile()
        )
        _report("vision tower @3x1024x1024 bf16", compiled)
    except Exception as e:  # noqa: BLE001
        print(f"vision tower: REJECTED — {e}")

    tcfg = ARConfig(max_seq_len=args.seq + 512, dtype=jnp.bfloat16,
                    **PIXTRAL_12B_TEXT)

    def tree():
        p = init_ar_params(jax.random.PRNGKey(0), tcfg, jnp.bfloat16)
        if args.quantize:
            from gen3c_tpu.models.quantize import quantize_ar_params

            p = quantize_ar_params(p)
        return p

    tshapes = jax.eval_shape(tree)
    rope = rope_tables(tcfg)
    cache_shapes = jax.eval_shape(
        lambda: init_kv_cache(tcfg, 1, jnp.bfloat16)
    )

    emb = sds((1, args.seq, tcfg.dim), jnp.bfloat16)
    toks = sds((1, args.seq), jnp.int32)
    try:
        compiled = (
            jax.jit(
                lambda p, t, e, c: ar_forward(
                    p, tcfg, t, rope, cache=c, input_embeddings=e
                )
            )
            .lower(tshapes, toks, emb, cache_shapes)
            .compile()
        )
        _report(f"12B prefill @L={args.seq}", compiled)
    except Exception as e:  # noqa: BLE001
        print(f"12B prefill: REJECTED — {e}")

    try:
        compiled = (
            jax.jit(
                lambda p, t, c: ar_forward(p, tcfg, t, rope, cache=c)
            )
            .lower(tshapes, sds((1, 1), jnp.int32), cache_shapes)
            .compile()
        )
        _report("12B decode step (full KV cache)", compiled)
    except Exception as e:  # noqa: BLE001
        print(f"12B decode: REJECTED — {e}")


if __name__ == "__main__":
    main()
