"""AOT memory analysis of the full 35-step W8A8 sampler program.

The 121-frame e2e run OOMs inside the denoise even with the DiT staged
in alone (bench.py's single-step program at the same shape fits). This
probe lowers + compiles the EXACT sampler program with abstract inputs
(jax.eval_shape of the quantized param tree — no weights, no transfer)
and prints XLA's memory_analysis(), so the overage is measured instead
of guessed.

Run: python scripts/probe_sampler_memory.py [--num_steps 35] [--policy none]
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
    ap.add_argument("--num_steps", type=int, default=35)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--cfg_sequential", action="store_true",
                    help="two sequential B-sized CFG forwards per step "
                         "instead of one batched 2B forward")
    ap.add_argument("--host_step", action="store_true",
                    help="analyze the single-step program the host-loop "
                         "sampler dispatches (generate_samples_host_loop)")
    ap.add_argument("--attn_temporal_window", type=int, default=None,
                    help="analyze with temporal-band sparse attention")
    ap.add_argument("--cond_only", action="store_true",
                    help="with --host_step: analyze the condition-only "
                         "(guidance-interval inactive, use_cfg=False) "
                         "step program")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gen3c_tpu.diffusion.sampler import generate_samples
    from gen3c_tpu.models.dit import GEN3C_7B, init_dit_params
    from gen3c_tpu.models.gen3c import _dit_net_fn
    from gen3c_tpu.models.quantize import _MIN_SIZE, quantize_linear

    cfg = GEN3C_7B
    if args.attn_temporal_window is not None:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, attn_temporal_window=args.attn_temporal_window)

    def _quantize_pure(params):
        # same tree transform as quantize_dit_params_inplace, but pure
        # (no delete/block) so it is eval_shape-able
        def visit(node):
            if isinstance(node, dict):
                if ("w" in node and len(node) == 1
                        and hasattr(node["w"], "ndim")
                        and node["w"].ndim == 2
                        and node["w"].size >= _MIN_SIZE):
                    return quantize_linear(node["w"], act_quant=True)
                return {k: visit(v) for k, v in node.items()}
            if isinstance(node, list):
                return [visit(v) for v in node]
            return node

        return visit(params)

    qshapes = jax.eval_shape(
        lambda k: _quantize_pure(init_dit_params(k, cfg, jnp.bfloat16)),
        jax.random.PRNGKey(0),
    )

    B = args.batch
    C, T, H, W = 16, 16, 88, 160
    f32 = jnp.float32
    sds = jax.ShapeDtypeStruct
    kwargs = dict(
        net_fn=_dit_net_fn,
        net_params=(qshapes, cfg),
        init_noise=sds((B, C, T, H, W), f32),
        augment_noise=sds((B, C, T, H, W), f32),
        crossattn_cond=sds((B, 512, 1024), f32),
        crossattn_uncond=sds((B, 512, 1024), f32),
        gt_latent=sds((B, C, T, H, W), f32),
        condition_video_indicator=sds((B, 1, T, 1, 1), f32),
        condition_video_input_mask=sds((B, 1, T, H, W), f32),
        pose_latent_cond=sds((B, 64, T, H, W), f32),
        pose_latent_uncond=sds((B, 64, T, H, W), f32),
        num_steps=args.num_steps,
        guidance=1.0,
        net_in_dtype=jnp.bfloat16,
        cfg_sequential=args.cfg_sequential,
    )
    if args.host_step:
        from gen3c_tpu.diffusion.sampler import _host_loop_step
        from gen3c_tpu.diffusion.scheduler import EDMEulerSchedule

        f1 = jnp.float32(1.0)
        kwargs = dict(
            net_fn=_dit_net_fn,
            net_params=(qshapes, cfg),
            xt=sds((B, C, T, H, W), f32),
            cached_out=sds((2 * B, C, T, H, W), f32),
            prev_x0=sds((B, C, T, H, W), f32),
            prev_sigma=sds((), f32),
            sigma=sds((), f32),
            sigma_next=sds((), f32),
            c_noise=sds((), f32),
            augment_latent=sds((B, C, T, H, W), f32),
            gt=sds((B, C, T, H, W), f32),
            indicator_base=sds((B, 1, T, 1, 1), f32),
            crossattn_cond=sds((B, 512, 1024), f32),
            crossattn_uncond=sds((B, 512, 1024), f32),
            condition_video_input_mask=sds((B, 1, T, H, W), f32),
            pose_latent_cond=sds((B, 64, T, H, W), f32),
            pose_latent_uncond=sds((B, 64, T, H, W), f32),
            guidance=1.0,
            aug=0.001,
            schedule=EDMEulerSchedule(),
            net_in_dtype=jnp.bfloat16,
            refresh=True,
            cfg_sequential=args.cfg_sequential,
            use_cfg=not args.cond_only,
        )
        del f1
        print("lowering + compiling the host-loop STEP program...",
              file=sys.stderr)
        lowered = _host_loop_step.lower(**kwargs)
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        print(mem, file=sys.stderr)
        g = 1e9
        tmp = getattr(mem, "temp_size_in_bytes", 0)
        arg = getattr(mem, "argument_size_in_bytes", 0)
        print(f"host step: args {arg/g:.2f} GB + temp {tmp/g:.2f} GB = "
              f"{(arg+tmp)/g:.2f} GB", file=sys.stderr)
        import json

        print(json.dumps({"temp_gb": round(tmp / g, 3),
                          "args_gb": round(arg / g, 3),
                          "peak_gb": round((arg + tmp) / g, 3)}))
        return

    print("lowering + compiling the sampler program...", file=sys.stderr)
    lowered = generate_samples.lower(**kwargs)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    print(mem, file=sys.stderr)
    g = 1e9
    arg = getattr(mem, "argument_size_in_bytes", 0)
    out = getattr(mem, "output_size_in_bytes", 0)
    tmp = getattr(mem, "temp_size_in_bytes", 0)
    gen = getattr(mem, "generated_code_size_in_bytes", 0)
    alias = getattr(mem, "alias_size_in_bytes", 0)
    total = arg + out + tmp + gen - alias
    print(
        f"args {arg/g:.2f} GB, out {out/g:.2f} GB, temp {tmp/g:.2f} GB, "
        f"code {gen/g:.3f} GB, aliased -{alias/g:.2f} GB -> "
        f"peak ~{total/g:.2f} GB (chip HBM 16 GB)",
        file=sys.stderr,
    )
    import json

    print(json.dumps({
        "temp_gb": round(tmp / g, 3),
        "args_gb": round(arg / g, 3),
        "peak_gb": round(total / g, 3),
    }))


if __name__ == "__main__":
    main()
