"""Per-component timing of one DiT block at the production GEN3C shape.

NOTE: every measurement includes a ~26 ms host-read floor through the
axon tunnel (see CLAUDE.md) — subtract it when comparing small ops.

Locates where the non-attention ~430 ms/block goes: projections, MLP,
cross-attention, AdaLN/LayerNorm elementwise, int8 dequant overhead.

Run:  python scripts/profile_block.py
"""

from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import jax
import jax.numpy as jnp

from gen3c_tpu.models.dit import (
    GEN3C_7B,
    _adaln_modulation,
    _attn_block,
    _layer_norm,
    _mlp_block,
    _modulated_residual,
    init_dit_params,
    rope_3d_table,
)
from gen3c_tpu.models.quantize import quantize_dit_params_inplace

B, Tp, Hp, Wp = 2, 16, 44, 80
L = Tp * Hp * Wp  # 56,320
D = 4096
M = 512  # T5 context


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(name, f, *args, iters=2, tf=None):
    g = jax.jit(lambda *a: jnp.sum(f(*a)))
    try:
        float(g(*args))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            float(g(*args))
        dt = (time.perf_counter() - t0) / iters
        extra = f"  ({tf / dt / 1e12:.1f} TF/s)" if tf else ""
        log(f"  {name:<28} {dt * 1e3:8.1f} ms{extra}")
        return dt
    except Exception as e:  # noqa: BLE001
        log(f"  {name:<28} FAILED: {str(e)[:120]}")
        jax.clear_caches()
        return None


def main():
    import dataclasses

    cfg = dataclasses.replace(GEN3C_7B, num_blocks=1)
    log(f"backend: {jax.default_backend()}, shape B={B} L={L} D={D}")
    params = init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    qparams = quantize_dit_params_inplace(params)
    blk = qparams["blocks"][0]

    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (B, L, D), jnp.bfloat16)
    ctx = jax.random.normal(key, (B, M, 1024), jnp.bfloat16)
    emb = jax.random.normal(key, (B, D), jnp.float32)
    lora = jax.random.normal(key, (B, 3 * D), jnp.float32)
    rope = rope_3d_table(cfg, Tp, Hp, Wp, fps=24.0)

    nh = cfg.num_heads

    # whole block = 3 modulated residuals
    def full_block(x, ctx, emb, lora):
        t = _modulated_residual(
            x, lambda t: _attn_block(blk["fa"], t, None, nh, rope), blk["fa"],
            emb, lora)
        t = _modulated_residual(
            t, lambda s: _attn_block(blk["ca"], s, ctx, nh, None), blk["ca"],
            emb, lora)
        return _modulated_residual(
            t, lambda s: _mlp_block(blk["mlp"], s), blk["mlp"], emb, lora)

    t_full = timeit("FULL block", full_block, x, ctx, emb, lora,
                    tf=(4.0 * B * nh * L * L * 128) + 53e12)

    # self-attention sub-block (projections + kernel + out)
    tf_self = 4.0 * B * nh * L * L * 128 + 8 * B * L * D * D
    t_sa = timeit("self-attn (proj+kern+out)",
                  lambda x: _attn_block(blk["fa"], x, None, nh, rope), x,
                  tf=tf_self)
    # cross-attention sub-block
    tf_ca = 4 * B * L * D * D + 4 * B * nh * L * M * 128
    t_ca = timeit("cross-attn",
                  lambda x, c: _attn_block(blk["ca"], x, c, nh, None), x, ctx,
                  tf=tf_ca)
    # MLP
    tf_mlp = 2 * 2 * B * L * D * 4 * D
    t_mlp = timeit("mlp", lambda x: _mlp_block(blk["mlp"], x), x, tf=tf_mlp)

    # plain projection matmul (1 of the 4 in self-attn) bf16 vs int8-dequant
    wq = blk["fa"]["q"]
    from gen3c_tpu.models.quantize import weight
    t_proj_q = timeit("one DxD matmul (int8 w)",
                      lambda x: x @ weight(wq, jnp.bfloat16), x,
                      tf=2 * B * L * D * D)
    wbf = jax.random.normal(key, (D, D), jnp.bfloat16)
    t_proj_b = timeit("one DxD matmul (bf16 w)", lambda x, w: x @ w, x, wbf,
                      tf=2 * B * L * D * D)
    w_mlp_bf = jax.random.normal(key, (D, 4 * D), jnp.bfloat16)
    timeit("Dx4D matmul (bf16 w)", lambda x, w: x @ w, x, w_mlp_bf,
           tf=2 * B * L * D * 4 * D)

    # elementwise: LN + modulate (fp32) + residual gate, no sub-fn
    def adaln_only(x, emb, lora):
        shift, scale, gate = _adaln_modulation(blk["mlp"]["adaln"], emb, lora, 3)
        normed = _layer_norm(x)
        modded = (normed.astype(jnp.float32) * (1 + scale[:, None, :])
                  + shift[:, None, :]).astype(x.dtype)
        return x + gate[:, None, :].astype(x.dtype) * modded

    t_eltw = timeit("LN+modulate+gate eltwise", adaln_only, x, emb, lora)

    if t_full and t_sa and t_ca and t_mlp:
        log(f"\n  sum of parts: {(t_sa + t_ca + t_mlp) * 1e3:.0f} ms "
            f"vs full {t_full * 1e3:.0f} ms")
        log(f"  non-selfattn: {(t_full - t_sa) * 1e3:.0f} ms")


if __name__ == "__main__":
    main()
