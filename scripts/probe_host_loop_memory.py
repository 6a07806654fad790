"""Run the host-loop denoise standalone with per-step syncs and device
memory stats — pinpoints the runtime OOM the AOT analysis (16.22 GB
peak, fits) does not predict.

Usage: python scripts/probe_host_loop_memory.py [steps] [window|none]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from gen3c_tpu.diffusion.sampler import _host_loop_step
from gen3c_tpu.diffusion.scheduler import EDMEulerSchedule
from gen3c_tpu.models.dit import GEN3C_7B, init_dit_params
from gen3c_tpu.models.gen3c import _dit_net_fn
from gen3c_tpu.models.quantize import quantize_dit_params_inplace


def mem(tag):
    try:
        st = jax.local_devices()[0].memory_stats()
        used = st.get("bytes_in_use", 0) / 1e9
        peak = st.get("peak_bytes_in_use", 0) / 1e9
        print(f"[{tag}] in_use {used:.2f} GB peak {peak:.2f} GB",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[{tag}] memory_stats unavailable: {e}", flush=True)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    win = sys.argv[2] if len(sys.argv) > 2 else "2"
    cfg = GEN3C_7B
    if win != "none":
        cfg = dataclasses.replace(cfg, attn_temporal_window=int(win))
    params = init_dit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    qparams = quantize_dit_params_inplace(params, act_quant=True)
    mem("params")

    B, C, T, H, W = 1, 16, 16, 88, 160
    k = jax.random.PRNGKey
    f32 = jnp.float32
    xt = jax.random.normal(k(1), (B, C, T, H, W), f32) * 80.0
    net_out = jnp.zeros((2 * B, C, T, H, W), f32)
    prev_x0 = jnp.zeros_like(xt)
    gt = jax.random.normal(k(2), (B, C, T, H, W), f32)
    aug_lat = gt * 0.999
    ind = jnp.ones((B, 1, T, 1, 1), f32)
    ctx_c = jax.random.normal(k(3), (B, 512, 1024), f32)
    ctx_u = jnp.zeros_like(ctx_c)
    mask = jnp.ones((B, 1, T, H, W), f32)
    pose_c = jax.random.normal(k(4), (B, 64, T, H, W), f32)
    pose_u = jnp.zeros_like(pose_c)
    mem("inputs")

    import numpy as np

    sig = np.linspace(80.0, 0.002, steps + 1).astype(np.float32)
    prev_sigma = 0.0
    schedule = EDMEulerSchedule()
    for i in range(steps):
        refresh = i < 2 or (i - 2) % 2 == 0
        t0 = time.perf_counter()
        xt, net_out, prev_x0 = _host_loop_step(
            _dit_net_fn, (qparams, cfg), xt, net_out, prev_x0,
            jnp.float32(prev_sigma), jnp.float32(sig[i]),
            jnp.float32(sig[i + 1]),
            jnp.float32(0.25 * np.log(sig[i])),
            aug_lat, gt, ind, ctx_c, ctx_u, mask, pose_c, pose_u,
            guidance=1.0, aug=0.001, schedule=schedule,
            net_in_dtype=jnp.bfloat16, refresh=bool(refresh),
            cfg_sequential=False,
        )
        float(jnp.sum(xt[:1, :1, :1, :1, :1]))  # per-step sync
        print(f"step {i} refresh={refresh}: "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        mem(f"step{i}")


if __name__ == "__main__":
    main()
