"""Multi-host bootstrap: 2 local processes through jax.distributed.

Exercises maybe_distributed_init (reference utils/distributed.py:49-79
parity) beyond its single-process no-op path: two CPU-backend processes
join a coordinator, build the GLOBAL (dp=2, cp=2, tp=2) mesh over 8
devices (4 local per process), and run one REAL sharded DiT train step
with host-local batch shards assembled via local_batch_to_global.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

from gen3c_tpu.parallel.mesh import (
    local_batch_to_global, make_mesh, maybe_distributed_init,
)

assert maybe_distributed_init() is True, "env-driven init did not trigger"
assert jax.process_count() == 2
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from gen3c_tpu.models.dit import DiTConfig, init_dit_params
from gen3c_tpu.training.train_step import (
    init_train_state, make_optimizer, make_sharded_train_step,
)

mesh = make_mesh(dp=2, cp=2, tp=2)  # global mesh over both processes
cfg = DiTConfig(
    in_channels=81, model_channels=32, num_blocks=1, num_heads=2,
    adaln_lora_dim=4, rope_t_extrapolation_ratio=2.0, dtype=jnp.float32,
)
params = init_dit_params(jax.random.PRNGKey(0), cfg, jnp.float32)
opt = make_optimizer(lr=1e-4, warmup_steps=2)
step_fn, _ = make_sharded_train_step(mesh, cfg, opt, params,
                                     sequence_parallel=True)
state = init_train_state(params, opt)

rank = jax.process_index()
rng = np.random.RandomState(0)  # same stream; each proc slices its half
x0 = rng.randn(2, 16, 4, 4, 8).astype(np.float32)
emb = rng.randn(2, 8, 1024).astype(np.float32)
extra = rng.randn(2, 65, 4, 4, 8).astype(np.float32)
local = {
    "x0": x0[rank:rank + 1],
    "crossattn_emb": emb[rank:rank + 1],
    "extra_channels": extra[rank:rank + 1],
}
batch = local_batch_to_global(
    mesh,
    {
        "x0": P("dp", None, "cp"),
        "crossattn_emb": P("dp"),
        "extra_channels": P("dp", None, "cp"),
    },
    local,
)
assert batch["x0"].shape == (2, 16, 4, 4, 8), batch["x0"].shape
state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
loss = float(jax.device_get(metrics["loss"]))
assert np.isfinite(loss)
print(f"RESULT rank={rank} loss={loss:.6f}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_bootstrap_and_sharded_step(tmp_path):
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["NUM_PROCESSES"] = "2"
        env["PROCESS_ID"] = str(rank)
        env["PYTHONPATH"] = repo
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                cwd=repo,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
    losses = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert line, out
        losses.append(float(line[0].split("loss=")[1]))
    # both processes computed the same global step
    assert abs(losses[0] - losses[1]) < 1e-6, losses
