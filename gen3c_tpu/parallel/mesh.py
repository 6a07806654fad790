"""Device mesh construction (the TPU-native replacement for megatron
parallel_state + torch.distributed NCCL groups).

Reference: utils/distributed.py:49-79 (NCCL init) +
parallel_state.initialize_model_parallel(tp, pp, cp) — here a single
jax.sharding.Mesh over ICI/DCN carries every parallelism axis:

  dp — data parallel (batch sharding)
  cfg — CFG parallel (size 2: the classifier-free-guidance cond /
        uncond forwards run on different ranks; one psum per denoise
        step combines them — gen3c_tpu-only, the reference batches
        the pair on every GPU)
  cp — context parallel (latent-T / token sharding in the denoiser,
       reference's torchrun --nproc_per_node=N mode)
  tp — tensor parallel (Megatron-style column/row param sharding)

Axes of size 1 are always present so PartitionSpecs can name them
unconditionally.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: int = 1,
    cp: Optional[int] = None,
    tp: int = 1,
    cfg: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (dp, cfg, cp, tp) mesh. cp defaults to all remaining
    devices. cfg (CFG parallelism) must be 1 or 2."""
    if devices is None:
        devices = jax.devices()
    if cfg not in (1, 2):
        raise ValueError(f"cfg axis must be 1 or 2, got {cfg}")
    n = len(devices)
    if cp is None:
        assert n % (dp * tp * cfg) == 0, (n, dp, tp, cfg)
        cp = n // (dp * tp * cfg)
    assert dp * cfg * cp * tp == n, (
        f"dp*cfg*cp*tp={dp * cfg * cp * tp} != {n} devices"
    )
    arr = np.asarray(devices).reshape(dp, cfg, cp, tp)
    return Mesh(arr, ("dp", "cfg", "cp", "tp"))


def maybe_distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host bootstrap (reference utils/distributed.py:49-79
    distributed.init parity — NCCL/MPI env plumbing replaced by
    jax.distributed's coordinator service; collectives then ride
    ICI/DCN via the global mesh).

    Args may be passed explicitly or through env vars:
      JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS / MASTER_ADDR(:PORT)
      NUM_PROCESSES / WORLD_SIZE, PROCESS_ID / RANK
    Returns True if jax.distributed was initialized (after which
    jax.devices() is the GLOBAL device list and make_mesh builds the
    global mesh), False for the single-process no-op path.

    Tested with 2 local CPU-backend processes in
    tests/test_distributed_bootstrap.py.
    """
    import os

    env = os.environ
    if coordinator_address is None:
        coordinator_address = env.get("JAX_COORDINATOR_ADDRESS") or env.get(
            "COORDINATOR_ADDRESS"
        )
        if coordinator_address is None and "MASTER_ADDR" in env:
            coordinator_address = (
                f"{env['MASTER_ADDR']}:{env.get('MASTER_PORT', '6379')}"
            )
    if coordinator_address is None:
        return False
    if num_processes is None:
        np_s = env.get("NUM_PROCESSES") or env.get("WORLD_SIZE")
        num_processes = int(np_s) if np_s else None
    if process_id is None:
        pid_s = env.get("PROCESS_ID") or env.get("RANK")
        process_id = int(pid_s) if pid_s else None
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def local_batch_to_global(mesh: Mesh, spec, local_batch):
    """Assemble per-process host-local batch shards into global arrays
    (the multi-host data-loader glue; reference shards via
    DistributedSampler + per-rank NCCL instead). `spec` is a
    PartitionSpec pytree (or one spec applied to every leaf)."""
    from jax.sharding import NamedSharding, PartitionSpec

    def put(x, s):
        # global_shape=None: jax infers it from the local shard shape
        # and which mesh axes span processes — correct for ANY
        # process-to-axis mapping (dp-, cp- or mixed-host sharding),
        # unlike scaling a hardcoded leading axis
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, s), np.asarray(x), None
        )

    if isinstance(spec, PartitionSpec):
        return jax.tree.map(lambda x: put(x, spec), local_batch)
    return jax.tree.map(put, local_batch, spec)
