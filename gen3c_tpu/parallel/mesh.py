"""Device mesh construction (the TPU-native replacement for megatron
parallel_state + torch.distributed NCCL groups).

Reference: utils/distributed.py:49-79 (NCCL init) +
parallel_state.initialize_model_parallel(tp, pp, cp) — here a single
jax.sharding.Mesh over ICI/DCN carries every parallelism axis:

  dp — data parallel (batch sharding)
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
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (dp, cp, tp) mesh. cp defaults to all remaining devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if cp is None:
        assert n % (dp * tp) == 0, (n, dp, tp)
        cp = n // (dp * tp)
    assert dp * cp * tp == n, f"dp*cp*tp={dp*cp*tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, cp, tp)
    return Mesh(arr, ("dp", "cp", "tp"))


def maybe_distributed_init() -> None:
    """Multi-host bootstrap (reference distributed.init parity): no-op for
    single-process; uses jax.distributed env-driven init when the standard
    coordinator env vars are present."""
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ or "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()
