"""Phase-wise parameter offloading: host RAM <-> device HBM staging.

Parity: the reference's --offload_* flags (inference_utils.py:53-170;
gen3c_pipeline.py:186-225 `_run_model_with_offload` moves each torch
module off the GPU after its phase so the 7B pipeline fits in GPU
memory — README.md:146-155 documents ~43 GB peak H100 with everything
offloaded). TPU-native equivalent: params rest as host numpy pytrees;
`staged()` device_puts them into HBM for the phase that needs them and
explicitly deletes the device buffers on exit, so XLA frees the HBM
immediately instead of waiting for GC. PJRT refcounts keep buffers
alive for any in-flight execution that was dispatched with them, so
deletion right after an async jit dispatch is safe.

Why it matters here: one v5e chip has 16 GB HBM. The W8A8 7B DiT is
7.6 GB; the full-res VAE encode/decode needs most of the rest — they
fit alone but not together (measured OOM in the 121-frame e2e run,
2026-08-16). With the DiT staged out during VAE phases the whole
single-image pipeline runs single-chip.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any

import numpy as np

from gen3c_tpu.utils import log


def tree_to_host(tree: Any) -> Any:
    """Move every array leaf off the device for offload residency.

    Preferred residency is the device-adjacent PINNED HOST memory (the
    TPU VM's RAM, jax memory_kind="pinned_host"): staging back into HBM
    then rides local DMA instead of the client<->TPU tunnel that costs
    ~165 s for the 7.6 GB DiT. Falls back to client-side numpy when the
    backend has no pinned_host memory or GEN3C_OFFLOAD_VIA=client is
    set.
    """
    import os

    import jax

    if os.environ.get("GEN3C_OFFLOAD_VIA", "pinned_host") == "pinned_host":
        try:
            from jax.sharding import SingleDeviceSharding

            d = jax.devices()[0]
            kinds = {m.kind for m in d.addressable_memories()}
            if "pinned_host" in kinds:
                sh = SingleDeviceSharding(d, memory_kind="pinned_host")
                out = jax.tree.map(
                    lambda x: jax.device_put(x, sh), tree
                )
                jax.block_until_ready(out)
                return out
        except Exception as e:  # noqa: BLE001
            log.warning(f"pinned_host offload unavailable ({e}); "
                        "falling back to client-side numpy")
    return jax.tree.map(np.asarray, tree)


def tree_nbytes(tree: Any) -> int:
    import jax

    return sum(
        getattr(leaf, "nbytes", 0) for leaf in jax.tree.leaves(tree)
    )


@contextlib.contextmanager
def staged(tree: Any, enabled: bool = True, tag: str = "params"):
    """Yield `tree` staged onto the default device; delete the device
    buffers on exit. With enabled=False, yields `tree` unchanged (the
    resident, non-offloaded configuration)."""
    import jax

    if not enabled:
        yield tree
        return
    t0 = time.perf_counter()
    # explicit device-memory placement: leaves may rest in pinned_host,
    # where a plain device_put would be a no-op
    from jax.sharding import SingleDeviceSharding

    try:
        dev_sh = SingleDeviceSharding(
            jax.devices()[0], memory_kind="device"
        )
        device_tree = jax.tree.map(
            lambda x: jax.device_put(x, dev_sh), tree
        )
    except Exception:  # noqa: BLE001
        device_tree = jax.device_put(tree)
    log.info(
        f"offload: staged {tag} ({tree_nbytes(tree)/1e9:.2f} GB) to "
        f"device in {time.perf_counter()-t0:.2f}s"
    )
    try:
        yield device_tree
    finally:
        # identity guard: a leaf already resident in device memory comes
        # back from device_put as the SAME array (no copy) — deleting it
        # would destroy the caller's only copy of the params
        src_ids = {id(leaf) for leaf in jax.tree.leaves(tree)}
        for leaf in jax.tree.leaves(device_tree):
            if isinstance(leaf, jax.Array) and id(leaf) not in src_ids:
                leaf.delete()
        log.info(f"offload: released {tag} from device")
