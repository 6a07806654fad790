"""Async checkpoint save/restore via orbax.

Parity: the reference's threaded checkpointer + latest_checkpoint.txt
pointer (utils/checkpointer.py:49-236) and the DDP/FSDP/TP variants
(checkpointer/): orbax's async, sharding-aware PyTree checkpointing
subsumes all of them on TPU (saves happen in a background thread, arrays
are gathered/scattered per their NamedShardings automatically).
"""

from __future__ import annotations

import os
from typing import Any, Optional

from gen3c_tpu.utils import log


class Checkpointer:
    def __init__(self, ckpt_dir: str, async_save: bool = True):
        import orbax.checkpoint as ocp

        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=3,
                enable_async_checkpointing=async_save,
            ),
        )

    def save(self, step: int, state: Any) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))
        log.info(f"checkpoint save dispatched at step {step}")

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
        log.info(f"restored checkpoint step {step}")
        return restored

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
