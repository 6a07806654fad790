"""Timers + TPU profiling hooks.

Parity: utils/misc.py:160-260 (`timer` context/decorator, `TrainingTimer`
per-phase accumulator) and the IterSpeed callback; plus the TPU-native
additions the reference lacks (SURVEY §5): jax.profiler trace capture and
a device-memory report.
"""

from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict
from typing import Dict, Optional

from gen3c_tpu.utils import log


class timer(contextlib.ContextDecorator):  # noqa: N801
    """Log elapsed wall time of a block / function (misc.timer parity)."""

    def __init__(self, context: str, debug: bool = False):
        self.context = context
        self.debug = debug

    def __enter__(self):
        self.tic = time.monotonic()
        return self

    def __exit__(self, *exc):
        dt = time.monotonic() - self.tic
        (log.debug if self.debug else log.info)(
            f"Time spent on {self.context}: {dt:.4f} seconds"
        )
        return False


class TrainingTimer:
    """Accumulate wall time per phase (misc.TrainingTimer parity):

        with timer_obj("dataloader"): ...
        timer_obj.report()
    """

    def __init__(self):
        self.results: Dict[str, list] = defaultdict(list)
        self._start: Dict[str, float] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.monotonic()
        try:
            yield
        finally:
            self.results[name].append(time.monotonic() - t0)

    def mean(self, name: str) -> float:
        vals = self.results.get(name, [])
        return sum(vals) / len(vals) if vals else 0.0

    def report(self) -> Dict[str, float]:
        out = {k: self.mean(k) for k in self.results}
        for k, v in out.items():
            log.info(f"phase {k}: mean {v*1000:.1f} ms")
        return out

    def reset(self) -> None:
        self.results.clear()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace viewable in XProf/TensorBoard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info(f"profiler trace written to {log_dir}")


def device_memory_report() -> Optional[dict]:
    """Per-device live memory stats, when the backend exposes them."""
    import jax

    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:  # noqa: BLE001
            continue
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    for k, v in out.items():
        log.info(
            f"{k}: in_use={v['bytes_in_use']} peak={v['peak_bytes_in_use']} "
            f"limit={v['bytes_limit']}"
        )
    return out or None
