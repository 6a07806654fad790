"""Training callbacks (reference: utils/callback.py:37-94 CallBackGroup
dispatch + the EveryN / GradClip / IterSpeed / LowPrecision callbacks).
Gradient clipping and EMA are part of the jitted step here (optax chain,
train_step.py), so callbacks cover the host-side hooks only.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

from gen3c_tpu.utils import log


class Callback:
    def on_train_start(self, trainer) -> None: ...

    def on_training_step_start(self, trainer, step: int) -> None: ...

    def on_training_step_end(
        self, trainer, step: int, metrics: Dict[str, Any]
    ) -> None: ...

    def on_validation_start(self, trainer, step: int) -> None: ...

    def on_validation_end(self, trainer, step: int, metrics) -> None: ...

    def on_train_end(self, trainer) -> None: ...


class CallBackGroup(Callback):
    """Dispatch to a list of callbacks (utils/callback.py parity)."""

    def __init__(self, callbacks: Optional[List[Callback]] = None):
        self.callbacks = callbacks or []

    def append(self, cb: Callback) -> None:
        self.callbacks.append(cb)

    def __getattribute__(self, name):
        if name.startswith("on_"):
            def dispatch(*args, **kwargs):
                for cb in object.__getattribute__(self, "callbacks"):
                    getattr(cb, name)(*args, **kwargs)

            return dispatch
        return object.__getattribute__(self, name)


class EveryN(Callback):
    """Run a hook every N steps (callbacks/every_n.py parity)."""

    def __init__(self, every_n: int, fn):
        self.every_n = every_n
        self.fn = fn

    def on_training_step_end(self, trainer, step, metrics):
        if step % self.every_n == 0:
            self.fn(trainer, step, metrics)


class IterSpeed(Callback):
    """Log iterations/sec every N steps (callbacks/iter_speed.py parity)."""

    def __init__(self, every_n: int = 10):
        self.every_n = every_n
        self._t0 = None
        self._last_step = 0

    def on_train_start(self, trainer):
        self._t0 = time.perf_counter()

    def on_training_step_end(self, trainer, step, metrics):
        if step % self.every_n == 0 and self._t0 is not None:
            dt = time.perf_counter() - self._t0
            n = step - self._last_step
            loss = metrics.get("loss")
            log.info(
                f"step {step}: {n / max(dt, 1e-9):.2f} it/s"
                + (f", loss {float(loss):.4f}" if loss is not None else "")
            )
            self._t0 = time.perf_counter()
            self._last_step = step


class ProgressWatchdog(Callback):
    """Detect hung steps (utils/trainer.py:108-109 SIGALRM parity, without
    signals: records the last-step wall time; exposes stalled())."""

    def __init__(self, timeout_s: float = 1800.0):
        self.timeout_s = timeout_s
        self.last_tick = time.monotonic()

    def on_training_step_end(self, trainer, step, metrics):
        self.last_tick = time.monotonic()

    def stalled(self) -> bool:
        return (time.monotonic() - self.last_tick) > self.timeout_s


class StepTimeout(Exception):
    """A training step exceeded the watchdog timeout."""


class HangWatchdog(Callback):
    """ENFORCING hung-step watchdog: `signal.alarm` armed at every step
    start and cleared at step end; a step that blocks longer than
    `timeout_s` gets a SIGALRM whose handler raises StepTimeout inside
    the blocked call, unwinding the train loop instead of hanging the
    job forever.

    Parity: utils/trainer.py:108-109 arms `signal.alarm(timeout_period)`
    once and re-arms per step (:197); the handler (misc.py:262-266)
    raises. Same semantics here, scoped to steps (disarmed outside) so
    checkpoint saves and validation are not killed. Main-thread only
    (signal restriction); install() is a no-op elsewhere so the trainer
    can enable it unconditionally.
    """

    def __init__(self, timeout_s: float = 1800.0):
        self.timeout_s = max(1, int(timeout_s))
        self._installed = False
        self._prev_handler = None

    def _handler(self, signum, frame):
        raise StepTimeout(
            f"training step exceeded {self.timeout_s}s watchdog"
        )

    def install(self) -> bool:
        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            log.warning("HangWatchdog: not on main thread; disabled")
            return False
        self._prev_handler = signal.signal(signal.SIGALRM, self._handler)
        self._installed = True
        return True

    def on_train_start(self, trainer):
        self.install()

    def on_training_step_start(self, trainer, step):
        if self._installed:
            import signal

            signal.alarm(self.timeout_s)

    def on_training_step_end(self, trainer, step, metrics):
        if self._installed:
            import signal

            signal.alarm(0)

    def on_train_end(self, trainer):
        if self._installed:
            import signal

            signal.alarm(0)
            signal.signal(signal.SIGALRM, self._prev_handler)
            self._installed = False


class MetricsJsonl(Callback):
    """Append per-step metrics to a JSONL file — the local observability
    equivalent of the reference's wandb logging (callbacks/iter_speed.py
    wandb hook; experiment configs enable wandb only in training)."""

    def __init__(self, path: str, every_n: int = 1):
        self.path = path
        self.every_n = every_n
        self._fh = None

    def on_train_start(self, trainer):
        import os

        os.makedirs(os.path.dirname(os.path.abspath(self.path)),
                    exist_ok=True)
        self._fh = open(self.path, "a")

    def on_training_step_end(self, trainer, step, metrics):
        if step % self.every_n or self._fh is None:
            return
        import json
        import time as _time

        row = {"step": step, "ts": _time.time()}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                pass
        self._fh.write(json.dumps(row) + "\n")
        self._fh.flush()

    def on_train_end(self, trainer):
        if self._fh is not None:
            self._fh.close()
            self._fh = None
