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
    """Full reference hook surface (utils/callback.py:124-230). The
    forward/backward/optimizer sub-hooks of the reference's eager torch
    step have no separate observable points inside a jitted XLA step —
    they fire adjacently around the fused step call so existing
    callbacks keep working when ported."""

    def on_train_start(self, trainer) -> None: ...

    def on_before_dataloading(self, trainer, step: int) -> None: ...

    def on_after_dataloading(self, trainer, step: int, batch=None) -> None: ...

    def on_training_step_start(self, trainer, step: int) -> None: ...

    def on_before_forward(self, trainer, step: int) -> None: ...

    def on_after_forward(self, trainer, step: int) -> None: ...

    def on_before_backward(self, trainer, step: int) -> None: ...

    def on_after_backward(self, trainer, step: int) -> None: ...

    def on_before_optimizer_step(self, trainer, step: int) -> None: ...

    def on_before_zero_grad(self, trainer, step: int) -> None: ...

    def on_training_step_end(
        self, trainer, step: int, metrics: Dict[str, Any]
    ) -> None: ...

    def on_validation_start(self, trainer, step: int) -> None: ...

    def on_validation_step_start(self, trainer, step: int) -> None: ...

    def on_validation_step_end(self, trainer, step: int, metrics=None) -> None: ...

    def on_validation_end(self, trainer, step: int, metrics) -> None: ...

    def on_load_checkpoint_start(self, trainer) -> None: ...

    def on_load_checkpoint_end(self, trainer, step: int = 0) -> None: ...

    def on_save_checkpoint_start(self, trainer, step: int = 0) -> None: ...

    def on_save_checkpoint_end(self, trainer, step: int = 0) -> None: ...

    def on_train_end(self, trainer) -> None: ...

    def on_app_end(self, trainer) -> None: ...


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


class GradNormMonitor(Callback):
    """Log the (pre-clip) gradient norm the jitted step reports
    (callbacks GradClip role: clipping itself lives in the optax chain
    inside the step; this surfaces the measurement)."""

    def __init__(self, every_n: int = 10, key: str = "grad_norm"):
        self.every_n = every_n
        self.key = key

    def on_training_step_end(self, trainer, step, metrics):
        if step % self.every_n == 0 and self.key in metrics:
            log.info(f"step {step}: grad_norm {float(metrics[self.key]):.4f}")


class LowPrecisionGuard(Callback):
    """NaN/inf loss detection (callbacks LowPrecision role + the
    reference GradClip's fused nan_to_num intent): a non-finite loss
    raises immediately instead of silently corrupting the run."""

    def __init__(self, key: str = "loss"):
        self.key = key

    def on_training_step_end(self, trainer, step, metrics):
        import math

        v = metrics.get(self.key)
        if v is None:
            return
        v = float(v)
        if not math.isfinite(v):
            raise FloatingPointError(
                f"non-finite {self.key} at step {step}: {v}"
            )


class LearningRateMonitor(Callback):
    """Log the current LR from the trainer's schedule every N steps."""

    def __init__(self, every_n: int = 100):
        self.every_n = every_n

    def on_training_step_end(self, trainer, step, metrics):
        if step % self.every_n:
            return
        sched = getattr(trainer, "lr_schedule", None)
        if sched is None:
            return
        try:
            log.info(f"step {step}: lr {float(sched(step)):.3e}")
        except Exception:  # noqa: BLE001 — monitoring must never kill a run
            pass


class CheckpointLogger(Callback):
    """Narrate checkpoint save/load (the reference's on_save/load hooks)."""

    def on_save_checkpoint_start(self, trainer, step=0):
        log.info(f"checkpoint save starting (step {step})")

    def on_save_checkpoint_end(self, trainer, step=0):
        log.info(f"checkpoint save dispatched (step {step})")

    def on_load_checkpoint_end(self, trainer, step=0):
        log.info(f"resumed from checkpoint at step {step}")
