"""Profiling hooks — the tracing subsystem the reference lacks (SURVEY.md §5).

``trace`` wraps ``jax.profiler`` so any region of a training/eval run can be
captured to a TensorBoard-compatible trace; ``StepTimer`` tracks step
wall-times and derived throughput, feeding the trainer's metric stream.
"""

import contextlib
import time
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: with trace("/tmp/trace"): run_steps()."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-time statistics + items/sec throughput."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list = []
        self._last: Optional[float] = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def mean_step_s(self) -> float:
        return float(np.mean(self._times)) if self._times else float("nan")

    def record_epoch(self, epoch_s: float, n_steps: int):
        """Derive step time from a synced epoch wall time (the trainer's
        async-dispatch loop: per-step tick() would measure dispatch, not
        device time)."""
        if n_steps > 0:
            self._times.append(epoch_s / n_steps)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = None

    def throughput(self, items_per_step: int) -> float:
        s = self.mean_step_s
        return items_per_step / s if s and np.isfinite(s) and s > 0 else float("nan")
