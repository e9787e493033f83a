"""Profiling helpers (SURVEY.md §5 tracing/profiling).

The reference exposes wall-clock timing per run plus nerfstudio's tensorboard
step timings. TPU-side we add: JAX profiler traces (XPlane, viewable in
TensorBoard/Perfetto) around training windows, and a simple step timer whose
percentiles land in metrics_train.jsonl.
"""
from __future__ import annotations

import contextlib
import time
from pathlib import Path

import numpy as np


@contextlib.contextmanager
def jax_trace(log_dir: str | Path | None):
    """Capture a JAX profiler trace into log_dir (no-op when None)."""
    if not log_dir:
        yield
        return
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Records per-step wall times; summary() gives mean/p50/p95 in ms."""

    def __init__(self, capacity: int = 10000):
        self.times: list[float] = []
        self.capacity = capacity
        self._t0: float | None = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self._t0 = None
            if len(self.times) > self.capacity:
                del self.times[: len(self.times) - self.capacity]

    def summary(self, last_n: int | None = None) -> dict:
        ts = np.asarray(self.times[-last_n:] if last_n else self.times)
        if len(ts) == 0:
            return {}
        return {
            "step_ms_mean": float(ts.mean() * 1e3),
            "step_ms_p50": float(np.percentile(ts, 50) * 1e3),
            "step_ms_p95": float(np.percentile(ts, 95) * 1e3),
            "steps_per_s": float(1.0 / ts.mean()),
        }
