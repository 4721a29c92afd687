"""Tracing / NaN-debugging switches — the aux-subsystem layer (SURVEY.md §5).

The reference's observability is wall-clock printouts (train_kth.py:322-326,
AverageMeters) and ``torch.autograd.detect_anomaly`` around mask search
(FindMasksComparison_I3D_smth.py:51). TPU-native equivalents:
  * ``trace``        — jax.profiler trace context writing a TensorBoard-
                       loadable profile (per-step XLA timing, HBM, MXU util);
  * ``detect_anomaly`` — jax_debug_nans toggle: any NaN output re-runs the
                       offending op un-jitted and raises at the source;
  * ``StepTimer``    — clips/sec + step-time meter matching the reference's
                       end-of-run step-time report.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def detect_anomaly(enable: bool = True):
    """NaN sanitizer (the jax analogue of torch.autograd.detect_anomaly)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class StepTimer:
    """Step time + clips/sec meter (train_kth.py:203,243-258,322-326)."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.time()

    def stop(self, n_clips: int = 0) -> float:
        dt = time.time() - self._t0
        self.times.append((dt, n_clips))
        return dt

    @property
    def mean_step_time(self) -> float:
        if not self.times:
            return 0.0
        return sum(t for t, _ in self.times) / len(self.times)

    @property
    def clips_per_sec(self) -> float:
        total_t = sum(t for t, _ in self.times)
        total_c = sum(c for _, c in self.times)
        return total_c / total_t if total_t else 0.0

    def report(self) -> str:
        return (
            f"Average step time: {self.mean_step_time:.4f}s "
            f"({self.clips_per_sec:.1f} clips/sec)"
        )
