"""Profiling / tracing hooks (SURVEY.md §5: replace the reference's wall-time
profile_kv scopes with real device traces).

Two layers:
  * `trace(logdir)` — context manager around `jax.profiler` producing a
    TensorBoard-loadable device trace (op-level timeline, HBM, MXU util).
  * `StepTimer` — lightweight wall-clock per-step timing with warmup
    exclusion, for the KV logger (steps/sec, p50/p90 step ms).
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span (shows up in the device timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._count = 0
        self._times: List[float] = []
        self._last: Optional[float] = None

    def tick(self):
        now = time.time()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self._times.append(now - self._last)
        self._last = now

    def summary(self) -> dict:
        if not self._times:
            return {}
        import numpy as np

        arr = np.asarray(self._times)
        return {
            "step_ms_p50": float(np.percentile(arr, 50) * 1e3),
            "step_ms_p90": float(np.percentile(arr, 90) * 1e3),
            "steps_per_sec": float(1.0 / arr.mean()),
        }
