"""Tracing / profiling utilities — new capability (SURVEY.md §5: the
reference has only ``time.time()`` epoch stamps).

- :class:`StepTimer` — device-synchronized step timing with warmup discard
  and derived throughput counters (edges/s, nodes/s — the BASELINE metric).
- :func:`trace` — ``jax.profiler`` trace context writing a TensorBoard-
  loadable profile directory.
- :func:`annotate` — named trace annotation around host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


class StepTimer:
    """Wall-clock step timing synchronized via ``block_until_ready``.

    >>> timer = StepTimer(warmup=3)
    >>> for _ in range(n):
    ...     out = step(...)
    ...     timer.mark(out)   # blocks on `out`, records the step time
    >>> timer.summary(edges_per_step=E)
    """

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.times: List[float] = []
        self._last: Optional[float] = None
        self._seen = 0

    def start(self):
        self._last = time.perf_counter()

    def mark(self, *arrays):
        if arrays:
            jax.block_until_ready(arrays)
        now = time.perf_counter()
        if self._last is not None:
            self._seen += 1
            if self._seen > self.warmup:
                self.times.append(now - self._last)
        self._last = now

    @property
    def mean_step_s(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def summary(
        self,
        edges_per_step: Optional[float] = None,
        nodes_per_step: Optional[float] = None,
    ) -> Dict[str, float]:
        out: Dict[str, float] = {
            "steps": float(len(self.times)),
            "mean_step_ms": self.mean_step_s * 1e3,
        }
        if self.times:
            out["p50_step_ms"] = sorted(self.times)[len(self.times) // 2] * 1e3
            out["max_step_ms"] = max(self.times) * 1e3
        if edges_per_step and self.mean_step_s > 0:
            out["edges_per_s"] = edges_per_step / self.mean_step_s
        if nodes_per_step and self.mean_step_s > 0:
            out["nodes_per_s"] = nodes_per_step / self.mean_step_s
        return out


@contextlib.contextmanager
def trace(logdir: str):
    """``jax.profiler`` trace for TensorBoard (device + host timelines)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named annotation visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)
