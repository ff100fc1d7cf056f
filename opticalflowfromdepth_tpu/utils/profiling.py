"""Tracing & timing (SURVEY.md §5.1).

The reference's only instrumentation is `count_time` wall-clock loops with
`torch.cuda.synchronize` (`adjusted_gmflow/evaluate.py:300-352`) and stage
prints in synthesis (`preprocess.py:343,449-480`). The TPU-native equivalents:

  * :func:`trace` — `jax.profiler` trace context writing a TensorBoard-
    loadable profile (per-kernel timeline, HBM/MXU utilization, roofline);
  * :func:`annotate` — named region visible in the profiler timeline;
  * :class:`StepTimer` — device-fenced step timing with running stats,
    reporting steps/s and frames/s (the `count_time` replacement; fencing via
    `block_until_ready` on a fetched scalar, which is the only honest fence
    on remote/tunneled devices).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Profile everything inside the context into ``log_dir``.

    View with TensorBoard's profile plugin or the generated perfetto trace.
    """
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline (use as a context manager)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Running step statistics with explicit device fencing.

    >>> timer = StepTimer(frames_per_step=batch_size, warmup=5)
    >>> for batch in loader:
    ...     state, metrics = step(state, batch)
    ...     timer.tick(metrics["total_loss"])   # fences on the scalar
    >>> timer.summary()   # {steps_per_s, frames_per_s, mean_ms, p50_ms, ...}
    """

    def __init__(self, frames_per_step: int = 1, warmup: int = 5):
        self.frames_per_step = frames_per_step
        self.warmup = warmup
        self._seen = 0
        self._times: list = []
        self._last: Optional[float] = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def tick(self, fence_on=None) -> Optional[float]:
        """Record one step; ``fence_on`` (any jax value) is fetched first so
        the interval covers device execution, not dispatch. Returns the step
        time in seconds (None during warmup)."""
        if fence_on is not None:
            jax.block_until_ready(fence_on)
        now = time.perf_counter()
        if self._last is None:
            self._last = now
            return None
        dt = now - self._last
        self._last = now
        self._seen += 1
        if self._seen <= self.warmup:
            return None
        self._times.append(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        ts = sorted(self._times)
        n = len(ts)
        mean = sum(ts) / n
        return {
            "steps_timed": float(n),
            "mean_ms": mean * 1e3,
            "p50_ms": ts[n // 2] * 1e3,
            "p90_ms": ts[min(n - 1, int(n * 0.9))] * 1e3,
            "steps_per_s": 1.0 / mean,
            "frames_per_s": self.frames_per_step / mean,
        }
