"""Profiling / tracing — a first-class subsystem the reference lacks entirely
(SURVEY.md §5: "Tracing / profiling: none").

* `trace(logdir)` — context manager around `jax.profiler` producing
  TensorBoard-viewable device traces (XLA op timeline, HBM usage).
* `annotate(name)` — TraceAnnotation for host-side phases.
* `StepTimer` — wall-clock per-step timing with device sync, EMA smoothing.
* `device_memory_stats()` — live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional


@contextlib.contextmanager
def trace(logdir: str, host_tracer_level: int = 2):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg: Optional[float] = None
        self._t0 = time.time()

    def tick(self, sync_on: Any = None) -> float:
        """Return seconds since last tick; blocks on `sync_on` (a jax array)
        first so async dispatch doesn't hide device time."""
        if sync_on is not None:
            import jax

            jax.block_until_ready(sync_on)
        now = time.time()
        dt = now - self._t0
        self._t0 = now
        self.avg = dt if self.avg is None else self.ema * self.avg + (1 - self.ema) * dt
        return dt


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    import jax

    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use_gb": stats.get("bytes_in_use", 0) / 1e9,
                "peak_bytes_gb": stats.get("peak_bytes_in_use", 0) / 1e9,
                "bytes_limit_gb": stats.get("bytes_limit", 0) / 1e9,
            }
    return out
