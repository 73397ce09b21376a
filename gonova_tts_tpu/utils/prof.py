"""Profiling/tracing: wall-clock stat surfaces + optional device tracing.

The reference's observability is wall-clock stats accumulated in dicts
(services/tts/core/synthesizer.py:140-145,274-289; queue counters,
queue_manager.py:69-75) — reproduced by the engine/queue stats surfaces.  This module
adds what the reference lacks: scoped timers with percentile summaries and a
`jax.profiler` trace hook for capturing device timelines (`/health` exposes the stats;
traces are written on demand for xprof/tensorboard).
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict, deque
from typing import Dict, Iterator, Optional

import numpy as np


class Timers:
    """Named timers with rolling percentile windows (thread-safe)."""

    def __init__(self, window: int = 512):
        self._window = window
        self._samples: Dict[str, deque] = defaultdict(lambda: deque(maxlen=window))
        self._counts: Dict[str, int] = defaultdict(int)
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def track(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(name, time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        with self._lock:
            self._samples[name].append(seconds)
            self._counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        out = {}
        with self._lock:
            for name, samples in self._samples.items():
                if not samples:
                    continue
                arr = np.asarray(samples)
                out[name] = {
                    "count": self._counts[name],
                    "p50_ms": round(float(np.percentile(arr, 50)) * 1000, 3),
                    "p90_ms": round(float(np.percentile(arr, 90)) * 1000, 3),
                    "p99_ms": round(float(np.percentile(arr, 99)) * 1000, 3),
                    "mean_ms": round(float(arr.mean()) * 1000, 3),
                }
        return out


# Global timer registry used by the engine/service.
timers = Timers()


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler device trace into log_dir (no-op when None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
