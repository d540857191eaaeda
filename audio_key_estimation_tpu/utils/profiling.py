"""Throughput counters + jax.profiler hooks.

The reference's only instrumentation is an ad-hoc time.time() print around
the CQT call (KeyDataset.py:488,495). Here: a step timer that reports
audio-minutes/sec/chip — the benchmark's headline metric — plus optional
jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List

import jax


@dataclass
class ThroughputMeter:
    """Accumulates wall time and audio seconds processed."""
    audio_seconds: float = 0.0
    wall_seconds: float = 0.0
    _t0: float = 0.0
    samples: List[float] = field(default_factory=list)

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, audio_seconds: float):
        dt = time.perf_counter() - self._t0
        self.wall_seconds += dt
        self.audio_seconds += audio_seconds
        self.samples.append(audio_seconds / dt if dt > 0 else 0.0)

    @property
    def audio_min_per_sec(self) -> float:
        if self.wall_seconds == 0:
            return 0.0
        return (self.audio_seconds / 60.0) / self.wall_seconds

    def per_chip(self, n_chips: int = None) -> float:
        n = n_chips or jax.device_count()
        return self.audio_min_per_sec / max(n, 1)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
