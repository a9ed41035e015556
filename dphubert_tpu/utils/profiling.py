"""Tracing / profiling utilities.

The reference ships no profiler hooks (SURVEY §5); here profiling is
first-class: ``jax.profiler`` trace capture around training steps plus
step-time / audio-seconds-per-second counters (the BASELINE.json metric).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a TensorBoard-viewable device trace:

        with profiling.trace("exp/profile"):
            run_some_steps()
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Rolling audio-seconds/sec and steps/sec counter."""

    def __init__(self, window: int = 50):
        self.window = window
        self._events = []  # (t, audio_seconds)

    def step(self, audio_seconds: float) -> None:
        self._events.append((time.perf_counter(), audio_seconds))
        if len(self._events) > self.window:
            self._events.pop(0)

    @property
    def steps_per_sec(self) -> Optional[float]:
        if len(self._events) < 2:
            return None
        dt = self._events[-1][0] - self._events[0][0]
        return (len(self._events) - 1) / dt if dt > 0 else None

    @property
    def audio_sec_per_sec(self) -> Optional[float]:
        if len(self._events) < 2:
            return None
        dt = self._events[-1][0] - self._events[0][0]
        total = sum(a for _, a in self._events[1:])
        return total / dt if dt > 0 else None

    def per_chip(self, n_chips: int) -> Optional[float]:
        v = self.audio_sec_per_sec
        return v / n_chips if v is not None else None
