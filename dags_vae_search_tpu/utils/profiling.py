"""Tracing / profiling utilities.

The reference's only instrumentation is wall-clock prints and tqdm bars
(``src/train_model.py:73-90``; SURVEY.md §5 "Tracing/profiling: none").
Here: jax profiler traces (XLA/TPU timelines viewable in TensorBoard or
Perfetto), a lightweight step timer with rate reporting, and a counters
registry for throughput metrics (graphs/s, candidates/s).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax profiler trace (XLA + TPU events) into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Name a region in the profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Rolling step timer with items/sec reporting.

    >>> timer = StepTimer()
    >>> for batch in batches:
    ...     with timer.step(items=batch_size):
    ...         run(batch)
    >>> timer.rate()  # items/sec over the window
    """

    def __init__(self, window: int = 50):
        self.window = window
        self._durations: list = []
        self._items: list = []

    @contextlib.contextmanager
    def step(self, items: int = 1) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._durations.append(time.perf_counter() - t0)
            self._items.append(items)
            if len(self._durations) > self.window:
                self._durations.pop(0)
                self._items.pop(0)

    def rate(self) -> float:
        total_t = sum(self._durations)
        return sum(self._items) / total_t if total_t else 0.0

    def mean_step_seconds(self) -> float:
        return (
            sum(self._durations) / len(self._durations) if self._durations else 0.0
        )


class Counters:
    """Named monotonically-increasing counters with rates since start."""

    def __init__(self):
        self._counts: Dict[str, float] = defaultdict(float)
        self._start = time.time()

    def add(self, name: str, value: float = 1.0) -> None:
        self._counts[name] += value

    def get(self, name: str) -> float:
        return self._counts[name]

    def rates(self) -> Dict[str, float]:
        elapsed = max(time.time() - self._start, 1e-9)
        return {k: v / elapsed for k, v in self._counts.items()}

    def summary(self) -> str:
        rates = self.rates()
        return ", ".join(
            f"{k}={self._counts[k]:,.0f} ({rates[k]:,.1f}/s)"
            for k in sorted(self._counts)
        )
