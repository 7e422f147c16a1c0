"""Profiling hooks: jax.profiler traces + step timing.

The reference has no profiler integration (SURVEY.md §5) — only wall-clock
ETA accounting. TPU-native equivalent: XLA profiler traces viewable in
TensorBoard/Perfetto, plus a lightweight step timer whose results land in the
JSONL metrics stream.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, *, enabled: bool = True) -> Iterator[None]:
    """Capture an XLA profiler trace for the enclosed steps.

    View with `tensorboard --logdir <log_dir>` or upload the .pb to Perfetto.
    """
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with warmup skip (compile excluded)."""

    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self.count = 0
        self.total = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.skip_first:
            self.total += dt

    @property
    def mean_ms(self) -> float:
        steps = max(1, self.count - self.skip_first)
        return self.total / steps * 1000.0


def annotate(name: str):
    """Named trace annotation (shows up as a span in the profile)."""
    return jax.profiler.TraceAnnotation(name)
