"""jax.profiler integration (SURVEY.md §5.1 TPU equivalent).

Usage:
    with trace_if("runs/profile"):   # no-op when dir is falsy
        state, metrics = step(...)
or via train config: ``train.profile_dir`` + ``train.profile_steps``.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax


@contextlib.contextmanager
def trace_if(trace_dir: Optional[str]):
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


class StepProfiler:
    """Capture a jax profiler trace for steps [start, start+count)."""

    def __init__(self, trace_dir: Optional[str], start: int = 10,
                 count: int = 3):
        self.trace_dir = trace_dir
        self.start = start
        self.stop_at = start + count
        self._active = False

    def maybe_start(self, step: int):
        if self.trace_dir and not self._active and step == self.start:
            jax.profiler.start_trace(self.trace_dir)
            self._active = True

    def maybe_stop(self, step: int):
        if self._active and step >= self.stop_at:
            jax.profiler.stop_trace()
            self._active = False
