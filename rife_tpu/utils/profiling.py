"""Profiling / tracing helpers.

The reference includes ncnn's benchmark.h but never calls its timers
(SURVEY.md §5 — no first-party tracing at all).  Here:

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace;
* ``WallTimer`` — lightweight named wall-clock sections for host-side
  stage accounting (the pipeline runner keeps its own StageMetrics).

Enable CLI tracing with RIFE_TPU_TRACE=<logdir>.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(logdir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace when a log dir is given (or via the
    RIFE_TPU_TRACE env var); no-op otherwise."""
    logdir = logdir or os.environ.get("RIFE_TPU_TRACE")
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class WallTimer:
    """Accumulating named wall-clock sections."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            lines.append(
                f"{name}: {self.totals[name]:.3f}s over {self.counts[name]} calls"
            )
        return "\n".join(lines)
