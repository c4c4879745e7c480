"""Profiling and tracing subsystem.

The reference has no profiling beyond module loggers (SURVEY.md §5); here
per-phase wall timers and JAX profiler traces are first-class:

- :class:`Timers` — named accumulating wall-clock timers; every
  ``BatchHandler`` keeps one (``submit``/``wait`` phases), inference
  methods can add their own phases.
- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible trace of the device execution.
- :func:`annotate` — ``jax.profiler.TraceAnnotation`` wrapper so method
  phases show up on the device timeline.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

__all__ = ["Timers", "trace", "annotate", "global_timers"]


class Timers:
    """Named accumulating wall-clock timers."""

    def __init__(self):
        self.total = defaultdict(float)
        self.count = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total[name] += time.perf_counter() - t0
            self.count[name] += 1

    def report(self):
        """Dict of {phase: {total_s, calls, mean_s}}."""
        return {k: {"total_s": round(self.total[k], 6),
                    "calls": self.count[k],
                    "mean_s": round(self.total[k] / max(self.count[k], 1),
                                    6)}
                for k in sorted(self.total)}

    def reset(self):
        self.total.clear()
        self.count.clear()

    def __repr__(self):
        lines = [f"{k:>20s}: {v['total_s']:.3f}s over {v['calls']} calls"
                 for k, v in self.report().items()]
        return "Timers(\n  " + "\n  ".join(lines) + "\n)" if lines \
            else "Timers()"


#: process-wide timer registry used by the runtime when no explicit
#: Timers instance is provided
global_timers = Timers()


@contextlib.contextmanager
def trace(logdir="/tmp/elfi_tpu_trace"):
    """Capture a JAX profiler trace (view with TensorBoard)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name):
    """Annotate a host-side region on the device profiler timeline."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
