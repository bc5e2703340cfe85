"""Profiling hooks — JAX profiler traces + phase counters.

The reference has no tracing/profiling at all (SURVEY.md §5: printf
tags only, no timers).  Greenfield here:

- ``trace(logdir)``: context manager around ``jax.profiler.trace`` —
  produces a TensorBoard/XProf trace of every device computation inside
  (set SHREDWORD_TRACE=/path to trace a whole CLI run)
- ``annotate(name)``: ``jax.profiler.TraceAnnotation`` wrapper for
  host-side phases
- ``phase_report()``: wall-clock + bytes/s per named phase collected by
  utils.logging.Timer
"""

from __future__ import annotations

import contextlib
import os

from . import logging as log


@contextlib.contextmanager
def trace(logdir: str | None = None):
    """Capture a device trace under `logdir` (or $SHREDWORD_TRACE)."""
    logdir = logdir or os.environ.get("SHREDWORD_TRACE")
    if not logdir:
        yield
        return
    import jax
    with jax.profiler.trace(logdir):
        yield
    log.info("profiler trace written to %s", logdir)


def annotate(name: str):
    """Named host-side region visible in profiler traces."""
    import jax
    return jax.profiler.TraceAnnotation(name)


def phase_report() -> dict[str, dict]:
    """Aggregated Timer stats per phase: {'phase': {'seconds', 'bytes',
    'mb_s'}} (Timers record into utils.logging._PHASES)."""
    out = {}
    for name, (secs, nbytes) in log.phase_totals().items():
        out[name] = {
            "seconds": round(secs, 4),
            "bytes": nbytes,
            "mb_s": round(nbytes / 1e6 / secs, 2) if secs and nbytes
            else None,
        }
    return out
