"""Lightweight tracing/profiling helpers.

The reference's only instrumentation is `@time`/tic-toq prints (SURVEY.md §5).
Here: wall-clock phase spans that also emit `jax.profiler` trace annotations
(visible in TensorBoard/Perfetto when a trace is being captured), plus an
optional programmatic trace context.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

_SPANS: dict[str, float] = defaultdict(float)
_COUNTS: dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def span(name: str, verbose: bool = False):
    """Time a phase; nests with jax.profiler.TraceAnnotation."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - t0
    _SPANS[name] += dt
    _COUNTS[name] += 1
    if verbose:
        print(f"[{name}] {dt:.3f}s")


def report() -> dict[str, tuple[float, int]]:
    """Accumulated {phase: (total_seconds, calls)}."""
    return {k: (_SPANS[k], _COUNTS[k]) for k in sorted(_SPANS)}


def reset() -> None:
    _SPANS.clear()
    _COUNTS.clear()


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace into `logdir`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
