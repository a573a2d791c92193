"""Profiling helpers for the TPU compute path.

The reference has no tracer (SURVEY.md §5); its observable signals are
progress bars and stats dicts.  Here the compute path is XLA programs, so
the right tool is the JAX profiler: ``with lotus_tpu.profiling.trace(dir):``
captures a TensorBoard-viewable device trace around any operator call, and
``annotate`` names host-side regions inside it.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Iterator

import lotus_tpu


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a JAX device trace (open with TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        lotus_tpu.logger.info(f"profiling: trace written to {log_dir}")


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Name a host region inside an active trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def timed(name: str, sink: dict[str, Any] | None = None) -> Iterator[None]:
    """Wall-clock a region into ``sink`` (or the log)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if sink is not None:
            sink[name] = sink.get(name, 0.0) + dt
        else:
            lotus_tpu.logger.info(f"profiling: {name} took {dt * 1000:.1f} ms")
