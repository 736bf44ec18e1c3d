"""Profiling helpers (SURVEY §5 "Tracing / profiling").

The reference has no tracing at all. These wrap jax.profiler so a
deployment can capture device traces (viewable in TensorBoard/Perfetto)
around any pipeline call, plus a dispatch-amortized timer that gives
honest device time (a plain wall clock over one dispatch measures the
host<->device round trip, not the TPU).
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace under ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Range annotation that shows up inside device traces."""
    return jax.profiler.TraceAnnotation(name)


def amortized_seconds(fn, *args, iters: int = 10, warmup: int = 1) -> float:
    """Steady-state seconds per call of a jitted ``fn``.

    Enqueues ``iters`` calls and synchronizes once via a host fetch of a
    single element, so per-dispatch host round trips (30 ms over a
    tunneled chip) do not pollute the number.
    """
    out = None
    for _ in range(max(1, warmup)):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf))
