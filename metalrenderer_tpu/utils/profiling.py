"""Profiling hooks (SURVEY.md §5: the reference has none beyond an FPS
counter; this framework exposes jax.profiler traces and per-stage timing
as first-class utilities)."""
from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def device_trace(log_dir="/tmp/metalrenderer_tpu_trace"):
    """Capture an XLA/TPU profile viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _drain(out):
    """Synchronize with the device. On tunneled backends (axon),
    block_until_ready can return before execution completes; fetching
    the smallest output leaf to host is the reliable barrier."""
    jax.block_until_ready(out)
    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        smallest = min(leaves, key=lambda x: getattr(x, "size", 1))
        np.asarray(smallest)


def timed(fn, *args, iters=10, warmup=2, **kwargs):
    """Wall-time a jitted callable with proper device synchronization
    (the perf-regression harness primitive, SURVEY.md §4e).
    Returns (seconds_per_call, last_result)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    if out is not None:
        _drain(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    _drain(out)
    return (time.perf_counter() - t0) / iters, out


def annotate(name):
    """Named profiler span (shows up in the trace timeline)."""
    return jax.profiler.TraceAnnotation(name)
