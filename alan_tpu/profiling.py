"""Tracing / profiling helpers.

The reference's observability is wall-clock timing with device sync around
each iteration (``examples/runner.py:13-16``) plus a CUDA memory report.
TPU-native equivalents:

  * :func:`trace` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable device trace (XLA op timeline, HBM usage).
  * :func:`timed_steps` — per-iteration wall-clock with ``block_until_ready``
    sync, mirroring the reference's ``iter_times`` contract.
  * :func:`device_memory_stats` — per-device HBM stats where the backend
    exposes them (the analog of the CUDA max-allocated report,
    ``runner.py:236-242``).
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_steps(step, state, keys, sync=lambda out: jax.block_until_ready(out)):
    """Run ``state, out = step(state, key)`` over ``keys``; returns
    ``(state, outs, iter_times)`` with post-sync per-iteration seconds."""
    outs, times = [], []
    for k in keys:
        t0 = time.perf_counter()
        state, out = step(state, k)
        sync(out)
        times.append(time.perf_counter() - t0)
        outs.append(out)
    return state, outs, times


def device_memory_stats():
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:
            stats[str(d)] = None
    return stats
