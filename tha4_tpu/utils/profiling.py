"""Profiling/tracing utilities.

Aux-subsystem parity with the reference (SURVEY.md section 5): the original
brackets teacher frames with CUDA events + wall clock
(reference: src/tha4/app/full_manual_poser.py:388-399) and keeps a rolling
FPS meter in the puppeteers (:28-42).  TPU-native equivalents:

  * FrameTimer — wall-clock frame timing with a *value fetch* barrier.  On
    some backends (the axon tunnel) ``block_until_ready`` returns before the
    device finishes; only fetching bytes is a true barrier, so the timer
    fetches a tiny scalar derived from the array.
  * trace() — context manager around ``jax.profiler`` for timeline captures
    viewable in TensorBoard/XProf.
  * device_timeit — the measurement harness for device-side op costs: scan N
    iterations inside one jitted program, fetch a scalar (amortizes dispatch
    overhead, defeats async-dispatch illusions).
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def fetch_barrier(x) -> float:
    """Force execution to complete; returns a tiny derived scalar."""
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.asarray(leaf).ravel()[0])


class FrameTimer:
    """Per-frame ms + rolling FPS (reference FPS meter semantics)."""

    def __init__(self, window: int = 100):
        self.times = deque(maxlen=window)
        self.last_ms: Optional[float] = None

    def measure(self, fn: Callable, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        fetch_barrier(out)
        self.last_ms = (time.perf_counter() - t0) * 1000.0
        self.times.append(time.perf_counter())
        return out

    @property
    def fps(self) -> Optional[float]:
        if len(self.times) < 2:
            return None
        return (len(self.times) - 1) / (self.times[-1] - self.times[0])


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace capture: ``with trace('/tmp/trace'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_timeit(fn: Callable, *args, iters: int = 20) -> float:
    """Device-side seconds per call of ``fn(*args)`` (scan-amortized).

    ``fn`` must be side-effect free and return a pytree of arrays.
    """
    from jax import lax

    @jax.jit
    def run(*a):
        def body(c, i):
            out = fn(*a)
            return c + sum(o.astype(jnp.float32).mean() for o in jax.tree.leaves(out)), ()

        c, _ = lax.scan(body, 0.0, jnp.arange(iters))
        return c

    float(run(*args))  # compile
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / iters
