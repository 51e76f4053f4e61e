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


def device_timeit(fn: Callable, *args, iters: int = 100) -> float:
    """Device-side seconds per call of ``fn(*args)`` (scan-amortized).

    ``fn`` must be side-effect free and return a pytree of arrays.

    Two measurement hazards this harness defeats (both observed on the axon
    tunnel):
      * loop-invariant hoisting — a body that doesn't depend on the scan
        index gets computed ONCE by XLA and the loop times nothing; the
        first array argument is perturbed by an index-derived epsilon so
        every iteration recomputes (the elementwise add fuses into the
        consumer, costing no extra memory traffic);
      * fixed dispatch+fetch overhead (~30 ms through the tunnel) — measured
        separately with a null body and subtracted, and iters defaults high
        enough to make the correction small.
    """
    from jax import lax

    def _eps(i, dtype):
        # An index-dependent value the algebraic simplifier cannot fold away
        # (i * 0 would fold to 0): ~1e-38 * i, which is exactly 0 after the
        # cast for bf16/f16 and a denormal for f32 — numerically invisible,
        # but a real data dependence on the loop counter.
        return (i.astype(jnp.float32) * jnp.float32(1e-38)).astype(dtype)

    def _perturbed(a, i):
        leaves, treedef = jax.tree.flatten(a)
        for k, leaf in enumerate(leaves):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
                leaves = list(leaves)
                leaves[k] = leaf + _eps(i, leaf.dtype)
                break
        else:
            # All-integer inputs (e.g. pure int8 conv probes) must still carry
            # a data dependence on the loop counter or the body is hoisted.
            # i // 2^30 is 0 for any realistic iters but dynamic to XLA
            # (i is a scanned value, not a compile-time iota).
            for k, leaf in enumerate(leaves):
                if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.integer):
                    leaves = list(leaves)
                    leaves[k] = leaf + (i.astype(jnp.int32) // jnp.int32(2**30)).astype(leaf.dtype)
                    break
        return jax.tree.unflatten(treedef, leaves)

    @jax.jit
    def run(*a):
        def body(c, i):
            out = fn(*_perturbed(a, i))
            return c + sum(o.astype(jnp.float32).mean() for o in jax.tree.leaves(out)), ()

        c, _ = lax.scan(body, 0.0, jnp.arange(iters))
        return c

    @jax.jit
    def null_run(x):
        def body(c, i):
            return c + (x + _eps(i, x.dtype)).mean(), ()

        c, _ = lax.scan(body, 0.0, jnp.arange(iters))
        return c

    tiny = jnp.ones((8, 128), jnp.float32)
    float(run(*args))  # compile
    float(null_run(tiny))
    t0 = time.perf_counter()
    float(run(*args))
    total = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(null_run(tiny))
    overhead = time.perf_counter() - t0
    return max(total - overhead, 1e-9) / iters
