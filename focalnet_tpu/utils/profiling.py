"""Profiling hooks (SURVEY.md §5.1 — the reference has wall-clock timers only;
the TPU build adds real device traces via jax.profiler)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/focalnet_trace"):
    """Capture a device trace viewable in TensorBoard/Perfetto:

        with trace("/tmp/tr"):
            step(...)  # must block inside the context
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def timed(fn, *args, iters: int = 10, warmup: int = 3):
    """Wall-clock a jitted callable with proper host sync (the axon tunnel
    does not honor block_until_ready — pull a scalar instead)."""
    import jax.numpy as jnp

    def scalarize(out):
        leaves = [x for x in jax.tree.leaves(out)]
        return float(jnp.sum(leaves[0].ravel()[0])) if leaves else 0.0

    import jax

    for _ in range(warmup):
        scalarize(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        scalarize(fn(*args))
    return (time.time() - t0) / iters
