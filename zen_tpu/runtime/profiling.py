"""Tracing / timing utilities.

The reference's observability is wall-clock timing at the app layer
(SURVEY.md §5.1). Here: jax.profiler trace capture plus an honest
steady-state timer for device code — output-chained iterations with a
forced host readback, because async dispatch (and relay-side
completion shortcuts) make naive block_until_ready timings lie (see
bench.py header).
"""
from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/zen_tpu_trace"):
    """jax.profiler trace context; view with xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def steady_state_ms(fn, example, iters: int = 30, warmup: int = 8) -> float:
    """Steady-state wall ms per call of fn(x)->y with x/y-compatible
    shapes: iterations are chained (y feeds the next x) and the final
    output is read back, so no async boundary can hide work."""
    y = fn(example)
    for _ in range(warmup):
        y = fn(y)
    float(jnp.sum(jax.tree.leaves(y)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(y)
    float(jnp.sum(jax.tree.leaves(y)[0]))
    return (time.perf_counter() - t0) / iters * 1e3
