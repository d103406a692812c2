"""Tracing / timing utilities.

The reference's observability is wall-clock timing at the app layer
(SURVEY.md §5.1). Here: jax.profiler trace capture plus two honest
timers for device code. Both chain iterations on the previous output
(no async boundary or result cache can skip work) and synchronize by
value READBACK — on tunneled runtimes (axon) jax.block_until_ready
returns before the device finishes, so a readback is the only true
sync (verified in bench.py's methodology notes).

* steady_state_ms — wall time per call incl. the sync cost: what a
  caller doing per-call round trips actually experiences.
* scan_slope_ms — pure device time per iteration: the slope of wall
  time between two on-device scan lengths; the (large, variable)
  sync constant cancels in the difference.
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
    output is read back, so no async boundary can hide work. Includes
    the host sync cost amortized over ``iters`` — use scan_slope_ms
    for pure device time."""
    y = fn(example)
    for _ in range(warmup):
        y = fn(y)
    float(jnp.sum(jax.tree.leaves(y)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(y)
    float(jnp.sum(jax.tree.leaves(y)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def scan_slope_ms(
    f, example, n1: int = 16, n2: int = 128, repeats: int = 5
) -> float:
    """Pure device ms per iteration of a shape-preserving traceable f:
    chained lax.scan runs of lengths n1 and n2, readback-synced,
    best-of-``repeats`` each; returns the slope between them (the sync
    constant and dispatch overhead cancel)."""

    def make_run(n):
        @jax.jit
        def run(x):
            return jax.lax.scan(
                lambda c, _: (f(c), None), x, None, length=n
            )[0]

        return run

    ts = {}
    y = example
    for n in (n1, n2):
        run = make_run(n)
        y = run(y)
        float(jnp.sum(jax.tree.leaves(y)[0]))  # compile + sync
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            y = run(y)
            float(jnp.sum(jax.tree.leaves(y)[0]))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[n2] - ts[n1]) / (n2 - n1) * 1e3
