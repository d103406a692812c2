"""Box (moving-average) filtering over spectrogram matrices.

TPU-native analog of the reference's NPP/IPP FilterBox wrappers
(reference: libzen/box.h), used only by the SSE steady-state/transient
path (hps.cu:582-652). Same ROI/anchor geometry as the median filter,
with two differences decoded from box.h:

* the GPU box filter *always* pads borders (wrap) — there is no
  nocopybord variant (box.h:154-180, filter at box.h:188-214);
* the output is the mean over the window (NPP FilterBox divides by
  the mask size).

The reference README (README.md:8) warns the NPP/IPP box filters are
less well-behaved than the median; the reference's box unit tests are
disabled (libzen/CMakeLists.txt:82). Here the box filter is an exact
mean over the same decoded tap patterns, so it is tested tightly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .median import (
    FREQUENCY,
    REPLICATE,
    WRAP,
    _tap,
    centered_offsets,
    odd_filter_len,
)


def sliding_mean(
    x: jnp.ndarray, offsets, axis: int, boundary: str, fill: float = 0.0
) -> jnp.ndarray:
    """Mean over static tap offsets. O(K) adds, no K-times memory.

    Deliberately NOT a cumsum-difference: the SSE feature is 1/|S|^2
    with a +inf prefill (spectral.prefill_value), and a running sum
    containing inf poisons every later window (inf - inf = nan),
    while direct windowed sums keep the reference's IEEE semantics
    (window containing inf -> mean inf -> reciprocal 0). The huge
    dynamic range of reciprocal-power features also makes prefix sums
    lose precision in f32."""
    offsets = list(offsets)
    acc = None
    for off in offsets:
        tap = _tap(x, off, axis, boundary, fill)
        acc = tap if acc is None else acc + tap
    return acc / jnp.float32(len(offsets))


@functools.partial(
    jax.jit, static_argnames=("filter_len", "direction", "border")
)
def box2d(
    x: jnp.ndarray, filter_len: int, direction: str, border: str
) -> jnp.ndarray:
    """Full-matrix box filter on [T, F]; GPU behavior == border='wrap'
    (centered window, periodic boundary — see median.py geometry notes),
    CPU == 'replicate'."""
    fl = odd_filter_len(filter_len)
    axis = -1 if direction == FREQUENCY else -2
    offsets = centered_offsets(fl)
    if border == WRAP:
        return sliding_mean(x, offsets, axis, WRAP)
    if border == REPLICATE:
        return sliding_mean(x, offsets, axis, REPLICATE)
    raise ValueError(f"box filter has no '{border}' border mode")
