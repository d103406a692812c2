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


def _taps_mean(x, offsets, axis, boundary, fill):
    """Direct per-tap sum (the reference-order fallback)."""
    acc = None
    for off in offsets:
        tap = _tap(x, off, axis, boundary, fill)
        acc = tap if acc is None else acc + tap
    return acc / jnp.float32(len(offsets))


def _pad_axis(x, back, fwd, axis, boundary, fill):
    """One boundary pad equivalent to _tap's per-offset rules:
    xp[i + back + off] == _tap(x, off)[i] for -back <= off <= fwd."""
    pad = [(0, 0)] * x.ndim
    pad[axis % x.ndim] = (back, fwd)
    if boundary == WRAP:
        return jnp.pad(x, pad, mode="wrap")
    if boundary in (REPLICATE, "clamp"):
        return jnp.pad(x, pad, mode="edge")
    if boundary == "reflect":
        return jnp.pad(x, pad, mode="reflect")
    return jnp.pad(x, pad, constant_values=fill)


def _window_sum(xp, base: int, length: int, out: int, axis: int):
    """out-extent window sums over a padded slab: r[i] = sum over
    xp[base+i .. base+i+length) along ``axis`` — O(log length)
    shift+adds via pow2 doubling (S_2k[i] = S_k[i] + S_k[i+k]) plus
    one add per set bit of ``length``."""
    ext = xp.shape[axis]
    pows = {1: xp}
    k = 1
    while 2 * k <= length:
        s = pows[k]
        e = s.shape[axis] - k
        pows[2 * k] = (
            jax.lax.slice_in_dim(s, 0, e, axis=axis)
            + jax.lax.slice_in_dim(s, k, k + e, axis=axis)
        )
        k *= 2
    total = None
    pos = base
    bit = k
    rem = length
    while bit >= 1:
        if rem >= bit:
            part = jax.lax.slice_in_dim(pows[bit], pos, pos + out, axis=axis)
            total = part if total is None else total + part
            pos += bit
            rem -= bit
        bit //= 2
    assert rem == 0 and pos - base == length, (base, length, ext)
    return total


def sliding_mean(
    x: jnp.ndarray, offsets, axis: int, boundary: str, fill: float = 0.0
) -> jnp.ndarray:
    """Mean over static tap offsets — O(log K) shifted adds for the
    contiguous runs of the tap pattern (pairwise pow2 doubling over a
    once-padded slab), O(1) per duplicated tap.

    Deliberately NOT a cumsum-difference: the SSE feature is 1/|S|^2
    with a +inf prefill (spectral.prefill_value), and a running sum
    containing inf poisons every later window (inf - inf = nan). The
    doubling tree uses ONLY additions of in-window values, so the
    reference's IEEE semantics survive exactly (window containing inf
    -> sum inf -> mean inf -> reciprocal 0), and pairwise summation is
    *more* accurate than the sequential tap order in f32. On TPU this
    cuts the dominant cost — Mosaic lane relayouts for frequency-axis
    shifts, ~10 VPU-op-equivalents each (docs/PERFORMANCE.md) — from
    K-1 to ~log2 K per output (round-2 verdict #6: the SSE variant was
    the one path with no kernel story)."""
    offsets = sorted(offsets)
    k = len(offsets)
    n = x.shape[axis]
    back = max(0, -offsets[0])
    fwd = max(0, offsets[-1])
    if k < 4 or back >= n or fwd >= n:
        # tiny windows gain nothing; pads wider than the array would
        # change wrap/reflect semantics vs the per-tap rules
        return _taps_mean(x, list(offsets), axis, boundary, fill)
    # decompose into maximal contiguous runs of unique offsets; each
    # extra duplicate (the replicate-border causal pattern repeats the
    # current frame) contributes one direct tap
    runs = []  # (start_offset, run_length)
    dups = []  # offsets counted beyond their first occurrence
    prev = None
    for off in offsets:
        if off == prev:
            dups.append(off)
            continue
        if runs and off == runs[-1][0] + runs[-1][1]:
            runs[-1] = (runs[-1][0], runs[-1][1] + 1)
        else:
            runs.append((off, 1))
        prev = off
    xp = _pad_axis(x, back, fwd, axis, boundary, fill)
    acc = None
    for start, length in runs:
        s = (
            _window_sum(xp, back + start, length, n, axis)
            if length >= 4
            else _taps_mean(x, list(range(start, start + length)), axis,
                            boundary, fill) * jnp.float32(length)
        )
        acc = s if acc is None else acc + s
    for off in dups:
        acc = acc + _tap(x, off, axis, boundary, fill)
    return acc / jnp.float32(k)


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
