"""Op-level tests: windows, median/box filter geometry, framing.

The median filter tests replicate the reference's impulse-pattern
design (mfilt.test.cu): a matrix with a marked middle row (5) and
column (8); each direction/border variant must preserve exactly the
expected structure.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from zen_tpu.engine.oracle import np_filter2d
from zen_tpu.errors import ZenError
from zen_tpu.ops import windows
from zen_tpu.ops.box import box2d
from zen_tpu.ops.framing import frame_signal, overlap_add_stream
from zen_tpu.ops.median import (
    FREQUENCY,
    REPLICATE,
    TIME_ANTICAUSAL,
    TIME_CAUSAL,
    VALID,
    WRAP,
    median2d,
    sliding_median,
    validate_filter,
)


def marked_matrix(t, f):
    """Middle row = 5, middle column = 8 (mfilt.test.cu:31-39)."""
    x = np.zeros((t, f), np.float32)
    x[t // 2, :] = 5
    x[:, f // 2] = 8
    return x


# --- windows ---
def test_sqrt_vonhann_periodic():
    w = windows.window(windows.SQRT_VON_HANN, 8)
    # periodic: w[0] == 0, and w**2 sums to N/2 for hann
    assert w[0] == 0.0
    np.testing.assert_allclose(np.sum(w**2), 4.0, rtol=1e-6)
    # periodic vs symmetric: w[4] is the peak (cos(2pi*4/8) = -1)
    np.testing.assert_allclose(w[4], 1.0, rtol=1e-6)


def test_cola_factor():
    w = windows.window(windows.SQRT_VON_HANN, 512)
    c = windows.cola_factor(w, 1024)
    np.testing.assert_allclose(c, 1024.0 / 256.0, rtol=1e-5)


# --- median filter: impulse patterns from mfilt.test.cu ---
SIZES = [(9, 9, 3), (10, 20, 5), (64, 17, 5)]


@pytest.mark.parametrize("t,f,fl", SIZES)
def test_median_causal_valid(t, f, fl):
    """GPU nocopybord causal: marked column survives only for rows
    i >= fl; everything off-column is 0 (mfilt.test.cu:117-134)."""
    x = marked_matrix(t, f)
    out = np.asarray(median2d(jnp.asarray(x), fl, TIME_CAUSAL, VALID))
    for i in range(t):
        for j in range(f):
            if j == f // 2:
                # exact valid-ROI start boundary: rows < fl unwritten
                assert out[i, j] == (8 if i >= fl else 0), (i, j)
            else:
                assert out[i, j] == 0, (i, j)


@pytest.mark.parametrize("t,f,fl", SIZES)
def test_median_anticausal_valid(t, f, fl):
    """Anticausal: survives in (fm, t-fm-1) (mfilt.test.cu:246-263)."""
    x = marked_matrix(t, f)
    out = np.asarray(median2d(jnp.asarray(x), fl, TIME_ANTICAUSAL, VALID))
    fm = fl // 2
    for i in range(t):
        for j in range(f):
            if j == f // 2:
                # exact written range [fm, t-fm-2] (mfilt.h:123-145)
                assert out[i, j] == (8 if fm <= i <= t - fm - 2 else 0), (
                    i, j,
                )
            else:
                assert out[i, j] == 0, (i, j)


@pytest.mark.parametrize("t,f,fl", SIZES)
def test_median_frequency_valid(t, f, fl):
    """Frequency: marked row survives for cols < f - fl
    (mfilt.test.cu:173-191)."""
    x = marked_matrix(t, f)
    out = np.asarray(median2d(jnp.asarray(x), fl, FREQUENCY, VALID))
    for i in range(t):
        for j in range(f):
            if i == t // 2:
                # exact top-bin boundary: cols > f-fl-1 unwritten
                assert out[i, j] == (5 if j <= f - fl - 1 else 0), (i, j)
            else:
                assert out[i, j] == 0, (i, j)


@pytest.mark.parametrize("direction", [TIME_CAUSAL, TIME_ANTICAUSAL, FREQUENCY])
@pytest.mark.parametrize("border", [WRAP, REPLICATE])
def test_median_wrap_replicate_preserve_structures(direction, border):
    """Centered variants: full marked row/column survive everywhere."""
    x = marked_matrix(11, 13)
    out = np.asarray(median2d(jnp.asarray(x), 3, direction, border))
    if direction == FREQUENCY:
        assert (out[11 // 2, :] == 5).all()
    else:
        assert (out[:, 13 // 2] == 8).all()
    # background stays zero away from the marks
    assert out[0, 0] == 0


def test_median_degenerate_raises():
    """Filter bigger than matrix dim throws (mfilt.test.cu:235-244)."""
    with pytest.raises(ZenError):
        validate_filter(171, FREQUENCY, 9, 9)
    validate_filter(3, FREQUENCY, 9, 9)


@pytest.mark.parametrize("direction", [TIME_CAUSAL, TIME_ANTICAUSAL, FREQUENCY])
@pytest.mark.parametrize("border", [WRAP, VALID, REPLICATE])
def test_median2d_matches_numpy_model(direction, border):
    """jnp median2d == independent numpy model on random data."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((12, 18)).astype(np.float32)
    got = np.asarray(median2d(jnp.asarray(x), 5, direction, border))
    want = np_filter2d(x, 5, direction, border)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("direction", [TIME_CAUSAL, TIME_ANTICAUSAL, FREQUENCY])
@pytest.mark.parametrize("border", [WRAP, REPLICATE])
def test_box2d_matches_numpy_model(direction, border):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((12, 18)).astype(np.float32)
    got = np.asarray(box2d(jnp.asarray(x), 5, direction, border))
    want = np_filter2d(x, 5, direction, border, op="mean")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sliding_median_chunked_equals_unchunked():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((64, 96)).astype(np.float32))
    offsets = list(range(-3, 4))
    full = sliding_median(x, offsets, -2, "zero")
    chunked = sliding_median(x, offsets, -2, "zero", budget=1024)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked))


# --- framing / OLA ---
def test_frame_signal_matches_input_ring():
    """frame n == the reference input ring contents at hop n."""
    hop = 4
    rng = np.random.default_rng(3)
    audio = rng.standard_normal(hop * 6).astype(np.float32)
    frames = np.asarray(frame_signal(jnp.asarray(audio), hop, 6))
    ring = np.zeros(2 * hop, np.float32)
    for n in range(6):
        ring[:hop] = ring[hop:]
        ring[hop:] = audio[n * hop : (n + 1) * hop]
        np.testing.assert_array_equal(frames[n], ring)


def test_overlap_add_stream_advance0():
    hop = 4
    y = np.zeros((3, 8), np.float32)
    y[0] = np.arange(8)
    y[1] = np.arange(8) * 10
    out = np.asarray(overlap_add_stream(jnp.asarray(y), hop, advance=0))
    assert out.shape == (12,)
    np.testing.assert_array_equal(out[:4], y[0, :4])  # y[-1] == 0
    np.testing.assert_array_equal(out[4:8], y[1, :4] + y[0, 4:])


def test_overlap_add_stream_advance1():
    hop = 4
    rng = np.random.default_rng(4)
    y = rng.standard_normal((5, 8)).astype(np.float32)
    out = np.asarray(overlap_add_stream(jnp.asarray(y), hop, advance=1))
    assert out.shape == (16,)
    for k in range(4):
        np.testing.assert_allclose(
            out[k * 4 : (k + 1) * 4], y[k + 1, :4] + y[k, 4:], rtol=1e-6
        )


def test_sliding_mean_tree_matches_direct_taps():
    """The pow2-doubling window sum (round-3 SSE fast path) must match
    the direct per-tap mean across boundaries, duplicate taps, split
    runs, and the +inf prefill semantics."""
    import numpy as np

    import jax.numpy as jnp

    from zen_tpu.ops.box import _taps_mean, sliding_mean

    rng = np.random.default_rng(3)
    x = rng.standard_normal((24, 130)).astype(np.float32)
    patterns = [
        tuple(range(-6, 7)),                 # centered contiguous
        tuple(range(-23, 0)),                # causal long run
        tuple(range(-21, -16)) + tuple(range(-5, 1)),  # split runs
        (-5, -4, -3, -2, -1, 0, 0, 0, 0, 0, 0),        # duplicates
    ]
    for axis in (-1, -2):
        for boundary in ("wrap", "reflect", "clamp", "zero"):
            for offs in patterns:
                got = np.asarray(
                    sliding_mean(jnp.asarray(x), offs, axis, boundary)
                )
                want = np.asarray(
                    _taps_mean(jnp.asarray(x), list(offs), axis, boundary, 0.0)
                )
                np.testing.assert_allclose(
                    got, want, rtol=2e-6, atol=2e-6,
                    err_msg=f"{axis} {boundary} {offs[:3]}...",
                )
    # +inf prefill: windows touching the fill go to inf exactly (the
    # SSE reciprocal-feature semantics), never NaN
    xi = jnp.asarray(np.abs(x) + 0.1)
    offs = tuple(range(-9, 1))
    got = np.asarray(sliding_mean(xi, offs, -2, "zero", fill=np.inf))
    assert np.isinf(got[:9]).all()
    assert np.isfinite(got[9:]).all()
    assert not np.isnan(got).any()


def test_shift_zero_offset_beyond_extent():
    """|offset| >= axis extent: the whole tap is boundary fill (found
    by randomized engine-vs-oracle fuzzing — the slice-then-pad built a
    wrong-length array and the tap stack failed shape-checking)."""
    import numpy as np

    from zen_tpu.ops.median import sliding_median, tap_stack

    x = jnp.arange(12.0).reshape(3, 4)
    # rows: extent 3; offsets reach past it in both directions
    taps = tap_stack(x, (-5, -3, 0, 3, 7), axis=0, boundary="zero", fill=9.0)
    assert taps.shape == (5, 3, 4)
    np.testing.assert_array_equal(np.asarray(taps[0]), np.full((3, 4), 9.0))
    np.testing.assert_array_equal(np.asarray(taps[1]), np.full((3, 4), 9.0))
    np.testing.assert_array_equal(np.asarray(taps[2]), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(taps[3]), np.full((3, 4), 9.0))
    np.testing.assert_array_equal(np.asarray(taps[4]), np.full((3, 4), 9.0))
    med = sliding_median(x, (-4, 0, 4), axis=0, boundary="zero", fill=0.0)
    # median(fill, x, fill) with fill=0 and x>=0 is elementwise min(x, ...)
    np.testing.assert_array_equal(
        np.asarray(med), np.minimum(np.asarray(x), 0.0) + 0.0
    )
