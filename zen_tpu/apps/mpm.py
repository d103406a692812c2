"""McLeod Pitch Method (MPM) pitch detection.

From-scratch reimplementation of the reference pitch-tracking demo
(reference: demos/pitch-tracking/pitch.cpp, pitch_detection.h):
FFT autocorrelation (pitch.cpp:38-60), NSDF peak picking
(pitch.cpp:62-97), parabolic interpolation (pitch.cpp:16-36) and the
0.93-of-max cutoff with an 80 Hz lower pitch bound (pitch.cpp:12-14,
99-135).

The autocorrelation is batched jnp (all chunks of a track in one TPU
dispatch); the scalar peak-picking walk runs on host — it is O(N)
branchy control flow over one 4096-vector per 93 ms chunk, firmly
host-side territory.

Deviation (deliberate, like btrack.py's index-clamp fix): the
reference's real_autocorrelation applies |X|^2/(2N) to only the FIRST
N of its 2N FFT bins before the inverse (pitch.cpp:49-52), leaving
bins N..2N-1 as the raw forward spectrum — the resulting "ACF" mixes
the true autocorrelation with O(|X|) leakage terms and biases the
pitch estimate (e.g. ~193 Hz for a 220 Hz chord in a direct
transcription). Here the textbook ACF (power over ALL bins) is
computed by default, which the NSDF/MPM derivation assumes; tests
assert the mathematically correct pitch (220.01 Hz for the same
input). For byte-for-byte A/B against the upstream demo binary,
``MPM(..., strict_ref=True)`` reproduces the reference's half-scaled
spectrum exactly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MPM_CUTOFF = 0.93
MPM_SMALL_CUTOFF = 0.5
MPM_LOWER_PITCH_CUTOFF = 80.0


@functools.partial(jax.jit, static_argnames=("n", "strict_ref"))
def _autocorr_batch(
    chunks: jnp.ndarray, n: int, strict_ref: bool = False
) -> jnp.ndarray:
    """Real autocorrelation via zero-padded FFT: [..., N] -> [..., N].

    Mirrors real_autocorrelation (pitch.cpp:38-60): X = FFT(x, 2N),
    X <- X * conj(X) / (2N), acf = Re(IFFT(X))[:N] — with the
    reference's unnormalized IPP inverse folded in (x 2N).

    strict_ref=True reproduces the reference's quirk verbatim: the
    |X|^2/(2N) scaling touches only bins [0, N) of the 2N C2C
    spectrum (pitch.cpp:49-52), leaving [N, 2N) as the raw forward
    spectrum — bit-compatible with the upstream demo, mathematically
    a biased ACF (module docstring).
    """
    if strict_ref:
        x = jnp.fft.fft(chunks.astype(jnp.complex64), n=2 * n, axis=-1)
        scaled = x * jnp.conj(x) / jnp.float32(2 * n)
        mixed = jnp.concatenate(
            [scaled[..., :n], x[..., n:]], axis=-1
        )
        acf = jnp.fft.ifft(mixed, axis=-1).real * jnp.float32(2 * n)
        return acf[..., :n]
    x = jnp.fft.rfft(chunks, n=2 * n, axis=-1)
    power = (x * jnp.conj(x)).real / jnp.float32(2 * n)
    acf = jnp.fft.irfft(power, n=2 * n, axis=-1) * jnp.float32(2 * n)
    return acf[..., :n]


def _parabolic_interpolation(array: np.ndarray, x: int):
    """(pitch.cpp:16-36)."""
    if x < 1:
        xa = x if array[x] <= array[x + 1] else x + 1
        return float(xa), float(array[xa])
    if x > len(array) - 2:
        xa = x if array[x] <= array[x - 1] else x - 1
        return float(xa), float(array[xa])
    den = array[x + 1] + array[x - 1] - 2 * array[x]
    delta = array[x - 1] - array[x + 1]
    if den == 0:
        return float(x), float(array[x])
    return (
        float(x + delta / (2 * den)),
        float(array[x] - delta * delta / (8 * den)),
    )


def _peak_picking(nsdf: np.ndarray) -> list:
    """(pitch.cpp:62-97)."""
    max_positions = []
    pos = 0
    cur_max_pos = 0
    size = len(nsdf)
    while pos < (size - 1) // 3 and nsdf[pos] > 0:
        pos += 1
    while pos < size - 1 and nsdf[pos] <= 0.0:
        pos += 1
    if pos == 0:
        pos = 1
    while pos < size - 1:
        if (
            nsdf[pos] > nsdf[pos - 1]
            and nsdf[pos] >= nsdf[pos + 1]
            and (cur_max_pos == 0 or nsdf[pos] > nsdf[cur_max_pos])
        ):
            cur_max_pos = pos
        pos += 1
        if pos < size - 1 and nsdf[pos] <= 0:
            if cur_max_pos > 0:
                max_positions.append(cur_max_pos)
                cur_max_pos = 0
            while pos < size - 1 and nsdf[pos] <= 0.0:
                pos += 1
    if cur_max_pos > 0:
        max_positions.append(cur_max_pos)
    return max_positions


def pitch_from_acf(acf: np.ndarray, sample_rate: float) -> float:
    """Pitch decision from one chunk's autocorrelation (pitch.cpp:
    99-135). Returns -1.0 when no pitch is detected."""
    max_positions = _peak_picking(acf)
    estimates = []
    highest_amplitude = -np.inf
    for i in max_positions:
        highest_amplitude = max(highest_amplitude, acf[i])
        if acf[i] > MPM_SMALL_CUTOFF:
            est = _parabolic_interpolation(acf, i)
            estimates.append(est)
            highest_amplitude = max(highest_amplitude, est[1])
    if not estimates:
        return -1.0
    actual_cutoff = MPM_CUTOFF * highest_amplitude
    period = 0.0
    for x, y in estimates:
        if y >= actual_cutoff:
            period = x
            break
    if period == 0.0:
        return -1.0
    pitch = sample_rate / period
    return pitch if pitch > MPM_LOWER_PITCH_CUTOFF else -1.0


class MPM:
    """Chunk-wise pitch detector, API analog of the reference MPM class
    (pitch_detection.h:14-94)."""

    def __init__(self, n: int, sample_rate: float, strict_ref: bool = False):
        if n <= 0:
            raise ValueError("chunk size must be positive")
        self.n = n
        self.sample_rate = float(sample_rate)
        self.strict_ref = bool(strict_ref)

    def pitch(self, audio_chunk) -> float:
        chunk = np.zeros(self.n, np.float32)
        a = np.asarray(audio_chunk, np.float32)[: self.n]
        chunk[: len(a)] = a
        acf = np.asarray(
            _autocorr_batch(jnp.asarray(chunk), self.n, self.strict_ref)
        )
        return pitch_from_acf(acf, self.sample_rate)

    def pitch_batch(self, chunks) -> np.ndarray:
        """All chunks' ACFs in one device dispatch, then host decisions."""
        chunks = np.asarray(chunks, np.float32)
        acfs = np.asarray(
            _autocorr_batch(jnp.asarray(chunks), self.n, self.strict_ref)
        )
        return np.array(
            [pitch_from_acf(acf, self.sample_rate) for acf in acfs],
            np.float32,
        )
