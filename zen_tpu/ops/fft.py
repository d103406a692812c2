"""FFT conventions matching the reference.

The reference uses unnormalized transforms in both directions:
cuFFT C2C (fftw.h:35-43) and IPP with IPP_FFT_NODIV_BY_ANY
(fftw.h:69-96). jnp.fft.fft is unnormalized forward; jnp.fft.ifft
divides by n — so the reference's backward() == ifft * nfft. The
engine folds that nfft into the overlap-add scale.

A real-input fast path (rfft + Hermitian symmetry) is provided for
the hot pipeline: the HPR masks are functions of |S| and therefore
Hermitian-symmetric whenever the frequency filter's boundary rule is
symmetric (wrap/replicate — everything except nocopybord), so the
masked spectrum stays Hermitian and irfft is exact.
"""
from __future__ import annotations

import jax.numpy as jnp


def fft_forward(x: jnp.ndarray, nfft: int) -> jnp.ndarray:
    """Unnormalized C2C forward FFT over the last axis, zero-padded to
    nfft (the reference zero-fills fft_vec[nwin:nfft], hps.cu:461-462).
    """
    return jnp.fft.fft(x, n=nfft, axis=-1)


def fft_backward_unnormalized(x: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized inverse: matches cufftExecC2C(..., CUFFT_INVERSE)."""
    return jnp.fft.ifft(x, axis=-1) * jnp.float32(x.shape[-1])


def rfft_forward(x: jnp.ndarray, nfft: int) -> jnp.ndarray:
    """Real-input forward FFT (half spectrum, nfft//2+1 bins)."""
    return jnp.fft.rfft(x, n=nfft, axis=-1)


def irfft_backward_unnormalized(x: jnp.ndarray, nfft: int) -> jnp.ndarray:
    """Real inverse of a Hermitian half spectrum, unnormalized to match
    the reference convention (times nfft)."""
    return jnp.fft.irfft(x, n=nfft, axis=-1) * jnp.float32(nfft)


def mirror_full(x_half: jnp.ndarray, nfft: int) -> jnp.ndarray:
    """Reconstruct a full-length symmetric magnitude row from the half
    spectrum: full[k] = half[min(k, nfft-k)]."""
    idx = jnp.minimum(jnp.arange(nfft), nfft - jnp.arange(nfft))
    return jnp.take(x_half, idx, axis=-1)


# ---------------- DFT-as-matmul fast path (MXU) ----------------
#
# The HPR frame pipeline zero-pads each nwin-sample windowed frame to
# nfft = 2*nwin before the forward transform (hps.cu:461-462) and
# keeps only the first nwin samples of the inverse (hps.cu:526). XLA's
# FFT cannot exploit either structure; an explicit DFT matmul uses
# only the nwin live rows / outputs — half the naive DFT FLOPs — and
# runs on the MXU, where it measures 1.5-4.6x faster than the XLA FFT
# lowering at HPR's sizes even at 3-pass bf16 precision (relative
# error ~3e-5; 'HIGHEST' gives ~3e-7 at f32 throughput). Matrices are
# trace-time constants, O(nwin * nfft) floats, so the path is gated to
# nfft <= 4096 (hop <= 1024) where they stay small.

import functools as _functools

import numpy as _np

import jax


@_functools.lru_cache(maxsize=8)
def _dft_mats(nwin: int, nfft: int):
    bins = nfft // 2 + 1
    n = _np.arange(nwin)[:, None]
    k = _np.arange(bins)[None, :]
    ang = -2.0 * _np.pi * n * k / nfft
    w = _np.concatenate([_np.cos(ang), _np.sin(ang)], axis=1)  # [nwin, 2b]
    wk = _np.ones(bins)
    wk[1:] = 2.0
    if nfft % 2 == 0:
        wk[-1] = 1.0
    angi = 2.0 * _np.pi * k.T * _np.arange(nwin)[None, :] / nfft
    wi = (
        _np.concatenate(
            [_np.cos(angi) * wk[:, None], -_np.sin(angi) * wk[:, None]],
            axis=0,
        )
        / nfft
    )  # [2b, nwin]
    # numpy (not jnp): these are cached across jit traces, and a
    # device array created inside one trace must not leak into another
    return w.astype(_np.float32), wi.astype(_np.float32)


def rfft_forward_dft(
    xw: jnp.ndarray, nfft: int, precision
) -> jnp.ndarray:
    """Forward half-spectrum DFT of zero-padded frames via one MXU
    matmul: xw [..., nwin] real -> complex [..., nfft//2+1]."""
    packed = rfft_forward_dft_packed(xw, nfft, precision)
    bins = nfft // 2 + 1
    return jax.lax.complex(packed[..., :bins], packed[..., bins:])


def rfft_forward_dft_packed(
    xw: jnp.ndarray, nfft: int, precision
) -> jnp.ndarray:
    """rfft_forward_dft WITHOUT the complex assembly: the raw packed
    matmul output [..., 2*bins] (re | im column halves). The serving
    block step stays in this form end-to-end — magnitude from the
    halves, mask applied to both halves, inverse matmul directly on
    the packed rows — so the complex intermediate (67 MB at 512
    streams) and its re/im split + repack concats never exist
    (round-5 transform-leg hunt, docs/PERFORMANCE.md)."""
    nwin = xw.shape[-1]
    w, _ = _dft_mats(nwin, nfft)
    return jnp.matmul(xw, w, precision=precision)


def irfft_head_dft_packed(
    packed: jnp.ndarray, nfft: int, nwin: int, precision
) -> jnp.ndarray:
    """irfft_head_dft on an already-packed [..., 2*bins] spectrum
    (normalized inverse, first nwin samples) — one matmul, no
    re/im concat."""
    _, wi = _dft_mats(nwin, nfft)
    return jnp.matmul(packed, wi, precision=precision)


def irfft_head_dft(
    s: jnp.ndarray, nfft: int, nwin: int, precision
) -> jnp.ndarray:
    """First nwin samples of the normalized inverse rFFT of a Hermitian
    half spectrum, via one MXU matmul."""
    _, wi = _dft_mats(nwin, nfft)
    packed = jnp.concatenate([s.real, s.imag], axis=-1)
    return jnp.matmul(packed, wi, precision=precision)
