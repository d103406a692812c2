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
