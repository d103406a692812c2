"""Framing and overlap-add assembly.

The reference maintains an nwin input ring, appending hop samples per
iteration (hps.cu:452-453), and rotating-accumulating nwin-length OLA
output buffers (hps.cu:435-449, 526-528). Batched over a whole signal,
those state machines reduce to the closed forms here — static-shape
reshapes and adds that XLA vectorizes, with no per-hop host control.

Derivation (nwin = 2*hop): with ring prefill of zeros, the ring content
at hop n is audio[(n-1)*hop : (n+1)*hop], i.e. frame n of
concat(zeros(hop), audio). The OLA chunk written at hop n is
y[n][0:hop] + y[n-1][hop:2*hop] where y[n] is that hop's scaled iFFT.
"""
from __future__ import annotations

import jax.numpy as jnp


def frame_signal(audio: jnp.ndarray, hop: int, n_frames: int) -> jnp.ndarray:
    """[..., L] -> [..., n_frames, nwin] frames of the reference's input
    ring: frame n = concat(zeros(hop), audio)[n*hop : n*hop + 2*hop].

    ``audio`` must have length >= (n_frames) * hop (zero-pad first).
    """
    nwin = 2 * hop
    padded = jnp.concatenate(
        [
            jnp.zeros(audio.shape[:-1] + (hop,), audio.dtype),
            audio,
        ],
        axis=-1,
    )
    need = n_frames * hop + hop
    if padded.shape[-1] < need:
        pad = [(0, 0)] * (padded.ndim - 1) + [(0, need - padded.shape[-1])]
        padded = jnp.pad(padded, pad)
    # frame n = padded[n*hop : n*hop + 2*hop] — two adjacent hop blocks
    blocks = padded[..., : (n_frames + 1) * hop].reshape(
        padded.shape[:-1] + (n_frames + 1, hop)
    )
    return jnp.concatenate([blocks[..., :-1, :], blocks[..., 1:, :]], axis=-1)


def overlap_add_stream(y: jnp.ndarray, hop: int, advance: int) -> jnp.ndarray:
    """Assemble the output stream from per-*frame* scaled iFFT chunks.

    y: [..., T, nwin] with y[t] the scaled iFFT of masked STFT frame t.
    Output chunk k = y[k+advance][0:hop] + y[k+advance-1][hop:].

    advance=1: offline drivers. The mask at hop n is applied to frame
    t=n-lag+1 (hps.cu:501-521 reads the lag column) and the stream is
    then shifted left by lag chunks (hps.cu:171-178, 207-217); the two
    index shifts compose to exactly advance=1. Returns (T-1)*hop samples.

    advance=0: causal realtime (lag=1, chunk n emitted at hop n, with
    y[-1] = 0 from the zero-initialized OLA buffer). Returns T*hop.
    """
    t = y.shape[-2]
    if advance == 0:
        zero = jnp.zeros(y.shape[:-2] + (1, y.shape[-1]), y.dtype)
        y_prev = jnp.concatenate([zero, y[..., :-1, :]], axis=-2)
        out = y[..., :, :hop] + y_prev[..., :, hop:]
        return out.reshape(out.shape[:-2] + (t * hop,))
    k = t - advance
    first = y[..., advance : advance + k, :hop]
    prev = y[..., advance - 1 : advance - 1 + k, hop:]
    out = first + prev
    return out.reshape(out.shape[:-2] + (k * hop,))
