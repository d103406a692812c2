"""Offline HPR drivers.

``hpr_separate`` is one anticausal HPR pass, fully batched over frames
(the TPU-idiomatic replacement for the reference per-hop loop); it is
the building block both of the public 2-pass HPRIOffline driver below
and of the sharded pod-scale drivers in zen_tpu/parallel.

HPRIOffline mirrors zen::hps::HPRIOffline (reference: libzen/hps.cu:
21-221): Driedger's iterative "HPR-I" — pass 1 at a large hop for
harmonic separation, pass 2 at a small hop over (percussive+residual)
for percussive separation.

Deviation from the reference (deliberate, documented): the reference
creates its pass-2 engine with OUTPUT_PERCUSSIVE only (hps.cu:45-48)
but still copies its never-written residual buffer to the caller
(hps.cu:200-204), so the reference GPU "residual" stem is silence.
Here pass 2 runs with OUTPUT_PERCUSSIVE|OUTPUT_RESIDUAL so the residual
stem carries the actual non-percussive remainder of the intermediate.
Harmonic and percussive stems are unaffected and match the reference.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ..engine.config import (
    OUTPUT_ALL,
    OUTPUT_PERCUSSIVE,
    OUTPUT_RESIDUAL,
    HPRConfig,
)
from ..engine.spectral import separate_frames
from ..errors import ZenError
from ..ops.framing import frame_signal, overlap_add_stream
from ..ops.median import WRAP


def _pass_trace(audio_padded, cfg: HPRConfig, n_frames: int, out_len: int):
    """Traceable single-pass body (jit-composable)."""
    frames = frame_signal(audio_padded, cfg.hop, n_frames)
    ys = separate_frames(frames, cfg)
    outs = {}
    for k, y in ys.items():
        if y is None:
            outs[k] = jnp.zeros(
                audio_padded.shape[:-1] + (out_len,), jnp.float32
            )
        else:
            outs[k] = overlap_add_stream(y, cfg.hop, advance=1)[..., :out_len]
    return outs


@functools.partial(jax.jit, static_argnames=("cfg", "n_frames", "out_len"))
def _offline_pass(audio_padded, cfg: HPRConfig, n_frames: int, out_len: int):
    return _pass_trace(audio_padded, cfg, n_frames, out_len)


def _pad_and_pass(audio, cfg: HPRConfig):
    """Traceable pad + pass (hpss_chunk_padder semantics, hps.cu:109-126)."""
    length = audio.shape[-1]
    n_frames = math.ceil(length / cfg.hop) + cfg.lag
    pad = n_frames * cfg.hop - length
    if pad:
        padding = [(0, 0)] * (audio.ndim - 1) + [(0, pad)]
        audio = jnp.pad(audio, padding)
    return _pass_trace(audio, cfg, n_frames, length)


@functools.partial(jax.jit, static_argnames=("cfg_h", "cfg_p"))
def _two_pass(audio, length, cfg_h: HPRConfig, cfg_p: HPRConfig):
    """The full 2-pass cascade as ONE device program — a single
    dispatch end-to-end (per-pass dispatch would pay host/tunnel RTT
    several times per clip).

    ``length`` is the *dynamic* true clip length: the input may be
    zero-padded to a compile bucket, and the intermediate is masked
    back to ``length`` so pass 2 sees exactly what it would have seen
    unbucketed (pass 1's OLA spill beyond the clip must not leak in,
    mirroring the reference's truncate-between-passes,
    hps.cu:171-178)."""
    pass1 = _pad_and_pass(audio, cfg_h)
    intermediate = pass1["percussive"] + pass1["residual"]
    keep = jnp.arange(intermediate.shape[-1]) < length
    intermediate = jnp.where(keep, intermediate, 0.0)
    pass2 = _pad_and_pass(intermediate, cfg_p)
    return pass1["harmonic"], pass2["percussive"], pass2["residual"]


def _bucket_len(length: int, hop: int) -> int:
    """Smallest power-of-two frame count covering ``length`` — clips
    share compiled executables per bucket instead of recompiling the
    whole cascade for every distinct clip length (<= 2x padded
    compute, amortized compile)."""
    frames = max(1, math.ceil(length / hop))
    return hop * (1 << (frames - 1).bit_length())


def hpr_separate(audio, cfg: HPRConfig) -> dict:
    """One offline HPR pass on [..., L] audio -> dict of [..., L] stems.

    Padding mirrors hpss_chunk_padder (hps.cu:109-126): round up to a
    whole number of hops, plus ``lag`` extra warm-up chunks whose output
    is shifted away again by the OLA assembly (advance=1, framing.py).
    """
    audio = jnp.asarray(audio, jnp.float32)
    return _one_pass(audio, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _one_pass(audio, cfg: HPRConfig):
    return _pad_and_pass(audio, cfg)


class HPRIOffline:
    """2-pass offline HPR-I separation (hps.cu:128-221, GPU semantics).

    process(audio[..., L]) -> (harmonic, percussive, residual), each
    [..., L]: harmonic from pass 1 (hop_h), percussive/residual from
    pass 2 (hop_p) run on pass 1's (percussive + residual).
    """

    def __init__(
        self,
        fs: float,
        hop_h: int = 4096,
        hop_p: int = 256,
        beta_h: float = 2.0,
        beta_p: float = 2.0,
        border: str = WRAP,
        use_sse: bool = False,
        soft_mask: bool = False,
    ):
        if hop_h % hop_p != 0:
            raise ZenError("hop_h and hop_p should be evenly divisible")
        common = dict(
            fs=fs,
            causal=False,
            border=border,
            use_sse=use_sse,
            soft_mask=soft_mask,
        )
        self.cfg_h = HPRConfig(
            hop=hop_h, beta=beta_h, outputs=OUTPUT_ALL, **common
        )
        self.cfg_p = HPRConfig(
            hop=hop_p,
            beta=beta_p,
            outputs=OUTPUT_PERCUSSIVE | OUTPUT_RESIDUAL,
            **common,
        )

    def use_sse_filter(self):
        import dataclasses

        self.cfg_h = dataclasses.replace(self.cfg_h, use_sse=True)
        self.cfg_p = dataclasses.replace(self.cfg_p, use_sse=True)

    def use_soft_mask(self):
        import dataclasses

        self.cfg_h = dataclasses.replace(self.cfg_h, soft_mask=True)
        self.cfg_p = dataclasses.replace(self.cfg_p, soft_mask=True)

    def process(self, audio):
        # xp1 + xr1 feeds pass 2 (hps.cu:152-158); residual is zero for
        # soft/SSE variants, as in the reference (hps.cu:562, 582-652).
        # Both passes run fused as one jitted device program, on a
        # power-of-two length bucket (bit-identical to unbucketed; see
        # _two_pass).
        audio = jnp.asarray(audio, jnp.float32)
        length = audio.shape[-1]
        nb = _bucket_len(length, self.cfg_h.hop)
        if nb != length:
            padding = [(0, 0)] * (audio.ndim - 1) + [(0, nb - length)]
            audio = jnp.pad(audio, padding)
        h, p, r = _two_pass(audio, length, self.cfg_h, self.cfg_p)
        return h[..., :length], p[..., :length], r[..., :length]

