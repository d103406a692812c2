"""Synthetic harmonic+percussive test mixtures with ground truth.

The reference repository's sample audio ships as git-lfs pointers, so
a fresh checkout has nothing to separate. This generator produces the
textbook HPSS decomposition (Fitzgerald 2010) deterministically:

  harmonic   — a sustained chord (optionally sawtooth-rich, with slow
               vibrato): horizontal ridges in the STFT
  percussive — short exponentially-decaying noise bursts on a beat
               grid: vertical ridges

Used by `zen synth` (CLI), the demo walkthroughs in README.md, and as
the quality oracle pattern (tests/test_quality.py keeps its own copy
so test thresholds are decoupled from CLI defaults).
"""
from __future__ import annotations

import numpy as np


def synth_mixture(
    fs: float = 44100.0,
    seconds: float = 4.0,
    chord: tuple = ((220.0, 0.5), (330.0, 0.35), (440.0, 0.25)),
    bpm: float = 120.0,
    hits_per_beat: int = 1,
    burst_ms: float = 20.0,
    burst_decay_ms: float = 4.0,
    burst_gain: float = 0.8,
    sawtooth: bool = False,
    vibrato_cents: float = 0.0,
    seed: int = 42,
):
    """Returns (harmonic, percussive, mixture) float32 arrays [L]."""
    n = int(fs * seconds)
    t = np.arange(n) / fs
    rng = np.random.default_rng(seed)

    harm = np.zeros(n, np.float64)
    for f0, amp in chord:
        if vibrato_cents:
            dev = 2.0 ** (
                vibrato_cents / 1200.0 * np.sin(2 * np.pi * 0.8 * t)
            )
            phase = np.cumsum(2 * np.pi * f0 * dev / fs)
        else:
            phase = 2 * np.pi * f0 * t
        if sawtooth:
            for k in range(1, 9):
                harm += amp * np.sin(k * phase) / k
        else:
            harm += amp * np.sin(phase)

    perc = np.zeros(n, np.float64)
    period = int(fs * 60.0 / (bpm * max(1, hits_per_beat)))
    if period < 1:
        raise ValueError(
            f"bpm*hits_per_beat = {bpm * hits_per_beat:.0f} exceeds the "
            f"sample rate ({fs:.0f} Hz): zero samples per hit"
        )
    burst = int(burst_ms * 1e-3 * fs)
    env = np.exp(-np.arange(burst) / (burst_decay_ms * 1e-3 * fs))
    for s in range(0, n - burst, period):
        perc[s : s + burst] += burst_gain * env * rng.standard_normal(burst)

    harm = harm.astype(np.float32)
    perc = perc.astype(np.float32)
    return harm, perc, harm + perc
