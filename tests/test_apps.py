"""MPM pitch detection and BTrack beat tracking tests.

Reproduces the reference demos' qualitative verdicts
(demos/README.md): stable pitch on tonal input; beat tracking locks
onto a click track's tempo.
"""
import os
import re

import numpy as np
import pytest

from zen_tpu.apps.btrack import (
    BTrack,
    frames_from_hops,
    odf_batch,
    rayleigh_weighting,
    tempo_transition_matrix,
    track_beats_from_odf,
)
from zen_tpu.apps.mpm import MPM

REF_HEADER = "/root/reference/demos/beat-tracking/BTrackPrecomputed.h"


@pytest.mark.skipif(
    not os.path.exists(REF_HEADER),
    reason="reference checkout not mounted (standalone repo)",
)
def test_precomputed_tables_match_reference_header():
    txt = open(REF_HEADER).read()
    m = txt.index("TempoTransitionMatrix")
    nums = re.findall(r"(-?\d\.\d+e?-?\d*)f", txt[m:])
    first_row = np.array([float(x) for x in nums[:41]])
    np.testing.assert_allclose(
        tempo_transition_matrix()[0], first_row, atol=2e-7
    )
    m2 = txt.index("RayleighWeightingVector128")
    nums2 = re.findall(r"(-?\d\.?\d*e?-?\d*)f", txt[m2:m])
    ray = np.array([float(x) for x in nums2[:128]])
    np.testing.assert_allclose(rayleigh_weighting(), ray, atol=1e-8)


def test_mpm_pure_tone():
    fs, n = 44100, 4096
    t = np.arange(n) / fs
    mpm = MPM(n, fs)
    for f0 in (110.0, 220.0, 441.0):
        chunk = 0.6 * np.sin(2 * np.pi * f0 * t).astype(np.float32)
        p = mpm.pitch(chunk)
        assert abs(p - f0) < 1.5, (f0, p)


def test_mpm_strict_ref_reproduces_reference_quirk():
    """strict_ref=True reproduces the reference's half-scaled ACF
    spectrum (pitch.cpp:49-52): still a usable pitch estimator on a
    pure tone, but numerically different from the corrected ACF (the
    leakage terms bias chord estimates — module docstring)."""
    fs, n = 44100, 4096
    t = np.arange(n) / fs
    # A major chord — the input where the quirk's bias is documented
    chord = sum(
        0.3 * np.sin(2 * np.pi * f * t) for f in (220.0, 275.0, 330.0)
    ).astype(np.float32)
    import jax.numpy as jnp

    from zen_tpu.apps.mpm import _autocorr_batch

    acf_fix = np.asarray(_autocorr_batch(jnp.asarray(chord), n, False))
    acf_ref = np.asarray(_autocorr_batch(jnp.asarray(chord), n, True))
    # the two ACFs genuinely differ (the quirk leaks O(|X|) terms) ...
    assert not np.allclose(acf_fix, acf_ref, rtol=1e-3, atol=1e-3)
    # ... and lag 0 of the corrected ACF is the signal energy, while
    # the strict one reproduces the reference's biased mixture.
    energy = float(np.dot(chord, chord))
    assert abs(acf_fix[0] - energy) / energy < 1e-4
    # the quirk measurably biases even a clean pure tone (the leakage
    # terms shift the NSDF peak), while the default mode is exact —
    # the whole reason the corrected ACF is the default
    tone = 0.6 * np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
    p_fix = MPM(n, fs).pitch(tone)
    p_ref = MPM(n, fs, strict_ref=True).pitch(tone)
    assert abs(p_fix - 220.0) < 1.5, p_fix
    assert p_ref > 0 and abs(p_ref - p_fix) > 5.0, (p_ref, p_fix)


def test_mpm_rejects_low_and_silence():
    fs, n = 44100, 4096
    mpm = MPM(n, fs)
    assert mpm.pitch(np.zeros(n, np.float32)) == -1.0
    t = np.arange(n) / fs
    low = 0.6 * np.sin(2 * np.pi * 50.0 * t).astype(np.float32)
    assert mpm.pitch(low) == -1.0  # below the 80 Hz cutoff


def test_mpm_batch_matches_single():
    fs, n = 8000, 1024
    rng = np.random.default_rng(0)
    t = np.arange(n) / fs
    chunks = np.stack(
        [
            0.5 * np.sin(2 * np.pi * f0 * t)
            + 0.01 * rng.standard_normal(n)
            for f0 in (110, 220, 330)
        ]
    ).astype(np.float32)
    mpm = MPM(n, fs)
    batch = mpm.pitch_batch(chunks)
    single = [mpm.pitch(c) for c in chunks]
    np.testing.assert_allclose(batch, single, rtol=1e-4)


def test_odf_batch_matches_streaming():
    fs = 44100
    rng = np.random.default_rng(1)
    audio = rng.standard_normal(256 * 24).astype(np.float32) * 0.2
    frames = frames_from_hops(audio)
    batched = np.asarray(odf_batch(frames))
    bt = BTrack(fs)
    streamed = []
    for n in range(24):
        bt.process_hop(audio[n * 256 : (n + 1) * 256])
        streamed.append(bt.last_onset)
    np.testing.assert_allclose(batched, np.array(streamed), rtol=2e-3)


@pytest.mark.slow
def test_btrack_locks_onto_click_track():
    fs = 44100
    bpm = 120.0
    seconds = 12
    n = fs * seconds
    audio = np.zeros(n, np.float32)
    period = int(60.0 / bpm * fs)
    rng = np.random.default_rng(2)
    for i in range(0, n - 600, period):
        audio[i : i + 600] += (
            rng.standard_normal(600) * np.exp(-np.arange(600) / 120)
        ).astype(np.float32)
    frames = frames_from_hops(audio)
    odf = np.asarray(odf_batch(frames))
    beats, tempi = track_beats_from_odf(odf, fs)
    # steady-state tempo within ~4% of 120 BPM (or a harmonic)
    steady = tempi[len(tempi) // 2 :]
    med = float(np.median(steady))
    assert any(
        abs(med - target) / target < 0.06 for target in (60.0, 120.0, 240.0)
    ), med
    assert beats.sum() >= seconds  # roughly >= 1 beat/sec detected


def test_btrack_high_sample_rate_no_crash():
    """Regression (review finding): beat_period > buffer/2 at
    fs >= 88.2 kHz made the cumulative-score window slice negative
    (numpy broadcast crash / C++ OOB read in the reference)."""
    rng = np.random.default_rng(9)
    bt = BTrack(96000)
    bt.beat_period = 290  # the low-tempo regime that overflowed
    for _ in range(40):
        bt.process_odf_sample(float(abs(rng.standard_normal())))
    assert np.isfinite(bt.latest_cumulative_score)
