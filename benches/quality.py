"""Separation-quality sweep: SI-SNR vs ground truth over beta and
mask type (the quality table in docs/DEMOS.md).

Usage: python benches/quality.py [--fs 44100] [--seconds 3]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def si_snr(ref, est) -> float:
    """Standard scale-invariant SDR (Le Roux et al.): project the
    ESTIMATE onto the reference; 10log10(||s_t||^2/||e||^2) with
    s_t = (<est,ref>/||ref||^2) ref."""
    ref = np.asarray(ref, np.float64)
    est = np.asarray(est, np.float64)
    a = np.dot(est, ref) / max(np.dot(ref, ref), 1e-30)
    s_t = a * ref
    e = est - s_t
    return 10 * np.log10(
        max(np.dot(s_t, s_t), 1e-30) / max(np.dot(e, e), 1e-30)
    )


def run(fs: float, seconds: float):
    from zen_tpu.drivers.offline import HPRIOffline
    from zen_tpu.io.synth import synth_mixture

    harm, perc, mix = synth_mixture(
        fs=fs,
        seconds=seconds,
        sawtooth=True,
        vibrato_cents=10,
        hits_per_beat=2,
    )
    n = len(mix)
    print(
        f"mixture baselines: harm {si_snr(harm, mix):.2f} dB, "
        f"perc {si_snr(perc, mix):.2f} dB"
    )
    print(f"{'config':<28} {'harm dB':>8} {'perc dB':>8}")

    def row(tag, sep):
        h, p, _ = (np.asarray(x)[:n] for x in sep.process(mix))
        print(f"{tag:<28} {si_snr(harm, h):8.2f} {si_snr(perc, p):8.2f}")

    for beta in (1.5, 2.0, 2.5, 3.0):
        for soft in (False, True):
            tag = f"beta={beta} {'soft' if soft else 'hard'}"
            row(tag, HPRIOffline(fs, 4096, 256, beta, beta, soft_mask=soft))
    row("sse", HPRIOffline(fs, 4096, 256, 2.0, 2.0, use_sse=True))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--fs", type=float, default=44100.0)
    ap.add_argument("--seconds", type=float, default=3.0)
    args = ap.parse_args()
    run(args.fs, args.seconds)
