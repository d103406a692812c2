"""Mechanics test for scripts/ab_reference.py: the real reference
stems are environment-blocked (git-lfs pointer + CUDA binary), so the
harness is validated against self-produced strict-ref stems — high
SNR on matching stems, failure on mismatched ones, silent-residual
handling (the reference binary's pass-2 quirk)."""
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_mixture(path, fs=4000, seconds=1.5):
    from zen_tpu.io.audio import write_wav_pcm16

    n = int(fs * seconds)
    t = np.arange(n) / fs
    harm = 0.5 * np.sin(2 * np.pi * 220 * t)
    perc = np.zeros(n, np.float32)
    rng = np.random.default_rng(0)
    for b in np.arange(0.2, seconds, 0.4):
        i = int(b * fs)
        L = 200
        perc[i : i + L] += rng.standard_normal(L) * np.exp(
            -np.arange(L) / 40
        )
    write_wav_pcm16(path, fs, (harm + perc).astype(np.float32))


def _run(args, timeout=900):
    env = dict(os.environ)
    env["ZEN_TPU_PLATFORM"] = "cpu"
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ab_reference.py"),
         *args],
        capture_output=True, timeout=timeout, env=env, text=True,
    )


def test_ab_reference_self_stems(tmp_path):
    mix = str(tmp_path / "mix.wav")
    _make_mixture(mix)
    # "reference" stems: the CLI's own strict-ref output (same
    # normalization + PCM16 encode as the reference binary)
    env = dict(os.environ)
    env["ZEN_TPU_PLATFORM"] = "cpu"
    ref_prefix = str(tmp_path / "ref")
    subprocess.run(
        [sys.executable, "-m", "zen_tpu.cli", "offline", "-i", mix,
         "-o", ref_prefix, "--hps", "256", "2.0", "64", "2.0",
         "--strict-ref"],
        check=True, capture_output=True, timeout=900, env=env,
    )
    proc = _run([mix, ref_prefix, "--hps", "256", "2.0", "64", "2.0",
                 "--min-snr-db", "35",
                 "--json", str(tmp_path / "rep.json")])
    assert proc.returncode == 0, proc.stderr[-2000:] + proc.stdout[-500:]
    rep = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rep["pass"] is True
    # harmonic + percussive compared with high SNR (PCM16-bounded);
    # the strict-ref residual is silence on both sides
    assert rep["stems"]["harm"]["snr_db"] > 35
    assert rep["stems"]["perc"]["snr_db"] > 35
    assert rep["stems"]["residual"]["status"] == "both_silent"
    assert os.path.exists(tmp_path / "rep.json")


def test_ab_reference_detects_mismatch(tmp_path):
    from zen_tpu.io.audio import write_wav_pcm16

    mix = str(tmp_path / "mix.wav")
    _make_mixture(mix)
    # wrong "reference": noise stems must fail the SNR gate
    rng = np.random.default_rng(7)
    fs = 4000
    for s in ("harm", "perc", "residual"):
        write_wav_pcm16(
            str(tmp_path / f"bad_{s}.wav"), fs,
            rng.standard_normal(6000).astype(np.float32),
        )
    proc = _run([mix, str(tmp_path / "bad"),
                 "--hps", "256", "2.0", "64", "2.0"])
    assert proc.returncode == 1
    rep = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rep["pass"] is False and rep["worst_snr_db"] < 20
