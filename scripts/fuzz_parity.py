"""Randomized engine-vs-oracle parity sweep (extended fuzz instrument).

The fixed-seed parity grid (tests/test_engine_parity.py) pins known
configurations; this instrument samples RANDOM ones — fs, hop, border,
causal, mask variant, beta, track length, random audio — and asserts
every valid sample separates within 5e-4 relative error of the
hop-by-hop numpy oracle (engine/oracle.py, the reference
transcription), offline AND streaming. Invalid configurations must be
rejected with a validated error, never a crash.

Round-3 catch: a short track whose frame count was below the time
filter's reach (high fs x small hop) crashed tap_stack in the jnp
median (ops/median.py::_shift_zero) — now fixed and regression-pinned
(tests/test_ops.py, tests/test_engine_parity.py). Run this sweep with
a fresh seed each round; it is cheap insurance against config-space
corners the fixed grid misses.

Usage: python scripts/fuzz_parity.py [seed] [n_cases]
"""
from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # oracle platform (conftest rule)

from zen_tpu import HPRConfig, OUTPUT_ALL  # noqa: E402
from zen_tpu.drivers.offline import hpr_separate  # noqa: E402
from zen_tpu.drivers.realtime import HPRRealtime  # noqa: E402
from zen_tpu.engine.oracle import (  # noqa: E402
    oracle_offline_pass,
    oracle_realtime_stream,
)
from zen_tpu.errors import ZenError  # noqa: E402

RTOL = 5e-4
STEMS = ("harmonic", "percussive", "residual")


def run_sweep(seed: int, n_cases: int) -> tuple:
    rng = np.random.default_rng(seed)
    ran = skipped = 0
    for case in range(n_cases):
        fs = float(rng.integers(800, 48001))
        hop = int(rng.choice([8, 16, 32, 64]))
        border = str(rng.choice(["wrap", "valid", "replicate"]))
        causal = bool(rng.integers(2))
        variant = str(rng.choice(["hard", "soft", "sse"]))
        beta = float(rng.uniform(1.0, 3.5))
        length = int(rng.integers(300, 2500))
        t = np.arange(length) / fs
        audio = (
            0.6 * np.sin(2 * np.pi * rng.uniform(30, fs / 8) * t)
            + 0.4 * (rng.random(length) > 0.97)
            + 0.05 * rng.standard_normal(length)
        ).astype(np.float32)
        desc = (
            f"case {case}: fs={fs:.0f} hop={hop} border={border} "
            f"causal={causal} variant={variant} beta={beta:.2f} L={length}"
        )
        try:
            cfg = HPRConfig(
                fs=fs, hop=hop, beta=beta, causal=causal, border=border,
                outputs=OUTPUT_ALL, fast_rfft=False,
                soft_mask=(variant == "soft"), use_sse=(variant == "sse"),
            )
        except (ZenError, ValueError) as e:
            skipped += 1
            print(f"{desc} -> validated reject: {e}", flush=True)
            continue
        want = oracle_offline_pass(audio, cfg)
        got = hpr_separate(audio, cfg)
        for k in STEMS:
            g, w = np.asarray(got[k]), np.asarray(want[k])
            scale = max(np.abs(w).max(), 1e-3)
            err = np.abs(g - w).max() / scale
            assert err < RTOL, f"{desc} stem={k} relerr={err:.2e}"
        if causal:
            want_rt = oracle_realtime_stream(audio, cfg)
            rt = HPRRealtime(
                fs, hop, beta, border=border,
                soft_mask=(variant == "soft"), use_sse=(variant == "sse"),
            )
            rt.cfg = dataclasses.replace(rt.cfg, fast_rfft=False)
            rt.reset_buffers()
            got_rt = np.asarray(rt.process_stream(audio, block_hops=16))
            w = np.stack([np.asarray(want_rt[k]) for k in STEMS])
            scale = max(np.abs(w).max(), 1e-3)
            err = np.abs(got_rt[:, : w.shape[1]] - w).max() / scale
            assert err < RTOL, f"{desc} STREAM relerr={err:.2e}"
        ran += 1
        print(f"{desc} -> OK", flush=True)
    return ran, skipped


def run_blocked_sweep(seed: int, n_cases: int) -> tuple:
    """Blocked-vs-unblocked driver parity on random configs AND random
    block sizes — the blocked path's guard/halo arithmetic has its own
    corner space (40/40 on the round-3 run, incl. short-track cases
    where the halo exceeds the track)."""
    from zen_tpu.drivers.offline import hpr_separate_blocked

    rng = np.random.default_rng(seed)
    ran = skipped = 0
    for case in range(n_cases):
        fs = float(rng.integers(800, 48001))
        hop = int(rng.choice([8, 16, 32, 64]))
        border = str(rng.choice(["wrap", "valid", "replicate"]))
        causal = bool(rng.integers(2))
        variant = str(rng.choice(["hard", "soft", "sse"]))
        beta = float(rng.uniform(1.0, 3.5))
        length = int(rng.integers(300, 4000))
        bf = int(rng.choice([2, 4, 8, 16, 64]))
        audio = (0.5 * rng.standard_normal(length)).astype(np.float32)
        desc = (
            f"blocked case {case}: fs={fs:.0f} hop={hop} border={border} "
            f"causal={causal} variant={variant} beta={beta:.2f} "
            f"L={length} bf={bf}"
        )
        try:
            cfg = HPRConfig(
                fs=fs, hop=hop, beta=beta, causal=causal, border=border,
                outputs=OUTPUT_ALL, fast_rfft=False,
                soft_mask=(variant == "soft"), use_sse=(variant == "sse"),
            )
        except (ZenError, ValueError) as e:
            skipped += 1
            print(f"{desc} -> validated reject: {e}", flush=True)
            continue
        want = hpr_separate(audio, cfg)
        got = hpr_separate_blocked(audio, cfg, block_frames=bf)
        for k in STEMS:
            w = np.nan_to_num(np.asarray(want[k]), posinf=0, neginf=0)
            g = np.nan_to_num(np.asarray(got[k]), posinf=0, neginf=0)
            scale = max(1.0, np.abs(w).max())
            err = np.abs(g - w).max() / scale
            assert err < 1e-4, f"{desc} stem={k} relerr={err:.2e}"
        ran += 1
        print(f"{desc} -> OK", flush=True)
    return ran, skipped


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n_cases = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    mode = sys.argv[3] if len(sys.argv) > 3 else "oracle"
    sweep = run_blocked_sweep if mode == "blocked" else run_sweep
    ran, skipped = sweep(seed, n_cases)
    print(
        f"PARITY SWEEP PASS: {ran} ran, {skipped} validated-rejected "
        f"(seed={seed}, mode={mode})",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
