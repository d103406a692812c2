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

Usage: python scripts/fuzz_parity.py [seed] [n_cases] [mode]
Modes: oracle (default), blocked, sharded, twopass, tp, serving.
"""
from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the sharded mode needs a multi-device mesh: force 8 virtual CPU
# devices (must happen before the jax import / backend init)
if "xla_force_host_platform_device_count" not in os.environ.get(
    "XLA_FLAGS", ""
):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402

import jax  # noqa: E402

from zen_tpu.runtime.platform import pin_platform  # noqa: E402

pin_platform(force="cpu")  # oracle platform (conftest rule)

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


def run_sharded_sweep(seed: int, n_cases: int) -> tuple:
    """Sharded-vs-unsharded parity on the virtual 8-device mesh with
    random configs, mesh splits, and channel counts. Sampling is
    biased toward configs whose time halo fits the virtual shards
    (moderate fs, larger hop, longer tracks); configs whose halo
    exceeds a shard must be REJECTED with a clean ZenError, never a
    crash or a wrong answer (round-3 run: 8 exact + 22 clean rejects,
    0 crashes over the unbiased space)."""
    from zen_tpu.parallel.mesh import make_mesh
    from zen_tpu.parallel.sharded import (
        sharded_separate,
        sharded_separate_blocked,
    )

    rng = np.random.default_rng(seed)
    ran = skipped = 0
    for case in range(n_cases):
        fs = float(rng.integers(800, 16001))
        hop = int(rng.choice([16, 32, 64]))
        border = str(rng.choice(["wrap", "valid", "replicate"]))
        causal = bool(rng.integers(2))
        variant = str(rng.choice(["hard", "soft", "sse"]))
        beta = float(rng.uniform(1.0, 3.5))
        length = int(rng.integers(1500, 6000))
        dp = int(rng.choice([1, 2]))
        sp = 8 // dp
        n_ch = dp * int(rng.integers(1, 3))
        bf = int(rng.choice([2, 8, 32]))
        audio = (0.5 * rng.standard_normal((n_ch, length))).astype(
            np.float32
        )
        desc = (
            f"sharded case {case}: fs={fs:.0f} hop={hop} border={border} "
            f"causal={causal} variant={variant} beta={beta:.2f} "
            f"L={length} dp={dp} sp={sp} C={n_ch} bf={bf}"
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
        mesh = make_mesh({"dp": dp, "sp": sp})
        want = {
            k: np.stack(
                [np.asarray(hpr_separate(audio[c], cfg)[k])
                 for c in range(n_ch)]
            )
            for k in STEMS
        }

        def check(tag, got, w):
            g = np.asarray(got)
            scale = max(1.0, np.abs(w).max())
            err = np.abs(g - w).max() / scale
            assert err < 1e-4, f"{desc} {tag} relerr={err:.2e}"

        try:
            got = sharded_separate(audio, cfg, mesh)
        except ZenError as e:
            skipped += 1
            print(f"{desc} -> validated reject: {e}", flush=True)
            continue
        for k in STEMS:
            check(f"SHARDED {k}", got[k], want[k])
        try:
            gotb = sharded_separate_blocked(
                audio[0], cfg, mesh, block_frames=bf
            )
            for k in STEMS:
                check(f"BLOCKED-SHARDED {k}", gotb[k], want[k][0])
        except ZenError as e:
            print(f"{desc} -> blocked validated reject: {e}", flush=True)
        ran += 1
        print(f"{desc} -> OK", flush=True)
    return ran, skipped


def run_twopass_sweep(seed: int, n_cases: int) -> tuple:
    """Full HPRIOffline 2-pass cascade vs the oracle cascade
    (pass 1 -> percussive+residual intermediate -> pass 2,
    hps.cu:128-221) on random hop pairs (hop_h a multiple of hop_p,
    the reference ctor constraint), borders, betas, and lengths —
    covers the truncate-between-passes and lag-compensation logic
    (25/25 on the round-3 run)."""
    from zen_tpu import (
        HPRIOffline,
        OUTPUT_PERCUSSIVE,
        OUTPUT_RESIDUAL,
    )

    rng = np.random.default_rng(seed)
    ran = skipped = 0
    for case in range(n_cases):
        fs = float(rng.integers(800, 24001))
        hop_p = int(rng.choice([8, 16]))
        hop_h = hop_p * int(rng.choice([2, 4, 8]))
        border = str(rng.choice(["wrap", "valid", "replicate"]))
        beta_h = float(rng.uniform(1.2, 3.2))
        beta_p = float(rng.uniform(1.2, 3.2))
        length = int(rng.integers(300, 2500))
        audio = (0.5 * rng.standard_normal(length)).astype(np.float32)
        desc = (
            f"twopass case {case}: fs={fs:.0f} hops={hop_h}/{hop_p} "
            f"border={border} betas={beta_h:.2f}/{beta_p:.2f} L={length}"
        )
        try:
            sep = HPRIOffline(
                fs, hop_h, hop_p, beta_h, beta_p, border=border
            )
            sep.cfg_h = dataclasses.replace(sep.cfg_h, fast_rfft=False)
            sep.cfg_p = dataclasses.replace(sep.cfg_p, fast_rfft=False)
            cfg_h = HPRConfig(
                fs=fs, hop=hop_h, beta=beta_h, causal=False,
                border=border, outputs=OUTPUT_ALL, fast_rfft=False,
            )
            cfg_p = HPRConfig(
                fs=fs, hop=hop_p, beta=beta_p, causal=False,
                border=border,
                outputs=OUTPUT_PERCUSSIVE | OUTPUT_RESIDUAL,
                fast_rfft=False,
            )
        except (ZenError, ValueError) as e:
            skipped += 1
            print(f"{desc} -> validated reject: {e}", flush=True)
            continue
        h, p, r = sep.process(audio)
        pass1 = oracle_offline_pass(audio, cfg_h)
        inter = pass1["percussive"] + pass1["residual"]
        pass2 = oracle_offline_pass(inter, cfg_p)
        for tag, g, w in (
            ("harm", h, pass1["harmonic"]),
            ("perc", p, pass2["percussive"]),
            ("res", r, pass2["residual"]),
        ):
            g, w = np.asarray(g), np.asarray(w)
            scale = max(np.abs(w).max(), 1e-3)
            err = np.abs(g - w).max() / scale
            assert err < RTOL, f"{desc} {tag} relerr={err:.2e}"
        ran += 1
        print(f"{desc} -> OK", flush=True)
    return ran, skipped


def run_tp_sweep(seed: int, n_cases: int) -> tuple:
    """Frequency-TP (partial-DFT) parity on the virtual mesh: random
    configs x tp widths vs the unsharded pass; bin-halo configs that
    cannot shard must reject cleanly (19 exact + 1 clean reject on the
    round-3 run). Wrap border only (the TP window is circular)."""
    from zen_tpu.parallel.mesh import make_mesh
    from zen_tpu.parallel.sharded import tp_separate

    rng = np.random.default_rng(seed)
    ran = skipped = 0
    for case in range(n_cases):
        fs = float(rng.integers(800, 24001))
        hop = int(rng.choice([16, 32, 64]))
        causal = bool(rng.integers(2))
        variant = str(rng.choice(["hard", "soft"]))
        beta = float(rng.uniform(1.2, 3.2))
        length = int(rng.integers(500, 2500))
        tp = int(rng.choice([2, 4, 8]))
        audio = (0.5 * rng.standard_normal(length)).astype(np.float32)
        desc = (
            f"tp case {case}: fs={fs:.0f} hop={hop} causal={causal} "
            f"variant={variant} beta={beta:.2f} L={length} tp={tp}"
        )
        try:
            cfg = HPRConfig(
                fs=fs, hop=hop, beta=beta, causal=causal, border="wrap",
                outputs=OUTPUT_ALL, fast_rfft=False,
                soft_mask=(variant == "soft"),
            )
        except (ZenError, ValueError) as e:
            skipped += 1
            print(f"{desc} -> validated reject: {e}", flush=True)
            continue
        mesh = make_mesh({"tp": tp})
        want = hpr_separate(audio, cfg)
        try:
            got = tp_separate(audio, cfg, mesh)
        except ZenError as e:
            skipped += 1
            print(f"{desc} -> validated reject: {e}", flush=True)
            continue
        for k in STEMS:
            w, g = np.asarray(want[k]), np.asarray(got[k])
            scale = max(1.0, np.abs(w).max())
            err = np.abs(g - w).max() / scale
            assert err < 1e-3, f"{desc} stem={k} relerr={err:.2e}"
        ran += 1
        print(f"{desc} -> OK", flush=True)
    return ran, skipped


def run_serving_sweep(seed: int, n_cases: int) -> tuple:
    """MultiStreamHPR (the serving driver) vs C independent
    HPRRealtime streams on random configs, stream counts, and block
    sizes — plus, on half the cases, a random mid-run
    ``reset_streams`` of a random slot subset: reset slots must
    reproduce fresh streams from the reset point on, untouched slots
    must continue unperturbed (the determinism contract of reference
    hps.h:296-321 extended to the serving axis)."""
    from zen_tpu.drivers.realtime import MultiStreamHPR

    rng = np.random.default_rng(seed)
    ran = skipped = 0
    for case in range(n_cases):
        fs = float(rng.integers(800, 48001))
        hop = int(rng.choice([8, 16, 32]))
        border = str(rng.choice(["wrap", "valid", "replicate"]))
        variant = str(rng.choice(["hard", "soft", "sse"]))
        beta = float(rng.uniform(1.0, 3.5))
        n_ch = int(rng.integers(2, 6))
        b = int(rng.choice([2, 4, 8]))
        n_blocks = int(rng.integers(2, 6))
        reset_at = int(rng.integers(1, n_blocks)) if rng.integers(2) else 0
        reset_idx = (
            sorted(
                int(i)
                for i in rng.choice(
                    n_ch, size=int(rng.integers(1, n_ch)), replace=False
                )
            )
            if reset_at
            else []
        )
        desc = (
            f"serving case {case}: fs={fs:.0f} hop={hop} border={border} "
            f"variant={variant} beta={beta:.2f} C={n_ch} b={b} "
            f"blocks={n_blocks} reset@{reset_at}={reset_idx}"
        )
        kw = dict(
            border=border,
            soft_mask=(variant == "soft"),
            use_sse=(variant == "sse"),
        )
        try:
            ms = MultiStreamHPR(n_ch, fs, hop, beta, **kw)
        except (ZenError, ValueError) as e:
            skipped += 1
            print(f"{desc} -> validated reject: {e}", flush=True)
            continue
        audio = (
            0.5 * rng.standard_normal((n_ch, n_blocks * b * hop))
        ).astype(np.float32)
        blocks = audio.reshape(n_ch, n_blocks, b, hop)
        outs = []
        for k in range(n_blocks):
            if reset_idx and k == reset_at:
                ms.reset_streams(reset_idx)
            outs.append(np.asarray(ms.process_block(blocks[:, k])))
        multi = np.concatenate(outs, axis=-1)  # [C, 3, L]
        cut = reset_at * b * hop
        for c in range(n_ch):
            rt = HPRRealtime(fs, hop, beta, **kw)
            if c in reset_idx:
                pre = np.asarray(
                    rt.process_stream(audio[c][:cut], block_hops=b)
                )
                fresh = HPRRealtime(fs, hop, beta, **kw)
                post = np.asarray(
                    fresh.process_stream(audio[c][cut:], block_hops=b)
                )
                want = np.concatenate([pre, post], axis=-1)
            else:
                want = np.asarray(
                    rt.process_stream(audio[c], block_hops=b)
                )
            scale = max(1.0, np.abs(want).max())
            err = np.abs(multi[c] - want).max() / scale
            assert err < 1e-4, f"{desc} stream={c} relerr={err:.2e}"
        ran += 1
        print(f"{desc} -> OK", flush=True)
    return ran, skipped


_MODES = {
    "oracle": run_sweep,
    "blocked": run_blocked_sweep,
    "sharded": run_sharded_sweep,
    "twopass": run_twopass_sweep,
    "tp": run_tp_sweep,
    "serving": run_serving_sweep,
}


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n_cases = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    mode = sys.argv[3] if len(sys.argv) > 3 else "oracle"
    sweep = _MODES[mode]
    ran, skipped = sweep(seed, n_cases)
    print(
        f"PARITY SWEEP PASS: {ran} ran, {skipped} validated-rejected "
        f"(seed={seed}, mode={mode})",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
