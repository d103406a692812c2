"""Scaling-efficiency instrument: samples/s vs device count.

The BASELINE north star demands >=80% samples/s scaling efficiency
from 1 to N devices; round-1 proved the structural preconditions
(zero DP collectives, length-independent SP halos — tests/
test_scaling.py) but shipped no instrument that MEASURES the
efficiency. This is that instrument (VERDICT r1 next#5).

Two legs, matching the two pod workloads:
  * DP  — MultiStreamHPR serving path: K streams per device, weak
    scaling (work grows with devices; perfect scaling = flat
    samples/s/device).
  * SP  — sharded offline pass on one fixed-length track, strong
    scaling (work fixed; perfect scaling = samples/s grows with
    devices).

Efficiency(N) = throughput(N) / (N * throughput(1))        [DP, weak]
Efficiency(N) = throughput(N) / (N * throughput(1))        [SP, strong]
(throughput = processed audio samples per wall second).

Timing is the repo's standard hazard-proof method (memory:
axon-tpu-measurement-hazards): wall time of n1 vs n2 CHAINED
iterations with a value readback at the end — the slope cancels the
sync constant, chaining defeats relay caching, and the method runs
unmodified on the virtual CPU mesh today and on real multi-chip
hardware when it exists.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python benches/scaling.py [--devices 1,2,4,8] [--json out.json]
On a real pod, run it with no flags; it uses jax.devices().
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# repo-standard platform policy, pinned before jax import side
# effects (a forced host device count implies CPU intent)
from zen_tpu.runtime.platform import pin_platform  # noqa: E402

pin_platform()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _sync(x):
    """True device sync: a value readback (block_until_ready is a
    no-op through the axon tunnel)."""
    leaves = jax.tree.leaves(x)
    return float(np.asarray(jnp.sum(leaves[0].ravel()[:8])))


def _slope_seconds(run, n1=4, n2=12, repeats=3):
    """Best-of-N slope of wall time between n1 and n2 chained
    iterations of run(k) (run executes k chained steps then syncs)."""
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        run(n1)
        t1 = time.perf_counter()
        run(n2)
        t2 = time.perf_counter()
        per = ((t2 - t1) - (t1 - t0)) / (n2 - n1)
        best = per if best is None else min(best, per)
    return max(best, 1e-9)


def dp_leg(n_dev: int, streams_per_dev: int, hop: int, block_hops: int, fs: float):
    """Weak-scaling serving throughput: samples/s across all streams."""
    from zen_tpu.drivers.realtime import MultiStreamHPR
    from zen_tpu.parallel.mesh import make_mesh

    n_streams = streams_per_dev * n_dev
    mesh = make_mesh({"dp": n_dev}, devices=jax.devices()[:n_dev])
    ms = MultiStreamHPR(n_streams, fs=fs, hop=hop, mesh=mesh)
    rng = np.random.default_rng(0)
    blocks = jnp.asarray(
        rng.standard_normal((n_streams, block_hops, hop)).astype(np.float32)
    )

    def run(k):
        out = None
        for _ in range(k):
            out = ms.process_block(blocks)  # state chains internally
        _sync(out)

    run(2)  # compile + warm
    per_step = _slope_seconds(run)
    return n_streams * block_hops * hop / per_step


def sp_leg(n_dev: int, n_frames: int, hop: int, fs: float):
    """Strong-scaling offline throughput on one track: samples/s."""
    from zen_tpu.engine.config import HPRConfig, OUTPUT_ALL
    from zen_tpu.parallel.mesh import make_mesh
    from zen_tpu.parallel.sharded import sharded_separate

    cfg = HPRConfig(
        fs=fs, hop=hop, beta=2.0, causal=False, outputs=OUTPUT_ALL
    )
    mesh = make_mesh(
        {"dp": 1, "sp": n_dev}, devices=jax.devices()[:n_dev]
    )
    length = n_frames * hop
    rng = np.random.default_rng(1)
    audio = jnp.asarray(
        rng.standard_normal((1, length)).astype(np.float32)
    )

    def run(k):
        x = audio
        out = None
        for _ in range(k):
            out = sharded_separate(x, cfg, mesh)
            # chain: feed the harmonic stem back in (same shape);
            # normalize so k chained passes can't denormal-flush
            x = out["harmonic"] * (0.25 / jnp.float32(cfg.synth_scale))
        _sync(out["harmonic"])

    run(1)  # compile + warm
    per_step = _slope_seconds(run)
    return length / per_step


def _chain_lengths(samples_per_step: int):
    """Chain lengths (n1, n2) for the slope timer, scaled so the LONG
    chain carries enough device work to dominate the readback-sync
    jitter. The old two-bucket policy left S=1 at n2=512 (~8 ms of
    device work against a ~26 ms variable sync constant): one round-5
    interleaved session measured 4.77 Gs/s on one pass of the 1-stream
    leg and 0.53 Gs/s on the other — pure noise, and the bogus peak
    poisoned every retention ratio in the pass. Scaling n2 inversely
    with per-step work keeps ~>=100 ms in the long chain at any S."""
    if samples_per_step < (1 << 17):
        return 256, 2048
    if samples_per_step < (1 << 20):
        return 64, 512
    return 16, 128


def chip_stream_curve_interleaved(stream_counts, hop: int, block_hops: int,
                                  fs: float, stream_state: str = "f32",
                                  passes: int = 2):
    """Retention with an error bar from ONE session (round-5 verdict
    #4): the kernel hunts' interleaved-A/B protocol applied to the
    chip curve. All stream counts are measured round-robin per pass,
    so slow tunnel-congestion drift hits every count ~equally, and
    retention is computed WITHIN each pass (ratio to that pass's own
    peak) then summarized across passes as mean ± half-spread — the
    cross-session 0.66-vs-0.82 ambiguity of the r04 headline cannot
    recur inside this artifact."""
    import bench as bench_mod
    from zen_tpu.engine.config import HPRConfig, OUTPUT_PERCUSSIVE

    cfg = HPRConfig(
        fs=fs, hop=hop, beta=2.0, causal=True, outputs=OUTPUT_PERCUSSIVE,
        stream_state=stream_state,
    )
    per_pass = []
    for pi in range(passes):
        curve = {}
        for s in stream_counts:
            n1, n2 = _chain_lengths(s * block_hops * hop)
            curve[s] = bench_mod.time_multistream(cfg, s, block_hops, n1, n2)
            print(
                f"chip[pass {pi + 1}/{passes}]: {s:4d} streams: "
                f"{curve[s]/1e6:9.2f} Msamples/s",
                flush=True,
            )
        per_pass.append(curve)
    summary = {}
    for s in stream_counts:
        rets = [c[s] / max(c.values()) for c in per_pass]
        summary[s] = {
            "retention_mean": round(sum(rets) / len(rets), 4),
            "retention_half_spread": round((max(rets) - min(rets)) / 2, 4),
            "samples_per_s_per_pass": [round(c[s], 0) for c in per_pass],
        }
        print(
            f"chip retention @ {s:4d} streams: "
            f"{summary[s]['retention_mean']:.3f} "
            f"± {summary[s]['retention_half_spread']:.3f}",
            flush=True,
        )
    return per_pass, summary


def chip_stream_curve(stream_counts, hop: int, block_hops: int, fs: float,
                      stream_state: str = "f32"):
    """Single-chip dp weak-scaling curve (round-2 verdict #8): Msamples/s
    at 1 -> N streams on ONE device — the per-chip scaling evidence this
    environment CAN measure (the virtual-mesh efficiencies validate the
    instrument; ICI behavior needs real multi-chip hardware).

    Delegates to bench.py's device-side-scan slope timer: a host loop
    of dispatches is noise-dominated at small stream counts (the
    per-step device time is micro-seconds against a ~ms readback
    constant), while the lax.scan form chains hundreds of steps inside
    one executable."""
    import bench as bench_mod
    from zen_tpu.engine.config import HPRConfig, OUTPUT_PERCUSSIVE

    cfg = HPRConfig(
        fs=fs, hop=hop, beta=2.0, causal=True, outputs=OUTPUT_PERCUSSIVE,
        stream_state=stream_state,
    )
    curve = {}
    for s in stream_counts:
        n1, n2 = _chain_lengths(s * block_hops * hop)
        curve[s] = bench_mod.time_multistream(cfg, s, block_hops, n1, n2)
        print(
            f"chip: {s:4d} streams: {curve[s]/1e6:9.2f} Msamples/s "
            f"({curve[s]/(s or 1)/1e6:.3f} per stream)",
            flush=True,
        )
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default=None,
                    help="comma list of device counts (default: 1,2,..,N)")
    ap.add_argument("--streams-per-dev", type=int, default=8)
    ap.add_argument("--hop", type=int, default=256)
    ap.add_argument("--block-hops", type=int, default=16)
    ap.add_argument("--frames", type=int, default=512,
                    help="SP leg track length in pass-frames")
    ap.add_argument("--fs", type=float, default=44100.0)
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--chip-streams", default=None,
        help="also sweep single-chip stream counts, e.g. '1,8,64,512' "
        "(the per-chip dp weak-scaling curve; default on TPU)",
    )
    ap.add_argument(
        "--stream-state", default="f32", choices=("f32", "bf16"),
        help="serving-state precision for the chip curve (the bf16 "
        "knob that lifts wide-fleet retention, docs/PERFORMANCE.md)",
    )
    ap.add_argument(
        "--mesh-legs", dest="mesh_legs", action="store_true", default=None,
        help="force the dp/sp mesh legs (default: only when >1 device)",
    )
    ap.add_argument(
        "--retention-passes", type=int, default=2,
        help="interleaved A/B passes for the chip retention curve "
        "(mean ± half-spread from one session; 1 = legacy single "
        "sweep)",
    )
    args = ap.parse_args()

    n_avail = len(jax.devices())
    platform = jax.devices()[0].platform
    if args.devices:
        counts = [int(x) for x in args.devices.split(",")]
    else:
        counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n_avail]
    print(f"devices available: {n_avail} ({platform}); sweep {counts}",
          flush=True)
    result = {"platform": platform, "counts": counts}
    if platform == "cpu":
        cores = os.cpu_count() or 1
        if cores < counts[-1]:
            caveat = (
                f"{counts[-1]} virtual CPU devices share {cores} physical "
                "core(s) — these efficiencies validate the instrument "
                "and the sharded program structure, NOT hardware (ICI) "
                "scaling; run on a real pod for the BASELINE >=80% target."
            )
            result["caveat"] = caveat
            print(f"NOTE: {caveat}", flush=True)

    run_mesh = args.mesh_legs if args.mesh_legs is not None else n_avail > 1
    if run_mesh:
        for leg, fn in (
            ("dp", lambda n: dp_leg(n, args.streams_per_dev, args.hop,
                                    args.block_hops, args.fs)),
            ("sp", lambda n: sp_leg(n, args.frames, args.hop, args.fs)),
        ):
            tput = {}
            for n in counts:
                tput[n] = fn(n)
                print(f"{leg}: {n} device(s): {tput[n]/1e6:.2f} Msamples/s",
                      flush=True)
            base = tput[counts[0]] / counts[0]
            eff = {n: tput[n] / (n * base) for n in counts}
            result[f"{leg}_samples_per_s"] = tput
            result[f"{leg}_efficiency"] = eff
            for n in counts[1:]:
                print(f"{leg}: efficiency @ {n} devices: {eff[n]*100:.1f}%",
                      flush=True)

    chip = args.chip_streams or ("1,8,64,512" if platform == "tpu" else None)
    if chip:
        streams = [int(x) for x in chip.split(",")]
        if args.retention_passes > 1:
            per_pass, summary = chip_stream_curve_interleaved(
                streams, args.hop, args.block_hops, args.fs,
                args.stream_state, args.retention_passes,
            )
            # last pass doubles as the point curve; retention comes
            # from the interleaved summary (mean ± half-spread)
            curve = per_pass[-1]
            result["chip_retention_interleaved"] = summary
            result["chip_retention_passes"] = args.retention_passes
        else:
            curve = chip_stream_curve(streams, args.hop, args.block_hops,
                                      args.fs, args.stream_state)
        result["chip_stream_curve_samples_per_s"] = curve
        result["chip_stream_state"] = args.stream_state
        # the chip is the scaling unit: stream count just fills it, so
        # the honest summary is throughput retention vs the chip's own
        # peak (flat curve == stream count costs nothing), not "weak
        # efficiency vs 1 stream" (1 stream already saturates the MXU)
        peak = max(curve.values())
        result["chip_throughput_retention_vs_peak"] = {
            s: curve[s] / peak for s in streams
        }

    if run_mesh:
        nmax = counts[-1]
        line = {
            "metric": f"sp_scaling_efficiency_{nmax}dev",
            "value": round(result["sp_efficiency"][nmax], 4),
            "unit": "ratio",
            "dp_efficiency": round(result["dp_efficiency"][nmax], 4),
            "target": 0.8,
            "platform": result["platform"],
        }
    elif "chip_stream_curve_samples_per_s" in result:
        curve = result["chip_stream_curve_samples_per_s"]
        smax = max(curve)
        line = {
            "metric": f"chip_stream_throughput_{smax}x",
            "value": round(curve[smax] / 1e6, 1),
            "unit": "Msamples/s",
            "platform": result["platform"],
        }
    else:
        # single non-TPU device, no legs requested: nothing to measure
        line = {
            "metric": "scaling_noop",
            "value": 0,
            "unit": "none",
            "platform": result["platform"],
            "note": "1 device and no --chip-streams/--mesh-legs requested",
        }
    print(json.dumps(line), flush=True)
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(result, fh, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
