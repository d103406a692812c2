"""Serving weak-scaling bound hunt: where do the microseconds go at 512 streams?

SCALING_r03.json's single-chip serving curve (hop-256 multichannel
causal HPR, the BASELINE 'batched multi-channel fakert' config scaled
past spec) retains 83-100% of peak throughput from 1->256 streams but
drops to ~55% at 512. "HBM-bound" was the round-3 hypothesis; this
instrument replaces the hypothesis with a measurement: it decomposes
the block step into its compute legs and slope-times each leg on
hardware at several stream counts, so the leg whose per-sample cost
grows with S is identified rather than guessed.

Legs (per 32-hop block step, hop 256, OUTPUT_PERCUSSIVE — exactly the
benches/scaling.py chip_stream_curve configuration):

  full       the production block_step_multi body (vmapped stream step)
  transform  window + forward DFT matmul + masked inverse DFT matmul
             (the MXU work; constant scalar mask so no extra HBM reads)
  median     time-direction tail + frequency-direction Pallas medians
             on production-shaped feature histories
  rest       full - transform - median (masks, OLA, state rotation,
             ring/concat plumbing — the fused elementwise remainder)

Timing uses runtime.profiling.scan_slope_ms (chained device-side scan,
readback-synced, slope between two lengths) — see bench.py's
methodology notes for why nothing simpler is honest on this runtime.

Emits one JSON artifact (default benches/serving_bound_r0N.json) with
per-leg us/step, per-sample ns, and a minimal-traffic HBM model for
the transform leg so the numbers can be read against the v5e roofline.

Reference context: the reference has no multi-stream serving path at
all (its one concurrency mechanism is CUDA stream-per-thread,
SURVEY.md section 2.3); this whole axis is rebuild-only.
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", default="64,256,512")
    ap.add_argument("--hop", type=int, default=256)
    ap.add_argument("--block-hops", type=int, default=32)
    ap.add_argument("--fs", type=float, default=44100.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--round", type=int, default=3)
    ap.add_argument(
        "--stream-state", default="f32", choices=("f32", "bf16"),
        help="serving-state precision knob (HPRConfig.stream_state); "
        "bf16 halves the carried-history and median HBM traffic",
    )
    ap.add_argument(
        "--n1", type=int, default=None,
        help="override the short chain length (smoke runs)",
    )
    ap.add_argument(
        "--n2", type=int, default=None,
        help="override the long chain length (smoke runs)",
    )
    args = ap.parse_args()
    if (args.n1 is None) != (args.n2 is None):
        ap.error("--n1 and --n2 must be given together")

    import jax

    from zen_tpu.runtime.platform import pin_platform

    pin_platform()  # shared policy: ZEN_TPU_PLATFORM knob, axon scrub

    import jax.numpy as jnp

    from zen_tpu import HPRConfig
    from zen_tpu.engine.config import OUTPUT_PERCUSSIVE
    from zen_tpu.engine.spectral import (
        analyze,
        freq_filtered,
        num_bins,
        synthesize,
        time_filtered_tail,
    )
    from zen_tpu.drivers.realtime import resolve_multistream_fft_impl
    from zen_tpu.runtime.profiling import scan_slope_ms
    from zen_tpu.runtime.xla_cache import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    B = args.block_hops
    hop = args.hop
    base_cfg = HPRConfig(
        fs=args.fs, hop=hop, beta=2.0, causal=True,
        outputs=OUTPUT_PERCUSSIVE, stream_state=args.stream_state,
    )
    counts = [int(s) for s in args.streams.split(",")]

    result = {
        "round": args.round,
        "platform": dev.platform,
        "device_kind": dev.device_kind,
        "config": {
            "hop": hop,
            "block_hops": B,
            "fs": args.fs,
            "outputs": "percussive",
            "stream_state": args.stream_state,
        },
        "legs_us_per_step": {},
        "per_sample_ns": {},
        "methodology": (
            "scan_slope_ms per leg (chained lax.scan, readback-synced, "
            "best-of-5 slope between two lengths); legs share the "
            "chip_stream_curve config. 'rest' = full - transform - "
            "median. Single-session numbers: compare legs within this "
            "artifact only (ambient congestion shifts absolute "
            "timings across sessions)."
        ),
    }

    for S in counts:
        rcfg = resolve_multistream_fft_impl(base_cfg, S)
        H = rcfg.time_history
        bins = num_bins(rcfg)
        nwin = rcfg.nwin
        samples = S * B * hop
        # the chip_stream_curve's chain-length policy: small steps need
        # longer chains to lift the slope above readback noise
        n1, n2 = (64, 512) if samples < (1 << 20) else (16, 128)
        if args.n1 is not None and args.n2 is not None:
            n1, n2 = args.n1, args.n2

        rng = np.random.default_rng(0)
        legs = {}

        # -- full: the production vmapped block step ------------------
        from zen_tpu.drivers.realtime import (
            _block_step_body,
            enabled_stems,
            init_state,
        )

        blocks0 = jnp.asarray(
            rng.standard_normal((S, B, hop)).astype(np.float32)
        )
        state0 = jax.vmap(lambda _: init_state(rcfg))(jnp.arange(S))

        def full_leg(carry):
            state, prev = carry
            blk = blocks0 + 1e-12 * prev[:, -1, :].reshape(S, B, hop)
            state, outs = jax.vmap(
                lambda s, b: _block_step_body(rcfg, s, b)
            )(state, blk)
            return (state, outs)

        prev0 = jnp.zeros(
            (S, len(enabled_stems(rcfg)), B * hop), jnp.float32
        )
        legs["full"] = scan_slope_ms(
            full_leg, (state0, prev0), n1, n2
        ) * 1e3

        # -- transform: MXU forward + masked inverse ------------------
        x0 = jnp.asarray(
            rng.standard_normal((S, B, nwin)).astype(np.float32)
        )
        half = jnp.float32(0.5)  # scalar mask: no extra HBM traffic

        def transform_leg(x):
            def one(xb):
                s = analyze(xb, rcfg)
                return synthesize(s, half, rcfg)

            return x0 + 1e-12 * jax.vmap(one)(x)

        legs["transform"] = scan_slope_ms(transform_leg, x0, n1, n2) * 1e3

        # -- median: both Pallas directions on production shapes ------
        # feature histories live in the serving-state dtype (the
        # production block step quantizes fresh rows to match)
        hist_dt = jnp.bfloat16 if args.stream_state == "bf16" else jnp.float32
        f0 = jnp.asarray(
            np.abs(rng.standard_normal((S, H + B, bins))).astype(np.float32)
        ).astype(hist_dt)
        newrows0 = f0[:, H:, :]

        def median_leg(feats):
            def one(fs_):
                h = time_filtered_tail(fs_, rcfg, H)
                p = freq_filtered(fs_[H:, :], rcfg).astype(jnp.float32)
                return h + p

            new = (
                newrows0.astype(jnp.float32) + 1e-12 * jax.vmap(one)(feats)
            ).astype(hist_dt)
            return jnp.concatenate([feats[:, B:, :], new], axis=1)

        legs["median"] = scan_slope_ms(median_leg, f0, n1, n2) * 1e3

        legs["rest"] = legs["full"] - legs["transform"] - legs["median"]
        result["legs_us_per_step"][S] = {
            k: round(v, 2) for k, v in legs.items()
        }
        result["per_sample_ns"][S] = {
            k: round(v * 1e3 / samples, 4) for k, v in legs.items()
        }
        thr = samples / (legs["full"] * 1e-6)
        print(
            f"S={S:4d}: full {legs['full']:9.1f} us/step "
            f"({thr/1e9:.2f} Gs/s) | transform {legs['transform']:8.1f} "
            f"| median {legs['median']:8.1f} | rest {legs['rest']:8.1f}",
            flush=True,
        )

    # minimal-HBM-traffic model for the transform leg: read frames,
    # write+read the complex spectrum at the matmul boundaries, write
    # the synthesis frames. Everything else can fuse.
    bins = base_cfg.nfft // 2 + 1
    per_sample_bytes = 4.0 * (
        base_cfg.nwin + 2 * (2 * bins) + base_cfg.nwin
    ) / hop
    result["transform_min_traffic_bytes_per_sample"] = round(
        per_sample_bytes, 1
    )

    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"serving_bound_r{args.round:02d}.json",
    )
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"wrote {out}", file=sys.stderr)

    smax = max(counts)
    print(
        json.dumps(
            {
                "metric": f"serving_bound_full_{smax}streams",
                "value": result["legs_us_per_step"][smax]["full"],
                "unit": "us_per_step",
                "platform": dev.platform,
            }
        )
    )


if __name__ == "__main__":
    main()
