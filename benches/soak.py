"""Stability soak: hours of audio through the multichannel causal step.

The reference's only stability evidence is its demos running
interactively; this instrument streams a configurable number of
stream-hours through the production block step (the same
_block_step_body the serving path dispatches) and verifies, entirely
device-side, that every output stays finite and the output envelope
does not drift — the OLA accumulators and sliding-STFT state are the
long-run failure surface (a leak there compounds over hours).

Methodology (memory-hazard aware, same as bench.py): each dispatch is
a chained lax.scan of ``--steps`` block steps whose input mixes in the
previous output (nothing cacheable), the carry threads across
dispatches, and each dispatch ends in a value readback of the
(max_abs, nonfinite_count) stats — the only true sync on this tunnel.

Usage:
  python benches/soak.py --dispatches 300         # ~507 stream-hours
  python benches/soak.py --streams 8 --steps 16 --dispatches 2  # smoke
(defaults give ~1.69 stream-hours per dispatch: 64 streams x 32-hop
blocks x hop 256 x 512 steps / 44.1 kHz)

Prints one JSON line:
  {"metric": "soak_stream_hours", "value": H, "finite": true,
   "max_abs_first": ..., "max_abs_last": ..., "drift_ratio": ...}

max_abs_* are PER-DISPATCH output maxima (stats reset each dispatch),
so drift_ratio = last/first detects both a growing envelope (leak,
ratio > 1) and a decaying one (state attenuation, ratio < 1); a
cumulative max would report a decaying output as healthy.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zen_tpu.runtime.platform import pin_platform  # noqa: E402

pin_platform()  # shared policy: scrub axon alias, honor ZEN_TPU_PLATFORM


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_soak_run(cfg, n_streams, block_hops, steps):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zen_tpu.drivers.realtime import (
        _block_step_body,
        enabled_stems,
        init_state,
        resolve_multistream_fft_impl,
    )

    cfg = resolve_multistream_fft_impl(cfg, n_streams)
    rng = np.random.default_rng(0)
    base = jnp.asarray(
        rng.standard_normal((n_streams, block_hops, cfg.hop)).astype(
            np.float32
        )
    )

    @jax.jit
    def run(state, prev, stats):
        def step(carry, _):
            state, prev, (mx, bad) = carry
            blocks = base + 1e-12 * prev[:, -1, :].reshape(
                n_streams, block_hops, cfg.hop
            )
            state, outs = jax.vmap(
                lambda s, b: _block_step_body(cfg, s, b)
            )(state, blocks)
            mx = jnp.maximum(mx, jnp.max(jnp.abs(outs)))
            bad = bad + jnp.sum(~jnp.isfinite(outs))
            return (state, outs, (mx, bad)), None

        return jax.lax.scan(
            step, (state, prev, stats), None, length=steps
        )[0]

    def init_carry():
        return (
            jax.vmap(lambda _: init_state(cfg))(jnp.arange(n_streams)),
            jnp.zeros(
                (n_streams, len(enabled_stems(cfg)),
                 block_hops * cfg.hop),
                jnp.float32,
            ),
            (jnp.float32(0.0), jnp.int32(0)),
        )

    return run, init_carry


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fs", type=float, default=44100.0)
    ap.add_argument("--hop", type=int, default=256)
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--block-hops", type=int, default=32)
    ap.add_argument("--steps", type=int, default=512,
                    help="block steps per device dispatch")
    ap.add_argument("--dispatches", type=int, default=20)
    ap.add_argument("--stream-state", default="f32", choices=("f32", "bf16"),
                    help="serving-state precision (the wide-fleet bf16 knob)")
    ap.add_argument("--fft-impl", default="auto",
                    choices=("auto", "xla", "dft", "dft_bf16", "dft_f32"),
                    help="transform seam: soak the full max-throughput "
                    "ladder with --fft-impl dft_bf16 --stream-state bf16 "
                    "(the >256-stream recommendation, round-5 verdict #7)")
    args = ap.parse_args()
    if args.dispatches < 1:
        ap.error("--dispatches must be >= 1")

    import jax

    from zen_tpu.engine.config import OUTPUT_ALL, HPRConfig
    from zen_tpu.runtime.xla_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = HPRConfig(
        fs=args.fs, hop=args.hop, causal=True, outputs=OUTPUT_ALL,
        stream_state=args.stream_state, fft_impl=args.fft_impl,
    )
    run, init_carry = build_soak_run(
        cfg, args.streams, args.block_hops, args.steps
    )
    state, prev, stats = init_carry()
    samples_per_dispatch = (
        args.streams * args.block_hops * args.hop * args.steps
    )
    log(
        f"soak: {args.streams} streams x hop {args.hop} x "
        f"{args.block_hops}-hop blocks, {args.steps} steps/dispatch "
        f"({samples_per_dispatch / args.fs / 3600:.2f} stream-h each), "
        f"device {jax.devices()[0].device_kind}"
    )
    import jax.numpy as jnp

    max_first = None
    t0 = time.time()
    for d in range(args.dispatches):
        # fresh stats per dispatch: per-dispatch maxima, not a running
        # max, so downward drift is visible too (see module docstring)
        state, prev, stats = run(
            state, prev, (jnp.float32(0.0), jnp.int32(0))
        )
        mx, bad = float(stats[0]), int(stats[1])  # readback = true sync
        if bad:
            log(f"dispatch {d}: {bad} non-finite outputs — ABORT")
            print(json.dumps({
                "metric": "soak_stream_hours", "value": 0.0,
                "finite": False, "dispatch": d,
            }))
            return 1
        if max_first is None:
            max_first = mx
        log(
            f"dispatch {d + 1}/{args.dispatches}: max|out|={mx:.1f}, "
            f"finite, {(d + 1) * samples_per_dispatch / args.fs / 3600:.2f} "
            f"stream-h, {time.time() - t0:.0f}s wall"
        )
    hours = args.dispatches * samples_per_dispatch / args.fs / 3600
    drift = float(mx / max_first) if max_first else 1.0
    print(json.dumps({
        "metric": "soak_stream_hours",
        "value": round(hours, 2),
        "finite": True,
        "max_abs_first": round(max_first, 1),
        "max_abs_last": round(float(mx), 1),
        "drift_ratio": round(drift, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
