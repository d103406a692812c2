"""Kernel microbenchmark sweep — the google-benchmark analog.

Replicates the reference's bench design (SURVEY.md §4.6) at the
reference's breadth: RangeMultiplier(2) size sweeps 2^5..2^14 over the
hot ops (FFT fwd/bwd/roundtrip, median frequency/time at every HPR K,
full HPR block step), each in _MEM (including host<->device transfer)
and _NOMEM (device-resident) variants, with a Complexity() fit per op
(reference: libzen/{fftw,mfilt,hps}.bench.cu:222-284).

The pallas medians are benched in BOTH network variants (cse = the
shift-normalized shared network, taps = per-tap slices) so the
_DEFAULT_CSE choice in ops/median_pallas.py stays measurement-backed,
and the xla path runs alongside so the median_impl='auto' crossover
is re-derivable from the CSV artifact (benches/kernels_r{N}.csv is
checked in per round).

Methodology: NOMEM timings are fully output-chained with a final host
readback (async dispatch and relay completion shortcuts cannot hide
work); MEM timings feed fresh host buffers per iteration and read the
result back.

Usage: python benches/kernels.py [--csv out.csv] [--quick]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zen_tpu.runtime.platform import pin_platform  # noqa: E402

pin_platform()  # shared policy: scrub axon alias, honor ZEN_TPU_PLATFORM


def chain_time(f, x, n1=16, n2=128, repeats=5):
    """Output-chained device ms/call — delegates to the library's
    slope timer (zen_tpu.runtime.profiling.scan_slope_ms) so the
    subtle methodology (readback sync, chaining, best-of-N slope)
    has a single source of truth. f must be shape-preserving."""
    from zen_tpu.runtime.profiling import scan_slope_ms

    return scan_slope_ms(f, x, n1=n1, n2=n2, repeats=repeats)


def mem_time(f, make_host, iters=10):
    """Fresh host buffer -> device -> compute -> host per iteration.
    NOTE: in this environment the host<->device path crosses the axon
    tunnel, so this measures tunnel bandwidth more than PCIe/DMA; the
    reference's _MEM/_NOMEM split is preserved for completeness."""
    # pre-generate distinct buffers OUTSIDE the clock (host RNG for
    # millions of floats would otherwise contaminate the timing);
    # distinct per iteration so relay-side caches can't serve repeats
    pool = [make_host() for _ in range(iters)]
    y = np.asarray(f(jnp.asarray(pool[0])))
    t0 = time.perf_counter()
    for x in pool:
        y = np.asarray(f(jnp.asarray(x)))
    t1 = time.perf_counter()
    return (t1 - t0) / iters * 1e3


def fit_complexity(points):
    """google-benchmark Complexity() analog: least-squares exponent of
    time vs size over (n, ms) points."""
    pts = [(n, ms) for n, ms in points if ms > 0]
    if len(pts) < 3:
        return float("nan")
    ln = np.log([p[0] for p in pts])
    lt = np.log([p[1] for p in pts])
    b, _a = np.polyfit(ln, lt, 1)
    return float(b)


# the K values the HPR engine actually uses (l_perc/l_harm-derived) —
# benched exactly, like the reference benches its production filter
# lengths; 187 probes the large-K scaling limit of the networks
HPR_KS = (13, 47, 187)


def run_serving(csv=None, quick=False):
    """Serving-shape median A/B: the hot streaming/serving shapes the
    round-2 verdict flagged as relayout-bound, swept over the row-fold
    (round-3: leading dims + T -> one row axis) x layout grid. The
    data behind _auto_layout's crossover at folded row counts."""
    from zen_tpu.ops.median_pallas import sliding_median_last_axis_pallas

    rng = np.random.default_rng(0)
    rows = []
    reps = 3 if quick else 5

    def report(name, ms):
        rows.append((name, ms))
        print(f"{name:<52s} {ms:10.4f} ms", flush=True)

    # (C streams, T hops, F bins, K): the BASELINE serving/streaming
    # configs — 64-stream fakert at hop 256 (F=513, K=13) and hop 1024
    # (F=2049, K=47), plus their single-stream forms
    shapes = [
        (64, 32, 513, 13),
        (64, 32, 2049, 47),
        (1, 32, 513, 13),
        (1, 32, 2049, 47),
    ]
    variants = [
        (layout, fold)
        for layout in ("lane", "sublane")
        for fold in (True, False)
    ]
    # two interleaved passes over the whole grid, report the min:
    # ambient tunnel congestion drifts on minute scales, so a single
    # pass can bias a whole column (measurement-hazard memo)
    results: dict = {}
    for _pass in range(2):
        for c, t, f, k in shapes:
            fm = k // 2
            x = jnp.asarray(
                rng.standard_normal((c, t, f)).astype(np.float32)
            )
            # chain length scaled to the per-iter cost so the slope's
            # signal (~n2 x per-iter) clears the ~ms readback noise
            big = c * t * f > 10_000_000
            n1, n2 = (16, 256) if big else (64, 1024)
            for layout, fold in variants:
                fn = jax.jit(
                    lambda v, fm=fm, k=k, layout=layout, fold=fold:
                    sliding_median_last_axis_pallas(
                        jnp.pad(
                            v, ((0, 0), (0, 0), (fm, fm)), mode="reflect"
                        ),
                        k, layout=layout, fold=fold,
                    )
                )
                tag = f"{layout}{'_fold' if fold else ''}"
                name = f"median_freq_serving_{tag}_NOMEM/K{k}_{c}x{t}x{f}"
                ms = chain_time(fn, x, n1=n1, n2=n2, repeats=reps)
                results[name] = min(results.get(name, float("inf")), ms)
                print(f"pass{_pass} {name:<58s} {ms:10.4f} ms", flush=True)
    for name, ms in results.items():
        report(name, ms)
    if csv:
        with open(csv, "w") as fh:
            fh.write("name,ms\n")
            for name, ms in rows:
                fh.write(f"{name},{ms}\n")
        print(f"wrote {csv}")


def run(csv=None, quick=False):
    from zen_tpu.ops.median import sliding_median
    from zen_tpu.ops.median_pallas import (
        sliding_median_last_axis_pallas,
        tap_median_time_pallas,
    )

    rng = np.random.default_rng(0)
    rows = []
    on_tpu = jax.devices()[0].platform == "tpu"

    def report(name, ms, n=None):
        rows.append((name, ms))
        print(f"{name:<52s} {ms:10.4f} ms", flush=True)

    reps = 2 if quick else 5

    # ---- FFT sweep (fftw.bench.cu:233-284 analog): 2^5..2^14 ----
    # roundtrip = fwd+bwd chained (fwd-only isn't shape-preserving for
    # the chain); the separate fwd/bwd split comes from the c2c pair
    fft_fits = {}
    fft_pts = []
    for p in range(5, 15):
        n = 1 << p
        t = max(1, (1 << 22) // n)  # ~4M elements per call
        x = jnp.asarray(rng.standard_normal((t, n)).astype(np.float32))
        f_rt = jax.jit(
            lambda v: jnp.fft.irfft(
                jnp.fft.rfft(v, axis=-1), n=v.shape[-1], axis=-1
            )
        )
        ms = chain_time(f_rt, x, repeats=reps)
        fft_pts.append((n, ms / t))
        report(f"fft_roundtrip_NOMEM/{n}x{t}", ms)
        if p in (8, 11, 14):
            report(
                f"fft_roundtrip_MEM/{n}x{t}",
                mem_time(
                    f_rt,
                    lambda t=t, n=n: rng.standard_normal((t, n)).astype(
                        np.float32
                    ),
                ),
            )
    fft_fits["fft_roundtrip"] = fit_complexity(fft_pts)
    print(f"fft per-row complexity fit: t ~ n^{fft_fits['fft_roundtrip']:.2f}"
          "  (n log n ~ 1.1)")

    # ---- frequency-direction median sweep (mfilt.bench.cu analog) ----
    # F sweeps 2^5..2^14 at every HPR K; xla vs pallas(cse) vs
    # pallas(taps) — the data behind median_impl='auto' and
    # _DEFAULT_CSE
    med_fits = {}
    for k in HPR_KS:
        fm = k // 2
        pts_xla, pts_cse, pts_taps = [], [], []
        f_range = range(7, 15, 2) if quick else range(5, 15)
        for p in f_range:
            f = (1 << p) + 1  # odd bin counts, like nfft/2+1
            if f <= k:
                continue
            t = max(8, min(4096, (1 << 21) // f))
            x = jnp.asarray(
                rng.standard_normal((t, f)).astype(np.float32)
            )
            xla = jax.jit(
                lambda v, fm=fm: sliding_median(
                    v, list(range(-fm, fm + 1)), -1, "reflect"
                )
            )
            ms = chain_time(xla, x, repeats=reps)
            pts_xla.append((f, ms / t))
            report(f"median_freq_xla_NOMEM/K{k}_{t}x{f}", ms)
            if on_tpu:
                # default (sublane layout + cse network) vs the two
                # non-default axes — the data behind the layout and
                # network choices in ops/median_pallas.py
                for nm, kw, pts in (
                    # layouts EXPLICIT: auto would silently relabel
                    # rows after any heuristic change, corrupting the
                    # A/B data the heuristic is re-derived from
                    ("sub_cse", {"layout": "sublane"}, pts_cse),
                    ("sub_taps", {"cse": False, "layout": "sublane"},
                     pts_taps),
                    ("lane_cse", {"layout": "lane"}, None),
                ):
                    pal = jax.jit(
                        lambda v, fm=fm, k=k, kw=kw:
                        sliding_median_last_axis_pallas(
                            jnp.pad(v, ((0, 0), (fm, fm)), mode="reflect"),
                            k, **kw,
                        )
                    )
                    ms = chain_time(pal, x, repeats=reps)
                    if pts is not None:
                        pts.append((f, ms / t))
                    report(f"median_freq_pallas_{nm}_NOMEM/K{k}_{t}x{f}", ms)
            if p == 11:
                impl = (
                    (lambda v: sliding_median_last_axis_pallas(
                        jnp.pad(v, ((0, 0), (fm, fm)), mode="reflect"), k))
                    if on_tpu else xla
                )
                report(
                    f"median_freq_MEM/K{k}_{t}x{f}",
                    mem_time(
                        impl,
                        lambda t=t, f=f: rng.standard_normal((t, f)).astype(
                            np.float32
                        ),
                    ),
                )
        med_fits[f"median_freq_xla_K{k}"] = fit_complexity(pts_xla)
        if pts_cse:
            med_fits[f"median_freq_cse_K{k}"] = fit_complexity(pts_cse)

    # ---- time-direction median sweep ----
    for k in (5, 11, 21):
        half = k // 2
        offs = tuple(range(-half, half + 1))
        pts = []
        t_range = (8, 11, 14) if quick else range(5, 15)
        for p in t_range:
            t = 1 << p
            f = 513
            x = jnp.asarray(rng.standard_normal((t, f)).astype(np.float32))
            xla = jax.jit(lambda v: sliding_median(v, list(offs), -2, "zero"))
            ms = chain_time(xla, x, repeats=reps)
            pts.append((t, ms))
            report(f"median_time_xla_NOMEM/K{k}_{t}x{f}", ms)
            if on_tpu:
                for nm, cse in (("cse", True), ("taps", False)):
                    pal = jax.jit(
                        lambda v, offs=offs, cse=cse: tap_median_time_pallas(
                            v, offs, cse=cse
                        )
                    )
                    report(
                        f"median_time_pallas_{nm}_NOMEM/K{k}_{t}x{f}",
                        chain_time(pal, x, repeats=reps),
                    )
            if p == 11:
                report(
                    f"median_time_MEM/K{k}_{t}x{f}",
                    mem_time(
                        (jax.jit(lambda v: tap_median_time_pallas(v, offs))
                         if on_tpu else xla),
                        lambda t=t, f=f: rng.standard_normal((t, f)).astype(
                            np.float32
                        ),
                    ),
                )
        med_fits[f"median_time_xla_K{k}"] = fit_complexity(pts)

    # ---- transform-seam sweep: the data behind fft_impl='auto' ----
    # engine/spectral._dft_precision picks the MXU DFT for nfft<=2048
    # always and nfft=4096 only with >=256 frames; this sweep measures
    # both paths at the decision points so the thresholds stay
    # re-derivable from the CSV artifact
    if on_tpu:
        from zen_tpu.ops.fft import rfft_forward, rfft_forward_dft

        for nfft in (1024, 2048, 4096, 8192):
            nwin = nfft // 2
            for frames in (32, 256, 2048):
                x = jnp.asarray(
                    rng.standard_normal((frames, nwin)).astype(np.float32)
                )
                xla_f = jax.jit(
                    lambda v, nfft=nfft: jnp.abs(
                        rfft_forward(v, nfft)
                    )[..., : v.shape[-1]]
                )
                dft_f = jax.jit(
                    lambda v, nfft=nfft: jnp.abs(
                        rfft_forward_dft(v, nfft, jax.lax.Precision.HIGH)
                    )[..., : v.shape[-1]]
                )
                report(
                    f"rfft_xla_NOMEM/n{nfft}_T{frames}",
                    chain_time(xla_f, x, repeats=reps),
                )
                report(
                    f"rfft_dft_NOMEM/n{nfft}_T{frames}",
                    chain_time(dft_f, x, repeats=reps),
                )

    for name, b in {**fft_fits, **med_fits}.items():
        print(f"complexity fit {name}: t ~ n^{b:.2f}")

    # ---- full HPR block step (hps.bench.cu analog) ----
    import bench as bench_mod
    from zen_tpu import HPRConfig, OUTPUT_PERCUSSIVE

    for hop in (256, 1024, 4096):
        cfg = HPRConfig(
            fs=44100.0, hop=hop, beta=2.0, causal=True,
            outputs=OUTPUT_PERCUSSIVE,
        )
        b = 32
        make_run, make_carry = bench_mod.stream_run_factory(cfg, b)
        per_iter = bench_mod.slope_time(make_run, make_carry, 16, 128)
        report(f"hpr_block_step_NOMEM/hop{hop}x{b}", per_iter * 1e3)

    # c2c fwd/bwd separately (complex chain is shape-preserving).
    # LAST on purpose: some backends reject complex-FFT scans
    # (observed TPU UNIMPLEMENTED) and the failure can wedge the
    # process's device client — nothing below it may need the device
    try:
        xz = jnp.asarray(
            (rng.standard_normal((1024, 4096))
             + 1j * rng.standard_normal((1024, 4096))).astype(np.complex64)
        )
        report("fft_c2c_fwd_NOMEM/4096x1024",
               chain_time(jax.jit(lambda v: jnp.fft.fft(v, axis=-1)), xz,
                          repeats=reps))
        report("fft_c2c_bwd_NOMEM/4096x1024",
               chain_time(jax.jit(lambda v: jnp.fft.ifft(v, axis=-1)), xz,
                          repeats=reps))
    except Exception as e:  # noqa: BLE001
        print(f"fft_c2c benches skipped: {type(e).__name__}", flush=True)


    if csv:
        with open(csv, "w") as fh:
            fh.write("name,ms\n")
            for name, ms in rows:
                fh.write(f"{name},{ms}\n")
        print(f"wrote {csv}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument(
        "--serving", action="store_true",
        help="only the serving-shape median fold/layout A/B grid",
    )
    ns = vars(ap.parse_args())
    (run_serving if ns.pop("serving") else run)(**ns)
