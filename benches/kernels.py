"""Kernel microbenchmark sweep — the google-benchmark analog.

Replicates the reference's bench design (SURVEY.md §4.6): size sweeps
with RangeMultiplier(2) over the hot ops (FFT fwd/bwd/roundtrip,
median time/frequency, full HPR block step), each in _MEM (including
host<->device transfer) and _NOMEM (device-resident) variants
(reference: libzen/{fftw,mfilt,hps}.bench.cu).

Methodology: NOMEM timings are fully output-chained with a final host
readback (async dispatch and relay completion shortcuts cannot hide
work); MEM timings feed fresh host buffers per iteration and read the
result back.

Usage: python benches/kernels.py [--csv out.csv]
"""
from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


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


def run(csv=None):
    from zen_tpu.ops.median import sliding_median
    from zen_tpu.ops.median_pallas import (
        sliding_median_last_axis_pallas,
        tap_median_time_pallas,
    )

    rng = np.random.default_rng(0)
    rows = []

    def report(name, ms):
        rows.append((name, ms))
        print(f"{name:<48s} {ms:10.4f} ms", flush=True)

    # --- FFT sweep (fftw.bench.cu analog): sizes 2^8..2^14 ---
    fft_pts = []
    for p in range(8, 15):
        n = 1 << p
        t = max(1, (1 << 22) // n)  # ~4M elements per call
        x = jnp.asarray(rng.standard_normal((t, n)).astype(np.float32))
        f_fwd = jax.jit(lambda v: jnp.fft.irfft(jnp.fft.rfft(v, axis=-1), n=v.shape[-1], axis=-1))
        ms = chain_time(f_fwd, x)
        fft_pts.append((n, ms / t))  # per-row ms at length n
        report(f"fft_roundtrip_NOMEM/{n}x{t}", ms)

    # Complexity() fitting analog (google-benchmark): least-squares
    # exponent of per-row time vs transform length
    ln = np.log([p[0] for p in fft_pts])
    lt = np.log([max(p[1], 1e-9) for p in fft_pts])
    b, a = np.polyfit(ln, lt, 1)
    print(f"fft per-row complexity fit: t ~ n^{b:.2f}  (n log n ~ 1.1)")

    # --- median sweep (mfilt.bench.cu analog) ---
    for (t, f, k) in [(5180, 513, 13), (1296, 2049, 47), (330, 8193, 187)]:
        fm = k // 2
        x = jnp.asarray(rng.standard_normal((t, f)).astype(np.float32))
        xla = jax.jit(
            lambda v: sliding_median(v, list(range(-fm, fm + 1)), -1, "reflect")
        )
        pal = jax.jit(
            lambda v: sliding_median_last_axis_pallas(
                jnp.pad(v, ((0, 0), (fm, fm)), mode="reflect"), k
            )
        )
        report(f"median_freq_xla_NOMEM/K{k}_{t}x{f}", chain_time(xla, x))
        report(f"median_freq_pallas_NOMEM/K{k}_{t}x{f}", chain_time(pal, x))
        report(
            f"median_freq_pallas_MEM/K{k}_{t}x{f}",
            mem_time(
                pal,
                lambda t=t, f=f: rng.standard_normal((t, f)).astype(np.float32),
            ),
        )

    # time-direction taps
    x = jnp.asarray(rng.standard_normal((5180, 513)).astype(np.float32))
    offs = tuple(range(-5, 6))
    xla = jax.jit(lambda v: sliding_median(v, list(offs), -2, "zero"))
    pal = jax.jit(lambda v: tap_median_time_pallas(v, offs))
    report("median_time_xla_NOMEM/K11_5180x513", chain_time(xla, x))
    report("median_time_pallas_NOMEM/K11_5180x513", chain_time(pal, x))

    # --- full HPR block step (hps.bench.cu analog) ---
    # shares bench.py's slope-timing machinery so methodology fixes
    # propagate to both harnesses
    import bench as bench_mod
    from zen_tpu import HPRConfig, OUTPUT_PERCUSSIVE

    for hop in (256, 1024, 4096):
        cfg = HPRConfig(
            fs=44100.0, hop=hop, beta=2.0, causal=True, outputs=OUTPUT_PERCUSSIVE
        )
        b = 32
        make_run, make_carry = bench_mod.stream_run_factory(cfg, b)
        per_iter = bench_mod.slope_time(make_run, make_carry, 16, 128)
        report(f"hpr_block_step_NOMEM/hop{hop}x{b}", per_iter * 1e3)

    if csv:
        with open(csv, "w") as fh:
            fh.write("name,ms\n")
            for name, ms in rows:
                fh.write(f"{name},{ms}\n")
        print(f"wrote {csv}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None)
    run(**vars(ap.parse_args()))
