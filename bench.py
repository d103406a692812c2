"""Headline benchmark: causal streaming HPR at the hop-1024 sweet spot.

Reference baseline (BASELINE.md): ~160 us of GPU compute per 10 ms of
input on an RTX 2070 SUPER (README.md:50); the flagship metric is
microseconds of device compute per 10 ms of audio for the realtime
HPR path (hop 1024 @ 44.1 kHz, percussive output, hard mask, wrap
border — `zen fakert --hps 1024 2.0`).

Prints ONE JSON line:
  {"metric": "us_per_10ms_hop1024_hpr", "value": ..., "unit": "us",
   "vs_baseline": <baseline_us / ours — speedup factor, >1 is faster>}

Methodology (shaped by this environment's measurement hazards, each
verified experimentally):

* Chained work: every scan iteration's input mixes in the previous
  iteration's output, so neither XLA nor any relay-side result cache
  can skip iterations.
* Readback-synced: jax.block_until_ready does NOT wait on the axon
  tunnel runtime (returns in ~0.1 ms while the device is mid-compute),
  so every timed run ends with a value readback — the only true sync.
* Slope-timed: a synchronous readback costs a large, variable constant
  (~26 ms idle, seconds under load), so each metric is the SLOPE of
  best-of-N wall time between two scan lengths (e.g. 128 vs 2048
  steps). The sync constant and dispatch overhead cancel in the
  difference; linearity is sanity-checked with a third point in
  benches/. Per-dispatch latency is reported separately, labeled as
  tunnel-inclusive.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from zen_tpu.runtime.platform import pin_platform, wait_for_device

pin_platform()  # shared policy: scrub axon alias, honor ZEN_TPU_PLATFORM

BASELINE_US_PER_10MS = 160.0  # reference README.md:50
FS = 44100.0
HOP = 1024
BLOCK_HOPS = 32

# ZEN_TPU_BENCH_SMOKE=1: validate the COMPLETE bench code path (every
# metric + the JSON line) with tiny configs/scan lengths — runnable on
# the CPU backend in minutes, so a refactor can be proven round-end
# safe without the TPU tunnel. Numbers are meaningless; the JSON line
# carries "smoke": true.
SMOKE = os.environ.get("ZEN_TPU_BENCH_SMOKE") == "1"
if SMOKE:
    FS = 8000.0
    HOP = 128
    BLOCK_HOPS = 4


def _sc(n: int) -> int:
    """Scale a scan length down in smoke mode."""
    return max(2, n // 64) if SMOKE else n


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(tree) -> float:
    """True synchronization: value readback (block_until_ready is a
    no-op on the axon runtime). Returns the checksum read."""
    return float(jnp.sum(jax.tree.leaves(tree)[0]))


def slope_time(make_run, make_carry, n1, n2, repeats=6):
    """Seconds per scan iteration: (best T(n2) - best T(n1))/(n2-n1),
    each run readback-synced, best-of-repeats."""
    ts = {}
    for n in (n1, n2):
        run = make_run(n)
        carry = make_carry()
        carry = run(*carry)
        _sync(carry)  # compile + warm (incl. donated-layout recompile)
        best = float("inf")
        s = 0.0
        for _ in range(repeats):
            t0 = time.perf_counter()
            carry = run(*carry)
            s = _sync(carry)
            best = min(best, time.perf_counter() - t0)
        assert np.isfinite(s)
        ts[n] = best
    return (ts[n2] - ts[n1]) / (n2 - n1)


def stream_run_factory(cfg, block_hops):
    from zen_tpu.drivers.realtime import (
        _block_step_body,
        enabled_stems,
        init_state,
    )

    n_rows = len(enabled_stems(cfg))
    rng = np.random.default_rng(0)
    base = jnp.asarray(
        rng.standard_normal((block_hops, cfg.hop)).astype(np.float32)
    )

    def make_run(n):
        @jax.jit
        def run(state, prev):
            def step(carry, _):
                state, prev = carry
                block = base + 1e-12 * prev[-1].reshape(
                    block_hops, cfg.hop
                )
                return _block_step_body(cfg, state, block), None

            return jax.lax.scan(step, (state, prev), None, length=n)[0]

        return run

    def make_carry():
        return (
            init_state(cfg),
            jnp.zeros((n_rows, block_hops * cfg.hop), jnp.float32),
        )

    return make_run, make_carry


def time_stream(cfg, block_hops, n1=128, n2=1024):
    """True device us/hop for the chained causal stream."""
    make_run, make_carry = stream_run_factory(cfg, block_hops)
    per_iter = slope_time(make_run, make_carry, n1, n2)
    return 1e6 * per_iter / block_hops


def time_multistream(cfg, n_streams, block_hops, n1=16, n2=128):
    """Multi-channel throughput (samples/s/chip), slope-timed, with
    the same fft_impl override MultiStreamHPR applies (the vmapped
    step hides the channel dim from the DFT heuristic — measure the
    production path)."""
    from zen_tpu.drivers.realtime import (
        _block_step_body,
        enabled_stems,
        init_state,
        resolve_multistream_fft_impl,
    )

    cfg = resolve_multistream_fft_impl(cfg, n_streams)
    n_rows = len(enabled_stems(cfg))

    rng = np.random.default_rng(0)
    base = jnp.asarray(
        rng.standard_normal((n_streams, block_hops, cfg.hop)).astype(
            np.float32
        )
    )

    def make_run(n):
        @jax.jit
        def run(state, prev):
            def step(carry, _):
                state, prev = carry
                blocks = base + 1e-12 * prev[:, -1, :].reshape(
                    n_streams, block_hops, cfg.hop
                )
                state, outs = jax.vmap(
                    lambda s, b: _block_step_body(cfg, s, b)
                )(state, blocks)
                return (state, outs), None

            return jax.lax.scan(step, (state, prev), None, length=n)[0]

        return run

    def make_carry():
        return (
            jax.vmap(lambda _: init_state(cfg))(jnp.arange(n_streams)),
            jnp.zeros((n_streams, n_rows, block_hops * cfg.hop), jnp.float32),
        )

    per_iter = slope_time(make_run, make_carry, n1, n2)
    return n_streams * block_hops * cfg.hop / per_iter


def time_offline(n1=2, n2=10):
    """Offline 2-pass cascade, slope-timed by scanning chained clips
    through the fused two-pass program (drivers.offline._two_pass)."""
    from zen_tpu.drivers.offline import _bucket_len, _two_pass
    from zen_tpu import HPRConfig, OUTPUT_ALL, OUTPUT_PERCUSSIVE, OUTPUT_RESIDUAL

    length = 16000 if SMOKE else 161571  # reference README's 3.66 s clip
    cfg_h = HPRConfig(
        fs=FS,
        hop=512 if SMOKE else 4096,
        beta=2.0,
        causal=False,
        outputs=OUTPUT_ALL,
    )
    cfg_p = HPRConfig(
        fs=FS,
        hop=64 if SMOKE else 256,
        beta=2.0,
        causal=False,
        outputs=OUTPUT_PERCUSSIVE | OUTPUT_RESIDUAL,
    )
    nb = _bucket_len(length, cfg_h.hop)
    rng = np.random.default_rng(0)
    base = jnp.asarray(
        np.pad(
            rng.standard_normal(length).astype(np.float32),
            (0, nb - length),
        )
    )

    def make_run(n):
        @jax.jit
        def run(audio):
            def step(a, _):
                h, p, r = _two_pass(a, length, cfg_h, cfg_p)
                # chain ALL stems: an unused stem would let XLA
                # dead-code-eliminate its synthesis branch
                return base + 1e-12 * (h + p + r), None

            return (jax.lax.scan(step, audio, None, length=n)[0],)

        return run

    per_iter = slope_time(make_run, lambda: (base,), n1, n2, repeats=4)
    return per_iter * 1e3


def single_hop_latency(cfg, repeats=20):
    """Per-hop round trip incl. dispatch + sync readback — dominated
    by the axon tunnel here, reported for completeness."""
    from zen_tpu.drivers.realtime import block_step, init_state

    state = init_state(cfg)
    block = jnp.zeros((1, cfg.hop), jnp.float32)
    state, outs = block_step(cfg, state, block)
    _sync(outs)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, outs = block_step(cfg, state, block)
        _sync(outs)
        best = min(best, time.perf_counter() - t0)
    return best * 1e6


def main():
    from zen_tpu import HPRConfig, OUTPUT_PERCUSSIVE
    from zen_tpu.runtime.xla_cache import enable_compilation_cache

    enable_compilation_cache()
    # Fail fast (with retries) instead of hanging forever when the
    # axon tunnel is down — backend init is uninterruptible in-process.
    if not wait_for_device():
        log("FATAL: accelerator backend init timed out; not benchmarking")
        sys.exit(3)
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")

    cfg = HPRConfig(
        fs=FS, hop=HOP, beta=2.0, causal=True, outputs=OUTPUT_PERCUSSIVE
    )
    us_per_hop = time_stream(cfg, BLOCK_HOPS, n1=_sc(128), n2=_sc(1024))
    hop_ms = 1000.0 * HOP / FS
    us_per_10ms = us_per_hop * (10.0 / hop_ms)
    rtf = us_per_hop / (hop_ms * 1000.0)
    log(
        f"hop-1024 device compute: {us_per_hop:.2f} us/hop "
        f"({us_per_10ms:.2f} us per 10ms of audio, RTF={rtf:.6f}, "
        f"block={BLOCK_HOPS} hops, median_impl=auto)"
    )

    # secondary: the reference's default fakert config (hop 256)
    cfg256 = HPRConfig(
        fs=FS,
        hop=64 if SMOKE else 256,
        beta=2.0,
        causal=True,
        outputs=OUTPUT_PERCUSSIVE,
    )
    us256 = time_stream(cfg256, 8 if SMOKE else 128, n1=_sc(64), n2=_sc(512))
    log(
        f"hop-256 stream: {us256:.2f} us/hop "
        f"(budget 5805 us, reference: 173.99 us/hop)"
    )

    # secondary: BASELINE configs[2] — soft-mask Wiener and SSE
    # (moving-average FilterBox) variants at the sweet-spot hop
    for name, kw in (
        ("soft-mask", dict(soft_mask=True)),
        ("sse", dict(use_sse=True)),
    ):
        cfg_v = HPRConfig(
            fs=FS,
            hop=HOP,
            beta=2.0,
            causal=True,
            outputs=OUTPUT_PERCUSSIVE,
            **kw,
        )
        us_v = time_stream(cfg_v, BLOCK_HOPS, n1=_sc(64), n2=_sc(512))
        log(
            f"hop-1024 {name} variant: {us_v:.2f} us/hop "
            f"({us_v * 10 / hop_ms:.2f} us per 10ms)"
        )

    # secondary: BASELINE configs[3] — batched multi-channel fakert
    n_streams = 4 if SMOKE else 64
    sps = time_multistream(
        cfg256, n_streams, 4 if SMOKE else 32,
        n1=_sc(16), n2=max(3, _sc(128)),
    )
    log(
        f"multichannel {n_streams}x hop-{cfg256.hop}: "
        f"{sps / 1e6:.0f} Msamples/s/chip "
        f"= {sps / FS:.0f} realtime 44.1 kHz streams/chip"
    )

    # secondary: offline 2-pass on the reference clip size
    off_ms = time_offline()
    log(
        f"offline 2-pass 3.66s clip: {off_ms:.1f} ms device compute "
        f"(reference transcript: 487 ms)"
    )

    lat = single_hop_latency(cfg, repeats=2 if SMOKE else 20)
    log(
        f"hop-1024 single-hop round trip (incl. tunnel sync): "
        f"{lat:.0f} us"
    )

    line = {
        "metric": "us_per_10ms_hop1024_hpr",
        "value": round(us_per_10ms, 2),
        "unit": "us",
        "vs_baseline": round(BASELINE_US_PER_10MS / us_per_10ms, 3),
    }
    if SMOKE:
        line["smoke"] = True  # tiny-config path validation, not a number
    print(json.dumps(line))


if __name__ == "__main__":
    main()
