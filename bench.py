"""Headline benchmark: causal streaming HPR at the hop-1024 sweet spot.

Reference baseline (BASELINE.md): ~160 us of GPU compute per 10 ms of
input on an RTX 2070 SUPER (README.md:50); the flagship metric is
microseconds of device compute per 10 ms of audio for the realtime
HPR path (hop 1024 @ 44.1 kHz, percussive output, hard mask, wrap
border — `zen fakert --hps 1024 2.0`).

Prints ONE JSON line:
  {"metric": "us_per_10ms_hop1024_hpr", "value": ..., "unit": "us",
   "vs_baseline": <baseline_us / ours — speedup factor, >1 is faster>}

Streaming granularity: 32 hops per device dispatch (the TPU-idiomatic
unit; per-hop host round-trips are a GPU idiom the north star forbids).
Per-hop latency and other configs are reported on stderr.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_US_PER_10MS = 160.0  # reference README.md:50
FS = 44100.0
HOP = 1024
BLOCK_HOPS = 32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_stream(rt, blocks, iters=20):
    """Steady-state wall time per hop over pre-staged device blocks."""
    from zen_tpu.drivers.realtime import block_step

    state = rt.state
    # warm
    for b in blocks[:2]:
        state, out = block_step(rt.cfg, state, b)
    jax.block_until_ready(out)
    n_hops = 0
    t0 = time.perf_counter()
    for _ in range(iters):
        for b in blocks:
            state, out = block_step(rt.cfg, state, b)
            n_hops += b.shape[0]
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    return 1e6 * (t1 - t0) / n_hops


def main():
    from zen_tpu import HPRRealtime, OUTPUT_PERCUSSIVE

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")

    rng = np.random.default_rng(0)
    n_blocks = 8
    audio = rng.standard_normal((n_blocks, BLOCK_HOPS, HOP)).astype(np.float32)
    blocks = [jax.device_put(jnp.asarray(a), dev) for a in audio]

    rt = HPRRealtime(FS, HOP, 2.0, outputs=OUTPUT_PERCUSSIVE)
    us_per_hop = time_stream(rt, blocks)
    hop_ms = 1000.0 * HOP / FS
    us_per_10ms = us_per_hop * (10.0 / hop_ms)
    rtf = us_per_hop / (hop_ms * 1000.0)
    log(
        f"hop-1024 stream: {us_per_hop:.1f} us/hop "
        f"({us_per_10ms:.1f} us per 10ms of audio, RTF={rtf:.5f}, "
        f"block={BLOCK_HOPS} hops)"
    )

    # secondary: single-hop dispatch latency (the latency-critical path)
    rt1 = HPRRealtime(FS, HOP, 2.0, outputs=OUTPUT_PERCUSSIVE)
    single = [
        jax.device_put(jnp.asarray(a[:1]), dev) for a in audio
    ]
    us_single = time_stream(rt1, single, iters=20)
    log(f"hop-1024 single-hop latency: {us_single:.1f} us/hop")

    print(
        json.dumps(
            {
                "metric": "us_per_10ms_hop1024_hpr",
                "value": round(us_per_10ms, 2),
                "unit": "us",
                "vs_baseline": round(BASELINE_US_PER_10MS / us_per_10ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
