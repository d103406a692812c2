"""Headline benchmark: causal streaming HPR at the hop-1024 sweet spot.

Reference baseline (BASELINE.md): ~160 us of GPU compute per 10 ms of
input on an RTX 2070 SUPER (README.md:50); the flagship metric is
microseconds of device compute per 10 ms of audio for the realtime
HPR path (hop 1024 @ 44.1 kHz, percussive output, hard mask, wrap
border — `zen fakert --hps 1024 2.0`).

Prints ONE JSON line:
  {"metric": "us_per_10ms_hop1024_hpr", "value": ..., "unit": "us",
   "vs_baseline": <baseline_us / ours — speedup factor, >1 is faster>}

Methodology: every iteration's *input* mixes in the previous
iteration's *output* (full data dependence), and the final output is
read back to the host — wall time cannot hide behind async dispatch
or any relay-side completion shortcuts. Streaming granularity is 32
hops per device dispatch (the TPU-idiomatic unit; per-hop host
round-trips are a GPU idiom the north star forbids). Secondary
numbers (single-hop latency, other configs) go to stderr.
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


def time_stream(cfg, block_hops, iters=40):
    """Steady-state wall time per hop, fully output-chained."""
    from zen_tpu.drivers.realtime import block_step, init_state

    rng = np.random.default_rng(0)
    base = jnp.asarray(
        rng.standard_normal((block_hops, cfg.hop)).astype(np.float32)
    )
    state = init_state(cfg)

    @jax.jit
    def step(state, block, prev):
        # chain the previous output into the input: full data dependence
        block = block + 1e-12 * prev[1].reshape(block_hops, cfg.hop)
        state, outs = block_step(cfg, state, block)
        return state, outs

    prev = jnp.zeros((3, block_hops * cfg.hop), jnp.float32)
    for _ in range(8):  # compile + warm thoroughly (first chained
        # iterations after compile carry lazy-init overhead)
        state, prev = step(state, base, prev)
    float(jnp.sum(prev))  # forced readback
    t0 = time.perf_counter()
    for _ in range(iters):
        state, prev = step(state, base, prev)
    checksum = float(jnp.sum(prev))  # forces completion of the chain
    t1 = time.perf_counter()
    assert np.isfinite(checksum)
    return 1e6 * (t1 - t0) / (iters * block_hops)


def main():
    from zen_tpu import HPRConfig, OUTPUT_PERCUSSIVE

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")

    cfg = HPRConfig(
        fs=FS, hop=HOP, beta=2.0, causal=True, outputs=OUTPUT_PERCUSSIVE
    )
    us_per_hop = time_stream(cfg, BLOCK_HOPS)
    hop_ms = 1000.0 * HOP / FS
    us_per_10ms = us_per_hop * (10.0 / hop_ms)
    rtf = us_per_hop / (hop_ms * 1000.0)
    log(
        f"hop-1024 stream: {us_per_hop:.1f} us/hop "
        f"({us_per_10ms:.1f} us per 10ms of audio, RTF={rtf:.5f}, "
        f"block={BLOCK_HOPS} hops, median_impl=auto)"
    )

    us_single = time_stream(cfg, 1, iters=100)
    log(f"hop-1024 single-hop latency: {us_single:.1f} us/hop")

    # secondary: the reference's default fakert config (hop 256)
    cfg256 = HPRConfig(
        fs=FS, hop=256, beta=2.0, causal=True, outputs=OUTPUT_PERCUSSIVE
    )
    us256 = time_stream(cfg256, 128, iters=20)
    log(
        f"hop-256 stream: {us256:.1f} us/hop "
        f"(budget 5805 us, reference: 173.99 us/hop)"
    )

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
