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
iteration's *output* (full data dependence — async dispatch and any
relay-side result caching cannot skip work), timing is closed by a
completion barrier (block_until_ready), and the checksum is read back
once *outside* the clock: a device->host value fetch costs a constant
~26 ms over the axon tunnel and would otherwise swamp every number.
Streaming granularity is 32 hops per device dispatch (the
TPU-idiomatic unit; per-hop host round-trips are a GPU idiom the
north star forbids). Secondary numbers (single-hop latency, other
configs) go to stderr.
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


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def time_stream(cfg, block_hops, iters=40, repeats=5):
    """Steady-state wall time per hop, fully output-chained, including
    per-block dispatch (the honest streaming cost). Best of ``repeats``
    timed runs — the axon tunnel adds multi-ms RTT jitter per dispatch
    that min-of-repeats filters out."""
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
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, prev = step(state, base, prev)
        jax.block_until_ready(prev)  # completion barrier: waits on
        # the full chain without paying the ~26 ms tunnel readback
        t1 = time.perf_counter()
        best = min(best, t1 - t0)
    assert np.isfinite(float(jnp.sum(prev)))  # checksum outside the clock
    return 1e6 * best / (iters * block_hops)


def time_stream_scan(cfg, block_hops, iters=64, repeats=5):
    """Device-resident us/hop: the whole chained run is ONE lax.scan
    dispatch (the north star's 'no host round-trips per hop' form).
    Chaining each block's input on the previous block's output forces
    every step to execute serially; the final readback closes the
    chain. This isolates TPU compute from the axon-tunnel RTT, which
    per-dispatch timing cannot (multi-ms ambient jitter)."""
    from zen_tpu.drivers.realtime import _block_step_body, init_state

    rng = np.random.default_rng(0)
    base = jnp.asarray(
        rng.standard_normal((block_hops, cfg.hop)).astype(np.float32)
    )
    state = init_state(cfg)
    prev = jnp.zeros((3, block_hops * cfg.hop), jnp.float32)

    @jax.jit
    def run(state, prev):
        def step(carry, _):
            state, prev = carry
            block = base + 1e-12 * prev[1].reshape(block_hops, cfg.hop)
            state, outs = _block_step_body(cfg, state, block)
            return (state, outs), None

        (state, prev), _ = jax.lax.scan(
            step, (state, prev), None, length=iters
        )
        return state, prev

    state, prev = run(state, prev)
    float(jnp.sum(prev))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, prev = run(state, prev)
        jax.block_until_ready(prev)
        t1 = time.perf_counter()
        best = min(best, t1 - t0)
    assert np.isfinite(float(jnp.sum(prev)))
    return 1e6 * best / (iters * block_hops)


def time_multistream(cfg, n_streams, block_hops, iters=50, repeats=5):
    """Steady-state multi-channel throughput (samples/s/chip).

    Device-resident: the whole chained run is one lax.scan dispatch
    (a throughput workload amortizes host round-trips by design; the
    chain through state+output still forces every step to execute),
    so the axon-tunnel RTT does not pollute the number. Best of
    ``repeats`` runs."""
    from zen_tpu.drivers.realtime import _block_step_body, init_state

    rng = np.random.default_rng(0)
    base = jnp.asarray(
        rng.standard_normal((n_streams, block_hops, cfg.hop)).astype(
            np.float32
        )
    )
    state = jax.vmap(lambda _: init_state(cfg))(jnp.arange(n_streams))
    prev = jnp.zeros((n_streams, 3, block_hops * cfg.hop), jnp.float32)

    @jax.jit
    def run(state, prev):
        def step(carry, _):
            state, prev = carry
            blocks = base + 1e-12 * prev[:, 1, :].reshape(
                n_streams, block_hops, cfg.hop
            )
            state, outs = jax.vmap(
                lambda s, b: _block_step_body(cfg, s, b)
            )(state, blocks)
            return (state, outs), None

        (state, prev), _ = jax.lax.scan(
            step, (state, prev), None, length=iters
        )
        return state, prev

    state, prev = run(state, prev)  # compile + warm
    float(jnp.sum(prev))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, prev = run(state, prev)
        jax.block_until_ready(prev)
        t1 = time.perf_counter()
        best = min(best, t1 - t0)
    assert np.isfinite(float(jnp.sum(prev)))
    return n_streams * block_hops * cfg.hop * iters / best


def main():
    from zen_tpu import HPRConfig, OUTPUT_PERCUSSIVE
    from zen_tpu.runtime.xla_cache import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")

    cfg = HPRConfig(
        fs=FS, hop=HOP, beta=2.0, causal=True, outputs=OUTPUT_PERCUSSIVE
    )
    us_per_hop = time_stream_scan(cfg, BLOCK_HOPS)
    hop_ms = 1000.0 * HOP / FS
    us_per_10ms = us_per_hop * (10.0 / hop_ms)
    rtf = us_per_hop / (hop_ms * 1000.0)
    log(
        f"hop-1024 device-resident: {us_per_hop:.1f} us/hop "
        f"({us_per_10ms:.1f} us per 10ms of audio, RTF={rtf:.5f}, "
        f"block={BLOCK_HOPS} hops, median_impl=auto)"
    )

    us_disp = time_stream(cfg, BLOCK_HOPS)
    log(
        f"hop-1024 per-dispatch streaming (incl. tunnel RTT): "
        f"{us_disp:.1f} us/hop"
    )

    us_single = time_stream(cfg, 1, iters=100, repeats=3)
    log(f"hop-1024 single-hop dispatch latency: {us_single:.1f} us/hop")

    # secondary: the reference's default fakert config (hop 256)
    cfg256 = HPRConfig(
        fs=FS, hop=256, beta=2.0, causal=True, outputs=OUTPUT_PERCUSSIVE
    )
    us256 = time_stream(cfg256, 128, iters=20)
    log(
        f"hop-256 stream: {us256:.1f} us/hop "
        f"(budget 5805 us, reference: 173.99 us/hop)"
    )

    # secondary: BASELINE configs[3] — batched multi-channel fakert,
    # 64 causal hop-256 streams in one device program
    sps = time_multistream(cfg256, 64, 32)
    log(
        f"multichannel 64x hop-256: {sps / 1e6:.0f} Msamples/s/chip "
        f"= {sps / FS:.0f} realtime 44.1 kHz streams/chip"
    )

    # secondary: offline 2-pass HPR-I on the reference README's 3.66 s
    # clip size (161571 samples, hops 4096/256; reference: 487 ms)
    from zen_tpu.drivers.offline import HPRIOffline

    # device-resident DISTINCT inputs per repeat: identical
    # (executable, inputs) pairs can be served from relay-side caches
    rng = np.random.default_rng(0)
    audios = [
        jnp.asarray(rng.standard_normal(161571).astype(np.float32))
        for _ in range(6)
    ]
    sep = HPRIOffline(FS, 4096, 256, 2.0, 2.0)
    jax.block_until_ready(sep.process(audios[0]))  # compile
    best = min(
        _timed(lambda a=a: jax.block_until_ready(sep.process(a)))
        for a in audios[1:]
    )
    log(
        f"offline 2-pass 3.66s clip: {best * 1e3:.1f} ms "
        f"(reference transcript: 487 ms)"
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
