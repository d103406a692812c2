"""Live streaming runtime: native ring buffer -> TPU block feeder.

Composes the native SPSC ring (runtime/native.py) with the causal
streaming engine: a producer (audio callback, network source, the
virtual-mic scripts in scripts/) pushes samples into the input ring;
the feeder thread pops whole blocks of hops, runs one device dispatch
per block, and pushes separated stems into per-stem output rings.

This is the architecture the reference approximates with pinned
zero-copy buffers + a per-hop GPU launch (fakert.h:217-251); on TPU
the block granularity amortizes dispatch latency while the ring depth
bounds added latency to block_hops hops.
"""
from __future__ import annotations

import threading

import jax.numpy as jnp
import numpy as np

from ..drivers.realtime import HPRRealtime
from .native import RingBuffer, available

_STEMS = ("harmonic", "percussive", "residual")


class LiveStream:
    """Real-time separation service around HPRRealtime."""

    def __init__(
        self,
        fs: float,
        hop: int = 256,
        beta: float = 2.0,
        outputs: int = 0,
        block_hops: int = 16,
        ring_capacity: int = 1 << 16,
        **cfg_kw,
    ):
        if not available():
            raise RuntimeError(
                "native runtime unavailable; build with make -C native"
            )
        self.rt = HPRRealtime(fs, hop, beta, outputs=outputs, **cfg_kw)
        self.hop = hop
        self.block_hops = block_hops
        self.in_ring = RingBuffer(ring_capacity)
        self.out_rings = {k: RingBuffer(ring_capacity) for k in _STEMS}
        self._stop = threading.Event()
        self._ready = threading.Event()
        self._thread: threading.Thread | None = None
        self.blocks_processed = 0
        self.dropped_out_samples = 0

    # -- producer side (audio callback) --
    def push(self, samples: np.ndarray) -> int:
        return self.in_ring.write(samples)

    # -- consumer side --
    def pull(self, stem: str, n: int):
        return self.out_rings[stem].read(n)

    def warmup(self):
        """Compile + warm the engine (tens of seconds on first use)."""
        if not self._ready.is_set():
            self.rt.warmup(block_sizes=(self.block_hops,))
            self._ready.set()
        return self

    def poll(self) -> bool:
        """Cooperative mode: process at most one pending block on the
        calling thread. Returns True if a block was processed. Use
        this from the application loop when the JAX runtime must be
        driven from the main thread (some dev-tunnel runtimes deadlock
        device dispatch on worker threads)."""
        n = self.block_hops * self.hop
        block = self.in_ring.read(n)
        if block is None:
            return False
        outs = np.asarray(
            self.rt.process_block(jnp.asarray(block.reshape(-1, self.hop)))
        )
        for i, k in enumerate(_STEMS):
            wrote = self.out_rings[k].write(outs[i])
            if wrote != len(outs[i]):
                # a lagging consumer lost samples: every later pull is
                # time-shifted — surface it instead of silently
                # desynchronizing the stream
                self.dropped_out_samples += len(outs[i]) - wrote
        self.blocks_processed += 1
        return True

    def _run(self):
        self.warmup()
        while not self._stop.is_set():
            if not self.poll():
                self._stop.wait(0.0005)

    def start(self, wait_ready: bool = True, timeout: float = 300.0):
        """Start the feeder thread; by default block until the engine
        is compiled and warmed (first XLA compile takes tens of
        seconds — a real-time producer must not start before that)."""
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        if wait_ready and not self._ready.wait(timeout):
            raise RuntimeError("LiveStream warmup did not complete")
        return self

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
