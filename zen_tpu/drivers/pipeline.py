"""Pipeline-parallel 2-pass HPR-I over a stream of tracks.

SURVEY.md §2.3 PP: the two cascade passes (hop_h pass feeding the
hop_p pass, hps.cu:128-221) have independent state, so a track stream
pipelines naturally: pass 1 of track i+1 runs on device group A while
pass 2 of track i runs on group B.

Overlap mechanism: a dedicated stage-1 worker thread feeding a
bounded queue. Async dispatch alone is NOT sufficient — the CPU
backend executes a jitted call synchronously on the dispatching host
thread (measured: two devices' programs dispatched from one thread
serialize exactly; from two threads they overlap perfectly), and the
round-2 overlap test (tests/test_runtime.py, injected per-stage
delays) would catch any regression to enqueue-only "overlap". On TPU
the extra thread is harmless (dispatch is cheap; execution is async
either way).

On a single chip this degrades gracefully to sequential execution;
the structure is what the pipeline axis of a pod slice uses.
"""
from __future__ import annotations

import queue
import threading

import jax
import jax.numpy as jnp

from ..engine.config import HPRConfig
from .offline import _offline_pass


class PipelinedHPRIOffline:
    """2-pass HPR-I with the passes placed on two devices."""

    def __init__(
        self,
        cfg_h: HPRConfig,
        cfg_p: HPRConfig,
        devices=None,
    ):
        self.cfg_h = cfg_h
        self.cfg_p = cfg_p
        devs = devices or jax.devices()
        self.dev_a = devs[0]
        self.dev_b = devs[1 % len(devs)]

    def _pass(self, audio, cfg, device, length):
        from .offline import _bucket_len

        # power-of-two length buckets (as HPRIOffline): without them
        # every distinct track length would recompile both stage
        # programs, dwarfing the pipeline overlap this driver provides
        nb = _bucket_len(length, cfg.hop)
        n_frames = nb // cfg.hop + cfg.lag
        padded = jnp.pad(audio, (0, n_frames * cfg.hop - length))
        padded = jax.device_put(padded, device)
        outs = _offline_pass(padded, cfg, n_frames, nb)
        return {k: v[..., :length] for k, v in outs.items()}

    def process_stream(self, tracks, prefetch: int = 2):
        """tracks: iterable of [L] float arrays. Yields (h, p, r) per
        track. Pass 1 of track i+1 runs on dev_a (worker thread) while
        this thread runs pass 2 of track i on dev_b; ``prefetch``
        bounds the tracks in flight (backpressure on the worker)."""
        q: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
        DONE, ERR = object(), object()
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that aborts when the consumer is gone — an
            # abandoned generator must not leave this thread blocked
            # forever pinning prefetched device buffers
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def stage1():
            try:
                for audio in tracks:
                    if stop.is_set():
                        return
                    a = jnp.asarray(audio, jnp.float32)
                    length = a.shape[-1]
                    p1 = self._pass(a, self.cfg_h, self.dev_a, length)
                    inter = p1["percussive"] + p1["residual"]
                    # materialize on THIS thread: the blocking part of
                    # a CPU-backend dispatch must not land on the
                    # consumer thread, or the pipeline re-serializes
                    jax.block_until_ready(inter)
                    if not put((p1["harmonic"], inter, length)):
                        return
                put(DONE)
            except BaseException as e:  # propagate to the consumer
                put((ERR, e))

        t = threading.Thread(target=stage1, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is DONE:
                    break
                if isinstance(item, tuple) and item[0] is ERR:
                    raise item[1]
                h, inter, length = item
                p2 = self._pass(inter, self.cfg_p, self.dev_b, length)
                yield h, p2["percussive"], p2["residual"]
        finally:
            stop.set()
            while True:  # unblock a worker stuck mid-put
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5.0)
