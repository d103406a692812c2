"""Pipeline-parallel 2-pass HPR-I over a stream of tracks.

SURVEY.md §2.3 PP: the two cascade passes (hop_h pass feeding the
hop_p pass, hps.cu:128-221) have independent state, so a track stream
pipelines naturally: pass 1 of track i+1 runs on device group A while
pass 2 of track i runs on group B. JAX's async dispatch provides the
overlap — the driver never blocks between stages; each stage is
jitted and pinned to its device.

On a single chip this degrades gracefully to sequential execution;
the structure is what the pipeline axis of a pod slice uses.
"""
from __future__ import annotations

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

    def process_stream(self, tracks):
        """tracks: iterable of [L] float arrays. Yields (h, p, r) per
        track, with stage overlap via async dispatch."""
        inflight = []  # (length, pass1 dict) awaiting pass 2
        for audio in tracks:
            audio = jnp.asarray(audio, jnp.float32)
            length = audio.shape[-1]
            p1 = self._pass(audio, self.cfg_h, self.dev_a, length)
            inter = p1["percussive"] + p1["residual"]
            p2 = self._pass(inter, self.cfg_p, self.dev_b, length)
            inflight.append((p1["harmonic"], p2))
            # drain lazily: keep at most 2 tracks in flight
            if len(inflight) > 1:
                h, p2d = inflight.pop(0)
                yield h, p2d["percussive"], p2d["residual"]
        for h, p2d in inflight:
            yield h, p2d["percussive"], p2d["residual"]
