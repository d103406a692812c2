"""Device mesh construction and multi-host bootstrap.

The reference is single-process/single-GPU (SURVEY.md §2.3); pod-scale
execution is a capability this rebuild adds. This module is the thin
"communication backend": mesh construction over ICI/DCN and
jax.distributed bootstrap. The collectives themselves (ppermute halo
exchange, psum) live in the sharded drivers (parallel/sharded.py).

Axis conventions:
  dp — data parallel over independent audio channels/streams/tracks
  sp — sequence (time-block) parallel with STFT-frame halo exchange
  tp — tensor parallel over frequency bins (bin-halo exchange + psum)
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(axes: dict, devices=None) -> Mesh:
    """Build a Mesh from {'axis': size}. Sizes must multiply to the
    device count used. axes order = mesh axis order (majorest first,
    so dp should lead: time halos then ride the fastest-varying —
    innermost, ICI-adjacent — axis)."""
    names = tuple(axes.keys())
    sizes = tuple(axes.values())
    if devices is None:
        n = int(np.prod(sizes))
        devices = jax.devices()[:n]
    devs = np.asarray(devices).reshape(sizes)
    return Mesh(devs, names)


def distributed_init(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bootstrap (DCN): jax.distributed.initialize wrapper.
    No-op when already initialized or when args are absent and the
    environment provides no cluster config."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def default_mesh(n_channels_hint: int = 0) -> Mesh:
    """A sensible mesh over all visible devices: channels over dp when
    the workload has at least as many channels, else everything on sp."""
    n = len(jax.devices())
    if n_channels_hint >= n:
        return make_mesh({"dp": n, "sp": 1})
    dp = 1
    if n_channels_hint:
        dp = max(d for d in range(1, n + 1) if n % d == 0 and d <= n_channels_hint)
    return make_mesh({"dp": dp, "sp": n // dp})
