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

Axis ORDER is load-bearing: axes dict insertion order = mesh axis
order, and the LAST axis is the fastest-varying one, which
mesh_utils.create_device_mesh lays onto physically adjacent chips
(ICI neighbors on a TPU torus). Callers therefore put dp first and
sp/tp last, so the per-pass neighbor ppermutes (the only collectives
with a locality requirement) ride ICI links, while dp — which has
zero collectives in the hop step — absorbs the DCN splits in
multi-host meshes (create_hybrid_device_mesh below).
"""
from __future__ import annotations

import math

import numpy as np

import jax
from jax.sharding import Mesh

from ..errors import ZenError


def _split_dcn(sizes: tuple, n_proc: int) -> tuple:
    """Factor the process count into the LEADING mesh axes: returns
    (dcn_shape, per_host_shape) with elementwise product == sizes and
    prod(dcn_shape) == n_proc. Greedy left-to-right, so dp absorbs the
    cross-host split first and the trailing (halo-exchanging) axes
    stay intact within a host. Raises when the factorization doesn't
    exist (caller falls back to enumeration-order reshape)."""
    dcn = []
    r = n_proc
    for s in sizes:
        f = math.gcd(r, s)
        dcn.append(f)
        r //= f
    if r != 1:
        raise ZenError(
            f"process count {n_proc} does not factor into mesh axes {sizes}"
        )
    per_host = tuple(s // f for s, f in zip(sizes, dcn))
    return tuple(dcn), per_host


def make_mesh(axes: dict, devices=None) -> Mesh:
    """Build a Mesh from {'axis': size}, topology-aware.

    Single-host: mesh_utils.create_device_mesh orders the devices so
    the innermost (last) axis steps between physically adjacent chips
    — on a 2-D/3-D ICI torus the sp ppermute partners become real
    neighbors instead of enumeration-order accidents.

    Multi-host: create_hybrid_device_mesh splits the leading axes
    across processes (DCN) and keeps the trailing axes within each
    host's ICI domain, so halo exchange never crosses DCN as long as
    dp covers the host count (tested by scripts/multihost_smoke.py on
    real processes).
    """
    names = tuple(axes.keys())
    sizes = tuple(axes.values())
    n = int(np.prod(sizes))
    if devices is None:
        devices = jax.devices()[:n]
    devices = list(devices)
    if len(devices) != n:
        raise ZenError(
            f"mesh axes {axes} need {n} devices, got {len(devices)}"
        )
    n_proc = len({d.process_index for d in devices})
    try:
        from jax.experimental import mesh_utils

        if n_proc > 1:
            dcn, per_host = _split_dcn(sizes, n_proc)
            devs = mesh_utils.create_hybrid_device_mesh(
                per_host, dcn, devices=devices
            )
        else:
            devs = mesh_utils.create_device_mesh(sizes, devices=devices)
    except Exception:
        # topology assignment is an optimization, never a correctness
        # requirement: any reshape yields a valid (if slower) mesh
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
