"""Scaling-structure tests: assert the *communication structure* of
the compiled sharded programs.

Virtual CPU devices share one host's cores, so wall-clock "scaling"
measured on the simulated mesh is meaningless. What can be verified
rigorously is the property that guarantees scaling on real ICI: the
compiled HLO of the DP path contains ZERO collectives (embarrassingly
parallel — scaling efficiency is 100% minus runtime jitter by
construction), and the SP/TP paths contain exactly the bounded
neighbor exchanges the overlap-save design calls for, never a
data-dependent all-gather of the full signal.

Halo volume per SP shard per pass is O(halo / block) of local work:
1 hop of samples + (back+fwd) feature rows + 1 OLA row, independent
of clip length — the BASELINE's >=80% scaling-efficiency target is a
statement about exactly this ratio staying small.
"""
from __future__ import annotations

import re

import numpy as np

import jax
import jax.numpy as jnp

from zen_tpu import HPRConfig, OUTPUT_ALL
from zen_tpu.parallel.mesh import make_mesh
from zen_tpu.parallel.sharded import _build_sp_fn, _build_tp_fn

CFG = dict(fs=1000.0, hop=8, causal=False, outputs=OUTPUT_ALL)


def _hlo(fn, *args) -> str:
    return fn.lower(*args).compile().as_text()


def _count(hlo: str, op: str) -> int:
    # count opcode occurrences only: an opcode is directly followed by
    # '(' — LHS names (%op-start.N = ...) and operand references
    # (%op-start.N) are followed by '.' or ')', and async -start/-done
    # pairs count once via the optional suffix
    return len(re.findall(rf"{op}(?:-start)?\(", hlo))


def _sp_program(dp: int, sp: int):
    cfg = HPRConfig(**CFG)
    mesh = make_mesh({"dp": dp, "sp": sp})
    fn = _build_sp_fn(cfg, mesh, "dp", "sp")
    n_frames = (cfg.stft_width + 2) * max(sp, 1)
    x = jnp.zeros((2 * dp, n_frames * cfg.hop), jnp.float32)
    return _hlo(fn, x), cfg


def test_dp_only_has_zero_collectives():
    hlo, _ = _sp_program(dp=8, sp=1)
    for op in ("collective-permute", "all-reduce", "all-gather",
               "all-to-all", "reduce-scatter"):
        assert _count(hlo, op) == 0, f"unexpected {op} in DP program"


def test_sp_uses_only_neighbor_permutes():
    hlo, cfg = _sp_program(dp=2, sp=4)
    # never a full-signal gather or reduction
    assert _count(hlo, "all-gather") == 0
    assert _count(hlo, "all-reduce") == 0
    assert _count(hlo, "all-to-all") == 0
    n_perm = _count(hlo, "collective-permute")
    assert n_perm >= 1
    # design bound: 1 framing halo + 2 feature halos + 3 OLA seams
    # (XLA may fuse or split starts; allow 2x slack, no more)
    assert n_perm <= 12, f"{n_perm} collective-permutes: halo leak?"


def test_sp_halo_volume_is_length_independent():
    """The halo rows exchanged per shard depend only on the filter
    geometry (back/fwd taps), not on how much audio the shard owns."""
    cfg = HPRConfig(**CFG)
    back = cfg.time_history
    fwd = max(max(cfg.time_offsets), 0)
    assert back == cfg.time_filter_len // 2
    assert fwd == cfg.time_filter_len // 2
    # doubling the per-shard length must not change permute count
    mesh = make_mesh({"dp": 1, "sp": 8})
    fn = _build_sp_fn(cfg, mesh, "dp", "sp")
    n1 = (cfg.stft_width + 2) * 8
    h1 = _hlo(fn, jnp.zeros((1, n1 * cfg.hop), jnp.float32))
    h2 = _hlo(fn, jnp.zeros((1, 2 * n1 * cfg.hop), jnp.float32))
    assert _count(h1, "collective-permute") == _count(
        h2, "collective-permute"
    )


def test_tp_uses_ring_permutes_and_psum_only():
    cfg = HPRConfig(fs=8000.0, hop=16, causal=False, outputs=OUTPUT_ALL)
    mesh = make_mesh({"tp": 8})
    n_frames = cfg.stft_width + 4
    fn = _build_tp_fn(cfg, mesh, "tp", n_frames)
    hlo = _hlo(fn, jnp.zeros((n_frames * cfg.hop,), jnp.float32))
    assert _count(hlo, "all-gather") == 0
    assert _count(hlo, "all-to-all") == 0
    assert _count(hlo, "collective-permute") >= 1  # freq halos
    assert _count(hlo, "all-reduce") >= 1  # psum (iFFT linearity)


def test_sharded_blocked_has_zero_collectives():
    """The long-track pod path's core claim: blocks sharded over sp
    with locally-primed OLA tails exchange NOTHING — every device
    scans independently (the halo context travels as overlapping host
    sample windows). Zero collectives in the compiled HLO is the
    structural precondition for its scaling."""
    from zen_tpu.parallel.sharded import _build_sharded_blocked_fn

    cfg = HPRConfig(**CFG)
    mesh = make_mesh({"sp": 8})
    bf, nbl = 8, 2
    back = cfg.time_history
    fwd = max(max(cfg.time_offsets), 0)
    fn = _build_sharded_blocked_fn(cfg, mesh, "sp", bf, back, fwd, nbl)
    w = (nbl * bf + back + fwd + 2) * cfg.hop
    x = jnp.zeros((8, w), jnp.float32)
    hlo = _hlo(fn, x)
    for op in ("collective-permute", "all-reduce", "all-gather",
               "all-to-all", "reduce-scatter"):
        assert _count(hlo, op) == 0, f"unexpected {op} in blocked program"
