"""Pallas TPU median-filter kernels.

The flagship custom kernel of the rebuild (the reference gets its
median filter for free from NPP, mfilt.h:227-267; here it is a
rank-select over K taps computed in VMEM).

Design
------
* The sliding window along the last (lane) axis is evaluated on a
  pre-padded input (the boundary rule — wrap/reflect/clamp/zero — is
  applied by the caller with one jnp.pad, so the kernel body is pure
  valid-mode selection).
* The grid tiles (batch, time); each program DMAs its input slab
  HBM->VMEM (BlockSpec cannot express overlapping blocks), builds the
  K tap views as static lane slices, and runs a bitonic sorting
  network over the tap axis, reading out the median wire. HBM traffic
  is exactly read-once + write-once — unlike the XLA lowering of
  jnp.median, which materializes the full [K, T, F] tap stack in HBM.
* The time-direction tap median (static frame offsets, K <= ~23)
  reuses the same network with row-shifted slabs.
* Both entry points accept arbitrary leading batch dims (folded into
  the first grid axis — one kernel launch for a whole channel batch)
  and carry a custom_vmap rule, so jax.vmap/shard_map compose (vmap
  of a manual-DMA pallas_call has no generic batching rule on TPU).

For huge K the compare-exchange count grows ~K log^2 K; the op-level
seam (ops.median.sliding_median / engine configs) keeps `impl='xla'`
available, and benches/kernels.py A/Bs the two paths per shape.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bitonic_pairs(n: int):
    """Compare-exchange schedule of a full bitonic sort on n (pow2)
    wires: list of (i, j, direction) with i < j; direction True means
    sort ascending at this pair."""
    pairs = []
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            for i in range(n):
                l = i ^ j
                if l > i:
                    up = (i & k) == 0
                    pairs.append((i, l, up))
            j //= 2
        k *= 2
    return pairs


@functools.lru_cache(maxsize=None)
def _pruned_schedule(n: int, k: int, rank: int):
    """Specialize the n-wire bitonic sort to an exact rank-select over
    k data wires: (a) constant-fold the n-k +inf pad wires — a
    comparator with one known-inf input is an exact wire *swap*, zero
    compute; (b) prune comparators outside the backward dependency
    cone of the ``rank`` output wire (any comparator not touching a
    needed wire cannot influence it; reverse-pass marking is exact).
    Together these drop ~40-60% of the min/max pairs at HPR's K values.

    Returns a list of ('cmp'|'swap', i, j, up) executed in order; wire
    values start as [data_0..data_{k-1}, inf...]."""
    pairs = _bitonic_pairs(n)
    needed = {rank}
    keep = [False] * len(pairs)
    for idx in range(len(pairs) - 1, -1, -1):
        i, j, _ = pairs[idx]
        if i in needed or j in needed:
            keep[idx] = True
            needed.add(i)
            needed.add(j)
    wires = [True] * k + [False] * (n - k)  # True = data, False = inf
    sched = []
    for idx, (i, j, up) in enumerate(pairs):
        a, b = wires[i], wires[j]
        if not a and not b:
            continue
        if not a or not b:
            # exact: min(x, inf) = x on the lo wire, inf on the hi wire
            sched.append(("swap", i, j, up))
            wires[i], wires[j] = (True, False) if up else (False, True)
            continue
        if keep[idx]:
            sched.append(("cmp", i, j, up))
    return tuple(sched)


def _median_network(taps, rank: int):
    """Exact rank-select over a Python list of equal-shaped arrays:
    a pruned bitonic sorting network over the tap axis (see
    _pruned_schedule), returning the wire at ``rank``.

    Every compare-exchange is a VPU min/max over the whole tile, so
    the network runs at vector rate entirely in VMEM/vregs — unlike
    the XLA sort lowering, which materializes the [K,T,F] tap stack in
    HBM (14-26x slower at HPR's K values, see benches/kernels.py)."""
    k = len(taps)
    n = 1
    while n < k:
        n *= 2
    vals = list(taps) + [None] * (n - k)  # None = +inf (never built)
    for op, i, j, up in _pruned_schedule(n, k, rank):
        a, b = vals[i], vals[j]
        if op == "swap":
            data = a if b is None else b
            vals[i], vals[j] = (data, None) if up else (None, data)
            continue
        lo = jnp.minimum(a, b)
        hi = jnp.maximum(a, b)
        vals[i], vals[j] = (lo, hi) if up else (hi, lo)
    out = vals[rank]
    assert out is not None
    return out


@functools.lru_cache(maxsize=None)
def _cse_nodes(offsets: tuple, rank: int):
    """Shift-normalized common-subexpression form of the pruned
    rank-select network.

    Every tap is a SHIFT of one underlying slab, and min/max commute
    with shifts: min(shift_a(X), shift_b(Y)) = shift_a(min(X,
    shift_{b-a}(Y))). Normalizing each comparator to (op, X, Y,
    delta) and hash-consing therefore collapses whole layers — e.g.
    the first bitonic layer's k/2 comparator pairs all become ONE
    shared (min, S, S, 1)/(max, S, S, 1) pair. At K=47 this cuts the
    live op count from 722 to 438 (+110 single-lane-delta rolls vs 47
    tap relayouts); measured ~1.5x in benches/kernels.py.

    Returns (nodes, out_id, out_shift): nodes is a topo-ordered tuple
    of (id, op, id1, id2, delta) restricted to the output's live cone;
    id 0 is the source slab; a node's value is
    op(value(id1), shift_by_delta(value(id2))), and the final result
    is shift_by_out_shift(value(out_id))."""
    k = len(offsets)
    n = _pow2_at_least(k)
    sched = _pruned_schedule(n, k, rank)
    INF = -1
    node_key: dict = {}
    node_def = {0: None}
    order: list = []

    def mk(op, a, b):
        (ia, sa), (ib, sb) = a, b
        if sa <= sb:
            i1, i2, d, s = ia, ib, sb - sa, sa
        else:
            i1, i2, d, s = ib, ia, sa - sb, sb
        # canonical with d >= 0 always: for d > 0 the lower-shift-first
        # form is unique (the operand-swapped form would need delta
        # -d < 0); for d == 0 order operands by id (commutativity)
        if d == 0 and i1 > i2:
            i1, i2 = i2, i1
        key = (op, i1, i2, d)
        if key not in node_key:
            nid = len(node_def)
            node_key[key] = nid
            node_def[nid] = key
            order.append(nid)
        return (node_key[key], s)

    wires = [(0, o) for o in offsets] + [(INF, 0)] * (n - k)
    for op, i, j, up in sched:
        a, b = wires[i], wires[j]
        if op == "swap":
            da = a if a[0] != INF else b
            wires[i], wires[j] = (da, (INF, 0)) if up else ((INF, 0), da)
            continue
        lo = mk("min", a, b)
        hi = mk("max", a, b)
        wires[i], wires[j] = (lo, hi) if up else (hi, lo)
    out_id, out_shift = wires[rank]
    live = set()
    stack = [out_id]
    while stack:
        nid = stack.pop()
        if nid in live or nid == 0:
            continue
        live.add(nid)
        _, i1, i2, _d = node_def[nid]
        stack.extend((i1, i2))
    nodes = tuple(
        (nid,) + node_def[nid] for nid in order if nid in live
    )
    return nodes, out_id, out_shift


def _median_network_cse(slab, offsets, rank: int, axis: int, out_extent: int):
    """Rank-select over shifted views of one slab via the CSE'd
    network (see _cse_nodes): returns an array of ``out_extent`` along
    ``axis`` with out[..j..] = rank_select(slab[..j+o..] for o in
    offsets).

    Shifts are realized as plain (possibly misaligned) SLICES — the
    same cheap vreg-rotate the per-tap network uses — never circular
    rolls (measured 1.4x slower: a full-width roll moves every vreg).
    Each node is evaluated once at the maximum extent any parent
    demands (demand-driven widths, computed statically)."""
    nodes, out_id, out_shift = _cse_nodes(tuple(offsets), rank)
    # demand-driven extents: parents read child i1 at offset 0 and
    # child i2 at offset d, both at the parent's extent
    need = {out_id: out_shift + out_extent}
    for nid, _op, i1, i2, d in reversed(nodes):
        w = need[nid]
        need[i1] = max(need.get(i1, 0), w)
        need[i2] = max(need.get(i2, 0), d + w)
    slab_w = slab.shape[axis]
    assert need.get(0, 0) <= slab_w, (need.get(0), slab_w)

    vals = {0: slab}
    read_cache: dict = {}

    def read(nid, off, w):
        v = vals[nid]
        vw = v.shape[axis]
        if off == 0 and vw == w:
            return v
        key = (nid, off, w)
        if key not in read_cache:
            read_cache[key] = jax.lax.slice_in_dim(v, off, off + w, axis=axis)
        return read_cache[key]

    for nid, op, i1, i2, d in nodes:
        w = need[nid]
        a = read(i1, 0, w)
        b = read(i2, d, w)
        vals[nid] = jnp.minimum(a, b) if op == "min" else jnp.maximum(a, b)
    return read(out_id, out_shift, out_extent)


def _align(n: int, m: int) -> int:
    return -(-n // m) * m


def _pow2_at_least(n: int) -> int:
    return 1 << (n - 1).bit_length()


# VMEM working-set budget per program for the sorting network: the
# bitonic network keeps ~n_pad (K padded to pow2) wires of one
# [tb, fb] tile live at once; budget well under the ~16 MB/core VMEM
# so slab + output + spills fit. Taller tiles amortize the per-program
# DMA-issue/grid overhead (tb=8 everywhere measured ~50x off the HBM
# roofline for small K).
_NET_BUDGET_BYTES = 4 << 20


def _pick_tb(n_pad: int, fb: int, t: int, esize: int = 4, sub: int = 8) -> int:
    """Tile height under the VMEM wire budget; ``sub`` is the dtype's
    native sublane multiple (8 for f32, 16 for bf16 — tiles and DMA row
    offsets must stay aligned to it)."""
    tb = _NET_BUDGET_BYTES // (esize * fb * n_pad)
    return max(sub, min(256, _align(t, sub), tb // sub * sub))


def _pick_tiles(
    n_pad: int, t_out: int, f_pad: int, halo: int, esize: int, sub: int
):
    """Joint (tb, fb) pick minimizing estimated HBM traffic under the
    VMEM wire budget (n_pad live wires of one [tb, fb] tile).

    Each row chunk DMAs align(tb + halo, sub) slab rows to produce tb
    output rows, so read amplification is halo-dominated at small tb.
    The fb-first policy this replaces maximized fb and was left with
    tb=8 against the transposed freq route's 12-row halo — a 3x read
    amplification that dominated the 512-stream median leg
    (serving_bound_r04.json; fixed in the round-5 serving hunt).
    Estimated bytes = chunks x (slab rows read + padded rows written)
    x padded lane width; ties prefer wider lane tiles (longer
    contiguous DMA runs), then taller row tiles."""
    best = None
    tb_cap = min(256, _align(t_out, sub))
    tb = sub
    while tb <= tb_cap:
        fb = min(
            f_pad, (_NET_BUDGET_BYTES // (esize * n_pad * tb)) // 128 * 128
        )
        if fb >= 128:
            n_t = -(-t_out // tb)
            rows = _align(tb + halo, sub)
            width = -(-f_pad // fb) * fb
            key = (n_t * (rows + tb) * width, -fb, -tb)
            if best is None or key < best[0]:
                best = (key, tb, fb)
        tb *= 2
    if best is None:
        return sub, 128
    return best[1], best[2]


def _fold_batch(x):
    """[..., T, F] -> ([C, T, F], lead_shape)."""
    lead = x.shape[:-2]
    c = math.prod(lead) if lead else 1
    return x.reshape((c,) + x.shape[-2:]), lead


def _fold_rows(x):
    """[..., T, Fp] -> ([1, R, Fp], lead_shape) with R = prod(lead)*T.

    The frequency-direction median treats every (batch, frame) row
    independently, so leading batch dims AND the time axis fold into
    ONE row axis: a 64-stream serving block [64, 32, Fp] becomes a
    single [2048, Fp] problem instead of 64 tiny T=32 problems — the
    row extent is what crosses the sublane-layout crossover and what
    sets the lane route's time-tile height (round-2 verdict: the
    per-stream grid presented 64 problems below every useful tile
    size)."""
    lead = x.shape[:-1]
    r = math.prod(lead) if lead else 1
    return x.reshape((1, r) + x.shape[-1:]), lead


# ---------------- frequency-direction sliding median ----------------


# default for the freq/time kernels: the CSE'd network (measured
# faster at every HPR K on hardware, benches/kernels.py); flip for A/B
_DEFAULT_CSE = True


def _freq_kernel_pipelined(
    x_hbm, out_hbm, slabs, outbufs, in_sems, out_sems,
    *, k: int, fb: int, tb: int, sw: int, n_t: int, cse: bool,
):
    """One (batch c, lane-tile j) program computing ALL n_t time chunks
    with double-buffered input and output DMA: chunk i+1's slab loads
    and chunk i-1's result stores while chunk i sorts. The simple
    one-chunk-per-program grid serializes DMA -> compute -> DMA per
    program (manual-DMA inputs get no BlockSpec auto-pipelining), which
    measured ~4x off the kernel's compute bound."""
    c = pl.program_id(0)
    j = pl.program_id(1)

    def in_dma(slot, i):
        return pltpu.make_async_copy(
            x_hbm.at[c, pl.ds(i * tb, tb), pl.ds(j * fb, sw)],
            slabs.at[slot],
            in_sems.at[slot],
        )

    def out_dma(slot, i):
        return pltpu.make_async_copy(
            outbufs.at[slot],
            out_hbm.at[c, pl.ds(i * tb, tb), pl.ds(j * fb, fb)],
            out_sems.at[slot],
        )

    in_dma(0, 0).start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_t)
        def _():
            in_dma(nxt, i + 1).start()

        in_dma(slot, i).wait()

        # the outbuf slot was dispatched at chunk i-2; wait before reuse
        @pl.when(i >= 2)
        def _():
            out_dma(slot, i - 2).wait()

        if cse:
            outbufs[slot] = _median_network_cse(
                slabs[slot], range(k), (k - 1) // 2, 1, fb
            )
        else:
            taps = [slabs[slot, :, t : t + fb] for t in range(k)]
            outbufs[slot] = _median_network(taps, (k - 1) // 2)
        out_dma(slot, i).start()
        return ()

    jax.lax.fori_loop(0, n_t, body, (), unroll=False)

    # drain the last (up to) two outstanding output stores
    @pl.when(n_t >= 2)
    def _():
        out_dma(jax.lax.rem(n_t - 2, 2), n_t - 2).wait()

    out_dma(jax.lax.rem(n_t - 1, 2), n_t - 1).wait()


def _freq_kernel(
    x_hbm, out_ref, slab, sem, *, k: int, fb: int, tb: int, sw: int, cse: bool
):
    """One [tb, fb] output tile of batch element c; input slab
    [tb, sw] from HBM, where sw = align128(fb + k - 1) (Mosaic DMA
    slices must be tile-aligned)."""
    c = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    cp = pltpu.make_async_copy(
        x_hbm.at[c, pl.ds(i * tb, tb), pl.ds(j * fb, sw)],
        slab,
        sem,
    )
    cp.start()
    cp.wait()
    if cse:
        out_ref[0] = _median_network_cse(
            slab[:], range(k), (k - 1) // 2, 1, fb
        )
    else:
        taps = [slab[:, t : t + fb] for t in range(k)]
        out_ref[0] = _median_network(taps, (k - 1) // 2)


def _freq_impl(x_padded: jnp.ndarray, k: int, cse: bool, fold: bool = True):
    if fold:
        xc, lead = _fold_rows(x_padded)
    else:
        xc, lead = _fold_batch(x_padded)
        lead = lead + (xc.shape[1],)
    if xc.dtype not in (jnp.float32, jnp.bfloat16):
        xc = xc.astype(jnp.float32)
    dt = xc.dtype
    esize = jnp.dtype(dt).itemsize
    sub = 16 if dt == jnp.bfloat16 else 8
    c, t, fp = xc.shape
    f = fp - (k - 1)
    # lane-tile: single tile when f rounds up to <= 768 lanes (e.g. the
    # ubiquitous 513-bin case — two 512-lane tiles would compute ~2x
    # the useful lanes), else 512-lane tiles
    fb = _align(f, 128) if _align(f, 128) <= 768 else 512
    tb = _pick_tb(_pow2_at_least(k), fb, t, esize, sub)
    sw = _align(fb + k - 1, 128)  # aligned slab width
    n_f = -(-f // fb)
    n_t = -(-t // tb)
    t_pad, f_pad = n_t * tb, n_f * fb
    # pad to tile multiples (extra rows/lanes computed and discarded);
    # the last block's slab reads up to (n_f-1)*fb + sw lanes
    lane_pad = max(f_pad, (n_f - 1) * fb + sw) - fp
    xc = jnp.pad(xc, ((0, 0), (0, t_pad - t), (0, max(lane_pad, 0))))
    if n_t > 1:
        out = pl.pallas_call(
            functools.partial(
                _freq_kernel_pipelined,
                k=k, fb=fb, tb=tb, sw=sw, n_t=n_t, cse=cse,
            ),
            out_shape=jax.ShapeDtypeStruct((c, t_pad, f_pad), dt),
            grid=(c, n_f),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, tb, sw), dt),
                pltpu.VMEM((2, tb, fb), dt),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(xc)
    else:
        out = pl.pallas_call(
            functools.partial(_freq_kernel, k=k, fb=fb, tb=tb, sw=sw, cse=cse),
            out_shape=jax.ShapeDtypeStruct((c, t_pad, f_pad), dt),
            grid=(c, n_t, n_f),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, tb, fb),
                lambda c, i, j: (c, i, j),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((tb, sw), dt),
                pltpu.SemaphoreType.DMA,
            ],
        )(xc)
    return out[:, :t, :f].reshape(lead + (f,))


def _freq_impl_sublane(x_padded: jnp.ndarray, k: int, cse: bool, fold: bool = True):
    """Frequency median with the SLIDING AXIS ON SUBLANES: transpose
    so bins become rows, then run the row-tap kernel.

    Measured on v5e (benches/kernels.py, serving_r03 sweeps): a
    lane-misaligned slice costs ~7-8 us per [32,640] tile — ~10 VPU-op
    equivalents (Mosaic lowers any non-128-aligned lane shift through
    its generic relayout path) — while sublane (row) shifts are
    near-free and XLA's transposes disappear into the pipeline. With
    the row-fold, all rows transpose as ONE [Fp, R] problem; the
    round-2 tc=2048 chunking (reshape into multiple transposed chunks)
    measured 1.2-1.8x SLOWER than the single transpose at every
    R > 2048 shape (r03 nocap A/B: (4088,513,K13) 0.095 vs 0.174 ms),
    so rows are never chunked — _time_impl lane-tiles arbitrary widths
    to the VMEM wire budget internally (the K=187 OOM caught by the
    r02 sweep)."""
    if fold:
        xc, lead = _fold_rows(x_padded)
    else:
        xc, lead = _fold_batch(x_padded)
        lead = lead + (xc.shape[1],)
    c, t, fp = xc.shape
    f = fp - (k - 1)
    tc = _align(t, 128)
    if tc != t:
        xc = jnp.pad(xc, ((0, 0), (0, tc - t), (0, 0)))
    xt = jnp.swapaxes(xc, -1, -2)  # [C, Fp, tc]
    yt = _time_impl(xt, tuple(range(k)), 0.0, 0, cse)[:, :f, :]
    y = jnp.swapaxes(yt, -1, -2)  # [C, tc, f]
    return y[:, :t].reshape(lead + (f,))


def _auto_layout(k: int, shape: tuple) -> str:
    """Data-derived layout crossover, evaluated on the FULL array shape
    (all leading batch dims folded into the row count — the rows are
    what become the transposed tile's lane extent).

    Re-measured in round 3 under the row-fold + unchunked transpose
    (clean interleaved A/Bs on v5e, 2 passes each, ~1% repeatability;
    serving_r03 CSVs + /tmp A/Bs recorded in docs/PERFORMANCE.md):

    * K <= 31: sublane wins at ANY bin count once rows >= 128 —
      2.2-2.5x at (128,513,K13), 1.5-1.8x at (631,513,K13) [offline
      pass-2, the hottest engine shape], 1.4x at (128..2048, 2049),
      1.2x at the folded 64-stream serving block (64x32,513), 1.46x
      at (4088,513). At rows=32 (single-stream blocks) the transposed
      tile wastes 3/4 of each vreg: lane 1.7x faster — rows >= 128.
    * 31 < K <= 128: the K=47 network's 64 live wires force tb=8 row
      tiles once the transposed lane extent is large — sublane only
      wins in the small-rows wide-bins band: 1.15-1.43x at
      (256,2049,K47); ties at 1023 rows; lane 1.33x faster at 2048
      folded rows and 1.56x at (4088,513,K47).
    * K > 128: lane — the wire budget forces narrow tiles (lane ~3x
      faster at K=187, r02 sweep)."""
    rows = math.prod(shape[:-1]) if len(shape) > 1 else 1
    f = shape[-1] - (k - 1)
    if k <= 31:
        return "sublane" if rows >= 128 else "lane"
    if k <= 128:
        return "sublane" if 128 <= rows <= 512 and f >= 1024 else "lane"
    return "lane"


@functools.lru_cache(maxsize=None)
def _freq_entry(k: int, cse: bool, layout: str, fold: bool):
    @jax.custom_batching.custom_vmap
    def f(xp):
        # resolve 'auto' HERE, inside the custom_vmap body: when the
        # caller sits under jax.vmap (MultiStreamHPR's 64-way channel
        # batch) the batching rule below re-enters f with the STACKED
        # array, so the decision sees the true row count — deciding at
        # the public entry point would see the per-example T=32 shape
        # and mis-pick lane for the folded 2048-row serving problem
        lay = _auto_layout(k, xp.shape) if layout == "auto" else layout
        if lay == "sublane":
            return _freq_impl_sublane(xp, k, cse, fold)
        return _freq_impl(xp, k, cse, fold)

    @f.def_vmap
    def _rule(axis_size, in_batched, xp):  # noqa: ANN001
        # batched axis arrives stacked at axis 0; the impl folds all
        # leading dims (and T) into the kernel's row axis
        return f(xp), True

    return f


def sliding_median_last_axis_pallas(
    x_padded: jnp.ndarray,
    k: int,
    cse: bool | None = None,
    layout: str | None = None,
    fold: bool = True,
):
    """Valid-mode sliding median along the last axis.

    x_padded: [..., T, F + k - 1] float32 or bfloat16 (caller applied
    the boundary pad; bf16 runs natively — selection is bf16-exact —
    and returns bf16). Returns [..., T, F]:
    out[..., t, j] = median(x_padded[..., t, j : j + k]).

    ``cse`` selects the shift-normalized network (default; see
    _cse_nodes) vs the per-tap-slice network; ``layout`` selects
    'sublane' (transposed tiles, taps as cheap row shifts — see
    _freq_impl_sublane) vs 'lane' (taps as lane slices) vs 'auto'
    (default: the measured crossover, see _auto_layout). All are
    bit-identical; ``fold=False`` disables the batch/time row-fold
    (see _fold_rows) and exists only for A/B benching of the round-2
    per-stream grid behavior.
    """
    if cse is None:
        cse = _DEFAULT_CSE
    if layout is None:
        import os

        layout = os.environ.get("ZEN_TPU_MEDIAN_LAYOUT", "auto")
    if layout not in ("auto", "sublane", "lane"):
        raise ValueError(f"unknown layout: {layout}")
    return _freq_entry(int(k), bool(cse), layout, bool(fold))(x_padded)


def _freq_kernel_fused(x_ref, o_ref, *, k: int, f: int, mode: str, cse: bool):
    """One [tr, F] row tile of the boundary-fused frequency median:
    transpose to put bins on sublanes, build the boundary rows IN
    VMEM (row shifts/concats on sublanes are near-free, unlike lane
    ops), run the row-tap network, transpose back.

    This removes every HBM copy the padded path pays around the
    kernel — the jnp.pad boundary slab, the two whole-array
    transposes of the sublane route, and the output un-pad slice —
    which together measured ~300 us of the 646 us production freq leg
    at 512 streams (benches/hbm_pattern.py: kernel 345 us vs
    freq_prod 646 us). HBM traffic becomes exactly read-once +
    write-once of the unpadded array."""
    fm = (k - 1) // 2
    xt = jnp.swapaxes(x_ref[:], 0, 1)  # [f, tr] — in-VMEM transpose
    if mode == "reflect":
        # lax.rev has no Mosaic lowering; fm is tiny, so build the
        # reversed boundary rows from single-row slices
        top = jnp.concatenate(
            [xt[i : i + 1] for i in range(fm, 0, -1)], axis=0
        )
        bot = jnp.concatenate(
            [xt[f - 2 - i : f - 1 - i] for i in range(fm)], axis=0
        )
    elif mode == "wrap":
        top = xt[f - fm :]
        bot = xt[:fm]
    else:  # edge (clamp)
        top = jnp.broadcast_to(xt[:1], (fm,) + xt.shape[1:])
        bot = jnp.broadcast_to(xt[f - 1 :], (fm,) + xt.shape[1:])
    xp = jnp.concatenate([top, xt, bot], axis=0)  # [f + k - 1, tr]
    if cse:
        y = _median_network_cse(xp, range(k), fm, 0, f)
    else:
        taps = [xp[t : t + f] for t in range(k)]
        y = _median_network(taps, fm)
    o_ref[:] = jnp.swapaxes(y, 0, 1)


def _freq_fused_tile(r: int, f: int, k: int, esize: int, sub: int):
    """Row-tile height for the fused freq kernel, or None when the
    shape doesn't qualify. The tile must divide the folded row count
    (the kernel uses exact whole-extent BlockSpec blocks — no row pad,
    that's the point), keep the transposed lane extent a full-vreg
    multiple, and fit the network's live wires + double-buffered
    in/out blocks in VMEM."""
    if k % 2 == 0 or f <= k:
        return None
    for tr in (256, 128):
        if tr % sub or r % tr:
            continue
        wires = _pow2_at_least(k) * (f + k - 1) * tr * esize
        bufs = 4 * tr * _align(f, 128) * esize  # in+out, double-buffered
        if wires + bufs <= (12 << 20):
            return tr
    return None


def _freq_fused_impl(x: jnp.ndarray, k: int, mode: str, cse: bool):
    xc, lead = _fold_rows(x)  # [1, R, F]
    if xc.dtype not in (jnp.float32, jnp.bfloat16):
        xc = xc.astype(jnp.float32)
    dt = xc.dtype
    r, f = xc.shape[1], xc.shape[2]
    sub = 16 if dt == jnp.bfloat16 else 8
    tr = _freq_fused_tile(r, f, k, jnp.dtype(dt).itemsize, sub)
    assert tr is not None, "caller must check fused_freq_supported"
    xr = xc.reshape(r, f)
    out = pl.pallas_call(
        functools.partial(_freq_kernel_fused, k=k, f=f, mode=mode, cse=cse),
        out_shape=jax.ShapeDtypeStruct((r, f), dt),
        grid=(r // tr,),
        in_specs=[pl.BlockSpec((tr, f), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((tr, f), lambda i: (i, 0)),
    )(xr)
    return out.reshape(lead + (f,))


@functools.lru_cache(maxsize=None)
def _freq_fused_entry(k: int, mode: str, cse: bool):
    @jax.custom_batching.custom_vmap
    def f(x):
        return _freq_fused_impl(x, k, mode, cse)

    @f.def_vmap
    def _rule(axis_size, in_batched, x):  # noqa: ANN001
        # stacked batch folds into the row axis like every other dim
        return f(x), True

    return f


def fused_freq_supported(shape: tuple, k: int, dtype) -> bool:
    """True when sliding_median_last_axis_fused can run this problem:
    odd k, folded rows divisible by a viable tile, f32/bf16. Shape is
    the UNPADDED [..., T, F] shape (vmap callers pass the stacked
    shape — the row fold sees every leading dim)."""
    import numpy as _np

    dt = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    esize = jnp.dtype(dt).itemsize
    sub = 16 if dt == jnp.bfloat16 else 8
    r = int(_np.prod(shape[:-1])) if len(shape) > 1 else 1
    return _freq_fused_tile(r, int(shape[-1]), int(k), esize, sub) is not None


def sliding_median_last_axis_fused(
    x: jnp.ndarray, k: int, mode: str, cse: bool | None = None
):
    """Boundary-fused sliding median along the last axis on the
    UNPADDED input: out[..., t, j] = median over x[..., t, r(j + o)]
    for o in [-(k-1)//2, (k-1)//2], with r() the ``mode`` boundary
    rule ('reflect' | 'wrap' | 'edge' — jnp.pad semantics).

    Bit-identical to jnp.pad(mode) + sliding_median_last_axis_pallas
    (tested in tests/test_pallas.py) with the pad, both transposes,
    and the un-pad slice fused into the kernel's VMEM tiles. Callers
    gate on fused_freq_supported (row-divisibility, odd k, dtype)."""
    if mode not in ("reflect", "wrap", "edge"):
        raise ValueError(f"unknown boundary mode: {mode}")
    if not fused_freq_supported(x.shape, k, x.dtype):
        raise ValueError(
            f"shape {x.shape} k={k} not viable for the fused freq kernel"
        )
    if cse is None:
        cse = _DEFAULT_CSE
    return _freq_fused_entry(int(k), mode, bool(cse))(x)


@functools.lru_cache(maxsize=None)
def _freq_boundary_entry(
    k: int, mode: str, cse: bool, layout: str, allow_fused: bool
):
    @jax.custom_batching.custom_vmap
    def f(x):
        # fused-vs-padded is decided HERE, inside the custom_vmap
        # body, for the same reason _freq_entry resolves 'auto' here:
        # under jax.vmap the rule below re-enters with the STACKED
        # array, so the row-divisibility gate sees the true folded row
        # count (a vmapped serving block is [S, 32, 513] — 32 rows
        # alone never qualify, S*32 usually do)
        if allow_fused and fused_freq_supported(x.shape, k, x.dtype):
            return _freq_fused_impl(x, k, mode, cse)
        fm = (k - 1) // 2
        pad = [(0, 0)] * (x.ndim - 1) + [(fm, fm)]
        return _freq_entry(k, cse, layout, True)(jnp.pad(x, pad, mode=mode))

    @f.def_vmap
    def _rule(axis_size, in_batched, x):  # noqa: ANN001
        return f(x), True

    return f


def sliding_median_boundary_pallas(
    x: jnp.ndarray,
    k: int,
    mode: str,
    cse: bool | None = None,
    layout: str | None = None,
):
    """Sliding median along the last axis with the ``mode`` boundary
    ('reflect' | 'wrap' | 'edge'), on the UNPADDED input. Routes to
    the boundary-fused kernel when the folded shape qualifies
    (fused_freq_supported), else to jnp.pad +
    sliding_median_last_axis_pallas — bit-identical either way.
    ZEN_TPU_FREQ_FUSED=0 pins the padded route for A/B."""
    import os

    if mode not in ("reflect", "wrap", "edge"):
        raise ValueError(f"unknown boundary mode: {mode}")
    if cse is None:
        cse = _DEFAULT_CSE
    if layout is None:
        layout = os.environ.get("ZEN_TPU_MEDIAN_LAYOUT", "auto")
    allow_fused = os.environ.get("ZEN_TPU_FREQ_FUSED", "1") != "0"
    return _freq_boundary_entry(
        int(k), mode, bool(cse), layout, allow_fused
    )(x)


# ---------------- time-direction tap median ----------------


def _time_kernel(
    x_hbm, out_ref, slab, sem,
    *, offsets, back, tb: int, rows: int, base: int, fb: int, cse: bool,
):
    """One [tb, fb] output tile of the time-direction tap median for
    batch element c. Input slab rows [base + i*tb ..] x lane block j
    of the padded array (rows = aligned span)."""
    c = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    k = len(offsets)
    cp = pltpu.make_async_copy(
        x_hbm.at[c, pl.ds(base + i * tb, rows), pl.ds(j * fb, fb)],
        slab,
        sem,
    )
    cp.start()
    cp.wait()
    if cse:
        shifted_offsets = tuple(o + back for o in offsets)
        out_ref[0] = _median_network_cse(
            slab[:], shifted_offsets, (k - 1) // 2, 0, tb
        )
    else:
        taps = [slab[o + back : o + back + tb, :] for o in offsets]
        out_ref[0] = _median_network(taps, (k - 1) // 2)


# Wide-serving fleets (≥ this many batch rows) leave the manual-DMA
# grid and take the auto-double-buffered BlockSpec kernel below: with
# one grid program per stream, the per-program copy-then-wait pattern
# serializes ~c DMA latencies, which is what made the 512-stream chip
# curve super-linear (serving_bound_r04 + scripts/median_cliff_ab*.py;
# measured 808→505 us/step at S=512 on the v5e, parity-identical).
# Below the threshold the carried state is chip-resident and the
# manual-DMA path is faster (18.6 vs 41 us at S=64), so it stays.
_TIME_PIPED_MIN_BATCH = 256


def _time_kernel_piped(x_ref, out_ref, *, offsets, first_tap: int, half: int, tb: int):
    """Whole-extent blocks, one stream per program: Pallas pre-fetches
    program i+1's block while i computes (no explicit DMA)."""
    shifted = tuple(first_tap + o for o in offsets)
    out_ref[0] = _median_network_cse(x_ref[0], shifted, half, 0, tb)


def _time_impl_piped(
    xc: jnp.ndarray, offsets: tuple, fill: float, start: int
) -> jnp.ndarray:
    """n_t==1/n_f==1 specialization of _time_impl for large stream
    counts; bit-identical output (tested against the general path).
    bf16 inputs run natively (half the HBM traffic — the whole point
    of cfg.stream_state='bf16'); the compare network is pure min/max
    selection, so bf16 results equal f32-upcast results exactly."""
    c, t, f = xc.shape
    row_align = 16 if xc.dtype == jnp.bfloat16 else 8
    t_out = t - start
    back = max(0, -min(offsets))
    fwd = max(0, max(offsets))
    top_pad = max(0, back - start)
    base = start - back + top_pad
    k = len(offsets)
    if top_pad == 0 and start + t_out + fwd <= t:
        # every tap of every output row is in-bounds (the serving block
        # step's shape: the carried history IS the boundary), so the
        # jnp.pad existed only for tile alignment — which Mosaic
        # handles internally for whole-array blocks. Skipping it
        # removes a full HBM read+write of the feature slab per step
        # (~129 MB at 512 streams), the single biggest term of the
        # round-4 "residency" gap (docs/PERFORMANCE.md round 5).
        return pl.pallas_call(
            functools.partial(
                _time_kernel_piped,
                offsets=tuple(offsets),
                first_tap=start,
                half=(k - 1) // 2,
                tb=t_out,
            ),
            out_shape=jax.ShapeDtypeStruct((c, t_out, f), xc.dtype),
            grid=(c,),
            in_specs=[pl.BlockSpec((1, t, f), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, t_out, f), lambda i: (i, 0, 0)),
        )(xc)
    f_pad = _align(f, 128)
    tb = t_out
    need = base + back + fwd + tb
    t_pad = _align(max(top_pad + t, need), row_align)
    xp = jnp.pad(
        xc,
        ((0, 0), (top_pad, t_pad - top_pad - t), (0, f_pad - f)),
        constant_values=fill,
    )
    out = pl.pallas_call(
        functools.partial(
            _time_kernel_piped,
            offsets=tuple(offsets),
            first_tap=base + back,
            half=(k - 1) // 2,
            tb=tb,
        ),
        out_shape=jax.ShapeDtypeStruct((c, tb, f_pad), xc.dtype),
        grid=(c,),
        in_specs=[pl.BlockSpec((1, t_pad, f_pad), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, tb, f_pad), lambda i: (i, 0, 0)),
    )(xp)
    return out[:, :, :f]


def _time_kernel_pair(h_ref, x_ref, out_ref, *, offsets, start, half, tb):
    """Virtual-concat variant of _time_kernel_piped: the tap slab is
    [hist ++ fresh] assembled IN VMEM from two whole-extent input
    blocks, so the caller never materializes the concatenated history
    in HBM. At 512 streams the serving block step's
    concat(feat_hist, fresh) was ~111 MB of pure HBM copy per step —
    the largest single removable term of the round-5 bound hunt
    (benches/hbm_pattern.py; docs/PERFORMANCE.md round 5).

    Blocks carry a GROUP of streams (leading dim): one stream per
    program leaves ~0.5 us of compute against per-program grid/DMA
    overhead, which capped the one-stream-per-program form at ~12%
    VPU efficiency (the round-5 hunt's in-step kernel numbers);
    grouping amortizes it the way the fused freq kernel's row tiles
    do."""
    slab = jnp.concatenate([h_ref[:], x_ref[:]], axis=1)
    shifted = tuple(start + o for o in offsets)
    out_ref[:] = _median_network_cse(slab, shifted, half, 1, tb)


def _pick_group(c: int, h: int, b: int, f: int, k: int, esize: int) -> int:
    """Streams per program for the pair kernel: largest group whose
    network wires + double-buffered in/out blocks fit the VMEM
    budget."""
    fa = _align(f, 128)
    n_pad = _pow2_at_least(k)
    for g in (8, 4, 2, 1):
        if c % g:
            continue
        wires = n_pad * g * (h + b) * fa * esize
        bufs = 2 * g * (2 * (h + b) + 2 * b) * fa * esize
        if wires + bufs <= (12 << 20):
            return g
    return 1


def _time_pair_impl(hist: jnp.ndarray, fresh: jnp.ndarray, offsets: tuple):
    hc, lead = _fold_batch(hist)
    xc, lead2 = _fold_batch(fresh)
    assert lead == lead2, (lead, lead2)
    if xc.dtype not in (jnp.float32, jnp.bfloat16):
        xc = xc.astype(jnp.float32)
    hc = hc.astype(xc.dtype)
    c, h, f = hc.shape
    b = xc.shape[1]
    k = len(offsets)
    g = _pick_group(c, h, b, f, k, jnp.dtype(xc.dtype).itemsize)
    out = pl.pallas_call(
        functools.partial(
            _time_kernel_pair,
            offsets=tuple(offsets),
            start=h,
            half=(k - 1) // 2,
            tb=b,
        ),
        out_shape=jax.ShapeDtypeStruct((c, b, f), xc.dtype),
        grid=(c // g,),
        in_specs=[
            pl.BlockSpec((g, h, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, b, f), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g, b, f), lambda i: (i, 0, 0)),
    )(hc, xc)
    return out.reshape(lead + (b, f))


# Widest batch the pair kernel runs at; above it the entry
# materializes the concat and takes the one-input kernel. The
# ONE-stream-per-program pair form lost to the materialized path at
# 512 streams in-step (0.861x, benches/pair_ab_r05.json: XLA hides
# the concat as an async copy under the MXU leg, while the pair
# route's operand-layout copies sat on the critical path) despite
# winning kernel-isolated; with grouped blocks the in-step order
# flips decisively — 1890 vs 2280 us full-step at S=512 (g=2 best of
# {2,4,8}, two interleaved passes) — so the gate now only guards the
# unmeasured far tail.
_PAIR_MAX_BATCH = 4096


@functools.lru_cache(maxsize=None)
def _time_pair_entry(offsets: tuple):
    @jax.custom_batching.custom_vmap
    def f(hist, fresh):
        c = math.prod(hist.shape[:-2]) if hist.ndim > 2 else 1
        if c > _PAIR_MAX_BATCH:
            h = hist.shape[-2]
            feats = jnp.concatenate(
                [hist, fresh.astype(hist.dtype)], axis=-2
            )
            return _time_entry(offsets, 0.0, h, _DEFAULT_CSE)(feats)
        return _time_pair_impl(hist, fresh, offsets)

    @f.def_vmap
    def _rule(axis_size, in_batched, hist, fresh):  # noqa: ANN001
        assert all(in_batched), "pair kernel: both operands are state"
        return f(hist, fresh), True

    return f


def tap_median_time_pair_pallas(
    hist: jnp.ndarray, fresh: jnp.ndarray, offsets: tuple
):
    """Causal tail tap-median over the VIRTUAL concat [hist ++ fresh]
    along the row axis, producing one output row per fresh row:
    out[..., i, :] = median over concat[..., H + i + o, :] for o in
    offsets, H = hist rows. Requires every tap in-bounds (causal
    serving shape): -min(offsets) <= H and max(offsets) <= 0.

    Bit-identical to
    tap_median_time_pallas(concat([hist, fresh], -2), offsets,
    start=H) without writing the concat to HBM (tested in
    tests/test_pallas.py). f32/bf16 native like the other entries;
    hist is cast to fresh's dtype (they share the stream-state dtype
    in production)."""
    k = len(offsets)
    h = hist.shape[-2]
    if not (0 < k and -min(offsets) <= h and max(offsets) <= 0):
        raise ValueError(
            f"pair kernel needs causal in-bounds taps: offsets={offsets}, "
            f"hist rows={h}"
        )
    return _time_pair_entry(tuple(offsets))(hist, fresh)


def _time_kernel_pipelined(
    x_hbm, out_hbm, slabs, outbufs, in_sems, out_sems,
    *, offsets, back, tb: int, rows: int, base: int, fb: int,
    n_t: int, cse: bool,
):
    """Double-buffered variant of _time_kernel for multi-chunk row
    spans: one (batch c, lane-tile j) program walks ALL n_t row chunks
    with chunk i+1's slab loading and chunk i-1's tile storing while
    chunk i sorts. The one-chunk-per-program grid pays a serialized
    DMA latency per program — the transposed freq-median route
    presents hundreds of row chunks at wide serving shapes (the folded
    512-stream block transposes to 16384 lanes x tb=8 rows = 66x2
    programs), which made the freq leg the dominant term of the
    512-stream step (serving_bound_r04.json legs)."""
    c = pl.program_id(0)
    j = pl.program_id(1)
    k = len(offsets)

    def in_dma(slot, i):
        return pltpu.make_async_copy(
            x_hbm.at[c, pl.ds(base + i * tb, rows), pl.ds(j * fb, fb)],
            slabs.at[slot],
            in_sems.at[slot],
        )

    def out_dma(slot, i):
        return pltpu.make_async_copy(
            outbufs.at[slot],
            out_hbm.at[c, pl.ds(i * tb, tb), pl.ds(j * fb, fb)],
            out_sems.at[slot],
        )

    in_dma(0, 0).start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_t)
        def _():
            in_dma(nxt, i + 1).start()

        in_dma(slot, i).wait()

        # the outbuf slot was dispatched at chunk i-2; wait before reuse
        @pl.when(i >= 2)
        def _():
            out_dma(slot, i - 2).wait()

        if cse:
            shifted = tuple(o + back for o in offsets)
            outbufs[slot] = _median_network_cse(
                slabs[slot], shifted, (k - 1) // 2, 0, tb
            )
        else:
            taps = [slabs[slot, o + back : o + back + tb, :] for o in offsets]
            outbufs[slot] = _median_network(taps, (k - 1) // 2)
        out_dma(slot, i).start()
        return ()

    jax.lax.fori_loop(0, n_t, body, (), unroll=False)

    # drain the last (up to) two outstanding output stores
    @pl.when(n_t >= 2)
    def _():
        out_dma(jax.lax.rem(n_t - 2, 2), n_t - 2).wait()

    out_dma(jax.lax.rem(n_t - 1, 2), n_t - 1).wait()


def _time_impl(x: jnp.ndarray, offsets: tuple, fill: float, start: int, cse: bool):
    """Tap median of rows start..T-1 only (out[..., i, :] = median over
    x[..., start + i + o, :]); streaming callers filter just the new
    block's rows instead of the whole history concat.

    f32 and bf16 run natively (out dtype = input dtype; the compare
    network is pure min/max selection, so bf16 results equal
    f32-upcast results exactly — stream_state='bf16' and the bf16
    freq-median route ride this for half the HBM traffic); any other
    dtype upcasts to f32."""
    xc, lead = _fold_batch(x)
    if xc.dtype not in (jnp.float32, jnp.bfloat16):
        xc = xc.astype(jnp.float32)
    dt = xc.dtype
    esize = jnp.dtype(dt).itemsize
    sub = 16 if dt == jnp.bfloat16 else 8  # native sublane multiple
    c, t, f = xc.shape
    t_out = t - start
    back = max(0, -min(offsets))
    fwd = max(0, max(offsets))
    top_pad = max(0, back - start)
    base = start - back + top_pad  # first padded row a slab reads
    f_pad = _align(f, 128)
    n_pad = _pow2_at_least(len(offsets))
    # joint (tb, fb) pick under the VMEM wire budget: keeps wide-f
    # big-k calls from OOMing the 16 MB VMEM (the r02 sweep's K=187
    # case) while minimizing halo read amplification (the r05 serving
    # hunt's 512-stream fix — see _pick_tiles)
    tb, fb = _pick_tiles(n_pad, t_out, f_pad, back + fwd, esize, sub)
    n_f = -(-f_pad // fb)
    f_pad = n_f * fb
    n_t = -(-t_out // tb)
    t_pad_out = n_t * tb
    if (
        cse
        and c >= _TIME_PIPED_MIN_BATCH
        and n_t == 1
        and n_f == 1
        and t * f_pad * esize <= (2 << 20)  # whole-extent block stays tiny
    ):
        return _time_impl_piped(xc, offsets, fill, start).reshape(lead + (t_out, f))
    # Mosaic requires DMA row offsets divisible by the sublane tiling
    # when the (small) input gets VMEM-placed: realign `base` down and
    # fold the residue into the in-slab tap shift (start > back calls
    # — e.g. a deep `start` into a short history — otherwise fail to
    # compile on hardware; caught by the r04 axon run of the piped
    # parity test's odd-shape case)
    delta = base % sub
    base -= delta
    back += delta
    rows = _align(tb + back + fwd, sub)  # aligned slab rows
    need_rows = base + (n_t - 1) * tb + rows
    bottom_pad = max(0, need_rows - (top_pad + t))
    xp = jnp.pad(
        xc,
        ((0, 0), (top_pad, bottom_pad), (0, f_pad - f)),
        constant_values=fill,
    )
    if n_t > 1:
        out = pl.pallas_call(
            functools.partial(
                _time_kernel_pipelined,
                offsets=tuple(offsets),
                back=back,
                tb=tb,
                rows=rows,
                base=base,
                fb=fb,
                n_t=n_t,
                cse=cse,
            ),
            out_shape=jax.ShapeDtypeStruct((c, t_pad_out, f_pad), dt),
            grid=(c, n_f),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, rows, fb), dt),
                pltpu.VMEM((2, tb, fb), dt),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(xp)
    else:
        out = pl.pallas_call(
            functools.partial(
                _time_kernel,
                offsets=tuple(offsets),
                back=back,
                tb=tb,
                rows=rows,
                base=base,
                fb=fb,
                cse=cse,
            ),
            out_shape=jax.ShapeDtypeStruct((c, t_pad_out, f_pad), dt),
            grid=(c, n_t, n_f),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, tb, fb), lambda c, i, j: (c, i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((rows, fb), dt),
                pltpu.SemaphoreType.DMA,
            ],
        )(xp)
    return out[:, :t_out, :f].reshape(lead + (t_out, f))


@functools.lru_cache(maxsize=None)
def _time_entry(offsets: tuple, fill: float, start: int, cse: bool):
    @jax.custom_batching.custom_vmap
    def f(x):
        return _time_impl(x, offsets, fill, start, cse)

    @f.def_vmap
    def _rule(axis_size, in_batched, x):  # noqa: ANN001
        return f(x), True

    return f


def tap_median_time_pallas(
    x: jnp.ndarray,
    offsets: tuple,
    fill: float = 0.0,
    start: int = 0,
    cse: bool | None = None,
):
    """Time-direction tap median with constant boundary: out[..., i, :]
    = median over x[..., start + i + o, :] for o in offsets
    (out-of-range rows read ``fill`` — the feature value of a zero
    prefill frame). ``start`` restricts output to the trailing
    T-start rows without computing the leading ones.

    x: [..., T, F] float32 or bfloat16 (bf16 runs natively, returns
    bf16); offsets: static tuple of frame offsets
    (duplicates allowed — the replicate-border causal mode repeats the
    current frame).
    """
    if cse is None:
        cse = _DEFAULT_CSE
    return _time_entry(tuple(offsets), float(fill), int(start), bool(cse))(x)
