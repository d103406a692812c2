"""Streaming causal HPR — the realtime path.

TPU-native replacement for zen::hps::HPRRealtime (reference:
libzen/hps.cu:282-427). The reference streams one hop per GPU
dispatch through pinned zero-copy buffers; on TPU the idiomatic
streaming unit is a *block of hops* per device step (the BASELINE
north star requires no host round-trips per hop). The per-hop state
machine is carried explicitly as a pytree:

    ring       [nwin]        input ring        (hps.h:182, hps.cu:452)
    feat_hist  [H, bins]     trailing filtered-feature frames, H =
                             farthest-back time tap (config.time_history)
    ola_tail   [3, hop]      second halves of the previous frame's
                             scaled iFFTs (the rotating OLA buffers,
                             hps.cu:435-449, reduced to their carry)

``block_step`` is a pure jitted function of (state, block) with donated
state — zero allocation per step, the analog of the reference's
allocate-in-ctor discipline. B = 1 gives exact per-hop streaming.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.config import HPRConfig
from ..engine.spectral import (
    analyze,
    analyze_packed,
    compute_masks,
    feature_transform,
    finalize_features,
    freq_filtered,
    magnitude_packed,
    num_bins,
    synthesize,
    synthesize_packed,
    time_filtered_tail,
    time_filtered_tail_pair,
)
from ..errors import ZenError

_STEMS = ("harmonic", "percussive", "residual")


class StreamState(NamedTuple):
    ring: jnp.ndarray  # [nwin]
    feat_hist: jnp.ndarray  # [H, bins]
    ola_tail: jnp.ndarray  # [3, hop]


def init_state(cfg: HPRConfig) -> StreamState:
    """Zeroed state == the reference's reset_buffers (hps.h:296-321).
    The feature history is initialized to the feature of a zero frame
    (+inf for SSE, see spectral.prefill_value)."""
    from ..engine.spectral import prefill_value

    hist_dtype = jnp.bfloat16 if cfg.stream_state == "bf16" else jnp.float32
    return StreamState(
        ring=jnp.zeros((cfg.nwin,), jnp.float32),
        feat_hist=jnp.full(
            (cfg.time_history, num_bins(cfg)), prefill_value(cfg), hist_dtype
        ),
        ola_tail=jnp.zeros((3, cfg.hop), jnp.float32),
    )


def enabled_stems(cfg: HPRConfig) -> tuple:
    """Indices into _STEMS of the stems the block step emits — the
    cfg's output flags. (An enabled residual under soft/SSE masks has
    no mask definition and yields a zero row, the reference's
    unwritten-buffer behavior, hps.cu:562-567 — the row stays so the
    flags alone decide the output shape.)"""
    return tuple(
        i
        for i, name in enumerate(_STEMS)
        if getattr(cfg, f"output_{name}")
    )


def _block_step_body(cfg: HPRConfig, state: StreamState, block: jnp.ndarray):
    """Process B hops: block [B, hop] -> (new_state, outs [E, B*hop])
    with one row per ENABLED stem (E = len(enabled_stems(cfg)), rows
    in harmonic/percussive/residual order filtered to enabled).

    Equivalent to B successive process_next_hop calls of the reference
    causal engine (hps.cu:429-486) with the per-output copy_* reads
    (hps.cu:342-363), batched into one device program.
    """
    if not cfg.causal:
        raise ZenError("streaming drivers are causal-only")
    b, hop = block.shape
    # frames i = samples[(i+1)*hop : (i+3)*hop] over ring ++ block.
    # The concat IS the right form: a round-5 A/B replaced it with
    # K-split DFT matmuls over the two hop slices (no materialized
    # frames) and LOST ~190 us/step at 512 streams — halving the
    # contraction depth makes the MXU revisit the f32 [rows, 2*bins]
    # output (partial-sum write+read ~134 MB/step), far more than the
    # ~34 MB concat it saved, and XLA hides the concat as an async
    # copy under compute anyway (docs/PERFORMANCE.md round 5).
    samples = jnp.concatenate([state.ring, block.reshape(b * hop)])
    blocks = samples.reshape(b + 2, hop)
    frames = jnp.concatenate([blocks[1 : b + 1], blocks[2 : b + 2]], axis=-1)

    # DFT-matmul configs run the PACKED real pipeline (no complex
    # intermediate, no re/im split + repack around the mask —
    # spectral.analyze_packed); the XLA-FFT path keeps complex form
    packed = analyze_packed(frames, cfg)
    if packed is not None:
        sp, prec = packed
        mag = magnitude_packed(sp, cfg)

        def synth(mask):
            return synthesize_packed(sp, mask, cfg, prec)

    else:
        s = analyze(frames, cfg)  # [B, bins]
        mag = jnp.abs(s)

        def synth(mask):
            return synthesize(s, mask, cfg)

    feat = feature_transform(mag, cfg)
    # stream_state='bf16' carries the tap history (the HBM-bound term
    # at wide fleets) in half precision; the fresh frames are quantized
    # to match so every tap sees one consistent precision
    featq = feat.astype(state.feat_hist.dtype)

    h_len = cfg.time_history
    # time filter: only the B newest rows; their taps reach at most
    # h_len frames back, all inside [hist ++ fresh] (earlier stream =
    # prefill feature values, already baked into the initial
    # feat_hist). When the block covers the history (B >= H, the
    # serving shape) the pair kernel takes (hist, fresh) separately
    # and the next history is a pure slice of the fresh rows — the
    # concatenated slab never hits HBM (round-5 serving bound hunt).
    if b >= h_len:
        h_rows = time_filtered_tail_pair(state.feat_hist, featq, cfg)
        new_hist = featq[b - h_len :]
    else:
        feats = jnp.concatenate([state.feat_hist, featq], axis=0)
        h_rows = time_filtered_tail(feats, cfg, h_len)
        new_hist = feats[feats.shape[0] - h_len :]
    # the freq features see the same quantization as the time taps so
    # the h-vs-p mask comparison stays consistent; the median itself
    # runs natively on the quantized dtype (selection — bf16-exact,
    # half the kernel's HBM traffic) and only the SSE *mean* needs f32
    # accumulation. Mask compute is f32 either way.
    fq = featq.astype(jnp.float32) if cfg.use_sse else featq
    p_rows = freq_filtered(fq, cfg).astype(jnp.float32)
    h_rows, p_rows = finalize_features(h_rows, p_rows, cfg)
    pm, hm, rm = compute_masks(h_rows, p_rows, cfg)

    masks = {"harmonic": hm, "percussive": pm, "residual": rm}
    # only enabled stems are synthesized AND materialized: the step's
    # output carries one row per enabled stem (enabled_stems order) —
    # a percussive-only 512-stream serving step was writing ~33 MB of
    # zero rows per dispatch for the disabled stems (round-5 'rest'
    # decomposition). The public single-stream API re-expands to the
    # reference's 3-row form on the host (zeros for disabled stems).
    outs = []
    tails = []
    en = enabled_stems(cfg)
    for i, name in enumerate(_STEMS):
        if i not in en:
            tails.append(state.ola_tail[i])
            continue
        if masks[name] is None:  # enabled residual, soft/SSE masks
            outs.append(jnp.zeros((b * hop,), jnp.float32))
            tails.append(state.ola_tail[i])
            continue
        y = synth(masks[name])  # [B, nwin]
        prev_tails = jnp.concatenate(
            [state.ola_tail[i][None], y[:-1, hop:]], axis=0
        )
        chunk = y[:, :hop] + prev_tails  # [B, hop]
        outs.append(chunk.reshape(b * hop))
        tails.append(y[-1, hop:])

    new_state = StreamState(
        ring=samples[-cfg.nwin :],
        feat_hist=new_hist,
        ola_tail=jnp.stack(tails),
    )
    return new_state, jnp.stack(outs)


@functools.partial(
    jax.jit, static_argnames=("cfg",), donate_argnames=("state",)
)
def block_step(cfg: HPRConfig, state: StreamState, block: jnp.ndarray):
    return _block_step_body(cfg, state, block)


@functools.partial(
    jax.jit, static_argnames=("cfg",), donate_argnames=("state",)
)
def block_step_multi(cfg: HPRConfig, state: StreamState, blocks: jnp.ndarray):
    """Multi-channel streaming: state with leading channel dim, blocks
    [C, B, hop] -> (state, outs [C, E, B*hop], one row per enabled
    stem — see _block_step_body). The BASELINE
    'batched multi-channel fakert' config — C independent causal
    streams in one device program (channel data parallelism; shard the
    C axis over a mesh for multi-chip)."""
    return jax.vmap(lambda s, b: _block_step_body(cfg, s, b))(state, blocks)


# nominal hops per multi-stream device step for the transform-seam
# resolution: streams are resolved ONCE at construction (a stream must
# not switch transform paths mid-flight when a caller varies its block
# size), so the seam sees n_streams x this typical serving block
_NOMINAL_BLOCK_HOPS = 32


def resolve_multistream_fft_impl(cfg: HPRConfig, n_streams: int) -> HPRConfig:
    """The vmapped multi-stream step hides the channel batch dim from
    the transform seam's trace-time fallback
    (engine/spectral._dft_precision), so resolve it here from the true
    stream count via the shared resolver (resolve_fft_impl): e.g. the
    nfft=4096 DFT-matmul needs >= 256 total rows to feed the MXU — 8
    streams at the nominal 32-hop block."""
    from ..engine.spectral import resolve_fft_impl

    return resolve_fft_impl(cfg, n_streams * _NOMINAL_BLOCK_HOPS)


class HPRRealtime:
    """Streaming causal HPR, API-compatible with the reference
    HPRRealtime pimpl class (libzen/libzen/hps.h:74-118).

    process_next_hop(hop_samples) processes one hop; copy_harmonic /
    copy_percussive / copy_residual return that hop's stems. For TPU
    throughput use process_block(block[B, hop]) — one device dispatch
    for B hops — or process_stream().
    """

    def __init__(
        self,
        fs: float,
        hop: int = 256,
        beta: float = 2.0,
        outputs: int = 0,
        border: str = "wrap",
        use_sse: bool = False,
        soft_mask: bool = False,
        fft_impl: str = "auto",
        median_impl: str = "auto",
        stream_state: str = "f32",
    ):
        from ..engine.config import OUTPUT_ALL

        self.cfg = HPRConfig(
            fs=fs,
            hop=hop,
            beta=beta,
            causal=True,
            border=border,
            outputs=outputs or OUTPUT_ALL,
            use_sse=use_sse,
            soft_mask=soft_mask,
            fft_impl=fft_impl,
            median_impl=median_impl,
            stream_state=stream_state,
        )
        self.state = init_state(self.cfg)
        self._last = np.zeros((3, hop), np.float32)

    # -- toggles (hps.cu:322-332) --
    def use_sse_filter(self):
        self._reconfig(use_sse=True)

    def use_soft_mask(self):
        self._reconfig(soft_mask=True)

    def _reconfig(self, **kw):
        import dataclasses

        self.cfg = dataclasses.replace(self.cfg, **kw)
        self.state = init_state(self.cfg)

    def reset_buffers(self):
        self.state = init_state(self.cfg)

    @property
    def latency_samples(self) -> int:
        """Inherent stream latency: the OLA emits each stem hop one hop
        after its input hop arrives (frame i's first-hop output overlaps
        frame i-1's tail; same structural latency as the reference's
        causal path — 'causal' means zero *lookahead*, hps.h:264-268)."""
        return self.cfg.hop

    def warmup(self, block_sizes=(1,)):
        """Compile the step(s) and reset — analog of warmup()
        (hps.cu:392-409), which exists to hide first-dispatch latency."""
        for b in block_sizes:
            dummy = jnp.zeros((b, self.cfg.hop), jnp.float32)
            self.state, _ = block_step(self.cfg, self.state, dummy)
        jax.block_until_ready(self.state.ring)
        self.reset_buffers()

    def _expand(self, outs):
        """Compact step rows -> the reference's 3-row (h, p, r) form,
        zeros for disabled stems (host-side: the device step never
        materializes them)."""
        en = enabled_stems(self.cfg)
        if len(en) == 3:
            return outs
        full = np.zeros((3, outs.shape[-1]), np.float32)
        full[list(en)] = np.asarray(outs)
        return full

    def process_next_hop(self, hop_samples):
        block = jnp.asarray(hop_samples, jnp.float32).reshape(1, self.cfg.hop)
        self.state, outs = block_step(self.cfg, self.state, block)
        self._last = outs = self._expand(outs)
        return outs

    def process_block(self, block):
        """block: [B, hop] or [B*hop] -> outs [3, B*hop] (h, p, r)."""
        block = jnp.asarray(block, jnp.float32).reshape(-1, self.cfg.hop)
        self.state, outs = block_step(self.cfg, self.state, block)
        self._last = outs = self._expand(outs)
        return outs

    def process_stream(self, audio, block_hops: int = 64):
        """Stream a whole [L] signal through the causal engine in
        blocks; pads the tail with zeros (clean tail handling — the
        reference fakert chunker drops trailing partial chunks,
        zen/fakert.h:15-34). Returns [3, ceil(L/hop)*hop].

        A ragged final block is processed at its exact size (one extra
        compile per distinct tail length) — padding it with zero hops
        would advance the stream state past hops that were never part
        of the signal, corrupting any later call on this object."""
        audio = np.asarray(audio, np.float32)
        hop = self.cfg.hop
        n_hops = -(-len(audio) // hop)
        padded = np.zeros(n_hops * hop, np.float32)
        padded[: len(audio)] = audio
        blocks = padded.reshape(n_hops, hop)
        outs = []
        for start in range(0, n_hops, block_hops):
            chunk = blocks[start : start + block_hops]
            outs.append(np.asarray(self.process_block(jnp.asarray(chunk))))
        return np.concatenate(outs, axis=1)

    # -- per-hop output reads (hps.cu:342-363): always the NEWEST hop,
    # matching the reference's one-hop OLA read regardless of whether
    # the last call processed one hop or a block --
    def copy_harmonic(self):
        return np.asarray(self._last[0])[-self.cfg.hop :]

    def copy_percussive(self):
        return np.asarray(self._last[1])[-self.cfg.hop :]

    def copy_residual(self):
        return np.asarray(self._last[2])[-self.cfg.hop :]


class MultiStreamHPR:
    """C independent causal HPR streams in one device program —
    the BASELINE 'batched multi-channel fakert' configuration
    (64 streams x 44.1 kHz, channel parallel).

    When a mesh is given, the channel axis of state and blocks is
    sharded over ``dp_axis`` (pure data parallelism, no collectives).
    """

    def __init__(
        self,
        n_streams: int,
        fs: float,
        hop: int = 256,
        beta: float = 2.0,
        outputs: int = 0,
        mesh=None,
        dp_axis: str = "dp",
        **cfg_kw,
    ):
        from ..engine.config import OUTPUT_ALL

        self.cfg = HPRConfig(
            fs=fs,
            hop=hop,
            beta=beta,
            causal=True,
            outputs=outputs or OUTPUT_ALL,
            **cfg_kw,
        )
        self.cfg = resolve_multistream_fft_impl(self.cfg, n_streams)
        self.n_streams = n_streams
        state = jax.vmap(lambda _: init_state(self.cfg))(
            jnp.arange(n_streams)
        )
        self._mesh, self._dp_axis = mesh, dp_axis
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            state = jax.tree.map(
                lambda x: jax.device_put(
                    x, NamedSharding(mesh, P(dp_axis, *([None] * (x.ndim - 1))))
                ),
                state,
            )
        self.state = state

    def warmup(self, block_sizes=(16,)):
        """Compile the block step for the given block sizes ahead of
        the stream (hps.cu:392-409 analog) and restore the pristine
        state — warmup blocks must not advance the streams past
        phantom silence hops. The step DONATES its state input, so the
        warmup runs on a copied scratch state; the original buffers
        are never donated."""
        import numpy as np

        state0 = self.state
        self.state = jax.tree.map(jnp.copy, state0)
        for b in block_sizes:
            out = self.process_block(
                np.zeros((self.n_streams, b, self.cfg.hop), np.float32)
            )
        jax.block_until_ready(out)
        self.state = state0

    @property
    def stem_rows(self) -> dict:
        """Stem name -> row in process_block's output (None when the
        stem is disabled): the multi-stream step emits COMPACT rows —
        one per enabled stem — so a percussive-only serving fleet
        never materializes zero rows (see _block_step_body)."""
        en = enabled_stems(self.cfg)
        return {
            name: (en.index(i) if i in en else None)
            for i, name in enumerate(_STEMS)
        }

    def process_block(self, blocks):
        """blocks: [C, B, hop] -> outs [C, E, B*hop], one row per
        ENABLED stem (row order per ``stem_rows``; E=3 with the
        default OUTPUT_ALL)."""
        blocks = jnp.asarray(blocks, jnp.float32)
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            blocks = jax.device_put(
                blocks,
                NamedSharding(self._mesh, P(self._dp_axis, None, None)),
            )
        self.state, outs = block_step_multi(self.cfg, self.state, blocks)
        return outs

    def reset_streams(self, indices):
        """Reset the given stream slots to pristine state, leaving all
        other slots untouched — the serving move when a slot is
        recycled for a new client mid-flight. Multi-stream analog of
        reset_buffers (reference hps.h:296-321), with the same
        determinism contract: a reset slot reproduces a fresh stream
        bit-exactly (tested in tests/test_runtime.py). No recompile:
        one scatter over the channel axis, sharding preserved."""
        idx = jnp.asarray(indices, jnp.int32)
        fresh = init_state(self.cfg)
        self.state = jax.tree.map(
            lambda s, f: s.at[idx].set(f), self.state, fresh
        )
