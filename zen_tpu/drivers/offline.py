"""Offline HPR drivers.

``hpr_separate`` is one anticausal HPR pass, fully batched over frames
(the TPU-idiomatic replacement for the reference per-hop loop); it is
the building block both of the public 2-pass HPRIOffline driver below
and of the sharded pod-scale drivers in zen_tpu/parallel.

HPRIOffline mirrors zen::hps::HPRIOffline (reference: libzen/hps.cu:
21-221): Driedger's iterative "HPR-I" — pass 1 at a large hop for
harmonic separation, pass 2 at a small hop over (percussive+residual)
for percussive separation.

Deviation from the reference (deliberate, documented): the reference
creates its pass-2 engine with OUTPUT_PERCUSSIVE only (hps.cu:45-48)
but still copies its never-written residual buffer to the caller
(hps.cu:200-204), so the reference GPU "residual" stem is silence.
Here pass 2 runs with OUTPUT_PERCUSSIVE|OUTPUT_RESIDUAL so the residual
stem carries the actual non-percussive remainder of the intermediate.
Harmonic and percussive stems are unaffected and match the reference.
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

from ..engine.config import (
    OUTPUT_ALL,
    OUTPUT_PERCUSSIVE,
    OUTPUT_RESIDUAL,
    HPRConfig,
)
from ..engine.spectral import separate_frames
from ..errors import ZenError
from ..ops.framing import frame_signal, overlap_add_stream
from ..ops.median import WRAP


def _pass_trace(audio_padded, cfg: HPRConfig, n_frames: int, out_len: int):
    """Traceable single-pass body (jit-composable)."""
    frames = frame_signal(audio_padded, cfg.hop, n_frames)
    ys = separate_frames(frames, cfg)
    outs = {}
    for k, y in ys.items():
        if y is None:
            outs[k] = jnp.zeros(
                audio_padded.shape[:-1] + (out_len,), jnp.float32
            )
        else:
            outs[k] = overlap_add_stream(y, cfg.hop, advance=1)[..., :out_len]
    return outs


@functools.partial(jax.jit, static_argnames=("cfg", "n_frames", "out_len"))
def _offline_pass(audio_padded, cfg: HPRConfig, n_frames: int, out_len: int):
    return _pass_trace(audio_padded, cfg, n_frames, out_len)


def _pad_and_pass(audio, cfg: HPRConfig):
    """Traceable pad + pass (hpss_chunk_padder semantics, hps.cu:109-126)."""
    length = audio.shape[-1]
    n_frames = math.ceil(length / cfg.hop) + cfg.lag
    pad = n_frames * cfg.hop - length
    if pad:
        padding = [(0, 0)] * (audio.ndim - 1) + [(0, pad)]
        audio = jnp.pad(audio, padding)
    return _pass_trace(audio, cfg, n_frames, length)


@functools.partial(jax.jit, static_argnames=("cfg_h", "cfg_p"))
def _two_pass(audio, length, cfg_h: HPRConfig, cfg_p: HPRConfig):
    """The full 2-pass cascade as ONE device program — a single
    dispatch end-to-end (per-pass dispatch would pay host/tunnel RTT
    several times per clip).

    ``length`` is the *dynamic* true clip length: the input may be
    zero-padded to a compile bucket, and the intermediate is masked
    back to ``length`` so pass 2 sees exactly what it would have seen
    unbucketed (pass 1's OLA spill beyond the clip must not leak in,
    mirroring the reference's truncate-between-passes,
    hps.cu:171-178)."""
    pass1 = _pad_and_pass(audio, cfg_h)
    intermediate = pass1["percussive"] + pass1["residual"]
    keep = jnp.arange(intermediate.shape[-1]) < length
    intermediate = jnp.where(keep, intermediate, 0.0)
    pass2 = _pad_and_pass(intermediate, cfg_p)
    return pass1["harmonic"], pass2["percussive"], pass2["residual"]


def _resolve_auto_fft(cfg: HPRConfig, length: int, batch: int = 1) -> HPRConfig:
    """Pin fft_impl='auto' to 'dft'/'xla' from the clip's TRUE frame
    count (ceil(length/hop) + lag, times any leading batch dims — what
    an unbucketed trace would see in engine/spectral._dft_precision),
    so process(), hpr_separate and process_blocked all take the same
    transform path for a given clip regardless of padding buckets."""
    from ..engine.spectral import resolve_fft_impl

    n_frames = (math.ceil(length / cfg.hop) + cfg.lag) * max(1, batch)
    return resolve_fft_impl(cfg, n_frames)


def _bucket_len(length: int, hop: int) -> int:
    """Smallest power-of-two frame count covering ``length`` — clips
    share compiled executables per bucket instead of recompiling the
    whole cascade for every distinct clip length (<= 2x padded
    compute, amortized compile)."""
    frames = max(1, math.ceil(length / hop))
    return hop * (1 << (frames - 1).bit_length())


def hpr_separate(audio, cfg: HPRConfig) -> dict:
    """One offline HPR pass on [..., L] audio -> dict of [..., L] stems.

    Padding mirrors hpss_chunk_padder (hps.cu:109-126): round up to a
    whole number of hops, plus ``lag`` extra warm-up chunks whose output
    is shifted away again by the OLA assembly (advance=1, framing.py).

    Memory is O(frames): the whole spectrogram lives in HBM (~7 MB per
    second of 44.1 kHz audio across the default cascade). Above
    LONG_TRACK_SAMPLES (~10 min) the drivers route to
    hpr_separate_blocked, which bounds the spectrogram working set.
    """
    audio = jnp.asarray(audio, jnp.float32)
    return _one_pass(audio, cfg)


# switch to the blocked (overlap-save) offline mode above this many
# samples: the batched spectrogram costs ~160 BYTES of HBM per input
# sample across the default cascade (~7 MB per second at 44.1 kHz),
# so ~28.8M samples (~10 min at 48 kHz) costs ~4.6 GB — comfortably
# inside one chip. Sample-count based — memory scales with samples,
# not seconds. Shared by the CLI and the corpus driver so their
# routing agrees.
LONG_TRACK_SAMPLES = 600 * 48000


def _blocked_block(cfg: HPRConfig, bf: int, back: int, fwd: int, samples, tails):
    """One overlap-save block (traceable): samples
    [(back+bf+fwd+1)*hop] covering the raw audio of frames
    [s-back, s+bf+fwd) (frame t = samples at global
    [(t-1)*hop, (t+1)*hop); global edges read the guard pads' zeros);
    tails [3, hop] = each stem's carried OLA tail."""
    from ..engine.spectral import (
        analyze,
        compute_masks,
        feature_transform,
        finalize_features,
        freq_filtered,
        synthesize,
        time_filtered,
        time_filtered_tail,
    )

    hop = cfg.hop
    n_ext = back + bf + fwd
    seg = samples.reshape(n_ext + 1, hop)
    frames = jnp.concatenate([seg[:-1], seg[1:]], axis=-1)

    s_spec = analyze(frames, cfg)
    feat = feature_transform(jnp.abs(s_spec), cfg)
    # time filter only rows >= back (halo rows are tap context; the
    # kept rows' forward taps stay inside the extended block)
    h = time_filtered_tail(feat, cfg, back)[:bf]
    core = slice(back, back + bf)
    p = freq_filtered(feat[core], cfg)
    h, p = finalize_features(h, p, cfg)
    pm, hm, rm = compute_masks(h, p, cfg)
    outs = []
    new_tails = []
    masks = {"harmonic": hm, "percussive": pm, "residual": rm}
    for i, name in enumerate(("harmonic", "percussive", "residual")):
        enabled = getattr(cfg, f"output_{name}") and masks[name] is not None
        if not enabled:
            outs.append(jnp.zeros((bf * hop,), jnp.float32))
            new_tails.append(tails[i])
            continue
        y = synthesize(s_spec[core], masks[name], cfg)  # [bf, nwin]
        # chunk j = y[j][:hop] + y[j-1][hop:], with the carried tail as
        # frame -1 — overlap_add_stream(advance=1) on [tail_row ++ y]
        tail_row = jnp.concatenate([jnp.zeros((hop,), jnp.float32), tails[i]])
        outs.append(
            overlap_add_stream(
                jnp.concatenate([tail_row[None], y], axis=0), hop, advance=1
            )
        )
        new_tails.append(y[-1, hop:])
    return jnp.stack(outs), jnp.stack(new_tails)


@functools.partial(
    jax.jit, static_argnames=("cfg", "bf", "back", "fwd", "nb")
)
def _blocked_scan(padded, cfg: HPRConfig, bf: int, back: int, fwd: int, nb: int):
    """ONE device dispatch for a whole track: the (b0=0, ng=nb,
    zero-tails) case of _blocked_scan_segment — one scan body, so the
    checkpointed path's byte-parity with this one cannot drift (review
    finding: the two hand-synchronized copies were a parity hazard).
    Jitted via the segment (static ng): repeat calls with the same
    (cfg, bf, nb) reuse the compiled executable."""
    tails0 = jnp.zeros((3, cfg.hop), jnp.float32)
    _, outs = _blocked_scan_segment(
        padded, tails0, jnp.int32(0), cfg, bf, back, fwd, nb
    )
    return outs


def hpr_separate_blocked(
    audio, cfg: HPRConfig, block_frames: int = 2048
) -> dict:
    """Offline pass as sequential overlap-save over time blocks: the
    spectrogram working set is O(block_frames) instead of O(track
    frames) — the dominant memory term of the batched form, ~160
    bytes per input sample across the default cascade (the waveform
    input/stems themselves remain O(track), 4 bytes/sample each). The
    reference's bounded sliding window has the same property
    (hps.h:233-234); the sharded SP driver realizes the same halo
    math across devices (parallel/sharded.py).

    Matches hpr_separate: each block's feature matrix is computed
    with ``back``/``fwd`` halo frames of context (the time filter's
    tap reach), the halo rows are discarded after filtering, and the
    OLA seam carries one frame tail between blocks. Global edges see
    the same zero-prefill the unblocked form sees. The fft seam is
    resolved from the track's total frame count (as the unblocked
    trace would see it), so the transform choice cannot differ."""
    audio1 = jnp.asarray(audio, jnp.float32)
    if audio1.ndim != 1:
        raise ZenError("hpr_separate_blocked expects [L] audio")
    hop = cfg.hop
    length = int(audio1.shape[-1])
    n_frames = math.ceil(length / hop) + cfg.lag
    cfg = _resolve_auto_fft(cfg, length)
    # short inputs: shrink the block to the track's own pow2 bucket
    # (a 110-frame clip must not pay for a 2048-frame block of zeros)
    bf = min(block_frames, 1 << (max(1, n_frames) - 1).bit_length())
    n_blocks = max(1, -(-n_frames // bf))
    # power-of-two block counts: executables are shared across track
    # lengths (extra blocks process guard zeros and are truncated)
    n_blocks = 1 << (n_blocks - 1).bit_length()
    back = cfg.time_history
    fwd = max(max(cfg.time_offsets), 0)

    # samples for frame t = concat(zeros(hop), audio)[t*hop : t*hop+2hop]
    # (ops/framing.py); guard pads cover halos at the global edges and
    # the final partial block
    guard_lo = (back + 1) * hop
    guard_hi = (n_blocks * bf + fwd + 1) * hop - length
    padded = jnp.pad(audio1, (guard_lo, max(guard_hi, 0)))

    full = _blocked_scan(padded, cfg, bf, back, fwd, n_blocks)
    # blocked chunk for frame t lands at t*hop; the unblocked
    # advance=1 assembly emits out[k] = y[k+1][:hop] + y[k][hop:] at
    # k*hop — i.e. the blocked stream shifted by exactly one hop
    # (frame 0's chunk is the zero warm-up the unblocked form never
    # emits)
    return {
        name: full[name_i, hop : hop + length]
        for name_i, name in enumerate(("harmonic", "percussive", "residual"))
    }


@functools.partial(
    jax.jit, static_argnames=("cfg", "bf", "back", "fwd", "ng")
)
def _blocked_scan_segment(
    padded, tails, b0, cfg: HPRConfig, bf: int, back: int, fwd: int, ng: int
):
    """``ng`` overlap-save blocks starting at global block index ``b0``
    (dynamic — one executable serves every segment of a track),
    carrying the OLA tails in and out: the segmented form of
    _blocked_scan whose carry can be made durable between segments
    (mid-track checkpoint/resume). Bit-identical per block: the scan
    body is the same _blocked_block trace."""
    hop = cfg.hop
    span = (back + bf + fwd + 1) * hop

    def scan_body(tails, j):
        samples = jax.lax.dynamic_slice(
            padded, ((b0 + j) * (bf * hop),), (span,)
        )
        out, tails = _blocked_block(cfg, bf, back, fwd, samples, tails)
        return tails, out

    tails, outs = jax.lax.scan(scan_body, tails, jnp.arange(ng))
    return tails, outs.transpose(1, 0, 2).reshape(3, ng * bf * hop)


def _cfg_digest(cfg: HPRConfig) -> str:
    """Stable fingerprint of a config for checkpoint compatibility
    checks (a resumed run must not silently continue a track that was
    started under different parameters)."""
    import hashlib

    return hashlib.sha1(repr(cfg).encode()).hexdigest()[:16]


def _fsync_file(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def hpr_separate_blocked_checkpointed(
    audio,
    cfg: HPRConfig,
    block_frames: int = 2048,
    ckpt_dir: str | None = None,
    tag: str = "track",
    ckpt_every_blocks: int = 8,
    on_segment=None,
) -> dict:
    """hpr_separate_blocked with mid-track durability: the scan runs
    in segments of ``ckpt_every_blocks`` blocks; after each segment the
    finished stem samples land in an on-disk buffer and the OLA-tail
    carry + next block index are checkpointed atomically
    (runtime/checkpoint.save_stream_state_durable). A SIGKILL at any
    point loses at most one segment of compute — a crash 3 hours into
    a 4-hour track resumes from the last durable segment instead of
    from zero (round-2 verdict weak #3; the reference's determinism
    mechanism hps.h:296-321 is what makes the resumed stems
    byte-match an uninterrupted run).

    ``on_segment(next_block, n_blocks)`` is called after each durable
    segment (progress reporting). With ckpt_dir=None this is exactly
    hpr_separate_blocked.

    Files under ckpt_dir: <tag>.stems.f32 (raw [3, padded] float32)
    and <tag>.ckpt.npz; both are deleted by clear_track_checkpoint
    once the caller has durably consumed the stems."""
    import numpy as np

    if ckpt_dir is None:
        return hpr_separate_blocked(audio, cfg, block_frames)
    from ..runtime.checkpoint import (
        load_stream_state,
        save_stream_state_durable,
    )

    audio1 = jnp.asarray(audio, jnp.float32)
    if audio1.ndim != 1:
        raise ZenError("hpr_separate_blocked_checkpointed expects [L] audio")
    hop = cfg.hop
    length = int(audio1.shape[-1])
    n_frames = math.ceil(length / hop) + cfg.lag
    cfg = _resolve_auto_fft(cfg, length)
    bf = min(block_frames, 1 << (max(1, n_frames) - 1).bit_length())
    n_blocks = max(1, -(-n_frames // bf))
    n_blocks = 1 << (n_blocks - 1).bit_length()
    back = cfg.time_history
    fwd = max(max(cfg.time_offsets), 0)
    guard_lo = (back + 1) * hop
    guard_hi = (n_blocks * bf + fwd + 1) * hop - length
    padded = jnp.pad(audio1, (guard_lo, max(guard_hi, 0)))

    os.makedirs(ckpt_dir, exist_ok=True)
    stems_path = os.path.join(ckpt_dir, f"{tag}.stems.f32")
    ckpt_path = os.path.join(ckpt_dir, f"{tag}.ckpt.npz")
    meta_want = {
        "cfg": _cfg_digest(cfg),
        "bf": bf,
        "nb": n_blocks,
        "length": length,
    }
    total = n_blocks * bf * hop

    tails = jnp.zeros((3, hop), jnp.float32)
    start_block = 0
    if os.path.exists(ckpt_path) and os.path.exists(stems_path):
        try:
            state, meta = load_stream_state(ckpt_path, like=tails)
            if all(meta.get(k) == v for k, v in meta_want.items()):
                # parse BEFORE adopting the carry: a checkpoint whose
                # next_block is missing/corrupt must restart with zero
                # tails, not recompute block 0 seeded with a mid-track
                # carry (silent stem corruption)
                start_block = int(meta["next_block"])
                tails = state
        except Exception:  # noqa: BLE001 — corrupt checkpoint: restart
            tails = jnp.zeros((3, hop), jnp.float32)
            start_block = 0
    mm = np.memmap(
        stems_path,
        np.float32,
        mode="r+" if start_block > 0 else "w+",
        shape=(3, total),
    )
    b = start_block
    while b < n_blocks:
        ng = min(ckpt_every_blocks, n_blocks - b)
        tails, outs = _blocked_scan_segment(
            padded, tails, jnp.int32(b), cfg, bf, back, fwd, ng
        )
        mm[:, b * bf * hop : (b + ng) * bf * hop] = np.asarray(outs)
        mm.flush()
        _fsync_file(stems_path)  # stems durable BEFORE the checkpoint
        # claims them — a crash between the two recomputes the segment
        b += ng
        save_stream_state_durable(
            ckpt_path, tails, {**meta_want, "next_block": b}
        )
        if on_segment is not None:
            on_segment(b, n_blocks)
    return {
        name: np.array(mm[i, hop : hop + length])
        for i, name in enumerate(("harmonic", "percussive", "residual"))
    }


def clear_track_checkpoint(ckpt_dir: str, tag: str) -> None:
    """Remove a track's mid-track checkpoint artifacts (call once the
    final stems are durably written and journaled)."""
    for suffix in (".stems.f32", ".ckpt.npz", ".ckpt.npz.tmp"):
        try:
            os.remove(os.path.join(ckpt_dir, tag + suffix))
        except FileNotFoundError:
            pass


@functools.partial(jax.jit, static_argnames=("cfg",))
def _one_pass(audio, cfg: HPRConfig):
    return _pad_and_pass(audio, cfg)


class HPRIOffline:
    """2-pass offline HPR-I separation (hps.cu:128-221, GPU semantics).

    process(audio[..., L]) -> (harmonic, percussive, residual), each
    [..., L]: harmonic from pass 1 (hop_h), percussive/residual from
    pass 2 (hop_p) run on pass 1's (percussive + residual).
    """

    def __init__(
        self,
        fs: float,
        hop_h: int = 4096,
        hop_p: int = 256,
        beta_h: float = 2.0,
        beta_p: float = 2.0,
        border: str = WRAP,
        use_sse: bool = False,
        soft_mask: bool = False,
        strict_ref: bool = False,
        fft_impl: str = "auto",
        median_impl: str = "auto",
        stream_state: str = "f32",
    ):
        """strict_ref=True reproduces the reference GPU binary's
        residual quirk bit-for-bit: its pass-2 engine is constructed
        OUTPUT_PERCUSSIVE-only (hps.cu:45-48) yet process() copies the
        never-written residual buffer to the caller (hps.cu:200-204),
        so the reference's offline residual stem is SILENCE. The
        default here deliberately runs pass 2 with residual enabled so
        the stem carries the actual non-percussive remainder (module
        docstring); flip this on to A/B separations against the real
        `zen` binary."""
        if hop_h % hop_p != 0:
            raise ZenError("hop_h and hop_p should be evenly divisible")
        common = dict(
            fs=fs,
            causal=False,
            border=border,
            use_sse=use_sse,
            soft_mask=soft_mask,
            fft_impl=fft_impl,
            median_impl=median_impl,
            # accepted for driver-kwarg uniformity; the anticausal
            # offline engine carries no streaming history, so the knob
            # is inert here (config.py stream_state docstring)
            stream_state=stream_state,
        )
        self.strict_ref = bool(strict_ref)
        self.cfg_h = HPRConfig(
            hop=hop_h, beta=beta_h, outputs=OUTPUT_ALL, **common
        )
        # strict mode mirrors the reference's percussive-only pass-2
        # engine exactly (skipping the residual synthesis, like the
        # reference's OUTPUT check does); the percussive stem is
        # unaffected either way — stems are independent mask
        # applications of the same spectra
        p_outputs = (
            OUTPUT_PERCUSSIVE
            if self.strict_ref
            else OUTPUT_PERCUSSIVE | OUTPUT_RESIDUAL
        )
        self.cfg_p = HPRConfig(
            hop=hop_p, beta=beta_p, outputs=p_outputs, **common
        )

    def use_sse_filter(self):
        import dataclasses

        self.cfg_h = dataclasses.replace(self.cfg_h, use_sse=True)
        self.cfg_p = dataclasses.replace(self.cfg_p, use_sse=True)

    def use_soft_mask(self):
        import dataclasses

        self.cfg_h = dataclasses.replace(self.cfg_h, soft_mask=True)
        self.cfg_p = dataclasses.replace(self.cfg_p, soft_mask=True)

    def process_blocked(
        self,
        audio,
        block_frames_h: int = 512,
        block_frames_p: int = 8192,
        ckpt_dir: str | None = None,
        tag: str = "track",
        ckpt_every_blocks: int = 8,
        on_segment=None,
    ):
        """2-pass separation for very long tracks on one chip: each
        pass streams overlap-save time blocks (hpr_separate_blocked),
        so the spectrogram working set is O(block) instead of the
        batched form's ~160 floats/sample. Device memory still holds
        the waveforms (~6x track floats peak: input + intermediate +
        3 stems) — a multi-hour 44.1 kHz track peaks at a few GB, vs
        hundreds for the batched form. Identical output to process().

        With ``ckpt_dir`` set, both passes run mid-track-checkpointed
        (hpr_separate_blocked_checkpointed): a kill at any point
        resumes from the last durable segment of whichever pass was
        running, byte-identically. The caller should
        clear_track_checkpoint(ckpt_dir, f"{tag}.p1"/".p2") once the
        stems are durably consumed.
        """
        audio = jnp.asarray(audio, jnp.float32)
        if audio.ndim != 1:
            raise ZenError("process_blocked expects [L] audio")
        ck = dict(
            ckpt_dir=ckpt_dir,
            ckpt_every_blocks=ckpt_every_blocks,
            on_segment=on_segment,
        )
        pass1 = hpr_separate_blocked_checkpointed(
            audio, self.cfg_h, block_frames_h, tag=f"{tag}.p1", **ck
        )
        inter = pass1["percussive"] + pass1["residual"]
        harmonic = pass1["harmonic"]
        del pass1  # release the pass-1 perc/residual buffers before
        # pass 2 allocates its own three stems (peak memory)
        pass2 = hpr_separate_blocked_checkpointed(
            inter, self.cfg_p, block_frames_p, tag=f"{tag}.p2", **ck
        )
        return (
            harmonic,
            pass2["percussive"],
            pass2["residual"],
        )

    def process(self, audio):
        # xp1 + xr1 feeds pass 2 (hps.cu:152-158); residual is zero for
        # soft/SSE variants, as in the reference (hps.cu:562, 582-652).
        # Both passes run fused as one jitted device program, on a
        # power-of-two length bucket (bit-identical to unbucketed; see
        # _two_pass).
        audio = jnp.asarray(audio, jnp.float32)
        length = audio.shape[-1]
        # Resolve the fft_impl='auto' transform seam from the TRUE
        # frame count before bucketing: _dft_precision inside the trace
        # would otherwise see the power-of-two-padded count, taking a
        # different transform path than hpr_separate/process_blocked
        # near the nfft=4096/256-frame threshold — and a clip's result
        # could change when its bucket changes.
        batch = math.prod(audio.shape[:-1]) if audio.ndim > 1 else 1
        cfg_h = _resolve_auto_fft(self.cfg_h, length, batch)
        cfg_p = _resolve_auto_fft(self.cfg_p, length, batch)
        nb = _bucket_len(length, self.cfg_h.hop)
        if nb != length:
            padding = [(0, 0)] * (audio.ndim - 1) + [(0, nb - length)]
            audio = jnp.pad(audio, padding)
        h, p, r = _two_pass(audio, length, cfg_h, cfg_p)
        return h[..., :length], p[..., :length], r[..., :length]

