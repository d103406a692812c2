"""Batched spectral HPR core — the TPU-idiomatic reformulation.

The reference streams one hop at a time, re-filtering its whole
stft_width x nfft sliding matrix per hop but consuming only a single
row of it (the lag column; hps.cu:488-580). Here the algorithm is
reformulated framewise: every STFT frame's filtered row is computed
exactly once over the whole [T, F] spectrogram — an O(stft_width)
algorithmic reduction over the reference before any kernel tuning —
and everything is static-shape, batched, and jit-compiled once.

Equivalence to the reference hop loop is established by the tap-offset
decode in engine/config.py and tested against a direct hop-by-hop
oracle (engine/oracle.py, tests/test_engine_parity.py).

All functions take arrays with arbitrary leading batch dims
([..., T, F]) so channel batching/sharding is a vmap/pjit concern of
the drivers, not of the math.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fft as zfft
from ..ops.box import sliding_mean
from ..ops.median import VALID, sliding_median
from .config import EPS, HPRConfig


def num_bins(cfg: HPRConfig) -> int:
    """Frequency bins carried through the pipeline."""
    return cfg.nfft // 2 + 1 if cfg.fast_rfft else cfg.nfft


def _dft_precision(cfg: HPRConfig, total_frames: int):
    """Resolve the transform seam: None = use the XLA FFT; otherwise
    the MXU DFT-matmul path at the returned matmul precision.

    'auto' picks the DFT at 3-pass-bf16 on TPU when the matmul has
    enough rows to feed the MXU: always for nfft <= 2048 (measured
    faster at every observed batch), and for nfft = 4096 only with
    >= 256 visible frames (a [32, 2048] x [2048, 4098] matmul starves
    the MXU and loses to the FFT). ``total_frames`` is the frame count
    visible at trace time — a vmap batch dim is not visible, so
    drivers that know their true batch (MultiStreamHPR) set
    fft_impl='dft' explicitly. The exact C2C path (fast_rfft=False)
    always uses XLA.
    """
    if not cfg.fast_rfft or cfg.fft_impl == "xla":
        return None
    if cfg.fft_impl == "auto":
        if jax.default_backend() != "tpu" or cfg.nfft > 4096:
            return None
        if cfg.nfft > 2048 and total_frames < 256:
            return None
        return jax.lax.Precision.HIGH
    return {
        "dft": jax.lax.Precision.HIGH,
        "dft_bf16": jax.lax.Precision.DEFAULT,
        "dft_f32": jax.lax.Precision.HIGHEST,
    }[cfg.fft_impl]


def resolve_fft_impl(cfg: HPRConfig, total_frames: int) -> HPRConfig:
    """Pin ``fft_impl='auto'`` to 'dft'/'xla' from the workload's TRUE
    total frame count — the single resolver for every driver seam.

    ``total_frames`` is the number of FFT rows the workload really
    batches per device program: frames x all leading batch dims
    (channels, streams, shards). Drivers must compute it from what
    they know at build time — vmap batch dims, padding buckets and
    shard splits are invisible to the trace-time fallback in
    _dft_precision, and each driver patching around that independently
    is exactly the divergence this function collapses (round-2 verdict
    weak #8). Call sites: drivers/offline._resolve_auto_fft,
    drivers/realtime.resolve_multistream_fft_impl,
    parallel/sharded.sharded_separate.
    """
    if cfg.fft_impl != "auto":
        return cfg
    import dataclasses

    resolved = "dft" if _dft_precision(cfg, total_frames) is not None else "xla"
    return dataclasses.replace(cfg, fft_impl=resolved)


def analyze(frames: jnp.ndarray, cfg: HPRConfig) -> jnp.ndarray:
    """Window + FFT: [..., T, nwin] -> complex spectra [..., T, bins].

    Mirrors the windowing (hps.cu:455-458), zero-pad to nfft
    (hps.cu:461-462) and forward FFT (hps.cu:465) of process_next_hop.
    """
    win = jnp.asarray(cfg.window)
    xw = frames.astype(jnp.float32) * win
    if cfg.fast_rfft:
        prec = _dft_precision(cfg, int(np.prod(xw.shape[:-1])))
        if prec is not None:
            return zfft.rfft_forward_dft(xw, cfg.nfft, prec)
        return zfft.rfft_forward(xw, cfg.nfft)
    return zfft.fft_forward(xw.astype(jnp.complex64), cfg.nfft)


def analyze_packed(frames: jnp.ndarray, cfg: HPRConfig):
    """analyze() in PACKED REAL form for the DFT-matmul path:
    window + forward matmul -> ([..., T, 2*bins], precision), or None
    when the config resolves to the XLA FFT (caller falls back to the
    complex pipeline). The packed form feeds magnitude_packed /
    synthesize_packed so the complex intermediate and its re/im
    split + repack never materialize (the serving step's
    transform-leg glue — docs/PERFORMANCE.md round 5)."""
    if not cfg.fast_rfft:
        return None
    prec = _dft_precision(cfg, int(np.prod(frames.shape[:-1])))
    if prec is None:
        return None
    win = jnp.asarray(cfg.window)
    xw = frames.astype(jnp.float32) * win
    return zfft.rfft_forward_dft_packed(xw, cfg.nfft, prec), prec


def magnitude_packed(packed: jnp.ndarray, cfg: HPRConfig) -> jnp.ndarray:
    """|S| from the packed re|im halves. (sqrt(re^2+im^2), same as
    the XLA lowering of abs(complex) up to float rounding — the DFT
    path is tolerance-validated, not bit-pinned, vs the FFT.)"""
    bins = cfg.nfft // 2 + 1
    re = packed[..., :bins]
    im = packed[..., bins:]
    return jnp.sqrt(re * re + im * im)


def synthesize_packed(
    packed: jnp.ndarray, mask: jnp.ndarray, cfg: HPRConfig, prec
) -> jnp.ndarray:
    """synthesize() on a packed spectrum: mask applied to both
    halves, inverse matmul directly on the packed rows."""
    scale = jnp.float32(cfg.synth_scale)
    masked = packed * jnp.concatenate([mask, mask], axis=-1)
    return (
        zfft.irfft_head_dft_packed(masked, cfg.nfft, cfg.nwin, prec) * scale
    )


def feature_transform(mag: jnp.ndarray, cfg: HPRConfig) -> jnp.ndarray:
    """The quantity the directional filters run on: |S| for the median
    path (hps.cu:492-493), 1/|S|^2 for the SSE path (hps.cu:586-592)."""
    if cfg.use_sse:
        return 1.0 / (mag * mag)
    return mag


def _use_pallas(cfg: HPRConfig) -> bool:
    """Resolve the median backend seam: Pallas kernels on TPU (26x
    faster than the XLA sort lowering for the large-K frequency
    median, see bench/kernels.py), XLA elsewhere."""
    if cfg.median_impl == "pallas":
        return True
    if cfg.median_impl == "xla":
        return False
    return jax.default_backend() == "tpu"


def _pallas_time_median(
    feats: jnp.ndarray, cfg: HPRConfig, start: int = 0
) -> jnp.ndarray:
    from ..ops.median_pallas import tap_median_time_pallas

    return tap_median_time_pallas(
        feats, tuple(cfg.time_offsets), fill=prefill_value(cfg), start=start
    )


def _last_axis_pad(x: jnp.ndarray, lo: int, hi: int, **kw) -> jnp.ndarray:
    pad = [(0, 0)] * (x.ndim - 1) + [(lo, hi)]
    return jnp.pad(x, pad, **kw)


def _pallas_freq_median(feats: jnp.ndarray, cfg: HPRConfig) -> jnp.ndarray:
    from ..ops.median_pallas import (
        sliding_median_boundary_pallas,
        sliding_median_last_axis_pallas,
    )

    k = cfg.freq_filter_len
    fboundary = "reflect" if cfg.fast_rfft else cfg.freq_boundary
    if cfg.border == VALID:
        xp = _last_axis_pad(feats, 0, k - 1)
        p = sliding_median_last_axis_pallas(xp, k)
        nb = feats.shape[-1]
        keep = jnp.arange(nb) <= nb - k - 1
        return jnp.where(keep, p, 0.0)
    mode = {"reflect": "reflect", "wrap": "wrap", "clamp": "edge"}[fboundary]
    # boundary + transposes fuse into the kernel when the folded rows
    # qualify (the serving fast path — see _freq_kernel_fused)
    return sliding_median_boundary_pallas(feats, k, mode)


def prefill_value(cfg: HPRConfig) -> float:
    """Feature value of a zero prefill frame: |0| = 0 for the median
    path, 1/0^2 = +inf for the SSE reciprocal feature (IEEE semantics
    identical to the reference's CUDA float math)."""
    return float("inf") if cfg.use_sse else 0.0


def time_filtered(feats: jnp.ndarray, cfg: HPRConfig) -> jnp.ndarray:
    """Time-direction filter over [..., T, bins] using the decoded tap
    offsets. The boundary along T is constant-fill: out-of-range frames
    are the sliding window's zero prefill (border modes act *within*
    the window and are already folded into the offsets)."""
    if not cfg.lag_row_written:
        # valid-ROI anticausal with l_harm <= 2: the reference never
        # writes the lag row, so masking sees an all-zero harmonic
        # matrix (config.lag_row_written)
        return jnp.zeros_like(feats)
    fill = prefill_value(cfg)
    if cfg.use_sse:
        return sliding_mean(feats, cfg.time_offsets, -2, "zero", fill)
    if _use_pallas(cfg):
        return _pallas_time_median(feats, cfg)
    return sliding_median(feats, cfg.time_offsets, -2, "zero", fill=fill)


def time_filtered_tail(
    feats: jnp.ndarray, cfg: HPRConfig, start: int
) -> jnp.ndarray:
    """time_filtered restricted to output rows start..T-1 — the
    streaming block step's form: the history rows exist only as tap
    context and their filtered values are never consumed, so the
    Pallas path skips computing them entirely (up to ~(H+1)x less
    median work at B=1)."""
    if not cfg.lag_row_written:
        return jnp.zeros_like(feats[..., start:, :], dtype=jnp.float32)
    fill = prefill_value(cfg)
    if cfg.use_sse:
        # SSE sums: bf16 accumulation would change numerics, so mean
        # always runs on f32 taps
        return sliding_mean(
            feats.astype(jnp.float32), cfg.time_offsets, -2, "zero", fill
        )[..., start:, :]
    if _use_pallas(cfg):
        out = _pallas_time_median(feats, cfg, start=start)
    else:
        out = sliding_median(feats, cfg.time_offsets, -2, "zero", fill=fill)[
            ..., start:, :
        ]
    # median is pure selection, so a bf16 history (stream_state='bf16')
    # yields bf16-exact values; masks and synthesis stay in f32
    return out.astype(jnp.float32)


def time_filtered_tail_pair(
    hist: jnp.ndarray, fresh: jnp.ndarray, cfg: HPRConfig
) -> jnp.ndarray:
    """time_filtered_tail over the VIRTUAL concat [hist ++ fresh]
    with start = hist rows, for the serving block step where every
    tap is in-bounds (B >= time_history, causal offsets). The Pallas
    pair kernel assembles the tap slab in VMEM, so the 2x-slab-sized
    HBM concat the materialized path pays per step never exists
    (~111 MB/step at 512 streams — the round-5 serving bound hunt's
    largest removable term, benches/hbm_pattern.py). Non-Pallas /
    SSE configs fall back to the materialized form; callers that need
    the concat for other reasons (B < history) use time_filtered_tail
    directly."""
    h_len = hist.shape[-2]
    if (
        cfg.lag_row_written
        and not cfg.use_sse
        and _use_pallas(cfg)
        and -min(cfg.time_offsets) <= h_len
        and max(cfg.time_offsets) <= 0
    ):
        from ..ops.median_pallas import tap_median_time_pair_pallas

        out = tap_median_time_pair_pallas(
            hist, fresh, tuple(cfg.time_offsets)
        )
        return out.astype(jnp.float32)
    feats = jnp.concatenate([hist, fresh.astype(hist.dtype)], axis=-2)
    return time_filtered_tail(feats, cfg, h_len)


def freq_filtered(feats: jnp.ndarray, cfg: HPRConfig) -> jnp.ndarray:
    """Frequency-direction filter along the last axis (per frame)."""
    fboundary = "reflect" if cfg.fast_rfft else cfg.freq_boundary
    if cfg.use_sse:
        return sliding_mean(feats, cfg.freq_offsets, -1, fboundary)
    if _use_pallas(cfg):
        return _pallas_freq_median(feats, cfg)
    p = sliding_median(feats, cfg.freq_offsets, -1, fboundary)
    if cfg.border == VALID:
        # NPP valid-ROI never writes the top filter_len bins (mfilt.h:152)
        nb = feats.shape[-1]
        keep = jnp.arange(nb) <= nb - cfg.freq_filter_len - 1
        p = jnp.where(keep, p, 0.0)
    return p


def finalize_features(h: jnp.ndarray, p: jnp.ndarray, cfg: HPRConfig):
    """SSE re-reciprocation scaled by (l+1) (hps.cu:598-604)."""
    if cfg.use_sse:
        h = (1.0 / h) * jnp.float32(cfg.l_harm + 1.0)
        p = (1.0 / p) * jnp.float32(cfg.l_perc + 1.0)
    return h, p


def filter_features(mag: jnp.ndarray, cfg: HPRConfig):
    """Time- and frequency-direction filtered feature matrices (the
    reference's harmonic_matrix / percussive_matrix at the lag row,
    computed for every frame at once).

    mag: |S| over [..., T, bins]. Returns (H, P) of the same shape.

    Median path: hps.cu:488-496. SSE path: hps.cu:582-604 —
    reciprocal of |S|^2, box means, reciprocal scaled by (l+1).
    """
    feats = feature_transform(mag, cfg)
    h = time_filtered(feats, cfg)
    p = freq_filtered(feats, cfg)
    return finalize_features(h, p, cfg)


def compute_masks(h: jnp.ndarray, p: jnp.ndarray, cfg: HPRConfig):
    """Percussive / harmonic / residual masks from filtered matrices.

    Hard mask (hps.h:100-113): (x / (y + eps)) >= beta, with the
    harmonic mask using beta - eps so ties go percussive (hps.cu:540).
    Soft/Wiener mask (hps.h:116-129): x^p / (x^p + y^p + eps) with
    p = int(beta). SSE mask (hps.h:132-140): x^2/(x^2 + y^2 + eps).

    Residual (hard-mask only, hps.cu:562-567): 1 - (hmask + pmask),
    where a mask contributes 0 if its output is disabled (the
    reference's mask buffers stay zero when unwritten).
    """
    eps = jnp.float32(EPS)
    if cfg.use_sse:
        pm = (p * p) / (p * p + h * h + eps)
        hm = (h * h) / (h * h + p * p + eps)
        rm = None
    elif cfg.soft_mask:
        pw = cfg.soft_power
        pm = p**pw / (p**pw + h**pw + eps)
        hm = h**pw / (h**pw + p**pw + eps)
        rm = None
    else:
        beta = jnp.float32(cfg.beta)
        pm = (p / (h + eps) >= beta).astype(jnp.float32)
        hm = (h / (p + eps) >= beta - eps).astype(jnp.float32)
        hm_eff = hm if cfg.output_harmonic else jnp.zeros_like(hm)
        pm_eff = pm if cfg.output_percussive else jnp.zeros_like(pm)
        rm = 1.0 - (hm_eff + pm_eff)
    return pm, hm, rm


def synthesize(s: jnp.ndarray, mask: jnp.ndarray, cfg: HPRConfig) -> jnp.ndarray:
    """Masked inverse FFT, scaled, truncated to nwin: [..., T, nwin].

    y = Re(IFFT(S * mask)) * nfft * COLA — the unnormalized backward
    transform (fftw.h:40-43) folded with the OLA COLA factor
    (hps.h:68-80) into one static scale.
    """
    scale = jnp.float32(cfg.synth_scale)
    masked = s * mask
    if cfg.fast_rfft:
        prec = _dft_precision(cfg, int(np.prod(masked.shape[:-1])))
        if prec is not None:
            return (
                zfft.irfft_head_dft(masked, cfg.nfft, cfg.nwin, prec)
                * scale
            )
        y = jnp.fft.irfft(masked, n=cfg.nfft, axis=-1)
    else:
        y = jnp.fft.ifft(masked, axis=-1).real
    return y[..., : cfg.nwin] * scale


def separate_frames(frames: jnp.ndarray, cfg: HPRConfig):
    """frames [..., T, nwin] -> dict of per-frame scaled iFFT chunks
    y [..., T, nwin] for each enabled output (None when disabled)."""
    s = analyze(frames, cfg)
    mag = jnp.abs(s)
    h, p = filter_features(mag, cfg)
    pm, hm, rm = compute_masks(h, p, cfg)
    out = {"harmonic": None, "percussive": None, "residual": None}
    if cfg.output_percussive:
        out["percussive"] = synthesize(s, pm, cfg)
    if cfg.output_harmonic:
        out["harmonic"] = synthesize(s, hm, cfg)
    if cfg.output_residual and rm is not None:
        out["residual"] = synthesize(s, rm, cfg)
    return out
