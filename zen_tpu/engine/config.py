"""HPR engine configuration and derived parameters.

Mirrors the reference HPR ctor derivation bit-for-bit
(reference: libzen/hps.h:216-285):

    nwin       = 2 * hop
    nfft       = 4 * hop
    l_harm     = roundf(0.2 / ((nfft - hop) / fs))      # time filter
    lag        = l_harm (anticausal) | 1 (causal)
    l_perc     = roundf(500 / (fs / nfft))              # frequency filter
    stft_width = 2 * l_harm
    COLA       = nfft / sum(win**2), win = sqrt(periodic hann(nwin))

roundf is C round-half-away-from-zero computed in float32.

The reference's backend/border variants collapse to a single ``border``
knob (see ops/median.py for the decoded geometry):
  'wrap'      == reference GPU with copy_bord (default of both drivers)
  'valid'     == reference GPU --nocopybord
  'replicate' == reference CPU (IPP) backend

For the engine only the masked lag row matters each hop, so every
variant reduces to a static list of *time tap offsets* relative to the
output frame, exposed here as ``time_offsets``. The frequency filter is
per-frame and exposed as window length + boundary rule.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np

from ..errors import ZenError
from ..ops import windows
from ..ops.median import REPLICATE, VALID, WRAP, odd_filter_len

# output flags — mirror zen::hps::OUTPUT_* (libzen/libzen/hps.h:25-27)
OUTPUT_HARMONIC = 1
OUTPUT_PERCUSSIVE = 1 << 1
OUTPUT_RESIDUAL = 1 << 2
OUTPUT_ALL = OUTPUT_HARMONIC | OUTPUT_PERCUSSIVE | OUTPUT_RESIDUAL

EPS = float(np.finfo(np.float32).eps)  # std::numeric_limits<float>::epsilon


def _roundf(x: float) -> int:
    """C roundf: round half away from zero, float32 arithmetic."""
    x = np.float32(x)
    return int(np.floor(x + np.float32(0.5))) if x >= 0 else -int(
        np.floor(-x + np.float32(0.5))
    )


@dataclasses.dataclass(frozen=True)
class HPRConfig:
    """Static configuration for one HPR separation stage."""

    fs: float
    hop: int
    beta: float = 2.0
    causal: bool = False  # False = TimeAnticausal (offline), True = realtime
    border: str = WRAP  # 'wrap' | 'valid' | 'replicate'
    outputs: int = OUTPUT_ALL
    use_sse: bool = False  # SSE box-filter variant (hps.cu:582-652)
    soft_mask: bool = False  # Wiener soft mask (hps.h:116-129)
    fast_rfft: bool = True  # Hermitian half-spectrum fast path
    median_impl: str = "auto"  # 'auto' | 'xla' | 'pallas' (the
    # TypeTraits-style backend seam, SURVEY.md §1: reference-path op vs
    # fast-path kernel selectable per engine). 'auto' = Pallas on TPU.
    fft_impl: str = "auto"  # 'auto' | 'xla' | 'dft' | 'dft_bf16' |
    # 'dft_f32': the transform seam. 'dft*' = MXU DFT-matmuls
    # exploiting the zero-pad/truncation structure (ops/fft.py);
    # 'dft' = 3-pass bf16 (rel err ~3e-5), 'dft_bf16' = max throughput
    # (~4e-3), 'dft_f32' = HIGHEST. 'auto' = 'dft' on TPU when
    # nfft <= 4096 and fast_rfft, else 'xla' (the np.fft-exact path).
    stream_state: str = "f32"  # 'f32' | 'bf16': dtype of the streaming
    # drivers' carried feature history. Wide serving fleets are
    # HBM-bound on re-reading that history every block (the 512-stream
    # bound, docs/PERFORMANCE.md round 4); 'bf16' halves the carry
    # traffic at the cost of quantizing the median/mask features to
    # bf16 (a quality knob in the dft_bf16 tradition — outputs shift
    # by feature-quantization noise, masks stay well-behaved). Both
    # median directions run natively on the quantized features (the
    # median is selection, so bf16 kernels pick exactly the elements
    # f32 would); all mask/synthesis math stays f32.

    def __post_init__(self):
        if self.hop <= 0 or (self.hop & (self.hop - 1)) != 0:
            raise ZenError("hop must be a positive power of two")
        if self.border not in (WRAP, VALID, REPLICATE):
            raise ZenError(f"unknown border mode: {self.border}")
        if self.l_harm < 1:
            raise ZenError("hop too large for fs: l_harm < 1")
        if self.time_filter_len > self.stft_width:
            raise ZenError("median filter bigger than matrix dimension")
        if self.freq_filter_len > self.nfft:
            raise ZenError("median filter bigger than matrix dimension")
        if self.median_impl not in ("auto", "xla", "pallas"):
            raise ZenError(f"unknown median_impl: {self.median_impl}")
        if self.fft_impl not in ("auto", "xla", "dft", "dft_bf16", "dft_f32"):
            raise ZenError(f"unknown fft_impl: {self.fft_impl}")
        if self.stream_state not in ("f32", "bf16"):
            raise ZenError(f"unknown stream_state: {self.stream_state}")
        if self.use_sse and self.border == VALID:
            # reference BoxFilterGPU always pads borders (box.h:154-180)
            object.__setattr__(self, "border", WRAP)
        if self.fast_rfft and self.border in (VALID, REPLICATE):
            # nocopybord zeroes high bins asymmetrically; replicate
            # clamps at DC (full-spectrum index clipping) which the
            # half spectrum's reflect boundary cannot emulate near bin
            # 0 — both need the full C2C path
            object.__setattr__(self, "fast_rfft", False)
        if self.fast_rfft and self.freq_filter_len // 2 >= self.nfft // 2 + 1:
            # the half-spectrum reflect pad needs fm < bins (very low
            # fs: the frequency window spans more than the half
            # spectrum); the full C2C path handles it like the
            # reference's full-matrix filter
            object.__setattr__(self, "fast_rfft", False)

    # ---- derived parameters (hps.h:222-268) ----
    @property
    def nwin(self) -> int:
        return 2 * self.hop

    @property
    def nfft(self) -> int:
        return 4 * self.hop

    @functools.cached_property
    def l_harm(self) -> int:
        return _roundf(
            np.float32(0.2)
            / (np.float32(self.nfft - self.hop) / np.float32(self.fs))
        )

    @functools.cached_property
    def l_perc(self) -> int:
        return _roundf(
            np.float32(500) / (np.float32(self.fs) / np.float32(self.nfft))
        )

    @property
    def lag(self) -> int:
        return 1 if self.causal else self.l_harm

    @property
    def stft_width(self) -> int:
        return 2 * self.l_harm

    @property
    def time_filter_len(self) -> int:
        return odd_filter_len(self.l_harm)

    @property
    def freq_filter_len(self) -> int:
        return odd_filter_len(self.l_perc)

    @functools.cached_property
    def window(self) -> np.ndarray:
        return windows.window(windows.SQRT_VON_HANN, self.nwin)

    @functools.cached_property
    def cola_factor(self) -> float:
        return windows.cola_factor(self.window, self.nfft)

    @property
    def synth_scale(self) -> float:
        """Scale on the (normalized) iFFT output: the reference backward
        FFT is unnormalized (x nfft) and the OLA multiplies by COLA
        (hps.h:68-80), so y = ifft * nfft * COLA."""
        return float(self.nfft) * self.cola_factor

    # ---- decoded engine tap patterns ----
    @functools.cached_property
    def time_offsets(self) -> tuple:
        """Frame-index offsets (relative to the output frame) whose
        median gives the time-direction filtered value at the lag row.

        Derived from the NPP/IPP geometry applied to the sliding STFT
        window of stft_width frames with the lag row at index
        stft_width - lag (see ops/median.py header for the decode).
        """
        fl = self.time_filter_len
        fm = fl // 2
        sw = self.stft_width
        if not self.causal:
            # lag row is interior for every border mode -> pure centered
            return tuple(range(-fm, fm + 1))
        if self.border == WRAP:
            # centered window at the newest row; the future half wraps
            # around to the *oldest* frames of the sliding window
            wrapped = tuple(range(-(sw - 1), -(sw - 1) + fm))
            return wrapped + tuple(range(-fm, 1))
        if self.border == VALID:
            # anchor at mask tip: strictly the previous fl frames
            return tuple(range(-fl, 0))
        # REPLICATE: centered at the last row, future half clamps to it
        return tuple(range(-fm, 0)) + (0,) * (fm + 1)

    @property
    def time_history(self) -> int:
        """Frames of magnitude history a causal stream must carry."""
        return max(0, -min(self.time_offsets))

    @property
    def lag_row_written(self) -> bool:
        """Whether the reference's time-direction filter ever writes
        the lag row. NPP valid-ROI anticausal writes only rows
        [fm, stft_width-fm-2] (mfilt.h:123-145); the lag row
        (= l_harm) falls outside that range when l_harm < fm+2, in
        which case the reference masks against an all-zero harmonic
        matrix (the dst buffer's initial value). Causal valid always
        writes its lag row (2*l_harm-1 >= filter_len for all l_harm);
        wrap/replicate write every row."""
        if self.border != VALID or self.causal:
            return True
        fm = self.time_filter_len // 2
        return fm <= self.l_harm <= self.stft_width - fm - 2

    @functools.cached_property
    def freq_offsets(self) -> tuple:
        """Bin offsets for the frequency-direction filter (per frame)."""
        fl = self.freq_filter_len
        fm = fl // 2
        if self.border == VALID:
            return tuple(range(0, fl))  # forward window (mfilt.h:146-160)
        return tuple(range(-fm, fm + 1))

    @property
    def freq_boundary(self) -> str:
        """Boundary rule along the frequency axis."""
        if self.border == WRAP:
            return "wrap"
        if self.border == REPLICATE:
            return "clamp"
        return "zero"  # valid: plus output zeroing of the high bins

    @property
    def output_harmonic(self) -> bool:
        return bool(self.outputs & OUTPUT_HARMONIC)

    @property
    def output_percussive(self) -> bool:
        return bool(self.outputs & OUTPUT_PERCUSSIVE)

    @property
    def output_residual(self) -> bool:
        return bool(self.outputs & OUTPUT_RESIDUAL)

    @property
    def soft_power(self) -> int:
        """The reference soft-mask functor truncates beta to int
        (hps.h:117-121 'const int power' constructed from float beta)."""
        return int(self.beta)
