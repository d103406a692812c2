"""Analysis windows.

TPU-native analog of the reference window generator
(reference: libzen/win.h:26-53). Windows are *periodic* ("matlab
'periodic' hann"): the denominator is N, not N-1. Computed once at
trace time as constants — the analog of the reference's
construct-in-ctor discipline.
"""
from __future__ import annotations

import numpy as np

VON_HANN = "vonhann"
SQRT_VON_HANN = "sqrt_vonhann"


def periodic_hann(n: int) -> np.ndarray:
    """Periodic von Hann window of length ``n`` (float32)."""
    k = np.arange(n, dtype=np.float32)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * k / np.float32(n)))).astype(
        np.float32
    )


def window(kind: str, n: int) -> np.ndarray:
    """Window by name; mirrors reference WindowType (win.h:16-19)."""
    if kind == VON_HANN:
        return periodic_hann(n)
    if kind == SQRT_VON_HANN:
        return np.sqrt(periodic_hann(n)).astype(np.float32)
    raise ValueError(f"unknown window kind: {kind}")


def cola_factor(win: np.ndarray, nfft: int) -> float:
    """COLA normalization factor: nfft / sum(win**2).

    Mirrors reference COLA computation (libzen/hps.h:270-274); see
    https://www.mathworks.com/help/signal/ref/iscola.html
    """
    s = float(np.sum(win.astype(np.float64) ** 2))
    return float(nfft) / s
