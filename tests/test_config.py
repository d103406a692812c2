"""Parameter-derivation parity with the reference ctor
(libzen/hps.h:222-274)."""
import numpy as np
import pytest

from zen_tpu import HPRConfig
from zen_tpu.errors import ZenError


def test_derivations_441k():
    # hop 256 @ 44.1 kHz: nwin=512, nfft=1024
    c = HPRConfig(fs=44100, hop=256, causal=False)
    assert c.nwin == 512 and c.nfft == 1024
    # l_harm = roundf(0.2 / (768/44100)) = roundf(11.484) = 11
    assert c.l_harm == 11
    # l_perc = roundf(500 / (44100/1024)) = roundf(11.61) = 12
    assert c.l_perc == 12
    assert c.stft_width == 22
    assert c.lag == 11
    assert c.time_filter_len == 11  # already odd
    assert c.freq_filter_len == 13  # odd-ified from 12
    np.testing.assert_allclose(c.cola_factor, 1024.0 / 256.0, rtol=1e-5)


def test_derivations_hop1024_and_4096():
    c = HPRConfig(fs=44100, hop=1024, causal=True)
    assert c.l_harm == 3 and c.l_perc == 46 and c.lag == 1
    c = HPRConfig(fs=44100, hop=4096, causal=False)
    assert c.l_harm == 1 and c.l_perc == 186
    assert c.time_filter_len == 1  # identity time median


def test_causal_lag_is_one():
    assert HPRConfig(fs=44100, hop=256, causal=True).lag == 1


def test_time_offsets_decode():
    c = HPRConfig(fs=44100, hop=256, causal=False)  # fl=11, fm=5
    assert c.time_offsets == tuple(range(-5, 6))
    c = HPRConfig(fs=44100, hop=256, causal=True, border="wrap")
    # centered at newest row; future half wraps to oldest frames
    assert c.time_offsets == tuple(range(-21, -16)) + tuple(range(-5, 1))
    c = HPRConfig(fs=44100, hop=256, causal=True, border="valid")
    assert c.time_offsets == tuple(range(-11, 0))
    c = HPRConfig(fs=44100, hop=256, causal=True, border="replicate")
    assert c.time_offsets == tuple(range(-5, 0)) + (0,) * 6


def test_soft_power_truncates_beta():
    """soft_mask_functor's 'const int power' truncates (hps.h:117)."""
    assert HPRConfig(fs=44100, hop=256, beta=2.5).soft_power == 2


def test_invalid_configs_raise():
    with pytest.raises(ZenError):
        HPRConfig(fs=44100, hop=100)  # not a power of two
    with pytest.raises(ZenError):
        HPRConfig(fs=44100, hop=256, border="bogus")
    with pytest.raises(ZenError):
        HPRConfig(fs=100.0, hop=4096)  # l_harm < 1
