"""Ogg Vorbis decoder validation against real foreign-encoded files.

The reference front door accepts .ogg via libnyquist/libvorbis; the
rebuild's from-scratch native decoder (native/zenvorbis.cpp) must
handle real encoder output.  The reference's vendored corpus has six
.ogg files — two of them (TestBeat stereo + mono) are lossy encodes of
the same master that exists LOSSLESSLY as WavPack in the same corpus,
giving a ground truth: a correct Vorbis decode of a ~mid-quality
encode lands near 38 dB SNR against the master, while any error in
the codebook/floor/residue/coupling/IMDCT/window chain collapses it.
"""
import os

import numpy as np
import pytest

from zen_tpu.runtime import native

_DIR = "/root/reference/vendor/libnyquist/test_data/ad_hoc"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_DIR), reason="reference test data absent"
)


def _p(name):
    return os.path.join(_DIR, name)


def _need_native():
    if not native.vorbis_available():
        pytest.skip("native vorbis decoder not built")


def test_all_corpus_files_decode():
    _need_native()
    expect = {
        "BlockSplit_Stereo.ogg": (44100, 2),
        "BlockWoosh_Stereo.ogg": (44100, 2),
        "LR_Stereo.ogg": (44100, 2),
        "TestBeat.ogg": (44100, 2),
        "TestBeatMono.ogg": (44100, 1),
        "TestLaugh_44k.ogg": (44100, 2),
    }
    for name, (want_fs, want_ch) in expect.items():
        fs, x = native.vorbis_read(_p(name))
        assert fs == want_fs, name
        assert x.shape[1] == want_ch, name
        assert x.shape[0] > 20000, name
        assert np.all(np.isfinite(x)), name
        rms = float(np.sqrt((x.astype(np.float64) ** 2).mean()))
        assert 0.005 < rms < 1.0, (name, rms)


def test_snr_against_lossless_master():
    """TestBeat.ogg vs the WavPack lossless master: sample-aligned SNR
    must be in the correct-decode regime (observed 38.1 dB stereo,
    38.0 dB mono; a broken stage lands orders of magnitude lower)."""
    _need_native()
    if not native.wv_available():
        pytest.skip("native wavpack decoder not built")
    fs, x = native.vorbis_read(_p("TestBeat.ogg"))
    fs2, ref = native.wv_read(_p("TestBeat_Int16.wv"))
    assert fs == fs2 == 44100
    assert x.shape == ref.shape  # exact frame count, no edge slop
    xd = x.astype(np.float64)
    rd = ref.astype(np.float64)
    err = xd - rd
    snr = 10 * np.log10((rd ** 2).sum() / (err ** 2).sum())
    assert snr > 30.0, snr

    fs, m = native.vorbis_read(_p("TestBeatMono.ogg"))
    fs2, mref = native.wv_read(_p("TestBeat_Int24_Mono.wv"))
    assert m.shape == mref.shape
    md = m[:, 0].astype(np.float64)
    mr = mref[:, 0].astype(np.float64)
    snr_m = 10 * np.log10((mr ** 2).sum() / ((md - mr) ** 2).sum())
    assert snr_m > 30.0, snr_m


def test_read_audio_mono_routes_ogg():
    _need_native()
    from zen_tpu.io.audio import read_audio_mono

    fs, x = read_audio_mono(_p("TestBeatMono.ogg"))
    assert fs == 44100
    assert x.dtype == np.float32
    assert x.shape == (268191,)
    assert 0.05 < float(np.sqrt((x.astype(np.float64) ** 2).mean())) < 1.0


def test_hostile_inputs_rejected():
    _need_native()
    import ctypes

    lib = native._load()
    lib.zen_vorbis_decode_mem.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]

    def try_decode(buf: bytes) -> int:
        out = ctypes.POINTER(ctypes.c_float)()
        frames = ctypes.c_uint64()
        fs = ctypes.c_int32()
        ch = ctypes.c_int32()
        rc = lib.zen_vorbis_decode_mem(
            buf, len(buf), ctypes.byref(out),
            ctypes.byref(frames), ctypes.byref(fs), ctypes.byref(ch),
        )
        if rc == 0:
            lib.zen_vorbis_free(out)
        return rc

    rng = np.random.default_rng(5)
    for _ in range(30):
        n = int(rng.integers(4, 4096))
        buf = b"OggS" + rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert try_decode(buf) != 0
    with open(_p("TestBeat.ogg"), "rb") as f:
        good = f.read()
    for cut in (10, 500, 5000):
        try_decode(good[:cut])  # must not crash; rc value free


def test_page_crc_rejects_header_corruption():
    """Damage inside the setup-header page must be caught by the Ogg
    page CRC (the stream has no decodable setup afterwards)."""
    _need_native()
    import ctypes

    lib = native._load()
    with open(_p("TestBeat.ogg"), "rb") as f:
        data = bytearray(f.read())
    # corrupt a byte early in the second page (setup header region)
    second = bytes(data).find(b"OggS", 4)
    assert second > 0
    data[second + 40] ^= 0xFF
    out = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_uint64()
    fs = ctypes.c_int32()
    ch = ctypes.c_int32()
    rc = lib.zen_vorbis_decode_mem(
        bytes(data), len(data), ctypes.byref(out),
        ctypes.byref(frames), ctypes.byref(fs), ctypes.byref(ch),
    )
    if rc == 0:
        lib.zen_vorbis_free(out)
    assert rc != 0
