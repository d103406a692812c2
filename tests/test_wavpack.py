"""WavPack decoder validation against real foreign-encoded files.

The reference front door accepts WavPack because libnyquist routes
NyquistIO::Load through WavPackDecoder.cpp; the rebuild's from-scratch
decoder (zen_tpu/io/wavpack.py) must therefore handle real files made
by the official encoder.  The reference's vendored test corpus has six
lossless .wv files of the same master at four bit depths — and WavPack
blocks store a CRC over the decoded integers (plus a second CRC over
the WVX extension stream for float32/int32 data), so every decode here
is self-proving: `strict=True` raises unless our output matches the
encoder bit-for-bit.
"""
import os

import numpy as np
import pytest

from zen_tpu.io.wavpack import (
    WavpackError,
    read_wavpack,
    read_wavpack_mono,
    wavpack_info,
)

_WV_DIR = "/root/reference/vendor/libnyquist/test_data/ad_hoc"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_WV_DIR), reason="reference test data absent"
)


def _p(name):
    return os.path.join(_WV_DIR, name)


@pytest.fixture(scope="module")
def decoded():
    """Decode each corpus file once (pure Python, CRC-strict)."""
    out = {}
    for name in (
        "TestBeat_Int16.wv",
        "TestBeat_Int24.wv",
        "TestBeat_Int32.wv",
        "TestBeat_Float32.wv",
        "TestBeat_Int24_Mono.wv",
        "TestBeat_Float32_Mono.wv",
    ):
        out[name] = read_wavpack(_p(name))
    return out


def test_all_corpus_files_decode_crc_clean(decoded):
    for name, (fs, x) in decoded.items():
        assert fs == 44100, name
        want_ch = 1 if "Mono" in name else 2
        assert x.shape == (268191, want_ch), name
        assert np.all(np.isfinite(x)), name
        assert float(np.abs(x).max()) <= 1.0, name
        assert float(np.abs(x).max()) > 0.5, name  # real content, not zeros


def test_cross_depth_consistency(decoded):
    """All four stereo files are the same master at different depths:
    decodes must agree to within one quantization step of the coarser
    format.  This cross-checks the int, int32+wvx, and float+wvx
    decode paths against each other on 268k real samples."""
    i16 = decoded["TestBeat_Int16.wv"][1]
    for name in ("TestBeat_Int24.wv", "TestBeat_Int32.wv", "TestBeat_Float32.wv"):
        d = float(np.abs(i16 - decoded[name][1]).max())
        assert d <= 2.0 ** -15, (name, d)
    # 24-bit vs float32 mono: agreement at the 24-bit step
    d = float(
        np.abs(
            decoded["TestBeat_Int24_Mono.wv"][1]
            - decoded["TestBeat_Float32_Mono.wv"][1]
        ).max()
    )
    assert d <= 2.0 ** -22, d


def test_wavpack_info():
    info = wavpack_info(_p("TestBeat_Int24.wv"))
    assert info["sample_rate"] == 44100
    assert info["channels"] == 2
    assert info["bits"] == 24
    assert not info["float"]
    assert info["total_samples"] == 268191
    finfo = wavpack_info(_p("TestBeat_Float32_Mono.wv"))
    assert finfo["float"] and finfo["bits"] == 32 and finfo["channels"] == 1


def test_max_blocks_prefix(decoded):
    """Bounded decode returns an exact prefix of the full decode."""
    fs, head = read_wavpack(_p("TestBeat_Int16.wv"), max_blocks=2)
    full = decoded["TestBeat_Int16.wv"][1]
    assert head.shape[0] == 2 * 22050
    np.testing.assert_array_equal(head, full[: head.shape[0]])


def test_read_audio_mono_routes_wavpack(decoded):
    """The driver front door sniffs the wvpk magic."""
    from zen_tpu.io.audio import read_audio_mono

    fs, x = read_audio_mono(_p("TestBeat_Int24_Mono.wv"))
    assert fs == 44100
    assert x.dtype == np.float32
    ref = decoded["TestBeat_Int24_Mono.wv"][1][:, 0]
    np.testing.assert_allclose(x, ref.astype(np.float32), atol=1e-7)


def test_mono_downmix(decoded):
    fs, m = read_wavpack_mono(_p("TestBeat_Int16.wv"))
    ref = decoded["TestBeat_Int16.wv"][1].mean(axis=1)
    np.testing.assert_allclose(m, ref.astype(np.float32), atol=1e-7)


def test_native_decoder_bit_identical(decoded):
    """The native fast path (native/zenwv.cpp) must agree with the
    pure-Python decoder sample-for-sample on every corpus file — both
    are independently CRC-gated, so agreement here plus CRC success
    pins both implementations to the encoder's exact output."""
    from zen_tpu.runtime import native

    if not native.wv_available():
        pytest.skip("native wavpack decoder not built")
    for name, (fs, x) in decoded.items():
        fs_n, y = native.wv_read(_p(name))
        assert fs_n == fs
        np.testing.assert_array_equal(y, x.astype(np.float32), err_msg=name)


def test_native_rejects_corrupt_and_garbage():
    from zen_tpu.runtime import native

    if not native.wv_available():
        pytest.skip("native wavpack decoder not built")
    import ctypes

    lib = native._load()
    rng = np.random.default_rng(3)
    with open(_p("TestBeat_Int16.wv"), "rb") as f:
        good = bytearray(f.read())

    def try_decode(buf: bytes) -> int:
        out = ctypes.POINTER(ctypes.c_float)()
        frames = ctypes.c_uint64()
        fs = ctypes.c_int32()
        ch = ctypes.c_int32()
        rc = lib.zen_wv_decode_mem(
            bytes(buf), len(buf), ctypes.byref(out),
            ctypes.byref(frames), ctypes.byref(fs), ctypes.byref(ch),
        )
        if rc == 0:
            lib.zen_wv_free(out)
        return rc

    lib.zen_wv_decode_mem.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    assert try_decode(bytes(good)) == 0
    bad = bytearray(good)
    bad[4000] ^= 0x40
    assert try_decode(bytes(bad)) != 0  # CRC catches payload damage
    for _ in range(30):
        n = int(rng.integers(4, 2048))
        assert try_decode(b"wvpk" + rng.integers(0, 256, n, dtype=np.uint8).tobytes()) != 0
    for cut in (10, 100, 1000, len(good) // 2):
        rc = try_decode(bytes(good[:cut]))
        assert rc != 0 or cut >= 32


def test_id3_tagged_wavpack_routes_to_wavpack(tmp_path):
    """An ID3v2 tag on a non-FLAC container must not shunt the file to
    the MP3 decoder: the post-tag magic dispatches (review regression)."""
    from zen_tpu.io.audio import read_audio_mono

    with open(_p("TestBeat_Int16.wv"), "rb") as f:
        wv = f.read()
    tagged = tmp_path / "tagged.wv"
    # minimal ID3v2 header with a 16-byte empty tag body
    tagged.write_bytes(b"ID3\x04\x00\x00\x00\x00\x00\x10" + bytes(16) + wv)
    fs, x = read_audio_mono(str(tagged))
    assert fs == 44100
    assert x.shape == (268191,)


def test_corrupt_payload_fails_crc():
    with open(_p("TestBeat_Int16.wv"), "rb") as f:
        data = bytearray(f.read())
    # flip a byte well inside the first block's residual bitstream
    data[4000] ^= 0x40
    with pytest.raises(WavpackError):
        read_wavpack(bytes(data), max_blocks=1)


def test_truncated_file_raises():
    with open(_p("TestBeat_Int16.wv"), "rb") as f:
        data = f.read()
    with pytest.raises(WavpackError):
        read_wavpack(data[:20])
    # cut mid-way through the first block
    with pytest.raises(WavpackError):
        read_wavpack(data[:1000], max_blocks=1)


def test_garbage_rejected_quickly():
    rng = np.random.default_rng(7)
    for _ in range(50):
        n = int(rng.integers(4, 4096))
        buf = b"wvpk" + rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        with pytest.raises(WavpackError):
            read_wavpack(buf)


def test_hybrid_rejected():
    """A block with the hybrid flag set must be refused clearly, not
    mis-decoded (we only implement the pure-lossless path)."""
    with open(_p("TestBeat_Int16.wv"), "rb") as f:
        data = bytearray(f.read())
    data[24] |= 0x08  # HYBRID_FLAG in the first block's flags word
    with pytest.raises(WavpackError, match="[Hh]ybrid"):
        read_wavpack(bytes(data), max_blocks=1)


# ---- encoder ---------------------------------------------------------------

_WAVPACK_SRC = "/root/reference/vendor/libnyquist/third_party/wavpack"

_WV_ORACLE_MAIN = r"""
#include "wavpack.h"
#include <stdio.h>
#include <stdlib.h>
int main(int argc, char** argv) {
  (void)argc;
  char err[128];
  WavpackContext* ctx = WavpackOpenFileInput(argv[1], err, 0, 0);
  if (!ctx) { fprintf(stderr, "open failed: %s\n", err); return 2; }
  int ch = WavpackGetNumChannels(ctx);
  FILE* o = fopen(argv[2], "wb");
  int32_t buf[4096 * 2];
  for (;;) {
    uint32_t n = WavpackUnpackSamples(ctx, buf, 4096 / ch);
    if (!n) break;
    fwrite(buf, 4, (size_t)n * ch, o);
  }
  fclose(o);
  fprintf(stderr, "%d %d\n", (int)WavpackGetSampleRate(ctx), ch);
  return WavpackGetNumErrors(ctx) ? 3 : 0;
}
"""

_WV_ORACLE_UNITS = [
    "common_utils.c", "open_utils.c", "open_filename.c", "unpack.c",
    "unpack_utils.c", "unpack_seek.c", "unpack_floats.c",
    "entropy_utils.c", "decorr_utils.c", "read_words.c", "tag_utils.c",
    "tags.c", "open_legacy.c", "unpack3.c", "unpack3_open.c",
    "unpack3_seek.c", "open_raw.c", "unpack_dsd.c",
]


def _signals(rng, fs):
    for kind in range(6):
        n = int(rng.integers(1, 70000))
        if kind == 0:
            yield rng.standard_normal(n).astype(np.float32) * 0.4
        elif kind == 1:
            yield np.sin(2 * np.pi * 330 * np.arange(n) / fs).astype(
                np.float32) * 0.7
        elif kind == 2:
            yield np.zeros(n, np.float32)  # zero-run entropy mode
        elif kind == 3:
            z = np.zeros(n, np.float32)
            z[::997] = 0.9  # sparse impulses around quiescent medians
            yield z
        elif kind == 4:
            yield np.clip(rng.standard_normal(n) * 2, -1, 1).astype(
                np.float32)
        else:
            yield (rng.standard_normal(n) * 1e-4).astype(np.float32)


def test_encoder_roundtrip_exact_and_native_byte_identical(tmp_path):
    """write_wavpack -> strict read_wavpack must reproduce the
    quantized input exactly (CRC-gated), and the native encoder must
    produce byte-identical files to the Python encoder."""
    from zen_tpu.io.wavpack import write_wavpack
    from zen_tpu.runtime import native

    rng = np.random.default_rng(11)
    fs = 44100
    for x in _signals(rng, fs):
        pp = tmp_path / "p.wv"
        write_wavpack(str(pp), fs, x)
        fs2, y = read_wavpack(str(pp))
        q = np.round(np.clip(x, -1, 1) * np.float32(32767)) / 32768.0
        assert fs2 == fs
        np.testing.assert_array_equal(y[:, 0], q)
        if native.available() and native._load()._has_wv_enc:
            pn = tmp_path / "n.wv"
            native.wv_write_mono(str(pn), fs, x)
            assert pn.read_bytes() == pp.read_bytes()


def test_encoder_bit_depths(tmp_path):
    from zen_tpu.io.wavpack import write_wavpack

    rng = np.random.default_rng(12)
    x = rng.standard_normal(5000).astype(np.float32) * 0.5
    from zen_tpu.runtime import native

    for bits in (8, 16, 24):
        p = tmp_path / f"b{bits}.wv"
        write_wavpack(str(p), 32000, x, bits=bits)
        fs, y = read_wavpack(str(p))
        full = float(1 << (bits - 1))
        q = np.round(np.clip(x, -1, 1) * np.float32(full - 1)) / full
        assert fs == 32000
        np.testing.assert_array_equal(y[:, 0], q)
        if native.available() and native._load()._has_wv_enc:
            pn = tmp_path / f"nb{bits}.wv"
            native.wv_write_mono(str(pn), 32000, x, bits=bits)
            assert pn.read_bytes() == p.read_bytes()


def test_encoder_unusual_rate_uses_sr_metadata(tmp_path):
    from zen_tpu.io.wavpack import write_wavpack

    p = tmp_path / "odd.wv"
    write_wavpack(str(p), 12345, np.zeros(100, np.float32))
    fs, y = read_wavpack(str(p))
    assert fs == 12345 and y.shape == (100, 1)


def test_encoder_output_decodes_with_libwavpack(tmp_path):
    """Conformance proof: the reference-vendored public libwavpack
    (compiled at test time, read-only mount) must decode our encode
    sample-exactly with zero errors."""
    import subprocess

    from zen_tpu.io.wavpack import write_wavpack

    if not os.path.isdir(_WAVPACK_SRC):
        pytest.skip("vendored libwavpack absent")
    src = tmp_path / "oracle.c"
    src.write_text(_WV_ORACLE_MAIN)
    exe = tmp_path / "oracle"
    cmd = (
        ["gcc", "-O2", "-fcommon", f"-I{_WAVPACK_SRC}/include",
         f"-I{_WAVPACK_SRC}/src", str(src)]
        + [f"{_WAVPACK_SRC}/src/{u}" for u in _WV_ORACLE_UNITS]
        + ["-o", str(exe), "-lm"]
    )
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"oracle build failed: {r.stderr[-200:]}")

    rng = np.random.default_rng(13)
    fs = 44100
    for x in _signals(rng, fs):
        p = tmp_path / "e.wv"
        raw = tmp_path / "e.raw"
        write_wavpack(str(p), fs, x)
        rr = subprocess.run(
            [str(exe), str(p), str(raw)], capture_output=True, text=True
        )
        assert rr.returncode == 0, rr.stderr
        y = np.fromfile(raw, np.int32)
        q = np.round(np.clip(x, -1, 1) * np.float32(32767)).astype(np.int64)
        np.testing.assert_array_equal(y, q)


def test_stem_writer_routes_wv(tmp_path):
    """write_audio_pcm16('.wv') + read_audio_mono round the product
    loop losslessly."""
    from zen_tpu.io.audio import read_audio_mono, write_audio_pcm16

    rng = np.random.default_rng(14)
    x = rng.standard_normal(20000).astype(np.float32) * 0.6
    p = tmp_path / "stem.wv"
    write_audio_pcm16(str(p), 22050, x)
    fs, y = read_audio_mono(str(p))
    q = np.round(np.clip(x, -1, 1) * np.float32(32767)) / np.float32(32768)
    assert fs == 22050
    np.testing.assert_allclose(y, q.astype(np.float32), atol=0)


# ---- stereo encoder (round 5: the last encoder-envelope asymmetry) ----------


def _stereo_signals(rng, fs):
    for kind in range(4):
        n = int(rng.integers(2, 50000))
        t = np.arange(n) / fs
        if kind == 0:  # independent tones per channel
            x = np.stack(
                [np.sin(2 * np.pi * 220 * t) * 0.6,
                 np.sin(2 * np.pi * 331 * t) * 0.4], 1)
        elif kind == 1:  # uncorrelated noise
            x = rng.standard_normal((n, 2)) * 0.3
        elif kind == 2:  # silence + burst: the stereo zero-run mode
            x = np.zeros((n, 2))
            if n > 100:
                x[n // 3 : n // 2] = rng.standard_normal(
                    (n // 2 - n // 3, 2)) * 0.2
        else:  # highly correlated channels
            base = np.sin(2 * np.pi * 440 * t) * 0.5
            x = np.stack([base, base + rng.standard_normal(n) * 1e-3], 1)
        yield x.astype(np.float32)


def test_stereo_encoder_roundtrip_and_native_byte_identical(tmp_path):
    """Stereo write_wavpack -> strict read_wavpack reproduces the
    quantized input exactly (CRC-gated); the native encoder is
    byte-identical across the full bits x signal matrix."""
    from zen_tpu.io.wavpack import write_wavpack
    from zen_tpu.runtime import native

    rng = np.random.default_rng(21)
    fs = 44100
    has_native = native.available() and getattr(
        native._load(), "_has_wv_enc_wide", False)
    for bits in (8, 16, 24):
        for x in _stereo_signals(rng, fs):
            pp = tmp_path / "p.wv"
            write_wavpack(str(pp), fs, x, bits=bits)
            fs2, y = read_wavpack(str(pp))
            full = float(1 << (bits - 1))
            q = np.round(np.clip(x, -1, 1) * np.float32(full - 1)) / full
            assert fs2 == fs and y.shape == x.shape
            np.testing.assert_array_equal(y, q)
            if has_native:
                pn = tmp_path / "n.wv"
                native.wv_write(str(pn), fs, x, bits=bits)
                assert pn.read_bytes() == pp.read_bytes()


def test_stereo_encoder_decodes_with_libwavpack(tmp_path):
    """Conformance: test-time-compiled libwavpack decodes our stereo
    encode sample-exactly with zero errors."""
    import subprocess

    from zen_tpu.io.wavpack import write_wavpack

    if not os.path.isdir(_WAVPACK_SRC):
        pytest.skip("vendored libwavpack absent")
    src = tmp_path / "oracle.c"
    src.write_text(_WV_ORACLE_MAIN)
    exe = tmp_path / "oracle"
    cmd = (
        ["gcc", "-O2", "-fcommon", f"-I{_WAVPACK_SRC}/include",
         f"-I{_WAVPACK_SRC}/src", str(src)]
        + [f"{_WAVPACK_SRC}/src/{u}" for u in _WV_ORACLE_UNITS]
        + ["-o", str(exe), "-lm"]
    )
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"oracle build failed: {r.stderr[-200:]}")

    rng = np.random.default_rng(22)
    fs = 44100
    for x in _stereo_signals(rng, fs):
        p = tmp_path / "e.wv"
        raw = tmp_path / "e.raw"
        write_wavpack(str(p), fs, x)
        rr = subprocess.run(
            [str(exe), str(p), str(raw)], capture_output=True, text=True
        )
        assert rr.returncode == 0, rr.stderr
        y = np.fromfile(raw, np.int32).reshape(-1, 2)
        q = np.round(np.clip(x, -1, 1) * np.float32(32767)).astype(np.int64)
        np.testing.assert_array_equal(y, q)


def test_stem_writer_routes_stereo_wv(tmp_path):
    """write_audio_pcm16('.wv') accepts [n, 2] stereo and the strict
    decoder reproduces both channels exactly."""
    from zen_tpu.io.audio import write_audio_pcm16

    rng = np.random.default_rng(23)
    x = (rng.standard_normal((15000, 2)) * 0.5).astype(np.float32)
    p = tmp_path / "stereo.wv"
    write_audio_pcm16(str(p), 48000, x)
    fs, y = read_wavpack(str(p))
    q = np.round(np.clip(x, -1, 1) * np.float32(32767)) / 32768.0
    assert fs == 48000
    np.testing.assert_array_equal(y, q)
