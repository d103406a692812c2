"""Native runtime tests: build, ring buffer (threaded), wav codec,
live streaming service. Skipped when no C++ toolchain is present."""
import shutil
import threading

import numpy as np
import pytest

from zen_tpu.runtime import native

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)


def test_native_builds_and_loads():
    assert native.available()


def test_ring_buffer_basic():
    r = native.RingBuffer(1 << 10)
    assert r.read(4) is None
    assert r.write(np.arange(8, dtype=np.float32)) == 8
    assert r.available_samples == 8
    out = r.read(8)
    np.testing.assert_array_equal(out, np.arange(8, dtype=np.float32))
    assert r.overruns == 0
    r.close()


def test_ring_buffer_overrun_and_wraparound():
    r = native.RingBuffer(16)
    assert r.write(np.ones(20, np.float32)) == 16
    assert r.overruns == 1
    assert r.read(16) is not None
    # wraparound
    for k in range(10):
        x = np.full(12, float(k), np.float32)
        assert r.write(x) == 12
        np.testing.assert_array_equal(r.read(12), x)
    r.close()


def test_ring_buffer_threaded_stream():
    """SPSC stress: 100k samples through a 4k ring, exact sequence."""
    r = native.RingBuffer(1 << 12)
    n = 100_000
    src = np.arange(n, dtype=np.float32)
    got = np.empty(n, np.float32)

    def producer():
        i = 0
        while i < n:
            w = r.write(src[i : i + 512])
            i += w

    t = threading.Thread(target=producer)
    t.start()
    i = 0
    while i < n:
        chunk = r.read(min(512, n - i))
        if chunk is not None:
            got[i : i + len(chunk)] = chunk
            i += len(chunk)
    t.join()
    np.testing.assert_array_equal(got, src)
    r.close()


def test_native_wav_roundtrip_matches_scipy(tmp_path):
    from scipy.io import wavfile

    x = (np.sin(np.linspace(0, 20, 3000)) * 0.7).astype(np.float32)
    p = str(tmp_path / "n.wav")
    native.wav_write_pcm16(p, 8000, x)
    fs_s, data = wavfile.read(p)
    fs_n, y = native.wav_read_mono(p)
    assert fs_s == fs_n == 8000
    np.testing.assert_allclose(y, data / 32768.0, atol=1e-6)
    np.testing.assert_allclose(y, x, atol=1.5 / 32768)


def test_native_wav_stereo_to_mono(tmp_path):
    from scipy.io import wavfile

    left = np.full(64, 0.5, np.float32)
    right = np.full(64, -0.25, np.float32)
    data = (np.stack([left, right], 1) * 32767).astype(np.int16)
    p = str(tmp_path / "st.wav")
    wavfile.write(p, 8000, data)
    fs, y = native.wav_read_mono(p)
    np.testing.assert_allclose(y, 0.125, atol=1e-3)


def test_native_wav_float32(tmp_path):
    from scipy.io import wavfile

    x = np.linspace(-0.9, 0.9, 500).astype(np.float32)
    p = str(tmp_path / "f32.wav")
    wavfile.write(p, 8000, x)  # scipy writes float32 wav for float input
    fs, y = native.wav_read_mono(p)
    np.testing.assert_allclose(y, x, atol=1e-7)


@pytest.mark.slow
def test_live_stream_end_to_end():
    from zen_tpu.runtime.stream import LiveStream

    fs, hop = 1000.0, 8
    ls = LiveStream(fs, hop, 2.0, block_hops=4).start()
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(hop * 64).astype(np.float32) * 0.5
    try:
        ls.push(audio)
        out = None
        for _ in range(2000):
            out = ls.pull("percussive", hop * 32)
            if out is not None:
                break
            threading.Event().wait(0.005)
        assert out is not None, "no output produced"
        # cross-check against the plain driver
        from zen_tpu import HPRRealtime

        want = HPRRealtime(fs, hop, 2.0).process_stream(
            audio, block_hops=4
        )[1][: len(out)]
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-4)
    finally:
        ls.stop()


@pytest.mark.slow
def test_native_sanitize_suite():
    """Build and run the ASAN/UBSAN + TSAN suite (reference analog:
    cuda-memcheck CTest label + ASAN/UBSAN options,
    libzen/CMakeLists.txt:56-89,111-133): wav-header fuzzing
    (truncations at every byte, hostile fields, odd-size chunk walks)
    and a threaded SPSC ring exerciser under TSAN."""
    import os
    import subprocess

    native_dir = os.path.join(os.path.dirname(__file__), "..", "native")
    r = subprocess.run(
        ["make", "-C", native_dir, "sanitize-check"],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, f"\n{r.stdout}\n{r.stderr}"
    assert "all ok" in r.stdout


@pytest.mark.filterwarnings("ignore::scipy.io.wavfile.WavFileWarning")
def test_wav_breadth_24bit_and_extensible(tmp_path):
    """The reference (libnyquist) reads 24-bit and WAVE_FORMAT_EXTENSIBLE
    wavs; our front door must too (native codec handles 16/f32, scipy
    covers the rest — pin that the fallback actually engages)."""
    import struct

    from zen_tpu.io.audio import read_audio_mono

    fs, n = 44100, 1000
    x = (np.sin(2 * np.pi * 440 * np.arange(n) / fs) * 0.5 * (2**23 - 1)
         ).astype(np.int64)
    data = b"".join(struct.pack("<i", int(v))[:3] for v in x)
    p24 = tmp_path / "t24.wav"
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, fs, fs * 3, 3, 24)
    hdr += b"data" + struct.pack("<I", len(data))
    p24.write_bytes(hdr + data)
    fs2, y = read_audio_mono(str(p24))
    assert fs2 == fs
    np.testing.assert_allclose(y, x / 2.0**23, atol=1e-6)

    # WAVE_FORMAT_EXTENSIBLE wrapping PCM16
    xi = (np.sin(2 * np.pi * 220 * np.arange(n) / fs) * 12000).astype("<i2")
    pext = tmp_path / "ext.wav"
    # 16-byte PCM subformat GUID per WAVEFORMATEXTENSIBLE
    sub = (b"\x01\x00\x00\x00\x00\x00\x10\x00"
           b"\x80\x00\x00\xaa\x00\x38\x9b\x71")
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, fs, fs * 2, 2, 16) + struct.pack(
        "<HH", 22, 16) + b"\x01\x00\x00\x00" + sub
    hdr = b"RIFF" + struct.pack("<I", 36 + 4 + len(fmt) - 16 + len(xi.tobytes())) + b"WAVE"
    hdr += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    hdr += b"data" + struct.pack("<I", len(xi.tobytes()))
    pext.write_bytes(hdr + xi.tobytes())
    fs3, z = read_audio_mono(str(pext))
    assert fs3 == fs
    np.testing.assert_allclose(z, xi / 32768.0, atol=1e-6)
