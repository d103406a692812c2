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
