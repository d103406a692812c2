"""Musepack SV8 decoder validation against real encoder output.

Ground truth: at test time the public libmpcdec the reference vendors
is compiled (read-only mount, nothing copied into this repo) into an
oracle binary; our decode of both corpus files must match it at float
precision and unity scale (observed 135.4/135.5 dB SNR — the adaptive
entropy layer means any decode error desyncs and collapses this).
"""
import os
import subprocess

import numpy as np
import pytest

from zen_tpu.runtime import native

_DIR = "/root/reference/vendor/libnyquist/test_data/ad_hoc"
_MUSEPACK = "/root/reference/vendor/libnyquist/third_party/musepack"
_MONO = os.path.join(_DIR, "44_16_mono.mpc")
_STEREO = os.path.join(_DIR, "44_16_stereo.mpc")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(_MONO), reason="reference test data absent"
)


def _need_native():
    if not native.mpc_available():
        pytest.skip("native musepack decoder not built")


def test_corpus_files_decode():
    _need_native()
    for path, ch in ((_MONO, 1), (_STEREO, 2)):
        fs, x = native.mpc_read(path)
        assert fs == 44100
        assert x.shape == (224091, ch)
        assert np.all(np.isfinite(x))
        rms = float(np.sqrt((x.astype(np.float64) ** 2).mean()))
        assert 0.01 < rms < 1.0, rms


_ORACLE_SRC = r"""
#include <mpc/mpcdec.h>
#include <stdio.h>
#include <stdlib.h>
int main(int argc, char** argv) {
  (void)argc;
  mpc_reader reader;
  if (mpc_reader_init_stdio(&reader, argv[1]) < 0) return 2;
  mpc_demux* demux = mpc_demux_init(&reader);
  if (!demux) return 3;
  mpc_streaminfo si;
  mpc_demux_get_info(demux, &si);
  FILE* o = fopen(argv[2], "wb");
  MPC_SAMPLE_FORMAT buf[MPC_DECODER_BUFFER_LENGTH];
  for (;;) {
    mpc_frame_info frame; frame.buffer = buf;
    if (mpc_demux_decode(demux, &frame) != MPC_STATUS_OK) break;
    if (frame.bits == -1) break;
    fwrite(buf, sizeof(float), (size_t)frame.samples * si.channels, o);
  }
  fclose(o);
  fprintf(stderr, "%d %d\n", si.sample_freq, si.channels);
  return si.sample_freq ? 0 : 1;
}
"""

_ORACLE_UNITS = [
    "mpc_demux.c", "mpc_decoder.c", "mpc_reader.c", "streaminfo.c",
    "huffman.c", "requant.c", "synth_filter.c", "mpc_bits_reader.c",
    "crc32.c",
]


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if not os.path.isdir(_MUSEPACK):
        pytest.skip("vendored musepack absent")
    d = tmp_path_factory.mktemp("mpc_oracle")
    src = d / "oracle.c"
    src.write_text(_ORACLE_SRC)
    exe = d / "oracle"
    cmd = [
        "gcc", "-O2", "-fcommon",
        f"-I{_MUSEPACK}/include", f"-I{_MUSEPACK}/libmpcdec",
        str(src),
    ] + [f"{_MUSEPACK}/libmpcdec/{u}" for u in _ORACLE_UNITS] + [
        "-o", str(exe), "-lm", "-z", "muldefs",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"oracle build failed: {r.stderr[:200]}")

    def run(path):
        raw = d / "out.f32"
        rr = subprocess.run(
            [str(exe), path, str(raw)], capture_output=True, text=True
        )
        assert rr.returncode == 0, rr.stderr
        fs, ch = (int(v) for v in rr.stderr.split())
        return fs, np.fromfile(raw, np.float32).reshape(-1, ch)

    return run


def test_matches_reference_decoder_float_exact(oracle):
    _need_native()
    for path in (_MONO, _STEREO):
        fs_o, ref = oracle(path)
        fs, x = native.mpc_read(path)
        assert fs == fs_o
        assert x.shape == ref.shape, (x.shape, ref.shape)
        xd = x.astype(np.float64)
        rd = ref.astype(np.float64)
        snr = 10 * np.log10(
            (rd ** 2).sum() / max(((xd - rd) ** 2).sum(), 1e-300)
        )
        assert snr > 100.0, (path, snr)


def test_read_audio_mono_routes_mpc():
    _need_native()
    from zen_tpu.io.audio import read_audio_mono

    fs, x = read_audio_mono(_MONO)
    assert fs == 44100
    assert x.dtype == np.float32
    assert x.shape == (224091,)


def test_sv7_rejected_with_clear_error(tmp_path):
    p = tmp_path / "legacy.mpc"
    p.write_bytes(b"MP+\x07" + bytes(64))
    from zen_tpu.io.audio import read_audio_mono

    with pytest.raises(ValueError, match="SV7"):
        read_audio_mono(str(p))


def test_hostile_inputs_rejected():
    _need_native()
    import ctypes

    lib = native._load()
    lib.zen_mpc_decode_mem.argtypes = [
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
        rc = lib.zen_mpc_decode_mem(
            buf, len(buf), ctypes.byref(out),
            ctypes.byref(frames), ctypes.byref(fs), ctypes.byref(ch),
        )
        if rc == 0:
            lib.zen_mpc_free(out)
        return rc

    # varint bomb: a chunk size crafted to wrap 64-bit bounds checks
    # must be rejected immediately, not read out of bounds
    assert try_decode(b"MPCK" + b"SH" + b"\xff" * 9 + b"\x7f") != 0
    rng = np.random.default_rng(13)
    for _ in range(30):
        n = int(rng.integers(4, 4096))
        assert try_decode(b"MPCK" + rng.integers(0, 256, n, dtype=np.uint8).tobytes()) != 0
    with open(_MONO, "rb") as f:
        good = f.read()
    for cut in (10, 100, 1000):
        try_decode(good[:cut])  # must not crash
    bad = bytearray(good)
    bad[12] ^= 0xFF  # inside the CRC-protected stream-header payload
    assert try_decode(bytes(bad)) != 0
