"""MP3 decoder validation against real encoder output.

The reference front door accepts .mp3 via libnyquist; the rebuild's
from-scratch Layer III decoder (native/zenmp3.cpp) must handle real
encoder output.  Ground truth: at test time we compile the *public*
minimp3 header the reference vendors (read-only mount, nothing copied
into this repo) into a standalone oracle binary and require our decode
of the corpus file to match it to float precision (observed 132.9 dB
SNR at unity scale — any error in the huffman/requantize/stereo/
IMDCT/synthesis chain collapses this by orders of magnitude).
"""
import os
import subprocess

import numpy as np
import pytest

from zen_tpu.runtime import native

_DIR = "/root/reference/vendor/libnyquist/test_data/ad_hoc"
_MINIMP3_INC = "/root/reference/vendor/libnyquist/third_party/minimp3"
_MP3 = os.path.join(_DIR, "acetylene.mp3")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(_MP3), reason="reference test data absent"
)


def _need_native():
    if not native.mp3_available():
        pytest.skip("native mp3 decoder not built")


def test_corpus_file_decodes():
    _need_native()
    fs, x = native.mp3_read(_MP3)
    assert fs == 44100
    assert x.shape[1] == 2
    assert x.shape[0] > 100000
    assert np.all(np.isfinite(x))
    rms = float(np.sqrt((x.astype(np.float64) ** 2).mean()))
    assert 0.01 < rms < 1.0, rms


_ORACLE_SRC = r"""
#define MINIMP3_IMPLEMENTATION
#define MINIMP3_FLOAT_OUTPUT
#include "minimp3.h"
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
int main(int argc, char** argv) {
  (void)argc;
  FILE* f = fopen(argv[1], "rb");
  if (!f) return 2;
  fseek(f, 0, SEEK_END); long sz = ftell(f); fseek(f, 0, SEEK_SET);
  unsigned char* buf = malloc(sz);
  if (fread(buf, 1, sz, f) != (size_t)sz) return 2;
  fclose(f);
  static mp3dec_t dec; mp3dec_init(&dec);
  mp3d_sample_t pcm[MINIMP3_MAX_SAMPLES_PER_FRAME];
  long off = 0;
  FILE* o = fopen(argv[2], "wb");
  int fs = 0, ch = 0;
  while (off < sz) {
    mp3dec_frame_info_t info;
    int n = mp3dec_decode_frame(&dec, buf + off, sz - off, pcm, &info);
    if (info.frame_bytes <= 0) break;
    off += info.frame_bytes;
    if (n > 0) { fs = info.hz; ch = info.channels;
                 fwrite(pcm, sizeof(float), (size_t)n * ch, o); }
  }
  fclose(o);
  fprintf(stderr, "%d %d\n", fs, ch);
  return fs ? 0 : 1;
}
"""


@pytest.fixture(scope="module")
def oracle_exe(tmp_path_factory):
    """Compile the minimp3 oracle binary once per module."""
    if not os.path.isdir(_MINIMP3_INC):
        pytest.skip("vendored minimp3 absent")
    d = tmp_path_factory.mktemp("mp3_oracle")
    src = d / "oracle.c"
    src.write_text(_ORACLE_SRC)
    exe = d / "oracle"
    # -ftrivial-auto-var-init=zero: minimp3's per-call scratch
    # (mp3dec_scratch_t) is uninitialized stack, and adversarial
    # intensity-stereo fuzz streams read ist_pos entries no
    # scalefactor partition wrote — without the flag the oracle's
    # output varies with the process environment (confirmed in round 4
    # by env-size perturbation; two distinct outputs, maxdiff ~1.3).
    # Forcing zero-init pins those reads; zenmp3 gives unwritten
    # ist_pos entries the same defined zero (per-frame memset).
    r = subprocess.run(
        ["gcc", "-O2", "-ftrivial-auto-var-init=zero",
         f"-I{_MINIMP3_INC}", str(src), "-o", str(exe), "-lm"],
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        pytest.skip(f"oracle build failed: {r.stderr[:200]}")
    return exe


def oracle_decode(exe, mp3_path, workdir):
    """Run the oracle on a file; returns (fs, [N, ch] float32)."""
    raw = os.path.join(str(workdir), "oracle_out.f32")
    r = subprocess.run(
        [str(exe), str(mp3_path), raw], capture_output=True, text=True
    )
    assert r.returncode == 0, r.stderr
    fs, ch = (int(v) for v in r.stderr.split())
    data = np.fromfile(raw, np.float32).reshape(-1, max(ch, 1))
    return fs, data


@pytest.fixture(scope="module")
def oracle_pcm(oracle_exe, tmp_path_factory):
    """Decode the corpus file with the minimp3 oracle."""
    d = tmp_path_factory.mktemp("mp3_oracle_corpus")
    return oracle_decode(oracle_exe, _MP3, d)


def test_matches_reference_decoder_float_exact(oracle_pcm):
    """Our decode must agree with the reference decode of the same
    file at float precision and unity scale."""
    _need_native()
    fs_o, ref = oracle_pcm
    fs, x = native.mp3_read(_MP3)
    assert fs == fs_o
    # the raw reference emits the Xing/Info tag frame as one leading
    # frame of silence; we skip that frame by design
    lead = ref.shape[0] - x.shape[0]
    assert 0 <= lead <= 2 * 1152, (ref.shape, x.shape)
    if lead:
        assert float(np.abs(ref[:lead]).max()) == 0.0
        ref = ref[lead:]
    xd = x.astype(np.float64)
    rd = ref.astype(np.float64)
    err = xd - rd
    snr = 10 * np.log10((rd ** 2).sum() / max((err ** 2).sum(), 1e-300))
    assert snr > 100.0, snr


def test_read_audio_mono_routes_mp3():
    _need_native()
    from zen_tpu.io.audio import read_audio_mono

    fs, x = read_audio_mono(_MP3)
    assert fs == 44100
    assert x.dtype == np.float32
    assert x.ndim == 1 and len(x) > 100000


def test_hostile_inputs_rejected():
    _need_native()
    import ctypes

    lib = native._load()
    lib.zen_mp3_decode_mem.argtypes = [
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
        rc = lib.zen_mp3_decode_mem(
            buf, len(buf), ctypes.byref(out),
            ctypes.byref(frames), ctypes.byref(fs), ctypes.byref(ch),
        )
        if rc == 0:
            lib.zen_mp3_free(out)
        return rc

    rng = np.random.default_rng(9)
    for _ in range(30):
        n = int(rng.integers(4, 4096))
        buf = bytearray(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
        buf[0] = 0xFF
        buf[1] = 0xFB
        try_decode(bytes(buf))  # any rc; must not crash or hang
    assert try_decode(b"") != 0
    assert try_decode(b"\x00" * 1000) != 0
    # truncations of the real file must not crash
    with open(_MP3, "rb") as f:
        good = f.read()
    for cut in (100, 5000, len(good) // 2):
        try_decode(good[:cut])


# ---------------- LSF (MPEG-2/2.5) differential fuzz ----------------
# Round-3 verdict #3: the corpus has only an MPEG-1 file, so the LSF
# side-info/scalefactor/intensity-stereo paths had zero coverage.
# Frames are synthesized (tests/mp3_lsf_gen.py): structurally valid
# header+side-info with randomized payloads, decoded by both zenmp3
# and the minimp3 oracle, requiring sample-level agreement.

from mp3_lsf_gen import make_lsf_stream, stream_configs  # noqa: E402


def _zen_decode_mem(buf: bytes):
    import ctypes

    lib = native._load()
    lib.zen_mp3_decode_mem.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    out = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_uint64()
    fs = ctypes.c_int32()
    ch = ctypes.c_int32()
    rc = lib.zen_mp3_decode_mem(
        buf, len(buf), ctypes.byref(out),
        ctypes.byref(frames), ctypes.byref(fs), ctypes.byref(ch),
    )
    if rc != 0:
        return rc, None, None
    n = frames.value * ch.value
    data = np.ctypeslib.as_array(out, shape=(n,)).reshape(
        -1, ch.value).copy()
    lib.zen_mp3_free(out)
    return 0, fs.value, data


@pytest.fixture(scope="module")
def zen_o0_decode(tmp_path_factory):
    """Our own decoder compiled at -O0: a rounding-perturbed twin.

    Adversarial fuzz streams (random scalefactors spanning ~2^30 of
    inter-band dynamic range) can be numerically ill-conditioned: the
    IMDCT/synthesis cancellation leaves outputs ~1e8 smaller than the
    internal spectra, so ANY float-summation-order change shifts the
    output at the same magnitude as a cross-decoder comparison.
    Measured in round 4: on one such stream our -O2 and -O0 builds
    agree with EACH OTHER at only 37.4 dB — exactly the minimp3
    cross-SNR.  The twin measures that conditioning floor per stream,
    so the parity bar can demand 'as close to the oracle as we are to
    ourselves' instead of a fixed threshold that ill-conditioned
    streams cannot meet and well-conditioned bugs could hide under."""
    import ctypes

    d = tmp_path_factory.mktemp("mp3_selfcheck")
    so = d / "zenmp3_o0.so"
    src = os.path.join(os.path.dirname(__file__), "..", "native", "zenmp3.cpp")
    r = subprocess.run(
        ["g++", "-O0", "-fPIC", "-std=c++17", "-shared", src, "-o", str(so)],
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        pytest.skip(f"selfcheck build failed: {r.stderr[:200]}")
    lib = ctypes.CDLL(str(so))
    lib.zen_mp3_decode_mem.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]

    def decode(buf: bytes):
        out = ctypes.POINTER(ctypes.c_float)()
        frames = ctypes.c_uint64()
        fs = ctypes.c_int32()
        ch = ctypes.c_int32()
        rc = lib.zen_mp3_decode_mem(
            buf, len(buf), ctypes.byref(out),
            ctypes.byref(frames), ctypes.byref(fs), ctypes.byref(ch),
        )
        if rc != 0:
            return rc, None, None
        n = frames.value * ch.value
        data = np.ctypeslib.as_array(out, shape=(n,)).reshape(
            -1, ch.value).copy()
        lib.zen_mp3_free(out)
        return 0, fs.value, data

    return decode


def _snr_db(ref, x):
    err = x.astype(np.float64) - ref.astype(np.float64)
    den = float((ref.astype(np.float64) ** 2).sum())
    num = float((err ** 2).sum())
    if den == 0.0:
        return np.inf if num == 0.0 else -np.inf
    return 10 * np.log10(den / max(num, 1e-300))


def _compare_streams(stream: bytes, oracle_exe, zen_o0_decode, tmp_path,
                     tag: str):
    """Decode with both; require agreement or identical rejection."""
    p = tmp_path / f"{tag}.mp3"
    p.write_bytes(stream)
    rc, fs_z, zen = _zen_decode_mem(stream)
    fs_o, ref = oracle_decode(oracle_exe, p, tmp_path)
    if rc != 0:
        # zen rejected the whole stream: the oracle must have produced
        # nothing audible either (it emits nothing for skipped frames)
        assert ref.size == 0 or float(np.abs(ref).max()) == 0.0, (
            tag, rc, ref.shape)
        return
    assert fs_z == fs_o, (tag, fs_z, fs_o)
    assert zen.shape == ref.shape, (tag, zen.shape, ref.shape)
    snr = _snr_db(ref, zen)
    if snr > 90.0:
        return
    # below the fixed bar: measure the stream's conditioning floor
    # with the rounding-perturbed twin (see zen_o0_decode docstring)
    rc0, _, zen0 = zen_o0_decode(stream)
    assert rc0 == 0, (tag, rc0)
    self_snr = _snr_db(zen, zen0)
    assert snr > min(90.0, self_snr - 10.0), (tag, snr, self_snr)


@pytest.mark.parametrize("name,kw", stream_configs())
def test_lsf_differential_fuzz(name, kw, oracle_exe, zen_o0_decode,
                               tmp_path):
    _need_native()
    for seed in range(4):
        stream = make_lsf_stream(seed=seed, n_frames=12, **kw)
        _compare_streams(stream, oracle_exe, zen_o0_decode, tmp_path,
                         f"{name}_s{seed}")


def test_lsf_regression_stream(oracle_exe, zen_o0_decode, tmp_path):
    """The pinned deterministic LSF regression stream (checked-in
    file): decodes, is non-silent, and matches the oracle. The file is
    byte-reproducible from the generator (seed 7, joint-stereo MPEG-2)
    — see scripts/gen_lsf_regression.py."""
    _need_native()
    pinned = os.path.join(
        os.path.dirname(__file__), "data", "lsf_regression.mp3")
    assert os.path.isfile(pinned), "regression stream missing"
    stream = open(pinned, "rb").read()
    want = make_lsf_stream(seed=7, n_frames=16, version25=False,
                           fs_idx=0, mode=1)
    assert stream == want, "pinned stream no longer matches generator"
    rc, fs, x = _zen_decode_mem(stream)
    assert rc == 0 and fs == 22050 and x.shape[1] == 2
    assert float(np.abs(x).max()) > 0.0
    _compare_streams(stream, oracle_exe, zen_o0_decode, tmp_path,
                     "regression")
