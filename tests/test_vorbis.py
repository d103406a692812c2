"""Ogg Vorbis decoder validation against real foreign-encoded files.

The reference front door accepts .ogg via libnyquist/libvorbis; the
rebuild's from-scratch native decoder (native/zenvorbis.cpp) must
handle real encoder output.  The reference's vendored corpus has six
.ogg files — two of them (TestBeat stereo + mono) are lossy encodes of
the same master that exists LOSSLESSLY as WavPack in the same corpus,
giving a ground truth: a correct Vorbis decode of a ~mid-quality
encode lands near 38 dB SNR against the master, while any error in
the codebook/floor/residue/coupling/IMDCT/window chain collapses it.

Stronger still, the vendored public libvorbis compiles into a
decode-only oracle at test time (psychoacoustics stubbed — never on
the decode path), and every corpus file must match it at float
precision (130+ dB, max error one float ulp).
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


_VORBIS_SRC = "/root/reference/vendor/libnyquist/third_party/libvorbis"
_OGG_SRC = "/root/reference/vendor/libnyquist/third_party/libogg"

_ORACLE_MAIN = r"""
#include <vorbis/vorbisfile.h>
#include <stdio.h>
#include <stdlib.h>
int main(int argc, char** argv) {
  (void)argc;
  OggVorbis_File vf;
  if (ov_fopen(argv[1], &vf) < 0) return 2;
  vorbis_info* vi = ov_info(&vf, -1);
  FILE* o = fopen(argv[2], "wb");
  int section = 0;
  for (;;) {
    float** pcm;
    long n = ov_read_float(&vf, &pcm, 4096, &section);
    if (n <= 0) break;
    for (long i = 0; i < n; ++i)
      for (int c = 0; c < vi->channels; ++c)
        fwrite(&pcm[c][i], 4, 1, o);
  }
  fclose(o);
  fprintf(stderr, "%ld %d\n", vi->rate, vi->channels);
  ov_clear(&vf);
  return 0;
}
"""

# decode-only build: the vendored tree is encoder+decoder in one; the
# ov_read path never reaches the psychoacoustics, so stub them out
_ORACLE_STUBS = r"""
#include <stdlib.h>
void _vi_psy_free(void* p) { (void)p; }
void _vp_psy_clear(void* p) { (void)p; }
void _vp_global_free(void* p) { (void)p; }
void _vp_psy_init(void* a, void* b, void* c, int d, long e) { (void)a;(void)b;(void)c;(void)d;(void)e; }
void* _vp_global_look(void* v) { (void)v; return 0; }
float _vp_ampmax_decay(float amp, void* vd) { (void)vd; return amp; }
void _vp_noisemask(void* a, float* b, float* c) { (void)a;(void)b;(void)c; abort(); }
void _vp_tonemask(void* a, float* b, float* c, float d, float e) { (void)a;(void)b;(void)c;(void)d;(void)e; abort(); }
void _vp_offset_and_mix(void* a, float* b, float* c, float* d, int e, int f, float* g, void* h, float* i) { (void)a;(void)b;(void)c;(void)d;(void)e;(void)f;(void)g;(void)h;(void)i; abort(); }
void _vp_couple_quantize_normalize(int a, void* b, void* c, void* d) { (void)a;(void)b;(void)c;(void)d; abort(); }
unsigned int bitreverse(unsigned int x) {
  x = ((x >> 16) & 0x0000ffffu) | ((x << 16) & 0xffff0000u);
  x = ((x >> 8) & 0x00ff00ffu) | ((x << 8) & 0xff00ff00u);
  x = ((x >> 4) & 0x0f0f0f0fu) | ((x << 4) & 0xf0f0f0f0u);
  x = ((x >> 2) & 0x33333333u) | ((x << 2) & 0xccccccccu);
  return ((x >> 1) & 0x55555555u) | ((x << 1) & 0xaaaaaaaau);
}
"""

_ORACLE_UNITS = [
    "vorbisfile.c", "synthesis.c", "info.c", "block.c", "codebook.c",
    "sharedbook.c", "registry.c", "mapping0.c", "floor0.c", "floor1.c",
    "res0.c", "mdct.c", "smallft.c", "window.c", "envelope.c", "lsp.c",
    "lpc.c", "bitrate.c",
]


@pytest.fixture(scope="module")
def vorbis_oracle(tmp_path_factory):
    """Compile the reference-vendored public libvorbis (read-only
    mount, nothing copied into the repo) into a decode oracle."""
    import subprocess

    if not os.path.isdir(_VORBIS_SRC):
        pytest.skip("vendored libvorbis absent")
    d = tmp_path_factory.mktemp("vorbis_oracle")
    (d / "oracle.c").write_text(_ORACLE_MAIN)
    (d / "stubs.c").write_text(_ORACLE_STUBS)
    exe = d / "oracle"
    cmd = (
        ["gcc", "-O2", f"-I{_VORBIS_SRC}/include", f"-I{_OGG_SRC}/include",
         str(d / "oracle.c"), str(d / "stubs.c")]
        + [f"{_VORBIS_SRC}/src/{u}" for u in _ORACLE_UNITS]
        + [f"{_OGG_SRC}/src/bitwise.c", f"{_OGG_SRC}/src/framing.c",
           "-o", str(exe), "-lm"]
    )
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"oracle build failed: {r.stderr[-200:]}")

    def run(path):
        raw = d / "out.f32"
        rr = subprocess.run(
            [str(exe), path, str(raw)], capture_output=True, text=True
        )
        assert rr.returncode == 0, rr.stderr
        fs, ch = (int(v) for v in rr.stderr.split())
        return fs, np.fromfile(raw, np.float32).reshape(-1, ch)

    return run


def _decode_mem_native(buf: bytes):
    import ctypes

    lib = native._load()
    out = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_uint64()
    fs = ctypes.c_int32()
    ch = ctypes.c_int32()
    rc = lib.zen_vorbis_decode_mem(buf, len(buf), ctypes.byref(out),
                                   ctypes.byref(frames), ctypes.byref(fs),
                                   ctypes.byref(ch))
    assert rc == 0, f"native decode failed rc={rc}"
    n = frames.value * ch.value
    try:
        arr = np.ctypeslib.as_array(out, shape=(n,)).copy() if n else np.zeros(0, np.float32)
    finally:
        lib.zen_vorbis_free(out)
    return int(fs.value), arr.reshape(frames.value, ch.value)


@pytest.mark.parametrize("seed,silent_every", [(0, 0), (1, 0), (2, 5), (3, 3)])
def test_floor0_differential_vs_libvorbis(vorbis_oracle, tmp_path, seed, silent_every):
    """Floor type 0 (legacy LSP): no encoder emits it, so streams are
    synthesized bit-by-bit (tests/vorbis_floor0_gen.py) and the decode
    must match the libvorbis oracle float-for-float — LSP curve
    synthesis, Bark mapping, amplitude handling, and the unused-floor
    (amplitude 0) channel-silence path."""
    _need_native()
    from vorbis_floor0_gen import make_stream

    data = make_stream(n_packets=25, seed=seed, silent_every=silent_every)
    path = tmp_path / f"floor0_{seed}.ogg"
    path.write_bytes(data)
    fs_ref, ref = vorbis_oracle(str(path))
    fs_got, got = _decode_mem_native(data)
    assert fs_got == fs_ref == 8000
    assert got.shape == ref.shape, (got.shape, ref.shape)
    # same float-exact standard as the corpus gate below: one-ulp-scale
    # agreement (the residual is this decoder's radix-2 IMDCT vs
    # libvorbis's smallft, present for every stream, not floor0)
    g = got.astype(np.float64)
    r = ref.astype(np.float64)
    err = ((g - r) ** 2).mean()
    sig = (r ** 2).mean()
    assert sig > 0, "stream should be audible"
    snr = 10 * np.log10(sig / err) if err > 0 else np.inf
    assert snr > 120, f"floor0 decode SNR {snr:.1f} dB"
    peak = np.abs(r).max()
    assert np.abs(g - r).max() <= 4e-6 * peak, "non-ulp-scale divergence"


def test_floor0_regression_stream_pinned():
    """The seed-0 floor0 stream is pinned as a repo asset so the
    decode matrix's floor0 row stays covered without the oracle."""
    _need_native()
    import pathlib

    from vorbis_floor0_gen import make_stream

    pinned = pathlib.Path(__file__).parent / "data" / "floor0_regression.ogg"
    data = make_stream(n_packets=25, seed=0)
    assert pinned.read_bytes() == data, "regenerate tests/data/floor0_regression.ogg"
    fs, x = _decode_mem_native(data)
    assert fs == 8000 and x.shape[0] > 2000
    assert np.all(np.isfinite(x))


def test_matches_reference_decoder_float_exact(vorbis_oracle):
    """Every corpus file must match the reference libvorbis decode at
    float precision (observed 130.3 dB / one-ulp max error on
    TestBeat.ogg) — a far stronger gate than the lossy-SNR check, and
    it pins window slopes, trimming, and frame alignment exactly."""
    _need_native()
    for name in (
        "TestBeat.ogg", "TestBeatMono.ogg", "BlockSplit_Stereo.ogg",
        "BlockWoosh_Stereo.ogg", "LR_Stereo.ogg", "TestLaugh_44k.ogg",
    ):
        fs_o, ref = vorbis_oracle(_p(name))
        fs, x = native.vorbis_read(_p(name))
        assert fs == fs_o, name
        assert x.shape == ref.shape, (name, x.shape, ref.shape)
        xd = x.astype(np.float64)
        rd = ref.astype(np.float64)
        snr = 10 * np.log10(
            (rd ** 2).sum() / max(((xd - rd) ** 2).sum(), 1e-300)
        )
        assert snr > 100.0, (name, snr)
