"""Opus decoder validation against a test-time-compiled libopus oracle.

The reference front door accepts .opus via libnyquist/opusfile
(vendor/libnyquist/src/OpusDecoder.cpp, src/Common.cpp:181).  The
rebuild's from-scratch decoder (native/zenopus*.cpp) is validated two
ways, both against the vendored IETF reference implementation compiled
from the read-only mount at test time (nothing copied into the repo):

1. whole-file: the one vendored .opus corpus file (detodos.opus,
   SILK-WB mono) must decode byte-identically to opusfile's
   op_read_float — same pre-skip, granule trim, and sample values;
2. per-packet differential: streams synthesized by the vendored
   libopus *encoder* across every mode must decode BIT-IDENTICALLY
   packet by packet — SILK is fixed-point-normative, and the CELT
   float path mirrors the as-built reference exactly (kiss_fft
   butterfly order + the x86 SSE kernel groupings the reference build
   actually uses, celt/x86/pitch_sse.h).

Coverage: whole-file (incl. multistream surround, channel mapping
family 1), SILK sweeps (incl. DTX via the fixed-point PLC/CNG),
CELT/hybrid all frame sizes, mode transitions, mid-stream
reconfiguration — all bit-exact.
"""
import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

from zen_tpu.runtime import native

_DIR = "/root/reference/vendor/libnyquist/test_data/ad_hoc"
_OPUS = "/root/reference/vendor/libnyquist/third_party/opus"
_OGG = "/root/reference/vendor/libnyquist/third_party/libogg"
# bump the suffix when the embedded oracle sources change (cache key)
_CACHE = "/tmp/zenopus_oracle_build_v3"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_DIR), reason="reference test data absent"
)

_ORACLE_FILE = r"""
#include <stdio.h>
#include <stdlib.h>
#include <opusfile.h>
int main(int argc, char** argv) {
  (void)argc;
  FILE* f = fopen(argv[1], "rb");
  if (!f) return 2;
  fseek(f, 0, SEEK_END); long n = ftell(f); fseek(f, 0, SEEK_SET);
  unsigned char* buf = malloc(n);
  if (fread(buf, 1, n, f) != (size_t)n) return 2;
  fclose(f);
  int err = 0;
  OggOpusFile* of = op_open_memory(buf, n, &err);
  if (!of) return 1;
  int nch = op_channel_count(of, -1);
  FILE* out = fopen(argv[2], "wb");
  float pcm[5760 * 8];
  for (;;) {
    int r = op_read_float(of, pcm, 5760 * 8, NULL);
    if (r < 0) return 1;
    if (r == 0) break;
    fwrite(pcm, sizeof(float), (size_t)r * nch, out);
  }
  fclose(out);
  printf("%d\n", nch);
  return 0;
}
"""

_ORACLE_PKT = r"""
/* encode <out.bin> <ch> <bitrate> <frame_ms_x10> <cbr> <force> <maxbw> <fec> <sec_x10> [app]
   msencode <out.bin> <ch> <streams> <coupled> <map0,map1,...> <bitrate> <sec_x10>
   decode <in.bin> <out.f32> <ch>  — [u32 len][bytes] packet files */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>
#include <opus.h>
#include <opus_multistream.h>
#define OPUS_SET_FORCE_MODE_REQUEST 11002
#define OPUS_SET_FORCE_MODE(x) OPUS_SET_FORCE_MODE_REQUEST, __opus_check_int(x)
int main(int argc, char** argv) {
  (void)argc;
  if (!strcmp(argv[1], "decode")) {
    FILE* f = fopen(argv[2], "rb");
    if (!f) return 2;
    fseek(f, 0, SEEK_END); long n = ftell(f); fseek(f, 0, SEEK_SET);
    unsigned char* b = malloc(n);
    if (fread(b, 1, n, f) != (size_t)n) return 2;
    fclose(f);
    int ch = atoi(argv[4]);
    int err; OpusDecoder* dec = opus_decoder_create(48000, ch, &err);
    FILE* out = fopen(argv[3], "wb");
    float* pcm = malloc(sizeof(float) * 5760 * 2);
    long off = 0;
    while (off + 4 <= n) {
      unsigned len; memcpy(&len, b + off, 4); off += 4;
      int r = opus_decode_float(dec, b + off, len, pcm, 5760, 0);
      off += len;
      if (r < 0) return 1;
      fwrite(pcm, sizeof(float), (size_t)r * ch, out);
    }
    fclose(out);
    return 0;
  }
  if (!strcmp(argv[1], "msencode")) {
    int ch = atoi(argv[3]);
    int streams = atoi(argv[4]), coupled = atoi(argv[5]);
    unsigned char mapping[8];
    { char* tok = strtok(argv[6], ",");
      for (int i = 0; i < ch && tok; i++) { mapping[i] = (unsigned char)atoi(tok); tok = strtok(NULL, ","); } }
    int bitrate = atoi(argv[7]), sec10 = atoi(argv[8]);
    long total = 48000L * sec10 / 10;
    float* sig = malloc(sizeof(float) * total * ch);
    unsigned s = 777u;
    for (long i = 0; i < total; i++) {
      double t = (double)i / 48000.0;
      for (int c = 0; c < ch; c++) {
        double v = 0.3 * sin(2 * M_PI * (150 + 70 * c) * t + 0.3 * c);
        s = s * 1664525u + 1013904223u;
        v += 0.02 * ((double)(s >> 8) / 8388608.0 - 1.0);
        sig[i * ch + c] = (float)(v * (0.3 + 0.7 * fabs(sin(2 * M_PI * 0.5 * t))));
      }
    }
    int err;
    OpusMSEncoder* enc = opus_multistream_encoder_create(48000, ch, streams, coupled,
                                                         mapping, 2049, &err);
    if (!enc) return 1;
    opus_multistream_encoder_ctl(enc, OPUS_SET_BITRATE(bitrate));
    FILE* out = fopen(argv[2], "wb");
    unsigned char pkt[8000];
    for (long pos = 0; pos + 960 <= total; pos += 960) {
      int r = opus_multistream_encode_float(enc, sig + pos * ch, 960, pkt, sizeof pkt);
      if (r < 0) return 1;
      unsigned len = r;
      fwrite(&len, 4, 1, out);
      fwrite(pkt, 1, len, out);
    }
    fclose(out);
    return 0;
  }
  /* encode */
  int ch = atoi(argv[3]), bitrate = atoi(argv[4]);
  int fms10 = atoi(argv[5]), cbr = atoi(argv[6]), force = atoi(argv[7]);
  int maxbw = atoi(argv[8]), fec = atoi(argv[9]), sec10 = atoi(argv[10]);
  long total = 48000L * sec10 / 10;
  float* sig = malloc(sizeof(float) * total * ch);
  unsigned s = 9001u + (unsigned)bitrate;
  for (long i = 0; i < total; i++) {
    double t = (double)i / 48000.0;
    double v = 0.4 * sin(2 * M_PI * (200 + 120 * sin(2 * M_PI * 0.7 * t)) * t)
             + 0.2 * sin(2 * M_PI * 1207 * t);
    s = s * 1664525u + 1013904223u;
    v += 0.03 * ((double)(s >> 8) / 8388608.0 - 1.0);
    double env = 0.25 + 0.75 * fabs(sin(2 * M_PI * 0.4 * t));
    for (int c = 0; c < ch; c++) sig[i * ch + c] = (float)(v * env * (c ? 0.7 : 1.0));
  }
  int app = argc > 11 ? atoi(argv[11]) : 2048;
  int err; OpusEncoder* enc = opus_encoder_create(48000, ch, app, &err);
  if (!enc) return 1;
  opus_encoder_ctl(enc, OPUS_SET_BITRATE(bitrate));
  opus_encoder_ctl(enc, OPUS_SET_VBR(!cbr));
  opus_encoder_ctl(enc, OPUS_SET_COMPLEXITY(10));
  if (force) opus_encoder_ctl(enc, OPUS_SET_FORCE_MODE(force));
  if (maxbw) opus_encoder_ctl(enc, OPUS_SET_MAX_BANDWIDTH(maxbw));
  if (fec) {
    opus_encoder_ctl(enc, OPUS_SET_INBAND_FEC(1));
    opus_encoder_ctl(enc, OPUS_SET_PACKET_LOSS_PERC(30));
  }
  int frame = 48000 * fms10 / 10000;
  FILE* out = fopen(argv[2], "wb");
  unsigned char pkt[4000];
  for (long pos = 0; pos + frame <= total; pos += frame) {
    int r = opus_encode_float(enc, sig + pos * ch, frame, pkt, sizeof pkt);
    if (r < 0) return 1;
    unsigned len = r;
    fwrite(&len, 4, 1, out);
    fwrite(pkt, 1, len, out);
  }
  fclose(out);
  return 0;
}
"""


def _build_oracle():
    """Compile the vendored libopus (+opusfile/libogg) into two test
    oracles; cached in /tmp across sessions (sources are read-only)."""
    os.makedirs(_CACHE, exist_ok=True)
    file_exe = os.path.join(_CACHE, "opus_file_oracle")
    pkt_exe = os.path.join(_CACHE, "opus_pkt_oracle")
    if os.path.exists(file_exe) and os.path.exists(pkt_exe):
        return file_exe, pkt_exe
    import glob as _glob

    celt = [c for c in _glob.glob(f"{_OPUS}/celt/*.c") if "demo" not in c]
    silk = _glob.glob(f"{_OPUS}/silk/*.c") + _glob.glob(f"{_OPUS}/silk/float/*.c")
    base = [
        f"{_OPUS}/libopus/src/{n}.c"
        for n in ("opus", "opus_decoder", "opus_encoder", "opus_multistream",
                  "opus_multistream_decoder", "opus_multistream_encoder",
                  "repacketizer", "analysis", "mlp", "mlp_data")
    ]
    incs = [f"-I{_OPUS}/libopus/include", f"-I{_OPUS}/celt", f"-I{_OPUS}/silk",
            f"-I{_OPUS}/silk/float", f"-I{_OPUS}/opusfile/include",
            f"-I{_OPUS}/opusfile/src/include", f"-I{_OGG}/include"]
    defs = ["-DOPUS_BUILD", "-DUSE_ALLOCA", "-DHAVE_LRINTF"]
    opusfile = [f"{_OPUS}/opusfile/src/{n}.c" for n in ("opusfile", "info", "internal",
                                                        "stream")]
    ogg = [f"{_OGG}/src/bitwise.c", f"{_OGG}/src/framing.c"]
    src_file = os.path.join(_CACHE, "oracle_file.c")
    src_pkt = os.path.join(_CACHE, "oracle_pkt.c")
    with open(src_file, "w") as f:
        f.write(_ORACLE_FILE)
    with open(src_pkt, "w") as f:
        f.write(_ORACLE_PKT)
    for exe, src, extra in ((file_exe, src_file, opusfile + ogg), (pkt_exe, src_pkt, [])):
        r = subprocess.run(
            ["gcc", "-O2", "-w", "-o", exe, src] + celt + silk + base + extra + incs
            + defs + ["-lm"],
            capture_output=True, text=True)
        if r.returncode != 0:
            shutil.rmtree(_CACHE, ignore_errors=True)
            pytest.skip(f"oracle build failed: {r.stderr[-300:]}")
    return file_exe, pkt_exe


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if shutil.which("gcc") is None:
        pytest.skip("no compiler for the oracle")
    file_exe, pkt_exe = _build_oracle()
    work = tmp_path_factory.mktemp("opus_oracle")
    return {"file": file_exe, "pkt": pkt_exe, "work": work}


def _need_native():
    if not native.opus_available():
        pytest.skip("native opus decoder not built")


def _decode_pkts_zen(pkts_path, channels):
    """Decode a [u32 len][bytes] packet file with the zenopus
    packet-level C API via ctypes."""
    import ctypes

    lib = native._load()
    lib.zen_opus_pkt_create.restype = ctypes.c_void_p
    lib.zen_opus_pkt_create.argtypes = [ctypes.c_int]
    lib.zen_opus_pkt_decode.restype = ctypes.c_int
    lib.zen_opus_pkt_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_uint32,
    ]
    lib.zen_opus_pkt_destroy.restype = None
    lib.zen_opus_pkt_destroy.argtypes = [ctypes.c_void_p]
    dec = lib.zen_opus_pkt_create(channels)
    assert dec
    out = []
    buf = (ctypes.c_float * (5760 * channels))()
    data = open(pkts_path, "rb").read()
    off = 0
    try:
        while off + 4 <= len(data):
            (ln,) = struct.unpack_from("<I", data, off)
            off += 4
            pkt = data[off:off + ln]
            off += ln
            r = lib.zen_opus_pkt_decode(dec, pkt, ln, buf, 5760)
            if r < 0:
                return None, r
            out.append(np.frombuffer(buf, np.float32, r * channels).copy())
    finally:
        lib.zen_opus_pkt_destroy(dec)
    return np.concatenate(out) if out else np.zeros(0, np.float32), 0


def _has_dtx_frames(pkts_path):
    """True if any packet contains a 0/1-byte frame (PLC/CNG path)."""
    data = open(pkts_path, "rb").read()
    off = 0
    while off + 4 <= len(data):
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        pkt = data[off:off + ln]
        off += ln
        if ln <= 2:
            return True
        # code-3 CBR padding can shrink the single frame to <=1 byte
        if ln >= 3 and (pkt[0] & 3) == 3 and (pkt[1] & 0x40):
            pad, i = 0, 2
            while i < ln:
                b = pkt[i]
                i += 1
                pad += 254 if b == 255 else b
                if b != 255:
                    break
            if ln - i - pad <= 1:
                return True
    return False


def test_detodos_byte_identical_to_opusfile(oracle):
    _need_native()
    src = os.path.join(_DIR, "detodos.opus")
    ref_raw = oracle["work"] / "detodos_ref.f32"
    r = subprocess.run([oracle["file"], src, str(ref_raw)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    nch = int(r.stdout.strip())
    ref = np.fromfile(ref_raw, np.float32)
    fs, x = native.opus_read(src)
    assert fs == 48000
    assert x.shape[1] == nch == 1
    got = x.reshape(-1)
    assert got.shape == ref.shape
    assert np.array_equal(got, ref), "Ogg Opus decode differs from opusfile"


# (force_mode 1000 = SILK-only; maxbw 1101/1102/1103 = NB/MB/WB)
_SILK_CASES = [
    ("nb_20ms_mono_vbr", 1, 12000, 200, 0, 1000, 1101, 0),
    ("mb_20ms_mono_vbr", 1, 16000, 200, 0, 1000, 1102, 0),
    ("wb_20ms_mono_vbr", 1, 24000, 200, 0, 1000, 1103, 0),
    ("wb_10ms_mono_cbr", 1, 16000, 100, 1, 1000, 1103, 0),
    ("wb_40ms_mono_vbr", 1, 16000, 400, 0, 1000, 1103, 0),
    ("nb_60ms_mono_vbr", 1, 8000, 600, 0, 1000, 1101, 0),
    ("wb_20ms_stereo_vbr", 2, 32000, 200, 0, 1000, 1103, 0),
    ("nb_20ms_stereo_low", 2, 12000, 200, 0, 1000, 1101, 0),
    ("wb_20ms_mono_fec", 1, 16000, 200, 0, 1000, 1103, 1),
    ("wb_20ms_stereo_fec", 2, 24000, 200, 0, 1000, 1103, 1),
    ("wb_60ms_stereo_vbr", 2, 20000, 600, 0, 1000, 1103, 0),
]


@pytest.mark.parametrize("name,ch,br,fms10,cbr,force,maxbw,fec",
                         _SILK_CASES, ids=[c[0] for c in _SILK_CASES])
def test_silk_bit_exact_vs_libopus(oracle, name, ch, br, fms10, cbr, force, maxbw, fec):
    """SILK decode is fixed-point-normative: require float-identical
    output to libopus for every packet of every synthesized stream."""
    _need_native()
    work = oracle["work"]
    pkts = work / f"{name}.bin"
    ref_raw = work / f"{name}_ref.f32"
    r = subprocess.run([oracle["pkt"], "encode", str(pkts), str(ch), str(br), str(fms10),
                        str(cbr), str(force), str(maxbw), str(fec), "20"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    # every frame must actually be SILK (the encoder can override the
    # forced mode in corners); CELT fallback cases are covered by the
    # CELT suite instead
    data = open(pkts, "rb").read()
    off = 0
    while off + 4 <= len(data):
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        if ln and (data[off] >> 3) >= 12:
            pytest.skip("encoder fell back to CELT/hybrid for this config")
        off += ln
    if _has_dtx_frames(pkts):
        pytest.skip("stream contains DTX frames (PLC/CNG path)")
    r = subprocess.run([oracle["pkt"], "decode", str(pkts), str(ref_raw), str(ch)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    ref = np.fromfile(ref_raw, np.float32)
    got, rc = _decode_pkts_zen(str(pkts), ch)
    assert rc == 0, f"zenopus decode failed rc={rc}"
    assert got.shape == ref.shape
    assert np.array_equal(got, ref), (
        f"{name}: {np.count_nonzero(got != ref)} of {got.size} samples differ"
    )


def test_dtx_plc_cng_bit_exact(oracle):
    """Streams with DTX frames (1-byte frames inside code-3 CBR
    padding) engage the reference's PLC extrapolation + CNG noise
    fill; the rebuild implements both in fixed point, so even these
    streams must be float-identical end to end."""
    _need_native()
    work = oracle["work"]
    pkts = work / "dtx.bin"
    ref_raw = work / "dtx_ref.f32"
    r = subprocess.run([oracle["pkt"], "encode", str(pkts), "2", "16000", "200", "1",
                        "1000", "1101", "1", "20"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    if not _has_dtx_frames(pkts):
        pytest.skip("encoder emitted no DTX frames for this config")
    r = subprocess.run([oracle["pkt"], "decode", str(pkts), str(ref_raw), "2"],
                       capture_output=True, text=True)
    assert r.returncode == 0
    ref = np.fromfile(ref_raw, np.float32)
    got, rc = _decode_pkts_zen(str(pkts), 2)
    assert rc == 0
    assert got.shape == ref.shape
    assert np.array_equal(got, ref), (
        f"{np.count_nonzero(got != ref)} of {got.size} samples differ"
    )


# CELT/hybrid exactness: the bit-allocation and range decoding are
# integer-normative, and the float signal path mirrors the as-built
# reference bit-for-bit (incl. the x86 SSE kernel groupings of
# celt/x86/pitch_sse.h and the kiss_fft butterfly order), so even the
# lossy MDCT modes must decode bit-identically.
_CELT_CASES = [
    # (name, ch, app, bitrate, frame_ms_x10, force_mode, maxbw)
    ("celt_fb_20ms_mono", 1, 2049, 64000, 200, 1002, 1105),
    ("celt_fb_20ms_stereo", 2, 2049, 96000, 200, 1002, 1105),
    ("celt_fb_2p5ms_mono", 1, 2051, 64000, 25, 1002, 1105),
    ("celt_fb_5ms_stereo", 2, 2051, 96000, 50, 1002, 1105),
    ("celt_fb_10ms_mono", 1, 2049, 48000, 100, 1002, 1105),
    ("celt_nb_20ms_lowrate", 1, 2049, 12000, 200, 1002, 1101),
    ("hybrid_swb_20ms_mono", 1, 2048, 32000, 200, 1001, 1104),
    ("hybrid_fb_20ms_stereo", 2, 2048, 48000, 200, 1001, 1105),
    ("auto_music_32k", 1, 2049, 32000, 200, 0, 0),
    ("auto_voip_32k_switching", 1, 2048, 32000, 200, 0, 0),
]


@pytest.mark.parametrize("name,ch,app,br,fms10,force,maxbw", _CELT_CASES,
                         ids=[c[0] for c in _CELT_CASES])
def test_celt_hybrid_float_exact_vs_libopus(oracle, name, ch, app, br, fms10, force, maxbw):
    _need_native()
    work = oracle["work"]
    pkts = work / f"{name}.bin"
    ref_raw = work / f"{name}_ref.f32"
    enc = subprocess.run([oracle["pkt"], "encode", str(pkts), str(ch), str(br), str(fms10),
                          "0", str(force), str(maxbw), "0", "20", str(app)],
                         capture_output=True, text=True)
    assert enc.returncode == 0, enc.stderr
    r = subprocess.run([oracle["pkt"], "decode", str(pkts), str(ref_raw), str(ch)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    ref = np.fromfile(ref_raw, np.float32).astype(np.float64)
    got, rc = _decode_pkts_zen(str(pkts), ch)
    assert rc == 0, f"zenopus decode failed rc={rc}"
    got = got.astype(np.float64)
    assert got.shape == ref.shape
    assert np.array_equal(got, ref), (
        f"{name}: {np.count_nonzero(got != ref)} of {got.size} samples differ"
    )


def test_mode_transitions_silk_celt(oracle):
    """A packet stream that hard-switches SILK→CELT→SILK→CELT: the
    transition fades are PLC-sourced (opus_decoder.c:306,448) and both
    PLC directions must match the reference bit-for-bit."""
    _need_native()
    work = oracle["work"]
    silk_pkts = work / "tr_silk.bin"
    celt_pkts = work / "tr_celt.bin"
    for pkts, force, maxbw, br in ((silk_pkts, 1000, 1103, 16000),
                                   (celt_pkts, 1002, 1105, 64000)):
        r = subprocess.run([oracle["pkt"], "encode", str(pkts), "1", str(br), "200", "0",
                            str(force), str(maxbw), "0", "10"], capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
    mix = work / "tr_mix.bin"
    with open(mix, "wb") as f:
        for p in (silk_pkts, celt_pkts, silk_pkts, celt_pkts):
            f.write(open(p, "rb").read())
    ref_raw = work / "tr_ref.f32"
    r = subprocess.run([oracle["pkt"], "decode", str(mix), str(ref_raw), "1"],
                       capture_output=True, text=True)
    assert r.returncode == 0
    ref = np.fromfile(ref_raw, np.float32).astype(np.float64)
    got, rc = _decode_pkts_zen(str(mix), 1)
    assert rc == 0
    assert got.shape == ref.shape
    assert np.array_equal(got, ref), (
        f"transition stream: {np.count_nonzero(got != ref)} samples differ"
    )


def _ogg_page(packets, serial, seqno, granule, bos=False, eos=False):
    crc_table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 else (r << 1) & 0xFFFFFFFF
        crc_table.append(r)
    lacing = bytearray()
    body = bytearray()
    for p in packets:
        n = len(p)
        while n >= 255:
            lacing.append(255)
            n -= 255
        lacing.append(n)
        body.extend(p)
    htype = (2 if bos else 0) | (4 if eos else 0)
    hdr = bytearray(b"OggS") + bytes([0, htype]) + struct.pack("<q", granule)
    hdr += struct.pack("<II", serial, seqno) + b"\x00" * 4 + bytes([len(lacing)]) + lacing
    page = bytes(hdr) + bytes(body)
    crc = 0
    for b in page:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ crc_table[((crc >> 24) ^ b) & 0xFF]
    return page[:22] + struct.pack("<I", crc) + page[26:]


def _build_ogg_opus_ms(pkts_path, channels, streams, coupled, mapping):
    """Wrap a multistream packet sequence in an Ogg Opus container
    (RFC 7845 channel mapping family 1)."""
    head = bytearray(b"OpusHead") + bytes([1, channels]) + struct.pack("<H", 312)
    head += struct.pack("<I", 48000) + struct.pack("<h", 0) + bytes([1])
    head += bytes([streams, coupled]) + bytes(mapping)
    tags = b"OpusTags" + struct.pack("<I", 4) + b"zen!" + struct.pack("<I", 0)
    data = open(pkts_path, "rb").read()
    pkts = []
    off = 0
    while off + 4 <= len(data):
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        pkts.append(data[off:off + ln])
        off += ln
    pages = [_ogg_page([bytes(head)], 7, 0, 0, bos=True), _ogg_page([tags], 7, 1, 0)]
    total = 960 * len(pkts)
    # split audio packets over pages of <=20 packets
    seq = 2
    for i in range(0, len(pkts), 20):
        chunk = pkts[i:i + 20]
        last = i + len(chunk) >= len(pkts)
        granule = 312 + 960 * (i + len(chunk)) if not last else 312 + total
        pages.append(_ogg_page(chunk, 7, seq, granule, eos=last))
        seq += 1
    return b"".join(pages)


@pytest.mark.parametrize("name,ch,streams,coupled,mapping", [
    ("quad", 4, 2, 2, [0, 1, 2, 3]),
    ("5dot1", 6, 4, 2, [0, 4, 1, 2, 3, 5]),
    ("3dot0_with_silent", 4, 2, 1, [0, 1, 2, 255]),
])
def test_multistream_surround_vs_opusfile(oracle, name, ch, streams, coupled, mapping):
    """Channel mapping family 1 (multistream surround): self-delimited
    elementary packets, per-stream decoders, channel mapping incl. the
    255 silent-channel code — the full-file decode must match opusfile
    at the float-exact envelope."""
    _need_native()
    work = oracle["work"]
    pkts = work / f"ms_{name}.bin"
    r = subprocess.run([oracle["pkt"], "msencode", str(pkts), str(ch), str(streams),
                        str(coupled), ",".join(str(m) for m in mapping), "96000", "20"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    ogg = work / f"ms_{name}.opus"
    ogg.write_bytes(_build_ogg_opus_ms(str(pkts), ch, streams, coupled, mapping))
    ref_raw = work / f"ms_{name}_ref.f32"
    rr = subprocess.run([oracle["file"], str(ogg), str(ref_raw)], capture_output=True,
                       text=True)
    assert rr.returncode == 0, rr.stderr
    nch = int(rr.stdout.strip())
    assert nch == ch
    ref = np.fromfile(ref_raw, np.float32).reshape(-1, ch).astype(np.float64)
    fs, got = native.opus_read(str(ogg))
    assert fs == 48000
    got = got.astype(np.float64)
    assert got.shape == ref.shape
    assert np.array_equal(got, ref), (
        f"{name}: {np.count_nonzero(got != ref)} of {got.size} samples differ"
    )
    for c in range(ch):
        if mapping[c] == 255:
            assert np.all(got[:, c] == 0), "mapped-silent channel must be zero"


@pytest.mark.parametrize("case", ["bandwidth", "channels"])
def test_silk_stream_reconfiguration_bit_exact(oracle, case):
    """Mid-stream reconfiguration switches inside SILK: internal rate
    changes (NB→WB→MB→NB: decoder_set_fs reset + resampler re-init) and
    mono↔stereo (side-channel init/collapse, dec_API.c:116-135).  All
    fixed-point, so the whole stream must stay bit-exact."""
    _need_native()
    work = oracle["work"]
    if case == "bandwidth":
        segs = [("1101", "12000", "1"), ("1103", "24000", "1"), ("1102", "16000", "1"),
                ("1101", "12000", "1")]
        ch = 1
    else:
        segs = [("1103", "16000", "1"), ("1103", "32000", "2"), ("1103", "16000", "1")]
        ch = 2
    mix = work / f"sw_{case}.bin"
    with open(mix, "wb") as out:
        for i, (bw, br, ech) in enumerate(segs):
            seg = work / f"sw_{case}_{i}.bin"
            r = subprocess.run([oracle["pkt"], "encode", str(seg), ech, br, "200", "0",
                                "1000", bw, "0", "10"], capture_output=True, text=True)
            assert r.returncode == 0, r.stderr
            out.write(open(seg, "rb").read())
    ref_raw = work / f"sw_{case}_ref.f32"
    r = subprocess.run([oracle["pkt"], "decode", str(mix), str(ref_raw), str(ch)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    ref = np.fromfile(ref_raw, np.float32)
    got, rc = _decode_pkts_zen(str(mix), ch)
    assert rc == 0
    assert got.shape == ref.shape
    assert np.array_equal(got, ref), (
        f"{np.count_nonzero(got != ref)} of {got.size} samples differ"
    )


def test_multistream_regression_pinned():
    """A quad (family 1, 2 coupled streams) file is pinned as a repo
    asset so the multistream path stays covered without the oracle,
    and serves as an ASAN fuzz seed (native/Makefile sanitize-check)."""
    _need_native()
    import pathlib

    pinned = pathlib.Path(__file__).parent / "data" / "ms_quad_regression.opus"
    fs, x = native.opus_read(str(pinned))
    assert fs == 48000
    assert x.shape == (95688, 4)
    assert np.all(np.isfinite(x))
    rms = float(np.sqrt((x.astype(np.float64) ** 2).mean()))
    assert 0.005 < rms < 1.0


def test_read_audio_mono_routes_opus():
    _need_native()
    from zen_tpu.io.audio import read_audio_mono

    fs, x = read_audio_mono(os.path.join(_DIR, "detodos.opus"))
    assert fs == 48000
    assert x.shape == (139848,)
    assert x.dtype == np.float32
    assert np.all(np.isfinite(x))
    rms = float(np.sqrt((x.astype(np.float64) ** 2).mean()))
    assert 0.005 < rms < 1.0


def test_hostile_inputs_rejected():
    _need_native()
    import ctypes

    lib = native._load()
    lib.zen_opus_decode_mem.restype = ctypes.c_int
    lib.zen_opus_decode_mem.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
    ]

    def try_decode(buf: bytes) -> int:
        out = ctypes.POINTER(ctypes.c_float)()
        frames = ctypes.c_uint64()
        fs = ctypes.c_uint32()
        ch = ctypes.c_uint32()
        rc = lib.zen_opus_decode_mem(buf, len(buf), ctypes.byref(out),
                                     ctypes.byref(frames), ctypes.byref(fs),
                                     ctypes.byref(ch))
        if rc == 0:
            lib.zen_opus_free(out)
        return rc

    assert try_decode(b"") != 0
    assert try_decode(b"OggS" + b"\x00" * 40) != 0
    assert try_decode(b"garbage" * 100) != 0
    # real file with truncations must never crash (rejection is fine)
    real = open(os.path.join(_DIR, "detodos.opus"), "rb").read()
    for cut in (10, 100, 1000, len(real) // 2, len(real) - 3):
        try_decode(real[:cut])
    # per-byte corruption of the head pages
    rng = np.random.default_rng(7)
    for _ in range(60):
        i = int(rng.integers(0, min(len(real), 4000)))
        mutated = bytearray(real)
        mutated[i] ^= int(rng.integers(1, 256))
        try_decode(bytes(mutated))
