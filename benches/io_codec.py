"""Host-IO codec throughput instrument (all input codecs + wav).

The corpus driver overlaps host IO with device compute
(runtime/loader.py), so codec throughput bounds corpus throughput only
when it drops below the device rate — this instrument records where
each rung sits per round (the host analog of benches/kernels.py's
per-round CSV trend).

Rungs measured (60 s of 44.1 kHz mono unless overridden):
  * native FLAC decode (native/zenflac.cpp)
  * pure-Python FLAC decode (zen_tpu/io/flac.py — the fallback)
  * native FLAC encode (native/zenflac_enc.cpp — the stem writer)
  * pure-Python FLAC encode (the full-featured fallback)
  * wav PCM16 write/read (scipy) for scale
  * decode rungs for the other from-scratch input codecs (WavPack,
    Ogg Vorbis, MP3, Musepack SV8) measured on the real
    foreign-encoded corpus files when the reference mount is present

Usage: python benches/io_codec.py [--seconds 60] [--json out.json]
Host-only (no JAX device touched); numbers are per-core on this host.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from zen_tpu.io.audio import read_wav_mono, write_wav_pcm16  # noqa: E402
from zen_tpu.io.flac import read_flac, write_flac  # noqa: E402
from zen_tpu.io.wavpack import write_wavpack  # noqa: E402
from zen_tpu.runtime import native  # noqa: E402


def best_of(fn, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    fs = 44100
    n = int(fs * args.seconds)
    rng = np.random.default_rng(0)
    t = np.arange(n) / fs
    x = (
        np.sin(2 * np.pi * 220 * t) * 0.35
        + rng.standard_normal(n) * 0.02
    ).astype(np.float32)

    tmp = tempfile.mkdtemp()
    flac_p = os.path.join(tmp, "t.flac")
    wav_p = os.path.join(tmp, "t.wav")
    rows = {}

    def record(name, seconds, note=""):
        ms = seconds * 1e3
        rows[name] = {
            "ms": round(ms, 1),
            "msamples_per_s": round(n / seconds / 1e6, 2),
            "x_realtime": round(args.seconds / seconds, 0),
            "note": note,
        }
        print(
            f"{name:26s} {ms:8.1f} ms  "
            f"{n / seconds / 1e6:7.2f} Msamples/s  "
            f"{args.seconds / seconds:7.0f}x realtime  {note}",
            flush=True,
        )

    if native.flac_available():
        record(
            "flac_encode_native",
            best_of(lambda: native.flac_write_mono16(flac_p, fs, x)),
            "zenflac_enc.cpp (stem writer)",
        )
    record(
        "flac_encode_python",
        best_of(lambda: write_flac(flac_p, fs, x, bits=16), repeats=2),
        "io/flac.py fallback",
    )
    if native.flac_available():
        record(
            "flac_decode_native",
            best_of(lambda: native.flac_read(flac_p)),
            "zenflac.cpp (read_audio_mono path)",
        )
    record(
        "flac_decode_python",
        best_of(lambda: read_flac(flac_p), repeats=1),
        "io/flac.py fallback",
    )
    wv_p = os.path.join(tmp, "t.wv")
    if native.available() and native._load()._has_wv_enc:
        record(
            "wv_encode_native",
            best_of(lambda: native.wv_write_mono(wv_p, fs, x)),
            "zenwv.cpp encoder (stem writer)",
        )
        rows["wv_ratio_vs_pcm16"] = round(
            os.path.getsize(wv_p) / (n * 2), 3
        )
    record(
        "wv_encode_python",
        best_of(lambda: write_wavpack(wv_p, fs, x), repeats=1),
        "io/wavpack.py fallback",
    )
    # stereo stem configs (round-5: both native encoders cover the
    # full CLI stem envelope — 8/16/24-bit x mono/stereo; rate rows
    # here pin the stereo legs the r04 artifact lacked)
    x2 = np.stack([x, -0.5 * x], axis=1)
    if native.flac_available():
        f2 = os.path.join(tmp, "t2.flac")
        record(
            "flac_encode_native_stereo",
            best_of(lambda: native.flac_write(f2, fs, x2, bits=16)),
            "zenflac_enc.cpp stereo16",
        )
    if native.available() and native._load()._has_wv_enc:
        w2 = os.path.join(tmp, "t2.wv")
        record(
            "wv_encode_native_stereo",
            best_of(lambda: native.wv_write(w2, fs, x2, bits=16)),
            "zenwv.cpp stereo16",
        )
    record("wav_write_pcm16", best_of(lambda: write_wav_pcm16(wav_p, fs, x)))
    record("wav_read", best_of(lambda: read_wav_mono(wav_p)))

    size = os.path.getsize(flac_p)
    rows["flac_ratio_vs_pcm16"] = round(size / (n * 2), 3)
    print(f"flac size ratio vs raw PCM16: {rows['flac_ratio_vs_pcm16']}")

    # foreign-corpus decode rungs (real encoder output; per-file
    # sample counts differ from the synthetic clip above)
    corpus = "/root/reference/vendor/libnyquist/test_data/ad_hoc"
    foreign = [
        ("wv_decode_native", "TestBeat_Int16.wv", native.wv_available,
         native.wv_read, "zenwv.cpp"),
        ("vorbis_decode_native", "TestBeat.ogg", native.vorbis_available,
         native.vorbis_read, "zenvorbis.cpp"),
        ("mp3_decode_native", "acetylene.mp3", native.mp3_available,
         native.mp3_read, "zenmp3.cpp"),
        ("mpc_decode_native", "44_16_stereo.mpc", native.mpc_available,
         native.mpc_read, "zenmpc.cpp"),
        ("opus_decode_native", "detodos.opus", native.opus_available,
         native.opus_read, "zenopus.cpp (SILK-WB; 48 kHz out)"),
    ]
    for name, fname, avail, reader, note in foreign:
        path = os.path.join(corpus, fname)
        if not (os.path.isfile(path) and avail()):
            continue
        fs_dec, frames = reader(path)
        nsamp = frames.shape[0] * frames.shape[1]
        secs = best_of(lambda: reader(path))
        dur_s = frames.shape[0] / float(fs_dec)
        rows[name] = {
            "ms": round(secs * 1e3, 1),
            "msamples_per_s": round(nsamp / secs / 1e6, 2),
            "x_realtime": round(dur_s / secs, 0),
            "note": f"{note} ({fname})",
        }
        print(
            f"{name:26s} {secs * 1e3:8.1f} ms  "
            f"{nsamp / secs / 1e6:7.2f} Msamples/s  "
            f"{dur_s / secs:7.0f}x realtime  {note} ({fname})",
            flush=True,
        )

    if args.json:
        with open(args.json, "w") as f:
            json.dump(
                {"seconds": args.seconds, "fs": fs, "rows": rows}, f,
                indent=1,
            )
        print(f"wrote {args.json}")
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
