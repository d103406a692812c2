"""Audio file IO.

Replaces the reference's vendored libnyquist decode/encode
(zen/offline.h:88-117, 193-253): wav read via scipy or the native
codec, FLAC via the from-scratch decoder (native/zenflac.cpp fast
path, zen_tpu/io/flac.py pure-Python fallback), stereo-to-mono
averaging, per-stem peak normalization, PCM16 encode. Host-side file
IO is not performance-critical (SURVEY.md §2.2); the streaming ring
buffer for live input lives in zen_tpu/runtime (native C++).
"""
from __future__ import annotations

import numpy as np
from scipy.io import wavfile


def read_audio_mono(path: str):
    """Load an audio file as float32 mono in [-1, 1] by sniffing the
    container magic — the front door every driver/CLI input goes
    through (the NyquistIO::Load analog, zen/offline.h:88-102).
    Supports RIFF wav, FLAC, WavPack, Ogg Vorbis, Ogg Opus, MP3, and
    Musepack SV8 — the full libnyquist decode surface."""
    had_id3 = False
    with open(path, "rb") as f:
        head = f.read(10)
        magic = head[:4]
        if head[:3] == b"ID3":
            # FLAC and MP3 files tagged by common tools carry an ID3v2
            # tag before the payload; sniff past it like the decoders do
            had_id3 = True
            from .flac import FlacError, skip_id3

            try:
                f.seek(skip_id3(head))
                magic = f.read(4)
            except FlacError:
                pass
    if magic == b"MPCK" or magic[:3] == b"MP+":
        from ..runtime import native

        if magic[:3] == b"MP+":
            raise ValueError(
                "legacy Musepack SV7 (MP+) is not supported; "
                "re-encode as SV8 or transcode to wav/flac"
            )
        if not native.mpc_available():
            raise RuntimeError(
                "Musepack input needs the native decoder; build it "
                "with `make -C native` (no pure-Python fallback)"
            )
        fs, frames = native.mpc_read(path)
        x = frames.mean(axis=1) if frames.shape[1] > 1 else frames[:, 0]
        return fs, np.ascontiguousarray(x, np.float32)
    if magic == b"OggS":
        from ..runtime import native

        with open(path, "rb") as f:
            page = f.read(1024)
        if b"OpusHead" in page:
            # Ogg Opus: from-scratch RFC 6716 decoder (SILK + CELT +
            # hybrid + PLC/CNG), always 48 kHz out — the same contract
            # as the reference's opusfile route (src/OpusDecoder.cpp:75)
            if not native.opus_available():
                raise RuntimeError(
                    "Opus input needs the native decoder; build it "
                    "with `make -C native` (no pure-Python fallback)"
                )
            fs, frames = native.opus_read(path)
            x = frames.mean(axis=1) if frames.shape[1] > 1 else frames[:, 0]
            return fs, np.ascontiguousarray(x, np.float32)
        if not native.vorbis_available():
            raise RuntimeError(
                "Ogg Vorbis input needs the native decoder; build it "
                "with `make -C native` (no pure-Python fallback)"
            )
        fs, frames = native.vorbis_read(path)
        x = frames.mean(axis=1) if frames.shape[1] > 1 else frames[:, 0]
        return fs, np.ascontiguousarray(x, np.float32)
    if magic == b"wvpk":
        try:
            from ..runtime import native

            if native.wv_available():
                fs, frames = native.wv_read(path)
                x = frames.mean(axis=1) if frames.shape[1] > 1 else frames[:, 0]
                return fs, np.ascontiguousarray(x, np.float32)
        except ValueError:
            raise  # malformed file: don't mask it with the fallback
        except Exception:
            pass
        from .wavpack import read_wavpack_mono

        return read_wavpack_mono(path)
    if magic == b"fLaC":
        try:
            from ..runtime import native

            if native.flac_available():
                fs, frames = native.flac_read(path)
                x = frames.mean(axis=1) if frames.shape[1] > 1 else frames[:, 0]
                return fs, np.ascontiguousarray(x, np.float32)
        except ValueError:
            raise  # malformed file: don't mask it with the fallback
        except Exception:
            pass
        from .flac import read_flac_mono

        return read_flac_mono(path)
    if (
        (
            len(magic) >= 2
            and magic[0] == 0xFF
            and (magic[1] & 0xE0) == 0xE0
            and magic != b"\xff\xfe\x00\x00"  # not a UTF byte-order mark
        )
        or had_id3  # tagged non-FLAC/WavPack/Ogg/Musepack: mp3 by elimination
        or (path.lower().endswith(".mp3") and magic != b"RIFF")
    ):
        from ..runtime import native

        if not native.mp3_available():
            raise RuntimeError(
                "MP3 input needs the native decoder; build it with "
                "`make -C native` (no pure-Python fallback)"
            )
        fs, frames = native.mp3_read(path)
        x = frames.mean(axis=1) if frames.shape[1] > 1 else frames[:, 0]
        return fs, np.ascontiguousarray(x, np.float32)
    return read_wav_mono(path)


def read_wav_mono(path: str):
    """Load a wav file as float32 mono in [-1, 1]. Returns (fs, audio).

    Stereo is averaged to mono, matching nqr::StereoToMono
    (zen/offline.h:106-113). Uses the native codec
    (zen_tpu/runtime/native.py) when built, scipy otherwise.
    """
    try:
        from ..runtime import native

        if native.available():
            return native.wav_read_mono(path)
    except Exception:
        pass
    fs, data = wavfile.read(path)
    if data.dtype == np.int16:
        audio = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        audio = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        audio = (data.astype(np.float32) - 128.0) / 128.0
    else:
        audio = data.astype(np.float32)
    if audio.ndim == 2:
        audio = audio.mean(axis=1)
    return int(fs), np.ascontiguousarray(audio, np.float32)


def peak_normalize(x: np.ndarray) -> np.ndarray:
    """Normalize to [-1, 1] by the max of (-min, max), matching the
    reference encode path (zen/offline.h:182-191). A silent signal is
    returned unchanged (the reference would divide by zero)."""
    x = np.asarray(x, np.float32)
    peak = max(-float(x.min(initial=0.0)), float(x.max(initial=0.0)))
    if peak == 0.0:
        return x
    return x / np.float32(peak)


def write_wav_pcm16(path: str, fs: int, x: np.ndarray) -> None:
    """Encode float [-1, 1] to mono PCM16 wav (nqr::PCMFormat::PCM_16,
    no dither — zen/offline.h:193-197)."""
    x = np.clip(np.asarray(x, np.float32), -1.0, 1.0)
    wavfile.write(path, fs, np.round(x * 32767.0).astype(np.int16))


def write_audio_pcm16(path: str, fs: int, x: np.ndarray) -> None:
    """16-bit encode routed by extension: ``.flac`` gets the
    from-scratch lossless FLAC encoder (io/flac.py — stems at roughly
    half the wav size), ``.wv`` the from-scratch lossless WavPack
    encoder (CRC-self-proving, the fastest lossless writer here),
    anything else PCM16 wav.  The write analog of
    :func:`read_audio_mono`'s magic sniffing."""
    if path.lower().endswith(".wv"):
        x = np.asarray(x, np.float32)
        if x.ndim not in (1, 2) or (x.ndim == 2 and x.shape[1] > 2):
            raise ValueError("audio must be [n] mono or [n, 2] stereo")
        try:
            from ..runtime import native

            # byte-identical to the Python encoder (pinned by test),
            # ~2 orders faster; handles mono and stereo
            native.wv_write(path, int(fs), x)
            return
        except (RuntimeError, OSError, ValueError):
            pass  # not built: the Python encoder below is exact too
        from .wavpack import write_wavpack

        write_wavpack(path, int(fs), x, bits=16)
        return
    if path.lower().endswith(".flac"):
        x = np.asarray(x, np.float32)
        if x.ndim in (1, 2):
            try:
                from ..runtime import native

                # byte-identical to the Python encoder (pinned by
                # test); handles mono and stereo
                native.flac_write(path, int(fs), x, bits=16)
                return
            except (RuntimeError, OSError, ValueError):
                # not built / unsupported shape / native IO error:
                # the Python encoder below either succeeds or raises
                # a properly-typed error (OSError with errno+path)
                pass
        from .flac import write_flac

        write_flac(path, int(fs), x, bits=16)
    else:
        write_wav_pcm16(path, fs, x)
