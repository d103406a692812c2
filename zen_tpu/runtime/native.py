"""ctypes bindings for the native host runtime (native/zenio.cpp).

The C++ side provides the real-time plumbing the reference keeps in
native code (IOGPU-style transport, libnyquist-style wav codec,
SURVEY.md §2.2); Python falls back to scipy IO when the shared
library is absent. Build: ``make -C native`` (auto-attempted once).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libzenio.so")
_lib = None
_build_attempted = False


def _stale() -> bool:
    """True when the .so is missing or older than any native source
    (a stale build would silently miss newer symbols like the flac
    decoder; make is a no-op when already fresh)."""
    if not os.path.exists(_LIB_PATH):
        return True
    try:
        built = os.path.getmtime(_LIB_PATH)
        for name in os.listdir(_NATIVE_DIR):
            if name.endswith((".cpp", ".h")) or name == "Makefile":
                if os.path.getmtime(os.path.join(_NATIVE_DIR, name)) > built:
                    return True
    except OSError:
        pass
    return False


def _load():
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if _stale() and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.zen_ring_create.restype = ctypes.c_void_p
    lib.zen_ring_create.argtypes = [ctypes.c_uint64]
    lib.zen_ring_destroy.argtypes = [ctypes.c_void_p]
    for fn in ("zen_ring_write", "zen_ring_read"):
        getattr(lib, fn).restype = ctypes.c_uint64
        getattr(lib, fn).argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_uint64,
        ]
    lib.zen_ring_available.restype = ctypes.c_uint64
    lib.zen_ring_available.argtypes = [ctypes.c_void_p]
    lib.zen_ring_overruns.restype = ctypes.c_uint64
    lib.zen_ring_overruns.argtypes = [ctypes.c_void_p]
    lib.zen_wav_read_mono.restype = ctypes.c_int
    lib.zen_wav_read_mono.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_uint32,
    ]
    lib.zen_wav_write_pcm16.restype = ctypes.c_int
    lib.zen_wav_write_pcm16.argtypes = [
        ctypes.c_char_p,
        ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_uint32,
    ]

    class _WavInfo(ctypes.Structure):
        _fields_ = [
            ("sample_rate", ctypes.c_uint32),
            ("n_frames", ctypes.c_uint32),
            ("n_channels", ctypes.c_uint16),
            ("format", ctypes.c_uint16),
        ]

    lib.zen_wav_info.restype = ctypes.c_int
    lib.zen_wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(_WavInfo)]
    lib._WavInfo = _WavInfo
    try:  # absent from pre-flac builds of the .so
        lib.zen_flac_decode_file.restype = ctypes.c_int
        lib.zen_flac_decode_file.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.zen_flac_free.restype = None
        lib.zen_flac_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.zen_crc16.restype = ctypes.c_uint16
        lib.zen_crc16.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.zen_crc8.restype = ctypes.c_uint8
        lib.zen_crc8.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib._has_flac = True
    except AttributeError:
        lib._has_flac = False
    try:  # own flag: a pre-encoder .so must keep native DECODE alive
        lib.zen_flac_encode_mono16.restype = ctypes.c_int
        lib.zen_flac_encode_mono16.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_uint64,
            ctypes.c_uint32,
        ]
        lib._has_flac_enc = True
    except AttributeError:
        lib._has_flac_enc = False
    try:  # round-4 widened encoder (8-24 bit, mono/stereo)
        lib.zen_flac_encode.restype = ctypes.c_int
        lib.zen_flac_encode.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_uint64,
            ctypes.c_uint32,
            ctypes.c_uint32,
            ctypes.c_uint32,
        ]
        lib._has_flac_enc_wide = True
    except AttributeError:
        lib._has_flac_enc_wide = False
    try:  # own flag: absent from pre-wv-encoder builds of the .so
        lib.zen_wv_encode_mono.restype = ctypes.c_int
        lib.zen_wv_encode_mono.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_uint64,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib._has_wv_enc = True
    except AttributeError:
        lib._has_wv_enc = False
    try:  # general (mono/stereo) wv encoder: absent from older builds
        lib.zen_wv_encode.restype = ctypes.c_int
        lib.zen_wv_encode.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_uint64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib._has_wv_enc_wide = True
    except AttributeError:
        lib._has_wv_enc_wide = False
    # one registration per from-scratch codec decoder; each gets its
    # own capability flag so a stale pre-codec .so degrades gracefully
    for prefix, flag in (
        ("zen_wv", "_has_wv"),
        ("zen_vorbis", "_has_vorbis"),
        ("zen_mp3", "_has_mp3"),
        ("zen_mpc", "_has_mpc"),
        ("zen_opus", "_has_opus"),
    ):
        try:
            dec = getattr(lib, f"{prefix}_decode_file")
            dec.restype = ctypes.c_int
            dec.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            fre = getattr(lib, f"{prefix}_free")
            fre.restype = None
            fre.argtypes = [ctypes.POINTER(ctypes.c_float)]
            setattr(lib, flag, True)
        except AttributeError:
            setattr(lib, flag, False)
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class RingBuffer:
    """Lock-free SPSC float ring buffer (native). The host-side
    transport between a real-time audio producer and the TPU feeder
    thread — the IOGPU analog (reference io.h:16-81)."""

    def __init__(self, capacity_pow2: int):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native runtime unavailable; build with make -C native"
            )
        self._lib = lib
        self._h = lib.zen_ring_create(capacity_pow2)
        if not self._h:
            raise ValueError("capacity must be a power of two")

    def write(self, samples: np.ndarray) -> int:
        x = np.ascontiguousarray(samples, np.float32)
        return self._lib.zen_ring_write(
            self._h,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(x),
        )

    def read(self, n: int) -> np.ndarray | None:
        out = np.empty(n, np.float32)
        got = self._lib.zen_ring_read(
            self._h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
        )
        return out if got == n else None

    @property
    def available_samples(self) -> int:
        return self._lib.zen_ring_available(self._h)

    @property
    def overruns(self) -> int:
        return self._lib.zen_ring_overruns(self._h)

    def close(self):
        if self._h:
            self._lib.zen_ring_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def wav_read_mono(path: str):
    """Native wav decode (PCM16/float32, stereo averaged). Returns
    (fs, audio) or raises; callers fall back to scipy."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    info = lib._WavInfo()
    rc = lib.zen_wav_info(path.encode(), ctypes.byref(info))
    if rc != 0:
        raise ValueError(f"zen_wav_info failed: {rc}")
    out = np.empty(info.n_frames, np.float32)
    rc = lib.zen_wav_read_mono(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        info.n_frames,
    )
    if rc != 0:
        raise ValueError(f"zen_wav_read_mono failed: {rc}")
    return int(info.sample_rate), out


def flac_available() -> bool:
    lib = _load()
    return lib is not None and lib._has_flac


def crc16(data: bytes) -> int | None:
    """Native CRC-16 (poly 0x8005) or None when unavailable."""
    lib = _load()
    if lib is None or not lib._has_flac:
        return None
    return int(lib.zen_crc16(data, len(data)))


def crc8(data: bytes) -> int | None:
    lib = _load()
    if lib is None or not lib._has_flac:
        return None
    return int(lib.zen_crc8(data, len(data)))


def flac_write_mono16(
    path: str, fs: int, audio: np.ndarray, block_size: int = 4096
) -> None:
    """Native FLAC encode of float mono as 16-bit — byte-identical to
    zen_tpu.io.flac.write_flac(bits=16) on the same input (pinned by
    test); ~the wav-write speed class instead of the Python encoder's
    ~2 Msamples/s. Raises on unavailability; callers fall back."""
    lib = _load()
    if lib is None or not lib._has_flac_enc:
        raise RuntimeError("native flac encoder unavailable")
    x = np.ascontiguousarray(audio, np.float32)
    if x.ndim != 1:
        raise ValueError("mono audio expected")
    rc = lib.zen_flac_encode_mono16(
        path.encode(),
        int(fs),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(x),
        int(block_size),
    )
    if rc != 0:
        raise ValueError(f"zen_flac_encode_mono16 failed: {rc}")


def flac_write(
    path: str,
    fs: int,
    audio: np.ndarray,
    bits: int = 16,
    block_size: int = 4096,
) -> None:
    """Native FLAC encode of float mono [n] or stereo [n, 2] at
    8/12/16/20/24 bits — byte-identical to
    zen_tpu.io.flac.write_flac(bits=bits) on the same input (pinned by
    tests/test_flac.py::test_native_encoder_wide_byte_identical).
    Raises on unavailability; callers fall back to the Python
    encoder."""
    lib = _load()
    if lib is None or not getattr(lib, "_has_flac_enc_wide", False):
        raise RuntimeError("native flac encoder unavailable")
    x = np.ascontiguousarray(audio, np.float32)
    if x.ndim == 1:
        channels = 1
    elif x.ndim == 2 and x.shape[1] in (1, 2):
        channels = x.shape[1]
    else:
        raise ValueError("audio must be [n] mono or [n, 2] stereo")
    n = x.shape[0]
    rc = lib.zen_flac_encode(
        path.encode(),
        int(fs),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        channels,
        int(bits),
        int(block_size),
    )
    if rc != 0:
        raise ValueError(f"zen_flac_encode failed: {rc}")


def flac_read(path: str):
    """Native FLAC decode (native/zenflac.cpp). Returns
    (fs, float32 [frames, channels] in [-1, 1]); callers fall back to
    the pure-Python decoder (zen_tpu/io/flac.py) when unavailable."""
    lib = _load()
    if lib is None or not lib._has_flac:
        raise RuntimeError("native flac decoder unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_uint64()
    fs = ctypes.c_int32()
    ch = ctypes.c_int32()
    bits = ctypes.c_int32()
    rc = lib.zen_flac_decode_file(
        path.encode(),
        ctypes.byref(out),
        ctypes.byref(frames),
        ctypes.byref(fs),
        ctypes.byref(ch),
        ctypes.byref(bits),
    )
    if rc != 0:
        raise ValueError(f"zen_flac_decode_file failed: {rc}")
    n = frames.value * ch.value
    try:
        arr = (
            np.ctypeslib.as_array(out, shape=(n,)).copy()
            if n
            else np.zeros(0, np.float32)
        )
    finally:
        lib.zen_flac_free(out)
    return int(fs.value), arr.reshape(frames.value, ch.value)


def _decode_frames(prefix: str, human: str, path: str):
    """Shared ctypes marshalling for the native codec decoders: call
    ``<prefix>_decode_file``, copy out interleaved float32 frames, and
    free the native buffer.  Returns (fs, [frames, channels])."""
    lib = _load()
    if lib is None or not getattr(lib, f"_has_{prefix[4:]}", False):
        raise RuntimeError(f"native {human} decoder unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_uint64()
    fs = ctypes.c_int32()
    ch = ctypes.c_int32()
    rc = getattr(lib, f"{prefix}_decode_file")(
        path.encode(),
        ctypes.byref(out),
        ctypes.byref(frames),
        ctypes.byref(fs),
        ctypes.byref(ch),
    )
    if rc != 0:
        raise ValueError(f"{prefix}_decode_file failed: {rc}")
    n = frames.value * ch.value
    try:
        arr = (
            np.ctypeslib.as_array(out, shape=(n,)).copy()
            if n
            else np.zeros(0, np.float32)
        )
    finally:
        getattr(lib, f"{prefix}_free")(out)
    return int(fs.value), arr.reshape(frames.value, ch.value)


def wv_available() -> bool:
    lib = _load()
    return lib is not None and lib._has_wv


def wv_read(path: str):
    """Native WavPack decode (native/zenwv.cpp); block CRCs (and the
    WVX CRC when present) are verified natively — a nonzero return
    means the file failed to prove itself.  Callers fall back to the
    pure-Python decoder (zen_tpu/io/wavpack.py) when unavailable."""
    return _decode_frames("zen_wv", "wavpack", path)


def opus_available() -> bool:
    lib = _load()
    return lib is not None and lib._has_opus


def opus_read(path: str):
    """Native Ogg Opus decode (native/zenopus.cpp: from-scratch RFC
    6716 SILK+CELT + RFC 7845 container).  Output is always 48 kHz
    (Opus decodes at 48 kHz by design — the reference's OpusDecoder
    does the same, vendor/libnyquist/src/OpusDecoder.cpp:75).  No
    pure-Python fallback."""
    return _decode_frames("zen_opus", "opus", path)


def vorbis_available() -> bool:
    lib = _load()
    return lib is not None and lib._has_vorbis


def vorbis_read(path: str):
    """Native Ogg Vorbis decode (native/zenvorbis.cpp).  No pure-Python
    fallback (a lossy perceptual codec is not a reasonable
    interpreter-speed target); callers surface a clear error when the
    native library is unavailable."""
    return _decode_frames("zen_vorbis", "vorbis", path)


def mp3_available() -> bool:
    lib = _load()
    return lib is not None and lib._has_mp3


def mp3_read(path: str):
    """Native MP3 (MPEG-1/2/2.5 Layer III) decode (native/zenmp3.cpp);
    same no-Python-fallback policy as Vorbis."""
    return _decode_frames("zen_mp3", "mp3", path)


def mpc_available() -> bool:
    lib = _load()
    return lib is not None and lib._has_mpc


def mpc_read(path: str):
    """Native Musepack SV8 decode (native/zenmpc.cpp); same
    no-Python-fallback policy as Vorbis/MP3."""
    return _decode_frames("zen_mpc", "musepack", path)


def wv_write_mono(path: str, fs: int, audio: np.ndarray, bits: int = 16,
                  block_samples: int = 22050) -> None:
    """Native WavPack encode — byte-identical to
    zen_tpu.io.wavpack.write_wavpack on the same input (pinned by
    test), ~2 orders faster than the Python encoder.  Raises on
    unavailability; callers fall back."""
    lib = _load()
    if lib is None or not lib._has_wv_enc:
        raise RuntimeError("native wavpack encoder unavailable")
    x = np.ascontiguousarray(audio, np.float32)
    if x.ndim != 1:
        raise ValueError("mono audio expected")
    rc = lib.zen_wv_encode_mono(
        path.encode(),
        int(fs),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(x),
        int(bits),
        int(block_samples),
    )
    if rc != 0:
        raise ValueError(f"zen_wv_encode_mono failed: {rc}")


def wv_write(path: str, fs: int, audio: np.ndarray, bits: int = 16,
             block_samples: int = 22050) -> None:
    """Native WavPack encode of float mono [n] or plain L/R stereo
    [n, 2] at 8/16/24 bits — byte-identical to
    zen_tpu.io.wavpack.write_wavpack on the same input (pinned by
    tests/test_wavpack.py), ~2 orders faster than the Python encoder.
    Raises on unavailability; callers fall back."""
    lib = _load()
    if lib is None or not getattr(lib, "_has_wv_enc_wide", False):
        raise RuntimeError("native wavpack encoder unavailable")
    x = np.ascontiguousarray(audio, np.float32)
    if x.ndim == 1:
        channels = 1
    elif x.ndim == 2 and x.shape[1] in (1, 2):
        channels = x.shape[1]
    else:
        raise ValueError("audio must be [n] mono or [n, 2] stereo")
    rc = lib.zen_wv_encode(
        path.encode(),
        int(fs),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.shape[0],
        channels,
        int(bits),
        int(block_samples),
    )
    if rc != 0:
        raise ValueError(f"zen_wv_encode failed: {rc}")


def wav_write_pcm16(path: str, fs: int, audio: np.ndarray) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    x = np.ascontiguousarray(audio, np.float32)
    rc = lib.zen_wav_write_pcm16(
        path.encode(),
        fs,
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(x),
    )
    if rc != 0:
        raise ValueError(f"zen_wav_write_pcm16 failed: {rc}")
