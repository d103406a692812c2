"""From-scratch WavPack (``.wv``) decoder — pure lossless path.

The reference pipeline accepts WavPack input because libnyquist routes
``NyquistIO::Load`` through its WavPackDecoder
(``vendor/libnyquist/src/WavPackDecoder.cpp``); this module gives the
rebuild the same front-door capability without vendoring anything.  It
decodes WavPack 4/5 streams (version 0x402-0x410): mono/stereo and
chained multichannel block sets, 8/16/24/32-bit integer and 32-bit
float audio, joint stereo, all decorrelation terms (1..8, 17, 18,
-1..-3), the zero-run entropy mode, and the WVX extension stream that
carries the shifted-out bits of float32/int32+ data.

Correctness is *provable* per block: every WavPack block stores a CRC
over the fully decorrelated integer samples, and WVX blocks store a
second CRC over the reconstructed float/int32 words, so a decode that
returns is a decode that matched the encoder bit-for-bit.  Both checks
are enforced here (``strict=True`` default).

Scope: pure lossless only.  Hybrid (lossy / lossy+correction) blocks
are rejected with a clear error — the reference's test corpus and the
stem-processing use case are lossless.

Format semantics were studied from the public WavPack 5 sources the
reference vendors (entropy coder: read_words.c; decorrelation +
sample fixup: unpack.c; metadata framing: open_utils.c /
decorr_utils.c / entropy_utils.c; float reconstruction:
unpack_floats.c).  The implementation below is original; the hot
per-sample recurrences are intentionally expressed in plain Python —
the product path uses the native decoder (native/zenwv.cpp) and this
module is the always-available fallback + test oracle.
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "WavpackError",
    "read_wavpack",
    "read_wavpack_mono",
    "wavpack_info",
]


class WavpackError(ValueError):
    pass


# ---- block header flag bits ------------------------------------------------
_BYTES_STORED = 3  # low 2 bits: bytes/sample - 1
_MONO_FLAG = 0x4
_HYBRID_FLAG = 0x8
_JOINT_STEREO = 0x10
_CROSS_DECORR = 0x20
_FLOAT_DATA = 0x80
_INT32_DATA = 0x100
_INITIAL_BLOCK = 0x800
_FINAL_BLOCK = 0x1000
_SHIFT_LSB, _SHIFT_MASK = 13, 0x1F << 13
_MAG_LSB, _MAG_MASK = 18, 0x1F << 18
_SRATE_LSB, _SRATE_MASK = 23, 0xF << 23
_FALSE_STEREO = 0x40000000
_MONO_DATA = _MONO_FLAG | _FALSE_STEREO

_SAMPLE_RATES = (
    6000, 8000, 9600, 11025, 12000, 16000, 22050, 24000,
    32000, 44100, 48000, 64000, 88200, 96000, 192000, 0,
)

# metadata sub-block ids (low 6 bits; 0x40 = odd true length, 0x80 = 24-bit
# word count follows instead of 8-bit)
_ID_ODD_SIZE = 0x40
_ID_LARGE = 0x80
_ID_DECORR_TERMS = 0x02
_ID_DECORR_WEIGHTS = 0x03
_ID_DECORR_SAMPLES = 0x04
_ID_ENTROPY_VARS = 0x05
_ID_FLOAT_INFO = 0x08
_ID_INT32_INFO = 0x09
_ID_WV_BITSTREAM = 0x0A
_ID_WVC_BITSTREAM = 0x0B
_ID_WVX_BITSTREAM = 0x0C
_ID_CHANNEL_INFO = 0x0D
_ID_SAMPLE_RATE = 0x27

_MAX_TERM = 8
_LIMIT_ONES = 16

# float_flags bits (ID_FLOAT_INFO byte 0)
_FLT_SHIFT_ONES = 1
_FLT_SHIFT_SAME = 2
_FLT_SHIFT_SENT = 4
_FLT_ZEROS_SENT = 8
_FLT_NEG_ZEROS = 0x10

# exp2_table[i] == round(256 * (2**(i/256) - 1)): the 8-bit log mantissa
# used by the exp2s/log2s encoding of medians, weights-history samples.
_EXP2_TABLE = [int(round(256.0 * (2.0 ** (i / 256.0) - 1.0))) for i in range(256)]


def _exp2s(log: int) -> int:
    """Signed pseudo-exponential decode of a 16-bit stored value."""
    if log < 0:
        return -_exp2s(-log)
    value = _EXP2_TABLE[log & 0xFF] | 0x100
    log >>= 8
    if log <= 9:
        return value >> (9 - log)
    return value << (log - 9)


def _restore_weight(w: int) -> int:
    """Inverse of the 8-bit weight quantization (w is signed char)."""
    result = w << 3
    if result > 0:
        result += (result + 64) >> 7
    return result


def _wrap32(x: int) -> int:
    """C int32 wraparound semantics."""
    return ((x + 0x80000000) & 0xFFFFFFFF) - 0x80000000


class _Bits:
    """LSB-first bit reader.  Reads past the end return 1-bits (the
    format's EOF convention: an over-long unary run signals stream end)
    but are counted so hostile inputs terminate deterministically."""

    __slots__ = ("d", "pos", "acc", "n", "over")

    def __init__(self, data) -> None:
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0
        self.over = 0

    def getbit(self) -> int:
        if not self.n:
            if self.pos < len(self.d):
                self.acc = self.d[self.pos]
                self.pos += 1
            else:
                self.acc = 0xFF
                self.over += 1
                if self.over > 16:
                    raise WavpackError("bitstream exhausted")
            self.n = 8
        b = self.acc & 1
        self.acc >>= 1
        self.n -= 1
        return b

    def getbits(self, nbits: int) -> int:
        while self.n < nbits:
            if self.pos < len(self.d):
                self.acc |= self.d[self.pos] << self.n
                self.pos += 1
            else:
                self.acc |= 0xFF << self.n
                self.over += 1
                if self.over > 16:
                    raise WavpackError("bitstream exhausted")
            self.n += 8
        v = self.acc & ((1 << nbits) - 1)
        self.acc >>= nbits
        self.n -= nbits
        return v

    def count_ones(self, limit: int) -> int:
        """Consecutive 1-bits; consumes the 0 terminator unless the
        count reaches `limit` first."""
        count = 0
        while count < limit and self.getbit():
            count += 1
        return count


def _read_code(bs: _Bits, maxcode: int) -> int:
    """Economical binary code for a value in [0, maxcode]."""
    if maxcode < 2:
        return bs.getbit() if maxcode else 0
    bitcount = maxcode.bit_length()
    extras = (1 << bitcount) - maxcode - 1
    code = bs.getbits(bitcount - 1)
    if code >= extras:
        code = (code << 1) - extras + bs.getbit()
    return code


# ---- entropy decode (residuals) -------------------------------------------


class _Entropy:
    """Per-stream adaptive state: 3 medians per channel plus the
    unary-run carry bits, persistent across blocks (refreshed whenever
    an ID_ENTROPY_VARS sub-block appears)."""

    __slots__ = ("med", "holding_one", "holding_zero", "zeros_acc")

    def __init__(self) -> None:
        self.med = [[0, 0, 0], [0, 0, 0]]
        self.holding_one = 0
        self.holding_zero = 0
        self.zeros_acc = 0

    def read_vars(self, data: bytes, mono: bool) -> None:
        want = 6 if mono else 12
        if len(data) != want:
            raise WavpackError("bad entropy-vars length")
        vals = struct.unpack("<%dh" % (want // 2), data)
        self.med[0] = [_exp2s(v) & 0xFFFFFFFF for v in vals[:3]]
        if not mono:
            self.med[1] = [_exp2s(v) & 0xFFFFFFFF for v in vals[3:]]
        self.holding_one = self.holding_zero = self.zeros_acc = 0


def _get_words(ent: _Entropy, bs: _Bits, nflat: int, stereo: bool) -> list:
    """Decode `nflat` interleaved residual words (the lossless variant
    of the medians-based Rice-like entropy coder)."""
    out = [0] * nflat
    med = ent.med
    m0, m1 = med[0], med[1]
    holding_one = ent.holding_one
    holding_zero = ent.holding_zero
    zeros_acc = ent.zeros_acc
    i = 0
    while i < nflat:
        c = m1 if (stereo and (i & 1)) else m0

        if holding_zero:
            # carried implicit "0 ones" sample: value within median-0
            holding_zero = 0
            low = 0
            high = ((c[0] >> 4) + 1) - 1
            c[0] = (c[0] - ((c[0] + 126) // 128) * 2) & 0xFFFFFFFF
            v = _read_code(bs, high)
            out[i] = ~v if bs.getbit() else v
            i += 1
            if i == nflat:
                break
            c = m1 if (stereo and (i & 1)) else m0

        if m0[0] < 2 and m1[0] < 2 and not holding_one:
            # both channels quiescent: zero-run mode
            if zeros_acc:
                zeros_acc -= 1
                if zeros_acc:
                    out[i] = 0
                    i += 1
                    continue
            else:
                cbits = bs.count_ones(33)
                if cbits == 33:
                    raise WavpackError("residual stream ended early")
                if cbits < 2:
                    zeros_acc = cbits
                else:
                    mask, zeros_acc = 1, 0
                    while cbits > 1:
                        if bs.getbit():
                            zeros_acc |= mask
                        mask <<= 1
                        cbits -= 1
                    zeros_acc |= mask
                if zeros_acc:
                    m0[0] = m0[1] = m0[2] = 0
                    m1[0] = m1[1] = m1[2] = 0
                    out[i] = 0
                    i += 1
                    continue

        ones = bs.count_ones(_LIMIT_ONES + 1)
        if ones >= _LIMIT_ONES:
            if ones == _LIMIT_ONES + 1:
                raise WavpackError("residual stream ended early")
            cbits = bs.count_ones(33)
            if cbits == 33:
                raise WavpackError("residual stream ended early")
            if cbits < 2:
                ones = cbits
            else:
                mask, ones = 1, 0
                while cbits > 1:
                    if bs.getbit():
                        ones |= mask
                    mask <<= 1
                    cbits -= 1
                ones |= mask
            ones += _LIMIT_ONES

        if holding_one:
            holding_one = ones & 1
            ones = (ones >> 1) + 1
        else:
            holding_one = ones & 1
            ones >>= 1
        holding_zero = 0 if holding_one else 1

        # map the ones-count to a [low, high] interval via the medians
        if ones == 0:
            low = 0
            high = ((c[0] >> 4) + 1) - 1
            c[0] = (c[0] - ((c[0] + 126) // 128) * 2) & 0xFFFFFFFF
        else:
            low = (c[0] >> 4) + 1
            c[0] = (c[0] + ((c[0] + 128) // 128) * 5) & 0xFFFFFFFF
            if ones == 1:
                high = low + ((c[1] >> 4) + 1) - 1
                c[1] = (c[1] - ((c[1] + 62) // 64) * 2) & 0xFFFFFFFF
            else:
                low += (c[1] >> 4) + 1
                c[1] = (c[1] + ((c[1] + 64) // 64) * 5) & 0xFFFFFFFF
                med2 = (c[2] >> 4) + 1
                if ones == 2:
                    high = low + med2 - 1
                    c[2] = (c[2] - ((c[2] + 30) // 32) * 2) & 0xFFFFFFFF
                else:
                    low += (ones - 2) * med2
                    high = low + med2 - 1
                    c[2] = (c[2] + ((c[2] + 32) // 32) * 5) & 0xFFFFFFFF
        low &= 0x7FFFFFFF
        high &= 0x7FFFFFFF
        if low > high:
            high = low
        v = low + _read_code(bs, high - low)
        out[i] = ~v if bs.getbit() else v
        i += 1

    ent.holding_one = holding_one
    ent.holding_zero = holding_zero
    ent.zeros_acc = zeros_acc
    return out


# ---- decorrelation ---------------------------------------------------------


def _apply_weight(w: int, s: int) -> int:
    if -32768 <= s <= 32767:
        return (w * s + 512) >> 10
    return ((((s & 0xFFFF) * w) >> 9) + (((s & ~0xFFFF) >> 9) * w) + 1) >> 1


class _Pass:
    """One decorrelation pass: term, adaptation delta, per-channel
    weight + sample history (refreshed by metadata when present)."""

    __slots__ = ("term", "delta", "w_a", "w_b", "sam_a", "sam_b")

    def __init__(self, term: int, delta: int) -> None:
        self.term = term
        self.delta = delta
        self.w_a = 0
        self.w_b = 0
        self.sam_a = [0] * _MAX_TERM
        self.sam_b = [0] * _MAX_TERM


def _decorr_channel(p: _Pass, hist: list, w: int, delta: int, buf: list):
    """Positive-term prediction over one channel, in place.  Returns
    the updated (weight, new-history) pair.  `hist` carries the
    previous outputs of *this* pass: hist[0] == x[-term] .. hist[-1]
    == x[-1] for terms 1..8; hist[0] == x[-1], hist[1] == x[-2] for
    the extrapolating terms 17/18."""
    term = p.term
    n = len(buf)
    if term == 17:
        p1, p2 = hist[0], hist[1]
        for i in range(n):
            sam = _wrap32(2 * p1 - p2)
            t = buf[i]
            nv = _wrap32(_apply_weight(w, sam) + t)
            buf[i] = nv
            if sam and t:
                w += delta if (sam ^ t) >= 0 else -delta
            p2, p1 = p1, nv
        return w, [p1, p2]
    if term == 18:
        p1, p2 = hist[0], hist[1]
        for i in range(n):
            sam = _wrap32(p1 + ((p1 - p2) >> 1))
            t = buf[i]
            nv = _wrap32(_apply_weight(w, sam) + t)
            buf[i] = nv
            if sam and t:
                w += delta if (sam ^ t) >= 0 else -delta
            p2, p1 = p1, nv
        return w, [p1, p2]
    # terms 1..8: direct reference to x[i - term]
    full = hist + buf  # hist holds exactly `term` entries
    for i in range(n):
        sam = full[i]
        t = buf[i]
        nv = _wrap32(_apply_weight(w, sam) + t)
        buf[i] = nv
        full[term + i] = nv
        if sam and t:
            w += delta if (sam ^ t) >= 0 else -delta
    return w, full[n:]


def _clip_update(w: int, delta: int, sam: int, res: int) -> int:
    if sam and res:
        if (sam ^ res) >= 0:
            w += delta
            if w > 1024:
                w = 1024
        else:
            w -= delta
            if w < -1024:
                w = -1024
    return w


def _decorr_block(passes: list, a: list, b: list, stereo: bool) -> None:
    """Apply every decorrelation pass over the block, updating the
    carried per-pass state."""
    for p in passes:
        term, delta = p.term, p.delta
        if term > 0:
            if term > _MAX_TERM:
                hist_a = p.sam_a[:2]
            else:
                hist_a = p.sam_a[:term]
            p.w_a, new_a = _decorr_channel(p, hist_a, p.w_a, delta, a)
            if term > _MAX_TERM:
                p.sam_a[:2] = new_a
            else:
                p.sam_a[:term] = new_a
            if stereo:
                if term > _MAX_TERM:
                    hist_b = p.sam_b[:2]
                else:
                    hist_b = p.sam_b[:term]
                p.w_b, new_b = _decorr_channel(p, hist_b, p.w_b, delta, b)
                if term > _MAX_TERM:
                    p.sam_b[:2] = new_b
                else:
                    p.sam_b[:term] = new_b
        elif term == -1:
            # left from previous right, right from current left
            w_a, w_b, prev_r = p.w_a, p.w_b, p.sam_a[0]
            for i in range(len(a)):
                ra, rb = a[i], b[i]
                left = _wrap32(_apply_weight(w_a, prev_r) + ra)
                w_a = _clip_update(w_a, delta, prev_r, ra)
                a[i] = left
                right = _wrap32(_apply_weight(w_b, left) + rb)
                w_b = _clip_update(w_b, delta, left, rb)
                b[i] = prev_r = right
            p.w_a, p.w_b, p.sam_a[0] = w_a, w_b, prev_r
        elif term == -2:
            # right from previous left, left from current right
            w_a, w_b, prev_l = p.w_a, p.w_b, p.sam_b[0]
            for i in range(len(a)):
                ra, rb = a[i], b[i]
                right = _wrap32(_apply_weight(w_b, prev_l) + rb)
                w_b = _clip_update(w_b, delta, prev_l, rb)
                b[i] = right
                left = _wrap32(_apply_weight(w_a, right) + ra)
                w_a = _clip_update(w_a, delta, right, ra)
                a[i] = prev_l = left
            p.w_a, p.w_b, p.sam_b[0] = w_a, w_b, prev_l
        elif term == -3:
            # both channels from the other's previous sample
            w_a, w_b = p.w_a, p.w_b
            prev_r, prev_l = p.sam_a[0], p.sam_b[0]
            for i in range(len(a)):
                ra, rb = a[i], b[i]
                left = _wrap32(_apply_weight(w_a, prev_r) + ra)
                w_a = _clip_update(w_a, delta, prev_r, ra)
                right = _wrap32(_apply_weight(w_b, prev_l) + rb)
                w_b = _clip_update(w_b, delta, prev_l, rb)
                a[i] = prev_l = left
                b[i] = prev_r = right
            p.w_a, p.w_b = w_a, w_b
            p.sam_a[0], p.sam_b[0] = prev_r, prev_l
        else:
            raise WavpackError(f"invalid decorrelation term {term}")


# ---- block container -------------------------------------------------------

_HDR = struct.Struct("<4sIHBBIIIII")


class _Block:
    __slots__ = (
        "version", "total_samples", "block_index", "block_samples",
        "flags", "crc", "meta",
    )


def _parse_block(data, off: int):
    if len(data) - off < 32:
        raise WavpackError("truncated block header")
    (magic, cksize, version, _idx8, _tot8, total, bidx, bsamp, flags, crc
     ) = _HDR.unpack_from(data, off)
    if magic != b"wvpk":
        raise WavpackError("bad block magic")
    end = off + 8 + cksize
    if cksize < 24 or end > len(data):
        raise WavpackError("block size out of range")
    if not 0x402 <= version <= 0x410:
        raise WavpackError(f"unsupported stream version {version:#x}")
    blk = _Block.__new__(_Block)
    blk.version = version
    blk.total_samples = total
    blk.block_index = bidx
    blk.block_samples = bsamp
    blk.flags = flags
    blk.crc = crc
    blk.meta = []
    mo = off + 32
    while mo < end:
        mid = data[mo]
        if mid & _ID_LARGE:
            if mo + 4 > end:
                raise WavpackError("truncated metadata header")
            words = data[mo + 1] | (data[mo + 2] << 8) | (data[mo + 3] << 16)
            mo += 4
        else:
            if mo + 2 > end:
                raise WavpackError("truncated metadata header")
            words = data[mo + 1]
            mo += 2
        size = words * 2
        if mo + size > end:
            raise WavpackError("metadata overruns block")
        payload = data[mo:mo + size]
        if mid & _ID_ODD_SIZE:
            payload = payload[:-1]
        blk.meta.append((mid & ~(_ID_LARGE | _ID_ODD_SIZE), payload))
        mo += size
    return blk, end


# ---- per-stream decode -----------------------------------------------------


class _Stream:
    """Carried state for one WavPack stream (1-2 channels).  Metadata
    sub-blocks refresh it; absent metadata means state persists from
    the previous block of the same stream."""

    def __init__(self) -> None:
        self.passes: list[_Pass] = []
        self.entropy = _Entropy()

    def decode_block(self, blk: _Block, strict: bool):
        flags = blk.flags
        if flags & _HYBRID_FLAG:
            raise WavpackError(
                "hybrid (lossy) WavPack streams are not supported; "
                "re-encode losslessly"
            )
        mono = bool(flags & _MONO_DATA)
        wv = wvx = None
        float_info = int32_info = None
        for mid, payload in blk.meta:
            if mid == _ID_DECORR_TERMS:
                # stored in reverse application order
                passes = []
                for byte in payload:
                    term = (byte & 0x1F) - 5
                    delta = (byte >> 5) & 0x7
                    ok = (1 <= term <= _MAX_TERM) or term in (17, 18) or (
                        -3 <= term <= -1 and not mono
                    )
                    if not ok:
                        raise WavpackError(f"invalid decorrelation term {term}")
                    passes.append(_Pass(term, delta))
                passes.reverse()
                self.passes = passes
            elif mid == _ID_DECORR_WEIGHTS:
                per = 1 if mono else 2
                count = len(payload) // per
                if count > len(self.passes):
                    raise WavpackError("more decorrelation weights than terms")
                for p in self.passes:
                    p.w_a = p.w_b = 0
                sgn = [b - 256 if b >= 128 else b for b in payload]
                # first stored weight belongs to the *last* pass
                k = 0
                for p in reversed(self.passes):
                    if k // per >= count:
                        break
                    p.w_a = _restore_weight(sgn[k]); k += 1
                    if not mono:
                        p.w_b = _restore_weight(sgn[k]); k += 1
            elif mid == _ID_DECORR_SAMPLES:
                for p in self.passes:
                    p.sam_a = [0] * _MAX_TERM
                    p.sam_b = [0] * _MAX_TERM
                pos = 0

                def _next16() -> int:
                    nonlocal pos
                    if pos + 2 > len(payload):
                        raise WavpackError("truncated decorrelation history")
                    v = struct.unpack_from("<h", payload, pos)[0]
                    pos += 2
                    return _exp2s(v)

                # history is also stored last-pass-first
                for p in reversed(self.passes):
                    if pos >= len(payload):
                        break
                    if p.term > _MAX_TERM:
                        p.sam_a[0] = _next16()
                        p.sam_a[1] = _next16()
                        if not mono:
                            p.sam_b[0] = _next16()
                            p.sam_b[1] = _next16()
                    elif p.term < 0:
                        p.sam_a[0] = _next16()
                        p.sam_b[0] = _next16()
                    else:
                        for m in range(p.term):
                            p.sam_a[m] = _next16()
                            if not mono:
                                p.sam_b[m] = _next16()
                if pos != len(payload):
                    raise WavpackError("decorrelation history length mismatch")
            elif mid == _ID_ENTROPY_VARS:
                self.entropy.read_vars(payload, mono)
            elif mid == _ID_FLOAT_INFO:
                if len(payload) != 4:
                    raise WavpackError("bad float-info length")
                float_info = tuple(payload)
            elif mid == _ID_INT32_INFO:
                if len(payload) != 4:
                    raise WavpackError("bad int32-info length")
                int32_info = tuple(payload)
            elif mid == _ID_WV_BITSTREAM:
                wv = payload
            elif mid == _ID_WVX_BITSTREAM:
                if len(payload) <= 4:
                    raise WavpackError("bad wvx length")
                wvx = payload
            elif mid == _ID_WVC_BITSTREAM:
                raise WavpackError("hybrid correction stream not supported")
        if wv is None:
            raise WavpackError("block has no residual bitstream")
        if not self.passes and blk.block_samples:
            # legal (verbatim residuals) but every real encoder sends terms
            pass
        n = blk.block_samples
        nflat = n if mono else 2 * n
        bs = _Bits(wv)
        res = _get_words(self.entropy, bs, nflat, not mono)

        if mono:
            a, b = res, []
        else:
            a, b = res[0::2], res[1::2]
        _decorr_block(self.passes, a, b, not mono)

        crc = 0xFFFFFFFF
        if mono:
            for v in a:
                crc = (crc * 3 + v) & 0xFFFFFFFF
        else:
            if flags & _JOINT_STEREO:
                for i in range(n):
                    r = _wrap32(b[i] - (a[i] >> 1))
                    left = _wrap32(a[i] + r)
                    a[i], b[i] = left, r
                    crc = (crc * 9 + 3 * left + r) & 0xFFFFFFFF
            else:
                for i in range(n):
                    crc = (crc * 9 + 3 * a[i] + b[i]) & 0xFFFFFFFF
        if strict and crc != blk.crc:
            raise WavpackError(
                f"block CRC mismatch ({crc:#010x} != {blk.crc:#010x})"
            )

        shift = (flags & _SHIFT_MASK) >> _SHIFT_LSB
        chans = [a] if mono else [a, b]

        if flags & _FLOAT_DATA:
            if float_info is None:
                raise WavpackError("float block without float-info")
            out = self._restore_floats(chans, float_info, wvx, strict)
        elif flags & _INT32_DATA:
            if int32_info is None:
                raise WavpackError("int32 block without int32-info")
            out = self._restore_int32(chans, int32_info, wvx, shift, strict)
        else:
            if shift:
                for ch in chans:
                    for i in range(len(ch)):
                        ch[i] = _wrap32(ch[i] << shift)
            out = [np.array(ch, np.int64) for ch in chans]

        if flags & _FALSE_STEREO:
            out = [out[0], out[0]]
        return out

    @staticmethod
    def _restore_floats(chans, float_info, wvx, strict):
        """Rebuild IEEE-754 words from the decoded ints + the WVX
        side-channel carrying shifted-out mantissa bits.  The WVX bits
        are interleaved across channels in frame order, so all
        channels are walked together."""
        fflags, fshift, fmax_exp, fnorm_exp = float_info
        if wvx is not None:
            crc_stored = struct.unpack_from("<I", wvx, 0)[0]
            xb = _Bits(memoryview(wvx)[4:])
        else:
            crc_stored = None
            xb = None
        crc = 0xFFFFFFFF
        n = len(chans[0])
        words = [np.empty(n, np.uint32) for _ in chans]
        for i in range(n):
            for ch, w_out in zip(chans, words):
                v = ch[i]
                sign = 0
                mant = 0
                exp = fmax_exp
                if v == 0:
                    exp = 0
                    if xb is not None and (fflags & _FLT_ZEROS_SENT):
                        if xb.getbit():
                            mant = xb.getbits(23)
                            if fmax_exp >= 25:
                                exp = xb.getbits(8)
                            sign = xb.getbit()
                        elif fflags & _FLT_NEG_ZEROS:
                            sign = xb.getbit()
                else:
                    v = _wrap32(v << fshift)
                    if v < 0:
                        v = -v
                        sign = 1
                    if v == 0x1000000 and xb is not None:
                        if xb.getbit():
                            mant = xb.getbits(23)
                        exp = 255
                    else:
                        if v >= 0x1000000 and xb is None:
                            while v & 0xF000000:
                                v >>= 1
                                exp += 1
                        shift_count = 0
                        while exp and not (v & 0x800000):
                            # exp decrements once per shift attempt; the
                            # decrement that lands on 0 exits unshifted
                            # (denormal with the mantissa as-is)
                            exp -= 1
                            if not exp:
                                break
                            shift_count += 1
                            v = _wrap32(v << 1)
                        if shift_count:
                            if (fflags & _FLT_SHIFT_ONES) or (
                                (fflags & _FLT_SHIFT_SAME)
                                and xb is not None
                                and xb.getbit()
                            ):
                                v |= (1 << shift_count) - 1
                            elif (fflags & _FLT_SHIFT_SENT) and xb is not None:
                                v |= xb.getbits(shift_count) & (
                                    (1 << shift_count) - 1
                                )
                        mant = v & 0x7FFFFF
                crc = (crc * 27 + mant * 9 + exp * 3 + sign) & 0xFFFFFFFF
                w_out[i] = (sign << 31) | (exp << 23) | mant
        if strict and crc_stored is not None and crc != crc_stored:
            raise WavpackError(
                f"wvx CRC mismatch ({crc:#010x} != {crc_stored:#010x})"
            )
        out = []
        for w in words:
            floats = w.view(np.float32).astype(np.float64)
            if fnorm_exp != 127:
                floats *= 2.0 ** (127 - fnorm_exp)
            out.append(floats)
        return out

    @staticmethod
    def _restore_int32(chans, int32_info, wvx, shift, strict):
        sent_bits, zeros, ones, dups = int32_info
        n = len(chans[0])
        if wvx is not None:
            crc_stored = struct.unpack_from("<I", wvx, 0)[0]
            xb = _Bits(memoryview(wvx)[4:])
            crc = 0xFFFFFFFF
            mask = (1 << sent_bits) - 1
            # interleaved channel order, matching the encoder's walk
            for i in range(n):
                for ch in chans:
                    v = ch[i]
                    data = xb.getbits(sent_bits) if sent_bits else 0
                    v = _wrap32((v << sent_bits) | (data & mask))
                    if zeros:
                        v = _wrap32(v << zeros)
                    elif ones:
                        v = _wrap32(((v + 1) << ones) - 1)
                    elif dups:
                        v = _wrap32(((v + (v & 1)) << dups) - (v & 1))
                    ch[i] = v
                    crc = (
                        crc * 9 + (v & 0xFFFF) * 3 + ((v >> 16) & 0xFFFF)
                    ) & 0xFFFFFFFF
            if strict and crc != crc_stored:
                raise WavpackError(
                    f"wvx CRC mismatch ({crc:#010x} != {crc_stored:#010x})"
                )
        elif not sent_bits and (zeros + ones + dups):
            for ch in chans:
                for i in range(n):
                    v = ch[i]
                    if zeros:
                        v = _wrap32(v << zeros)
                    elif ones:
                        v = _wrap32(((v + 1) << ones) - 1)
                    elif dups:
                        v = _wrap32(((v + (v & 1)) << dups) - (v & 1))
                    ch[i] = v
        else:
            shift += zeros + sent_bits + ones + dups
        if shift:
            for ch in chans:
                for i in range(n):
                    ch[i] = _wrap32(ch[i] << shift)
        return [np.array(ch, np.int64) for ch in chans]


# ---- public API ------------------------------------------------------------


def _find_first_block(data) -> int:
    """Tolerate leading tags/junk the way shipping decoders do: scan
    for the first plausible block signature."""
    off = data.find(b"wvpk")
    limit = 1 << 20
    while off != -1 and off < limit:
        try:
            _parse_block(data, off)
            return off
        except WavpackError:
            off = data.find(b"wvpk", off + 1)
    raise WavpackError("not a WavPack file (no wvpk block found)")


def wavpack_info(path: str) -> dict:
    """Cheap header probe: sample rate, channels, bit depth, length."""
    with open(path, "rb") as f:
        data = f.read()
    off = _find_first_block(data)
    blk, _ = _parse_block(data, off)
    flags = blk.flags
    chans = 1 if (flags & _MONO_DATA) else 2
    if not flags & _INITIAL_BLOCK:
        raise WavpackError("first block is not stream-initial")
    fs = _SAMPLE_RATES[(flags & _SRATE_MASK) >> _SRATE_LSB]
    for mid, payload in blk.meta:
        if mid == _ID_SAMPLE_RATE and len(payload) >= 3:
            fs = payload[0] | (payload[1] << 8) | (payload[2] << 16)
        elif mid == _ID_CHANNEL_INFO and payload:
            chans = payload[0]
    return {
        "sample_rate": fs,
        "channels": chans,
        "bits": 32 if flags & _FLOAT_DATA else 8 * ((flags & _BYTES_STORED) + 1),
        "float": bool(flags & _FLOAT_DATA),
        "total_samples": blk.total_samples,
        "version": blk.version,
    }


def read_wavpack(source, *, strict: bool = True, max_blocks: int | None = None):
    """Decode a WavPack file (path, bytes, or file object) to
    ``(fs, float64 array [frames, channels])`` in [-1, 1].

    Every block's stored CRC is verified (and the WVX CRC when the
    stream carries one) unless ``strict=False``.  ``max_blocks`` stops
    after N block sets — used by tests to bound the pure-Python cost
    on long real-world files."""
    if isinstance(source, (bytes, bytearray, memoryview)):
        data = bytes(source)
    elif hasattr(source, "read"):
        data = source.read()
    else:
        with open(source, "rb") as f:
            data = f.read()
    off = _find_first_block(data)

    streams: list[_Stream] = []
    fs = None
    bits = None
    is_float = False
    norm_scale = None
    segments: list[list[np.ndarray]] = []
    current: list[np.ndarray] = []
    stream_idx = 0
    nblocks = 0
    while off <= len(data) - 32 and data[off:off + 4] == b"wvpk":
        blk, off = _parse_block(data, off)
        flags = blk.flags
        if blk.block_samples == 0:
            continue  # metadata-only block (tags etc.)
        if flags & _INITIAL_BLOCK:
            stream_idx = 0
        if stream_idx >= len(streams):
            streams.append(_Stream())
        if fs is None:
            fs = _SAMPLE_RATES[(flags & _SRATE_MASK) >> _SRATE_LSB]
            for mid, payload in blk.meta:
                if mid == _ID_SAMPLE_RATE and len(payload) >= 3:
                    fs = payload[0] | (payload[1] << 8) | (payload[2] << 16)
            bits = 8 * ((flags & _BYTES_STORED) + 1)
            is_float = bool(flags & _FLOAT_DATA)
        chans = streams[stream_idx].decode_block(blk, strict)
        if is_float:
            current.extend(chans)
        else:
            scale = float(1 << (bits - 1))
            current.extend(np.asarray(c, np.float64) / scale for c in chans)
        stream_idx += 1
        if flags & _FINAL_BLOCK:
            segments.append(current)
            current = []
            stream_idx = 0
            nblocks += 1
            if max_blocks is not None and nblocks >= max_blocks:
                break
    if current:
        segments.append(current)
    if not segments:
        raise WavpackError("no audio blocks found")
    nch = len(segments[0])
    if any(len(s) != nch for s in segments):
        raise WavpackError("inconsistent channel count across blocks")
    channels = [np.concatenate([s[c] for s in segments]) for c in range(nch)]
    out = np.stack(channels, axis=1)
    if not fs:
        raise WavpackError("reserved sample-rate code with no SR metadata")
    return int(fs), out


def read_wavpack_mono(source, *, strict: bool = True):
    """Decode and average to float32 mono — the driver front door."""
    fs, x = read_wavpack(source, strict=strict)
    mono = x.mean(axis=1) if x.shape[1] > 1 else x[:, 0]
    return fs, np.ascontiguousarray(mono, np.float32)


# ---- encoder (mono lossless, the stem-writing path) ------------------------
#
# The exact mirror of the decoder above: the medians entropy coder is
# symmetric (the DEC/INC recurrences run identically on both sides),
# the dual-state unary carry resolves with one symbol of lookahead
# (the emitted count's parity announces whether the next symbol's
# bucket is zero), and per-block metadata pins all adaptive state
# (terms, zero weights/history, starting medians), so every block is
# independently decodable.  Output is a chain of INITIAL|FINAL mono
# blocks, each carrying the stored CRC the strict decoder (and
# libwavpack) verifies bit-for-bit.


class _BitWriter:
    """LSB-first bit writer (the _Bits mirror)."""

    __slots__ = ("buf", "acc", "n")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def putbit(self, b: int) -> None:
        self.acc |= (b & 1) << self.n
        self.n += 1
        if self.n == 8:
            self.buf.append(self.acc)
            self.acc = 0
            self.n = 0

    def putbits(self, v: int, nbits: int) -> None:
        self.acc |= (v & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def done(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.buf)


def _write_code(bw: _BitWriter, value: int, maxcode: int) -> None:
    """Inverse of _read_code: economical binary code in [0, maxcode]."""
    if maxcode < 2:
        if maxcode:
            bw.putbit(value)
        return
    bitcount = maxcode.bit_length()
    extras = (1 << bitcount) - maxcode - 1
    if value < extras:
        bw.putbits(value, bitcount - 1)
    else:
        w = value + extras
        bw.putbits(w >> 1, bitcount - 1)
        bw.putbit(w & 1)


def _write_elias(bw: _BitWriter, v: int) -> None:
    """The zeros_acc / unary-escape count code: bit_length(v) ones, a
    zero terminator, then the bits below the implicit top (LSB-first)
    — mirror of the decoder's count loops."""
    if v < 2:
        for _ in range(v):
            bw.putbit(1)
        bw.putbit(0)
        return
    cbits = v.bit_length()
    for _ in range(cbits):
        bw.putbit(1)
    bw.putbit(0)
    for k in range(cbits - 1):
        bw.putbit((v >> k) & 1)


def _put_words(values, med, bw: _BitWriter, med_b=None) -> None:
    """Entropy-encode a residual block (mirror of _get_words); the
    medians evolve in place through the decoder's exact recurrences.

    Mono when ``med_b`` is None; stereo when given — ``values`` is then
    the interleaved L/R flat stream and symbol i uses the (i & 1)
    channel's medians, exactly the decoder's channel walk.  The
    holding_one/holding_zero carry and the zero-run mode are
    stream-wide (shared across channels), as in _get_words."""
    n = len(values)
    stereo = med_b is not None
    m1 = med_b if stereo else [0, 0, 0]

    def bucket(c, vi: int) -> int:
        b0 = (c[0] >> 4) + 1
        if vi < b0:
            return 0
        b1 = (c[1] >> 4) + 1
        if vi < b0 + b1:
            return 1
        b2 = (c[2] >> 4) + 1
        return 2 + (vi - b0 - b1) // b2

    h1 = 0
    h0 = 0
    i = 0
    while i < n:
        c = m1 if (stereo and (i & 1)) else med
        if h0:
            # forced ones_count==0 slot announced by the previous
            # symbol's even count (its value fits median-0 by choice
            # of that parity)
            h0 = 0
            v = values[i]
            vi = ~v if v < 0 else v
            high = c[0] >> 4
            c[0] = (c[0] - ((c[0] + 126) // 128) * 2) & 0xFFFFFFFF
            _write_code(bw, vi, high)
            bw.putbit(1 if v < 0 else 0)
            i += 1
            if i == n:
                break
            c = m1 if (stereo and (i & 1)) else med

        if med[0] < 2 and m1[0] < 2 and not h1:
            # quiescent: the zero-run code (mono keeps the decoder's
            # channel-1 medians at zero, so its condition reduces to
            # channel 0; stereo requires both quiescent, _get_words:246)
            z = 0
            while i + z < n and values[i + z] == 0:
                z += 1
            _write_elias(bw, z)
            if z:
                med[0] = med[1] = med[2] = 0
                m1[0] = m1[1] = m1[2] = 0
                i += z
                if i >= n:
                    break
                c = m1 if (stereo and (i & 1)) else med
            # the symbol at the new i is encoded via the unary path
            # with no second zero-run check (decoder falls through)

        v = values[i]
        vi = ~v if v < 0 else v
        b = bucket(c, vi)

        if b == 0:
            low = 0
            high = c[0] >> 4
            c[0] = (c[0] - ((c[0] + 126) // 128) * 2) & 0xFFFFFFFF
        else:
            low = (c[0] >> 4) + 1
            c[0] = (c[0] + ((c[0] + 128) // 128) * 5) & 0xFFFFFFFF
            if b == 1:
                high = low + (c[1] >> 4)
                c[1] = (c[1] - ((c[1] + 62) // 64) * 2) & 0xFFFFFFFF
            else:
                low += (c[1] >> 4) + 1
                c[1] = (c[1] + ((c[1] + 64) // 64) * 5) & 0xFFFFFFFF
                med2 = (c[2] >> 4) + 1
                if b == 2:
                    high = low + med2 - 1
                    c[2] = (c[2] - ((c[2] + 30) // 32) * 2) & 0xFFFFFFFF
                else:
                    low += (b - 2) * med2
                    high = low + med2 - 1
                    c[2] = (c[2] + ((c[2] + 32) // 32) * 5) & 0xFFFFFFFF

        # the count's parity announces whether the NEXT symbol's
        # bucket (under its own channel's just-updated medians) is
        # zero — the decoder's holding_one/holding_zero contract
        p = 0
        if i + 1 < n:
            nc = m1 if (stereo and ((i + 1) & 1)) else med
            nv = values[i + 1]
            nvi = ~nv if nv < 0 else nv
            p = 1 if nvi > (nc[0] >> 4) else 0
        u = 2 * (b - h1) + p
        if u < _LIMIT_ONES:
            for _ in range(u):
                bw.putbit(1)
            bw.putbit(0)
        else:
            for _ in range(_LIMIT_ONES):
                bw.putbit(1)
            bw.putbit(0)
            _write_elias(bw, u - _LIMIT_ONES)
        h1 = p
        h0 = 1 - p

        _write_code(bw, vi - low, high - low)
        bw.putbit(1 if v < 0 else 0)
        i += 1


# decode passes are applied [18, 17]; the inverse runs 17 then 18
_ENC_TERMS = (18, 17)
_ENC_DELTA = 2


def _decorr_encode_pass(term: int, x: list) -> list:
    """Inverse of one positive-term decode pass, zero initial state:
    res[i] = x[i] - apply_weight(w, predict(x)) with the decoder's
    exact weight adaptation (x is this pass's decode OUTPUT, so the
    history comes from x itself)."""
    w = 0
    p1 = p2 = 0
    out = [0] * len(x)
    for i, xv in enumerate(x):
        if term == 17:
            sam = _wrap32(2 * p1 - p2)
        else:
            sam = _wrap32(p1 + ((p1 - p2) >> 1))
        r = _wrap32(xv - _apply_weight(w, sam))
        out[i] = r
        if sam and r:
            w += _ENC_DELTA if (sam ^ r) >= 0 else -_ENC_DELTA
        p2, p1 = p1, xv
    return out


def _median_seed(target: int) -> int:
    """Smallest stored int16 whose exp2s decode is >= target (the
    encoder must use exactly the representable value)."""
    for v in range(0, 0x8000):
        if _exp2s(v) >= target:
            return v
    return 0x7FFF


def write_wavpack(path: str, fs: int, audio, *, bits: int = 16,
                  block_samples: int = 22050) -> None:
    """Encode lossless WavPack (the stem-writing path).

    `audio` is float in [-1, 1] (quantized like the PCM16 wav writer:
    round-half-away via np.round) or an integer array already at the
    target depth; shape [n] mono or [n, 2] stereo (plain L/R stereo —
    independent per-channel decorrelation, interleaved entropy walk).
    Every emitted block carries the stored CRC, so `read_wavpack(path)`
    (or libwavpack) re-verifies the encode bit-for-bit.
    """
    if bits not in (8, 16, 24):
        raise WavpackError("bits must be 8, 16, or 24")
    x = np.asarray(audio)
    if x.ndim == 2 and x.shape[1] == 1:
        x = x[:, 0]
    if x.ndim not in (1, 2) or (x.ndim == 2 and x.shape[1] != 2):
        raise WavpackError("audio must be [n] mono or [n, 2] stereo")
    stereo = x.ndim == 2
    if np.issubdtype(x.dtype, np.floating):
        full = float(1 << (bits - 1))
        q = np.round(np.clip(x, -1.0, 1.0) * (full - 1)).astype(np.int64)
    else:
        q = x.astype(np.int64)
        lim = 1 << (bits - 1)
        if q.size and (q.min() < -lim or q.max() >= lim):
            raise WavpackError(f"samples exceed {bits}-bit range")
    total = len(q)

    try:
        srate_idx = _SAMPLE_RATES.index(int(fs))
    except ValueError:
        srate_idx = 15

    # starting medians per block: representable values near a typical
    # residual scale for the depth (correctness does not depend on the
    # choice — both sides derive state from the stored bytes)
    seed = _median_seed(max(8, 1 << max(0, bits - 12)))

    out = bytearray()
    n_blocks = max(1, (total + block_samples - 1) // block_samples)
    for bi in range(n_blocks):
        seg = q[bi * block_samples : (bi + 1) * block_samples]
        n = len(seg)

        if stereo:
            left = [int(v) for v in seg[:, 0]]
            right = [int(v) for v in seg[:, 1]]
            # non-joint stereo CRC: crc*9 + 3*L + R per frame
            # (the decoder's exact recurrence, _get_words caller:675)
            crc = 0xFFFFFFFF
            for lv, rv in zip(left, right):
                crc = (crc * 9 + 3 * lv + rv) & 0xFFFFFFFF
            res_l, res_r = list(left), list(right)
            for term in reversed(_ENC_TERMS):
                res_l = _decorr_encode_pass(term, res_l)
                res_r = _decorr_encode_pass(term, res_r)
            res = [0] * (2 * n)
            res[0::2] = res_l
            res[1::2] = res_r
            samples = left + right  # for the MAG field below
        else:
            samples = [int(v) for v in seg]
            crc = 0xFFFFFFFF
            for v in samples:
                crc = (crc * 3 + v) & 0xFFFFFFFF
            res = list(samples)
            for term in reversed(_ENC_TERMS):
                res = _decorr_encode_pass(term, res)

        med = [_exp2s(seed) & 0xFFFFFFFF] * 3
        med_b = [_exp2s(seed) & 0xFFFFFFFF] * 3 if stereo else None
        bw = _BitWriter()
        _put_words(res, med, bw, med_b)
        stream = bw.done()
        if len(stream) & 1:
            stream += b"\x00"

        meta = bytearray()

        def put_meta(mid: int, payload: bytes) -> None:
            odd = len(payload) & 1
            if odd:
                payload = payload + b"\x00"
                mid |= _ID_ODD_SIZE
            words = len(payload) // 2
            if words > 255:
                meta.append(mid | _ID_LARGE)
                meta.append(words & 0xFF)
                meta.append((words >> 8) & 0xFF)
                meta.append((words >> 16) & 0xFF)
            else:
                meta.append(mid)
                meta.append(words)
            meta.extend(payload)

        # terms are stored in reverse application order
        term_bytes = bytes(
            ((t + 5) & 0x1F) | (_ENC_DELTA << 5) for t in reversed(_ENC_TERMS)
        )
        put_meta(_ID_DECORR_TERMS, term_bytes)
        put_meta(_ID_DECORR_WEIGHTS, b"")   # zero weights (both channels)
        put_meta(_ID_DECORR_SAMPLES, b"")   # zero history (both channels)
        n_seeds = 6 if stereo else 3
        put_meta(
            _ID_ENTROPY_VARS, struct.pack("<%dh" % n_seeds, *([seed] * n_seeds))
        )
        if srate_idx == 15:
            put_meta(_ID_SAMPLE_RATE, struct.pack("<I", int(fs))[:3])
        put_meta(_ID_WV_BITSTREAM, stream)

        mag = max((abs(v).bit_length() for v in samples), default=0)
        flags = (
            (bits // 8 - 1)
            | (0 if stereo else _MONO_FLAG)
            | _INITIAL_BLOCK
            | _FINAL_BLOCK
            | (mag << _MAG_LSB)
            | (srate_idx << _SRATE_LSB)
        )
        hdr = _HDR.pack(
            b"wvpk", 24 + len(meta), 0x407, 0, 0, total,
            bi * block_samples, n, flags, crc,
        )
        out.extend(hdr)
        out.extend(meta)

    with open(path, "wb") as f:
        f.write(out)
