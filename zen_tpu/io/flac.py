"""From-scratch FLAC codec (pure Python reference implementation).

The reference CLI accepts any format its vendored libnyquist decodes
(zen/offline.h:88-102 via nqr::NyquistIO); FLAC is the one lossless
format that actually shows up in stem-separation workflows, so zen-tpu
implements it from scratch rather than documenting it away:

* this module — a complete encoder (CONSTANT / VERBATIM / FIXED 0-4 /
  LPC subframes, Rice/Rice2 residuals with partitions and escape
  codes, all four stereo decorrelation modes, wasted-bits) and a
  matching pure-Python decoder.  The encoder is the product path for
  writing lossless stems; the decoder is the fallback when the native
  library is not built, and the oracle the C++ decoder
  (native/zenflac.cpp) is cross-checked against bit-exactly.
* native/zenflac.cpp — the fast decode path used by
  zen_tpu.io.audio.read_audio_mono.

Host-side file IO is not performance-critical for the TPU pipeline
(SURVEY.md §2.2), but a pure-Python Rice decoder is slow enough
(~seconds per track minute) that the native path matters for corpus
work.

Format notes (implemented strictly from the published spec):
frame sync 0b11111111111110, fixed blocking strategy, CRC-8 (poly
0x07) header / CRC-16 (poly 0x8005) frame integrity, UTF-8-coded
frame numbers, STREAMINFO MD5 of the raw little-endian sample bytes.
"""
from __future__ import annotations

import hashlib
import struct

import numpy as np


class FlacError(ValueError):
    """Malformed or unsupported FLAC stream."""


# ---------------------------------------------------------------- CRC

def _make_crc_table(poly: int, bits: int) -> list[int]:
    mask = (1 << bits) - 1
    top = 1 << (bits - 1)
    table = []
    for byte in range(256):
        crc = byte << (bits - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    # native fast path when built (the per-byte Python loop is the
    # encoder's hot spot at ~1 us/byte); identical table/poly
    try:
        from ..runtime import native

        crc = native.crc16(data)
        if crc is not None:
            return crc
    except Exception:
        pass
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[(crc >> 8) ^ b]
    return crc


# ------------------------------------------------------------- bit IO

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        acc = (self._acc << bits) | (value & ((1 << bits) - 1))
        n = self._n + bits
        while n >= 8:
            n -= 8
            self.buf.append((acc >> n) & 0xFF)
        self._acc = acc & ((1 << n) - 1)
        self._n = n

    def write_signed(self, value: int, bits: int) -> None:
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int) -> None:
        self.write(1, q + 1)  # q zero bits then a one

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)

    def getvalue(self) -> bytes:
        assert self._n == 0, "unaligned"
        return bytes(self.buf)

    # -- vectorized bulk writers (the per-sample Python loop costs
    # ~3 us/sample, which made --stem-format flac the corpus
    # bottleneck; these pack whole residual partitions with numpy) --

    def _flush_bitarray(self, bits: np.ndarray) -> None:
        """Append a uint8 0/1 array to the stream."""
        if self._n:
            head = np.array(
                [(self._acc >> (self._n - 1 - k)) & 1
                 for k in range(self._n)],
                np.uint8,
            )
            bits = np.concatenate([head, bits])
            self._acc = 0
            self._n = 0
        nbytes = len(bits) // 8
        if nbytes:
            self.buf += np.packbits(bits[: nbytes * 8]).tobytes()
        for b in bits[nbytes * 8 :]:
            self.write(int(b), 1)

    def write_rice_array(self, u: np.ndarray, p: int) -> None:
        """Rice fields for unsigned ``u``: (u>>p) zeros, a 1, then the
        low p bits MSB-first — bit-identical to the scalar
        write_unary+write loop (pinned by test)."""
        u = u.astype(np.int64)
        q = u >> p
        lens = q + 1 + p
        if int(lens.sum()) > (1 << 26):
            # pathological quotients (a badly mismatched p on huge
            # residuals) would allocate a giant bit array; take the
            # scalar path — correctness over speed in the corner
            for v in u:
                self.write_unary(int(v) >> p)
                self.write(int(v) & ((1 << p) - 1), p)
            return
        starts = np.cumsum(lens) - lens
        bits = np.zeros(int(lens.sum()), np.uint8)
        bits[starts + q] = 1
        for k in range(p):
            bits[starts + q + 1 + k] = (u >> (p - 1 - k)) & 1
        self._flush_bitarray(bits)

    def write_fixed_array(self, values: np.ndarray, bits: int) -> None:
        """Two's-complement fixed-width fields, MSB-first — the
        vectorized form of a write_signed loop."""
        if bits == 0:
            return
        u = values.astype(np.int64) & ((1 << bits) - 1)
        mat = (
            (u[:, None] >> np.arange(bits - 1, -1, -1)[None, :]) & 1
        ).astype(np.uint8)
        self._flush_bitarray(mat.reshape(-1))


class _BitReader:
    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.bit = byte_pos * 8
        self._end = len(data) * 8

    def byte_pos(self) -> int:
        assert self.bit % 8 == 0
        return self.bit // 8

    def read(self, bits: int) -> int:
        if self.bit + bits > self._end:
            raise FlacError("truncated stream")
        v = 0
        bit = self.bit
        data = self.data
        while bits > 0:
            byte = data[bit >> 3]
            avail = 8 - (bit & 7)
            take = avail if avail < bits else bits
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            bit += take
            bits -= take
        self.bit = bit
        return v

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v >> (bits - 1) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.bit >= self._end:
                raise FlacError("truncated stream")
            if self.read(1):
                return q
            q += 1

    def align(self) -> None:
        rem = self.bit & 7
        if rem:
            self.read(8 - rem)


# ----------------------------------------------------- UTF-8 numbers

def _utf8_encode_number(w: _BitWriter, n: int) -> None:
    """FLAC's UTF-8-style varint for frame/sample numbers."""
    if n < 0x80:
        w.write(n, 8)
        return
    for total in range(2, 8):
        # payload capacity: (7 - total) header payload bits unless
        # total == 7 (0 bits), plus 6 per continuation byte
        cap = (7 - total) + 6 * (total - 1) if total < 7 else 6 * 6
        if n < (1 << cap):
            if total < 7:
                lead = ((0xFF << (8 - total)) & 0xFF) | (
                    n >> (6 * (total - 1))
                )
            else:
                lead = 0xFE
            w.write(lead, 8)
            for k in range(total - 2, -1, -1):
                w.write(0x80 | ((n >> (6 * k)) & 0x3F), 8)
            return
    raise FlacError("number too large for UTF-8 coding")


def _utf8_decode_number(r: _BitReader) -> int:
    lead = r.read(8)
    if lead < 0x80:
        return lead
    if lead == 0xFE:
        total = 7
        n = 0
    else:
        total = 0
        mask = 0x80
        while lead & mask:
            total += 1
            mask >>= 1
        if total < 2 or total > 6:
            raise FlacError("invalid UTF-8 coded number")
        n = lead & (0x7F >> total)
    for _ in range(total - 1):
        b = r.read(8)
        if (b & 0xC0) != 0x80:
            raise FlacError("invalid UTF-8 continuation")
        n = (n << 6) | (b & 0x3F)
    return n


# ------------------------------------------------------ fixed/LPC math

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(samples: np.ndarray, order: int) -> np.ndarray:
    r = samples.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _best_rice(z: np.ndarray, pmax: int = 30) -> tuple[int, int]:
    """(best param, bits) for pre-zigzagged residuals.  cost(p) =
    sum(z >> p) + n*(1+p); zigzag is hoisted to the caller because the
    auto-mode order search evaluates many (order, p) pairs."""
    # p >= bit_length(max) zeroes the quotient term and the linear
    # term only grows after that — no need to scan further
    m = int(z.max(initial=0))
    pmax = min(pmax, m.bit_length() + 1)
    best_p, best_c = 0, None
    for p in range(pmax):
        c = int((z >> p).sum()) + len(z) * (1 + p)
        if best_c is None or c < best_c:
            best_p, best_c = p, c
    return best_p, best_c


def _zigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    return np.where(v >= 0, v << 1, (-v << 1) - 1).astype(np.int64)


def _zigzag_decode(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


_U64 = 1 << 64


def _wrap64(v: int) -> int:
    """Two's-complement int64 wraparound — corrupt frame payloads
    (caught only by the CRC *after* subframe decode) can blow the
    predictor recurrence past int64; unbounded Python ints would then
    raise OverflowError on assignment into the int64 output instead of
    reaching the CRC check.  Matches the native decoder's uint64
    arithmetic (modulo-2^64 is a ring homomorphism, so wrapping once
    at the end equals the C++ per-operation wrap)."""
    v &= _U64 - 1
    return v - _U64 if v >> 63 else v


# ------------------------------------------------------------ encoder

_BLOCKSIZE_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                    8192: 13, 16384: 14, 32768: 15}
_SAMPLE_SIZE_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}


def _quantize(audio: np.ndarray, bits: int) -> np.ndarray:
    """float [-1, 1] -> signed ints of `bits`; integer input passes
    through (must already fit)."""
    if np.issubdtype(audio.dtype, np.integer):
        s = audio.astype(np.int64)
        lim = 1 << (bits - 1)
        if s.min(initial=0) < -lim or s.max(initial=0) > lim - 1:
            raise FlacError(f"integer samples exceed {bits}-bit range")
        return s
    scale = float(1 << (bits - 1))
    # NaN encodes as silence (defined on both encoders — np.astype of
    # NaN is platform-defined, the C++ cast would be UB)
    x = np.nan_to_num(
        np.asarray(audio, np.float64), nan=0.0, posinf=1.0, neginf=-1.0
    )
    x = np.clip(x, -1.0, 1.0)
    return np.clip(
        np.round(x * scale), -scale, scale - 1
    ).astype(np.int64)


def _encode_rice_partitions(
    w: _BitWriter,
    resid: np.ndarray,
    blocksize: int,
    pred_order: int,
    partition_order: int,
    force_escape: bool,
) -> None:
    method_bits = 4  # RICE; RICE2 (5) emitted when a partition needs p > 14
    params: list[tuple[int, bool, int]] = []  # (param, escaped, rawbits)
    chunks: list[np.ndarray] = []
    zigzags: list[np.ndarray] = []
    # clamp per frame: the ragged final block rarely divides 2^order
    # (libFLAC does the same)
    while partition_order > 0 and (
        blocksize % (1 << partition_order)
        or (blocksize >> partition_order) <= pred_order
    ):
        partition_order -= 1
    nparts = 1 << partition_order
    start = 0
    for k in range(nparts):
        cnt = (blocksize >> partition_order) - (pred_order if k == 0 else 0)
        chunk = resid[start : start + cnt]
        start += cnt
        chunks.append(chunk)
        zigzags.append(_zigzag(chunk))
        if force_escape:
            rawbits = int(
                max(
                    (int(c).bit_length() + 1 for c in chunk),
                    default=1,
                )
            )
            # the escape raw-bit-count field is 5 bits (max 31); a
            # residual needing more cannot be escaped — fall through
            # to Rice for that partition (unbounded via the unary part)
            if rawbits <= 31:
                params.append((0, True, rawbits))
                continue
        best_p, _ = _best_rice(zigzags[-1])
        params.append((best_p, False, 0))
    if any(not esc and p > 14 for p, esc, _ in params):
        method_bits = 5
    escape_code = (1 << method_bits) - 1
    w.write(0 if method_bits == 4 else 1, 2)
    w.write(partition_order, 4)
    for (p, escaped, rawbits), chunk, z in zip(params, chunks, zigzags):
        if escaped:
            w.write(escape_code, method_bits)
            w.write(rawbits, 5)
            w.write_fixed_array(chunk, rawbits)
        else:
            w.write(p, method_bits)
            w.write_rice_array(z, p)


def _encode_subframe(
    w: _BitWriter,
    samples: np.ndarray,
    bps: int,
    force: str | None,
    partition_order: int,
    force_escape: bool,
) -> None:
    samples = samples.astype(np.int64)
    n = len(samples)

    # wasted bits: shared trailing zero bits (spec: encoded shifted
    # down, flag carries the shift)
    wasted = 0
    if force != "verbatim" and np.any(samples):
        ors = int(np.bitwise_or.reduce(samples))
        while wasted < bps - 1 and not (ors >> wasted) & 1:
            wasted += 1
        if wasted:
            samples = samples >> wasted
    eff = bps - wasted

    def header(type_code: int) -> None:
        w.write(0, 1)
        w.write(type_code, 6)
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)

    # a forced predictor order can exceed the ragged final block;
    # degrade to verbatim (always valid, still lossless)
    if force and (force.startswith("fixed") or force.startswith("lpc")):
        order = int(force[5:] if force.startswith("fixed") else force[3:])
        if n <= order:
            force = "verbatim"

    if force is None:
        if np.all(samples == samples[0]):
            force = "constant"
        else:
            costs = {}
            resid = samples
            for o in range(5):
                if n > o:
                    if o:
                        resid = np.diff(resid)
                    costs[o] = o * eff + _best_rice(
                        _zigzag(resid), pmax=15
                    )[1]
            o = min(costs, key=costs.get)
            force = f"fixed{o}" if costs[o] < n * eff else "verbatim"

    if force == "constant":
        if not np.all(samples == samples[0]):
            raise FlacError("constant subframe with varying samples")
        header(0b000000)
        w.write_signed(int(samples[0]), eff)
    elif force == "verbatim":
        header(0b000001)
        w.write_fixed_array(samples, eff)
    elif force.startswith("fixed"):
        order = int(force[5:])
        if n <= order:
            raise FlacError("block shorter than fixed order")
        header(0b001000 | order)
        for v in samples[:order]:
            w.write_signed(int(v), eff)
        _encode_rice_partitions(
            w, _fixed_residual(samples, order), n, order,
            partition_order, force_escape,
        )
    elif force.startswith("lpc"):
        order = int(force[3:])
        if order < 1 or order > 32 or n <= order:
            raise FlacError("bad LPC order")
        precision = 12
        shift = 9
        # Any valid quantized predictor is legal — the residual is
        # computed against it exactly, so even a crude LS fit
        # roundtrips losslessly.  Solve on the first samples.
        m = min(n, 512)
        if m > order:
            A = np.stack(
                [samples[order - 1 - j : m - 1 - j] for j in range(order)],
                axis=1,
            ).astype(np.float64)
            y = samples[order:m].astype(np.float64)
            try:
                coefs, *_ = np.linalg.lstsq(A, y, rcond=None)
            except np.linalg.LinAlgError:
                coefs = np.zeros(order)
        else:
            coefs = np.zeros(order)
        q = np.clip(
            np.round(coefs * (1 << shift)),
            -(1 << (precision - 1)),
            (1 << (precision - 1)) - 1,
        ).astype(np.int64)
        if not np.any(q):
            q[0] = 1 << shift  # degenerate fit: fall back to s[i-1]
        header(0b100000 | (order - 1))
        for v in samples[:order]:
            w.write_signed(int(v), eff)
        w.write(precision - 1, 4)
        w.write_signed(shift, 5)
        for c in q:
            w.write_signed(int(c), precision)
        pred = np.zeros(n - order, np.int64)
        for j in range(order):
            pred += q[j] * samples[order - 1 - j : n - 1 - j]
        resid = samples[order:] - (pred >> shift)
        _encode_rice_partitions(
            w, resid, n, order, partition_order, force_escape
        )
    else:
        raise FlacError(f"unknown subframe type {force!r}")


def write_flac(
    path: str,
    fs: int,
    audio: np.ndarray,
    bits: int = 16,
    block_size: int = 4096,
    stereo_mode: str = "auto",
    subframe: str | None = None,
    partition_order: int = 0,
    force_escape: bool = False,
) -> None:
    """Encode mono [n] or stereo [n, 2] audio to a FLAC file.

    Float input is quantized like the PCM16 wav path; integer input is
    taken verbatim (lossless).  ``subframe`` forces a subframe type
    ('constant'|'verbatim'|'fixed0'..'fixed4'|'lpc1'..'lpc32') — the
    default picks per block; ``stereo_mode`` in 'auto'|'independent'|
    'left_side'|'right_side'|'mid_side'.  ``partition_order`` /
    ``force_escape`` exist to exercise every residual coding path in
    the decoders.
    """
    s = _quantize(np.asarray(audio), bits)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] not in (1, 2):
        raise FlacError("audio must be [n] mono or [n, 2] stereo")
    n, channels = s.shape
    if bits not in (8, 12, 16, 20, 24):
        raise FlacError("bits must be one of 8/12/16/20/24")
    if not 16 <= block_size <= 65535:
        raise FlacError("block size out of range")
    if not 1 <= int(fs) < (1 << 20):
        raise FlacError("sample rate must fit STREAMINFO's 20 bits")
    if n == 0:
        raise FlacError("empty audio")

    md5 = hashlib.md5()
    bytes_per = (bits + 7) // 8
    inter = s.reshape(-1)  # interleaved
    raw = np.zeros((len(inter), bytes_per), np.uint8)
    u = inter.astype(np.int64) & ((1 << (8 * bytes_per)) - 1)
    for b in range(bytes_per):
        raw[:, b] = (u >> (8 * b)) & 0xFF
    md5.update(raw.tobytes())

    out = bytearray(b"fLaC")
    si = _BitWriter()
    # libFLAC convention: min == max == nominal block size (the spec
    # explicitly exempts a shorter final frame)
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(fs, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    body = si.getvalue() + md5.digest()
    out += bytes([0x80 | 0x00])  # last metadata block, STREAMINFO
    out += struct.pack(">I", len(body))[1:]
    out += body

    frame_idx = 0
    for start in range(0, n, block_size):
        blk = s[start : start + block_size]
        bs = len(blk)
        mode = stereo_mode
        if channels == 1:
            mode = "independent"
        elif mode == "auto":
            mode = "mid_side" if bs > 1 else "independent"
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking strategy
        bs_code = _BLOCKSIZE_CODES.get(bs)
        if bs_code is None:
            bs_code = 6 if bs <= 256 else 7
        w.write(bs_code, 4)
        w.write(0, 4)  # sample rate from STREAMINFO
        ch_code = {
            "independent": channels - 1,
            "left_side": 0b1000,
            "right_side": 0b1001,
            "mid_side": 0b1010,
        }[mode]
        if mode != "independent" and channels != 2:
            raise FlacError("stereo decorrelation needs 2 channels")
        w.write(ch_code, 4)
        w.write(_SAMPLE_SIZE_CODES.get(bits, 0), 3)
        w.write(0, 1)
        _utf8_encode_number(w, frame_idx)
        if bs_code == 6:
            w.write(bs - 1, 8)
        elif bs_code == 7:
            w.write(bs - 1, 16)
        w.align()
        hdr = w.getvalue()
        w.write(_crc8(hdr), 8)

        if mode == "independent":
            subs = [(blk[:, c], bits) for c in range(channels)]
        else:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            side = left - right
            if mode == "left_side":
                subs = [(left, bits), (side, bits + 1)]
            elif mode == "right_side":
                subs = [(side, bits + 1), (right, bits)]
            else:
                subs = [((left + right) >> 1, bits), (side, bits + 1)]
        for ch_samples, ch_bps in subs:
            _encode_subframe(
                w, ch_samples, ch_bps, subframe, partition_order,
                force_escape,
            )
        w.align()
        frame = w.getvalue()
        out += frame + struct.pack(">H", _crc16(frame))
        frame_idx += 1

    with open(path, "wb") as f:
        f.write(bytes(out))


# ------------------------------------------------------------ decoder

def _decode_subframe(
    r: _BitReader, bs: int, bps: int
) -> np.ndarray:
    if r.read(1):
        raise FlacError("subframe padding bit set")
    type_code = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise FlacError("wasted bits exceed sample size")

    if type_code == 0b000000:
        out = np.full(bs, r.read_signed(eff), np.int64)
    elif type_code == 0b000001:
        out = np.fromiter(
            (r.read_signed(eff) for _ in range(bs)), np.int64, bs
        )
    elif 0b001000 <= type_code <= 0b001100:
        order = type_code & 0x07
        if bs <= order:
            raise FlacError("block shorter than fixed order")
        warm = [r.read_signed(eff) for _ in range(order)]
        resid = _decode_rice_partitions(r, bs, order)
        out = np.empty(bs, np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, bs):
            acc = int(resid[i - order])
            for j, c in enumerate(coefs):
                acc += c * int(out[i - 1 - j])
            out[i] = _wrap64(acc)
    elif type_code >= 0b100000:
        order = (type_code & 0x1F) + 1
        if bs <= order:
            raise FlacError("block shorter than LPC order")
        warm = [r.read_signed(eff) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise FlacError("invalid LPC precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coefs = [r.read_signed(precision) for _ in range(order)]
        resid = _decode_rice_partitions(r, bs, order)
        out = np.empty(bs, np.int64)
        out[:order] = warm
        for i in range(order, bs):
            acc = 0
            for j in range(order):
                acc += coefs[j] * int(out[i - 1 - j])
            out[i] = _wrap64(int(resid[i - order]) + (_wrap64(acc) >> shift))
    else:
        raise FlacError(f"reserved subframe type {type_code:#08b}")
    return out << wasted


def _decode_rice_partitions(
    r: _BitReader, bs: int, pred_order: int
) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise FlacError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if bs % nparts or (bs >> porder) <= pred_order:
        raise FlacError("invalid partition order")
    out = np.empty(bs - pred_order, np.int64)
    pos = 0
    for k in range(nparts):
        cnt = (bs >> porder) - (pred_order if k == 0 else 0)
        p = r.read(pbits)
        if p == escape:
            rawbits = r.read(5)
            if rawbits == 0:
                out[pos : pos + cnt] = 0
            else:
                for i in range(cnt):
                    out[pos + i] = r.read_signed(rawbits)
        else:
            for i in range(cnt):
                q = r.read_unary()
                low = r.read(p)
                out[pos + i] = _zigzag_decode((q << p) | low)
        pos += cnt
    return out


_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def read_flac(path: str):
    """Decode a FLAC file.  Returns (fs, samples[n, channels] int32,
    bits_per_sample).  Verifies frame CRC-8/CRC-16 and the STREAMINFO
    MD5 when present."""
    with open(path, "rb") as f:
        data = f.read()
    return decode_flac_bytes(data)


def skip_id3(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 when absent) — files
    tagged by common tools carry one before the fLaC magic and libFLAC
    skips it, so we do too.  Size is synchsafe (7 bits/byte), +10
    header bytes, +10 more when the footer flag (bit 4) is set."""
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    if any(b & 0x80 for b in data[6:10]):
        raise FlacError("corrupt ID3 synchsafe size")
    size = (
        (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    ) + 10
    if data[5] & 0x10:
        size += 10  # footer present
    return size


def decode_flac_bytes(data: bytes):
    data = data[skip_id3(data) :]
    if data[:4] != b"fLaC":
        raise FlacError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(data):
            raise FlacError("truncated metadata")
        hdr = data[pos]
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if len(body) != length:
            raise FlacError("truncated metadata block")
        if (hdr & 0x7F) == 0:
            if length != 34:
                raise FlacError("bad STREAMINFO length")
            streaminfo = body
        pos += 4 + length
        if hdr & 0x80:
            break
    if streaminfo is None:
        raise FlacError("missing STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)  # min block size
    si.read(16)  # max block size
    si.read(24)
    si.read(24)
    fs = si.read(20)
    channels = si.read(3) + 1
    bits = si.read(5) + 1
    total = si.read(36)
    md5_expect = streaminfo[18:34]
    if fs == 0:
        raise FlacError("invalid sample rate")
    if channels > 2:
        raise FlacError("only mono/stereo supported")

    frames: list[np.ndarray] = []
    got = 0
    while pos < len(data) and (total == 0 or got < total):
        r = _BitReader(data, pos)
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise FlacError("lost frame sync")
        if r.read(1):
            raise FlacError("reserved frame bit set")
        r.read(1)  # blocking strategy (number is parsed either way)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        size_code = r.read(3)
        if r.read(1):
            raise FlacError("reserved frame bit set")
        _utf8_decode_number(r)
        if bs_code == 0:
            raise FlacError("reserved block size code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 0:
            pass  # from STREAMINFO
        elif sr_code in _RATE_CODES:
            pass
        elif sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        else:
            raise FlacError("invalid sample rate code")
        if size_code == 3:
            raise FlacError("reserved sample size code")
        frame_bits = _SIZE_CODES.get(size_code, bits)
        hdr_end = r.byte_pos() if r.bit % 8 == 0 else None
        if hdr_end is None:
            raise FlacError("unaligned frame header")
        if _crc8(data[pos:hdr_end]) != r.read(8):
            raise FlacError("frame header CRC-8 mismatch")

        if ch_code < 8:
            n_ch = ch_code + 1
            if n_ch != channels:
                raise FlacError("frame/STREAMINFO channel mismatch")
            chans = [
                _decode_subframe(r, bs, frame_bits) for _ in range(n_ch)
            ]
        elif ch_code in (0b1000, 0b1001, 0b1010):
            if channels != 2:
                raise FlacError("stereo decorrelation in non-stereo stream")
            if ch_code == 0b1000:
                left = _decode_subframe(r, bs, frame_bits)
                side = _decode_subframe(r, bs, frame_bits + 1)
                chans = [left, left - side]
            elif ch_code == 0b1001:
                side = _decode_subframe(r, bs, frame_bits + 1)
                right = _decode_subframe(r, bs, frame_bits)
                chans = [side + right, right]
            else:
                mid = _decode_subframe(r, bs, frame_bits)
                side = _decode_subframe(r, bs, frame_bits + 1)
                m2 = (mid << 1) | (side & 1)
                chans = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise FlacError("reserved channel assignment")
        r.align()
        crc_pos = r.byte_pos()
        if _crc16(data[pos:crc_pos]) != r.read(16):
            raise FlacError("frame CRC-16 mismatch")
        pos = crc_pos + 2
        frames.append(np.stack(chans, axis=1))
        got += bs

    if total and got < total:
        raise FlacError("stream ends before total_samples")
    out = (
        np.concatenate(frames, axis=0)
        if frames
        else np.zeros((0, channels), np.int64)
    )
    if total:
        out = out[:total]
    lim = 1 << (bits - 1)
    if len(out) and (out.min() < -lim or out.max() > lim - 1):
        raise FlacError("decoded sample exceeds bit depth")

    if md5_expect != b"\x00" * 16:
        bytes_per = (bits + 7) // 8
        inter = out.reshape(-1).astype(np.int64)
        raw = np.zeros((len(inter), bytes_per), np.uint8)
        u = inter & ((1 << (8 * bytes_per)) - 1)
        for b in range(bytes_per):
            raw[:, b] = (u >> (8 * b)) & 0xFF
        if hashlib.md5(raw.tobytes()).digest() != md5_expect:
            raise FlacError("MD5 mismatch: decoded audio corrupt")
    return fs, out.astype(np.int32), bits


def read_flac_mono(path: str):
    """Decode to float32 mono in [-1, 1]; stereo averaged like the wav
    path (nqr::StereoToMono analog, zen/offline.h:106-113)."""
    fs, samples, bits = read_flac(path)
    x = samples.astype(np.float32) / np.float32(1 << (bits - 1))
    if x.shape[1] > 1:
        x = x.mean(axis=1)
    else:
        x = x[:, 0]
    return fs, np.ascontiguousarray(x, np.float32)
