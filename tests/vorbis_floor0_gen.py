"""Synthesize minimal Ogg Vorbis streams that use floor TYPE 0 (the
legacy LSP floor).

No mainstream encoder has emitted floor0 since ~2002, so there is no
corpus file to test against; like the MP3 LSF fuzz (tests/mp3_lsf_gen.py
precedent), the streams are constructed bit-by-bit from the Vorbis I
spec here and validated by DIFFERENTIAL decode: the test-time-compiled
libvorbis oracle and native/zenvorbis.cpp must produce float-identical
PCM for every generated stream.

Stream shape: mono, 8 kHz, blocksizes 256/2048 with a single all-short
mode; 3 codebooks (residue classbook, residue VQ book, floor0 LSP
book); residue type 0 with two classes (silent + coded); floor0 with
order 3 over a 64-bin Bark map (odd order exercises the asymmetric
LSP branch; the book spacing keeps every curve finite).  All knobs (amplitude, LSP codewords,
residue classes/values) are driven per-packet from a seeded RNG.
"""
from __future__ import annotations

import struct

import numpy as np


class BitWriter:
    """LSB-first bit packer (Vorbis packet convention)."""

    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        self.acc |= (value & ((1 << bits) - 1)) << self.n
        self.n += bits
        while self.n >= 8:
            self.bytes.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_codeword(self, value: int, bits: int) -> None:
        """Huffman codewords enter the stream MSB-first."""
        for i in range(bits - 1, -1, -1):
            self.write((value >> i) & 1, 1)

    def done(self) -> bytes:
        if self.n:
            self.bytes.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.bytes)


def float32_pack_exact(x: float) -> int:
    """Inverse of the Vorbis packed-float decode (21-bit mantissa,
    biased 10-bit exponent, sign)."""
    # value = mant * 2^(exp_field - 788), mant in [2^20, 2^21)
    if x == 0:
        return 0
    sign = 0x80000000 if x < 0 else 0
    m = abs(x)
    e = 0
    while m < (1 << 20):
        m *= 2
        e -= 1
    while m >= (1 << 21):
        m /= 2
        e += 1
    mant = int(round(m))
    if mant == (1 << 21):
        mant >>= 1
        e += 1
    exp_field = e + 788
    assert 0 <= exp_field < 1024
    return sign | (exp_field << 21) | mant


_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if _r & 0x80000000 else (_r << 1) & 0xFFFFFFFF
    _CRC_TABLE.append(_r)


def _crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) ^ b) & 0xFF]
    return crc


def ogg_page(packets, serial, seqno, granule, bos=False, eos=False, cont=False) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for p in packets:
        assert len(p) < 255, "generator keeps packets under one lacing segment"
        lacing.append(len(p))
        body.extend(p)
    htype = (1 if cont else 0) | (2 if bos else 0) | (4 if eos else 0)
    hdr = bytearray(b"OggS")
    hdr.append(0)
    hdr.append(htype)
    hdr += struct.pack("<q", granule)
    hdr += struct.pack("<I", serial)
    hdr += struct.pack("<I", seqno)
    hdr += b"\x00\x00\x00\x00"  # crc placeholder
    hdr.append(len(lacing))
    hdr += lacing
    page = bytes(hdr) + bytes(body)
    crc = _crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


# ---- stream parameters ------------------------------------------------------
_RATE = 8000
_BS0_LOG, _BS1_LOG = 8, 11  # 256 / 2048; only the short mode is used
_N2 = 256 // 2
_ORDER = 3
_BARKMAP = 64
_AMPBITS = 6
_AMPDB = 20
_RES_END = 128
_PART_SIZE = 8
_NPARTS = _RES_END // _PART_SIZE


def _vorbis_header(w: BitWriter, packet_type: int) -> None:
    w.write(packet_type, 8)
    for ch in b"vorbis":
        w.write(ch, 8)


def _codebook(w: BitWriter, dim, entries, length, lookup=None) -> None:
    """Uniform-length codebook; lookup = (min, delta, bits, values)."""
    w.write(0x564342, 24)
    w.write(dim, 16)
    w.write(entries, 24)
    w.write(0, 1)  # unordered
    w.write(0, 1)  # not sparse
    for _ in range(entries):
        w.write(length - 1, 5)
    if lookup is None:
        w.write(0, 4)
    else:
        mn, delta, bits, values = lookup
        w.write(1, 4)
        w.write(float32_pack_exact(mn), 32)
        w.write(float32_pack_exact(delta), 32)
        w.write(bits - 1, 4)
        w.write(0, 1)  # sequence_p
        for v in values:
            w.write(v, bits)


def make_headers() -> list:
    ident = BitWriter()
    _vorbis_header(ident, 1)
    ident.write(0, 32)  # version
    ident.write(1, 8)  # channels
    ident.write(_RATE, 32)
    ident.write(0, 32)
    ident.write(0, 32)
    ident.write(0, 32)
    ident.write(_BS0_LOG, 4)
    ident.write(_BS1_LOG, 4)
    ident.write(1, 1)  # framing

    comment = BitWriter()
    _vorbis_header(comment, 3)
    comment.write(0, 32)  # vendor length
    comment.write(0, 32)  # no comments
    comment.write(1, 1)

    setup = BitWriter()
    _vorbis_header(setup, 5)
    setup.write(3 - 1, 8)  # codebook count
    # book 0: residue classbook (dim 1, 2 entries, scalar)
    _codebook(setup, 1, 2, 1)
    # book 1: residue VQ (dim 2, 4 entries of 2 bits; coords ±0.5)
    _codebook(setup, 2, 4, 2, lookup=(-0.5, 1.0, 1, [0, 1]))
    # book 2: floor0 LSP (dim 1 so the cumulative "last" offset makes
    # every LSP vector strictly increasing; coords 0.6..1.2 keep all
    # resonances away from the w=±2 band edges, so with amplitudes
    # capped at 28/63 the curve is provably finite — see the bound
    # sweep in the generator history; order 3 exercises the odd-order
    # filter branch)
    _codebook(setup, 1, 16, 4, lookup=(0.6, 0.04, 4, list(range(16))))
    # times
    setup.write(0, 6)
    setup.write(0, 16)
    # floors: one, type 0
    setup.write(0, 6)
    setup.write(0, 16)  # floor type 0
    setup.write(_ORDER, 8)
    setup.write(_RATE, 16)
    setup.write(_BARKMAP, 16)
    setup.write(_AMPBITS, 6)
    setup.write(_AMPDB, 8)
    setup.write(0, 4)  # numbooks - 1
    setup.write(2, 8)  # LSP book id
    # residues: one, type 0
    setup.write(0, 6)
    setup.write(0, 16)  # residue type 0
    setup.write(0, 24)  # begin
    setup.write(_RES_END, 24)  # end
    setup.write(_PART_SIZE - 1, 24)
    setup.write(2 - 1, 6)  # classifications
    setup.write(0, 8)  # classbook
    # class cascades: class 0 silent, class 1 pass-0 coded
    setup.write(0, 3)
    setup.write(0, 1)
    setup.write(1, 3)
    setup.write(0, 1)
    setup.write(1, 8)  # class 1 / pass 0 book id
    # mappings: one, type 0, single submap, no coupling
    setup.write(0, 6)
    setup.write(0, 16)
    setup.write(0, 1)  # submaps flag
    setup.write(0, 1)  # coupling flag
    setup.write(0, 2)  # reserved
    setup.write(0, 8)  # time
    setup.write(0, 8)  # floor
    setup.write(0, 8)  # residue
    # modes: one, all-short
    setup.write(0, 6)
    setup.write(0, 1)  # blockflag
    setup.write(0, 16)
    setup.write(0, 16)
    setup.write(0, 8)
    setup.write(1, 1)  # framing
    return [ident.done(), comment.done(), setup.done()]


def make_audio_packet(rng: np.random.Generator, silent_floor=False) -> bytes:
    w = BitWriter()
    w.write(0, 1)  # audio packet
    # 1 mode -> zero mode bits; blockflag 0 -> no window flags
    if silent_floor:
        w.write(0, _AMPBITS)  # amplitude 0: channel unused this frame
        return w.done()
    # amp <= 0.95 dB: curve gains stay O(1) so the synthesized stream
    # has a natural signal level (and is trivially overflow-free)
    w.write(int(rng.integers(1, 4)), _AMPBITS)
    w.write(0, 1)  # book number (ilog(1) = 1 bit)
    for _ in range(_ORDER):
        w.write_codeword(int(rng.integers(0, 16)), 4)
    # residue type 0: per partition, classword then 4 VQ entries if coded
    classes = rng.integers(0, 2, _NPARTS)
    for cls in classes:
        w.write_codeword(int(cls), 1)
        if cls == 1:
            for _ in range(_PART_SIZE // 2):
                w.write_codeword(int(rng.integers(0, 4)), 2)
    return w.done()


def make_stream(n_packets: int = 25, seed: int = 0, silent_every: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    ident, comment, setup = make_headers()
    serial = 0x0F00BAA
    pages = [ogg_page([ident], serial, 0, 0, bos=True)]
    pages.append(ogg_page([comment, setup], serial, 1, 0))
    pkts = []
    for i in range(n_packets):
        silent = silent_every and (i % silent_every == silent_every - 1)
        pkts.append(make_audio_packet(rng, silent_floor=bool(silent)))
    total = _N2 * (n_packets - 1)
    pages.append(ogg_page(pkts, serial, 2, total, eos=True))
    return b"".join(pages)
