"""Synthesized MPEG-2/2.5 Layer III (LSF) frame generator.

Covers the round-3 verdict #3 gap: the corpus has only an MPEG-1 file,
so zenmp3's LSF side-info / scalefactor / intensity-stereo paths had
no coverage. No encoder is needed — frames here are *structurally
valid* (correct header, spec-valid side info, in-budget
part2_3_lengths) with randomized scalefactor and Huffman payload
bytes; what the spec makes of random payload is well-defined, and the
from-scratch decoder must agree with the public minimp3 oracle
(/root/reference/vendor/libnyquist/third_party/minimp3/minimp3.h,
L3_read_side_info:470-603 for the LSF side-info layout mirrored here).

Determinism constraints (why the generator is careful, not free-random):

- minimp3's Huffman stage reads its bit cache *past* the granule limit
  and resolves the overrun only afterwards (minimp3.h:806-831); inside
  the assembled reservoir+frame buffer both decoders see the same
  bytes, but past the buffer's end minimp3 reads uninitialized scratch
  while zenmp3's bit reader returns zeros.  The generator therefore
  keeps the total part2_3 budget >= 512 bits short of the assembled
  buffer so neither decoder's reads can straddle the end while any
  output-affecting position is still inside its granule.
- big_values is capped so its worst-case bit consumption (<64 bits per
  pair: longest code + 2x13 linbits + 2 signs) plus worst-case LSF
  scalefactor bits (~<=512) fits inside part2_3_length: the big-values
  stage has *no* limit check in either decoder.
- main_data_begin is only drawn from ranges where the two decoders
  agree on reservoir availability: minimp3 keeps only the *unconsumed*
  tail of main data while zenmp3 keeps the last 511 raw bytes (real
  encoders never reference consumed bytes, so the models agree on real
  streams).  The generator simulates minimp3's remains and declares
  either mdb <= remains (both decode) or mdb > 511-capped raw history
  (both skip).
- block types follow the spec's legal window sequence per channel
  (normal->{normal,start}, start->short, short->{short,stop},
  stop->{normal,start}).  At *illegal* transitions (short->normal
  etc., which no encoder emits) the carried IMDCT overlap tail's
  windowing is spec-undefined: minimp3's factored twid/window overlap
  representation applies the NEXT granule's window to the saved tail,
  while zenmp3 stores the fully-windowed tail — identical for every
  legal sequence (corpus parity at 132 dB), divergent by O(1) on
  illegal ones (established empirically in round 4; the first
  divergent frame of every unconstrained fuzz stream followed an
  illegal transition, and all legal-transition frames matched to
  float).
"""
from __future__ import annotations

import numpy as np

FS_MPEG2 = [22050, 24000, 16000]   # version bits 10, fs_index 0..2
FS_MPEG25 = [11025, 12000, 8000]   # version bits 00
BR2 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]

# worst-case LSF scalefactor part2 bits (4 slen fields x counts; the
# intensity variant reads the most) plus margin — see module docstring
_SCF_MARGIN_BITS = 512
_WORST_PAIR_BITS = 64
_END_SLACK_BITS = 512


class BitWriter:
    def __init__(self):
        self._bits: list[int] = []

    def put(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self._bits.append((int(v) >> i) & 1)

    def nbits(self) -> int:
        return len(self._bits)

    def to_bytes(self) -> bytes:
        bits = self._bits + [0] * (-len(self._bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        return bytes(out)


def frame_size(version25: bool, fs_idx: int, bitrate_idx: int,
               padding: int) -> int:
    fs = (FS_MPEG25 if version25 else FS_MPEG2)[fs_idx]
    return 576 * BR2[bitrate_idx] * 125 // fs + padding


def make_header(version25: bool, fs_idx: int, bitrate_idx: int,
                padding: int, mode: int, mode_ext: int) -> bytes:
    version_bits = 0b00 if version25 else 0b10
    b1 = 0xE0 | (version_bits << 3) | (0b01 << 1) | 1  # layer III, no CRC
    b2 = (bitrate_idx << 4) | (fs_idx << 2) | (padding << 1)
    b3 = (mode << 6) | (mode_ext << 4)
    return bytes([0xFF, b1, b2, b3])


# legal window-sequence successors, keyed by the previous granule's
# effective block kind: 0 = long/normal, 1 = start, 2 = short, 3 = stop
_LEGAL_NEXT = {0: (0, 1), 1: (2,), 2: (2, 3), 3: (0, 1)}


def _side_info(rng, nch: int, md_len: int, mdb: int, intensity: bool,
               block_state=None):
    """Write spec-valid LSF side info; returns (bytes, p23_sum_bits).

    ``block_state``: per-channel previous block kind list, mutated in
    place so window sequences stay legal across frames."""
    if block_state is None:
        block_state = [0] * nch
    w = BitWriter()
    w.put(mdb, 8)
    w.put(int(rng.integers(0, 1 << nch)), nch)  # private bits
    budget = max(0, (md_len + mdb) * 8 - _END_SLACK_BITS)
    used = 0
    for ch in range(nch):
        p23_max = min(4095, budget - used)
        if p23_max >= _SCF_MARGIN_BITS + _WORST_PAIR_BITS:
            p23 = int(rng.integers(_SCF_MARGIN_BITS, p23_max + 1))
            big_max = min(288, (p23 - _SCF_MARGIN_BITS) // _WORST_PAIR_BITS)
        else:
            p23 = max(0, p23_max)
            big_max = 0
        big_values = int(rng.integers(0, big_max + 1)) if big_max else 0
        used += p23
        w.put(p23, 12)
        w.put(big_values, 9)
        w.put(int(rng.integers(0, 256)), 8)           # global_gain
        w.put(int(rng.integers(0, 512)), 9)           # scalefac_compress
        nxt = _LEGAL_NEXT[block_state[ch]]
        kind = int(nxt[rng.integers(0, len(nxt))])
        block_state[ch] = kind
        window_switching = 0 if kind == 0 else 1
        w.put(window_switching, 1)
        if window_switching:
            w.put(kind, 2)                            # block_type != 0
            w.put(int(rng.integers(0, 2)), 1)         # mixed_block_flag
            for _t in range(2):
                w.put(int(rng.integers(0, 32)), 5)    # table_select
            for _s in range(3):
                w.put(int(rng.integers(0, 8)), 3)     # subblock_gain
        else:
            for _t in range(3):
                w.put(int(rng.integers(0, 32)), 5)
            w.put(int(rng.integers(0, 16)), 4)        # region0
            w.put(int(rng.integers(0, 8)), 3)         # region1
        w.put(int(rng.integers(0, 2)), 1)             # scalefac_scale
        w.put(int(rng.integers(0, 2)), 1)             # count1_table
    side = w.to_bytes()
    want = 9 if nch == 1 else 17
    assert len(side) <= want, (len(side), want)
    return side + bytes(want - len(side)), used


def make_lsf_stream(seed: int, n_frames: int = 12, version25: bool = False,
                    fs_idx: int = 0, bitrate_idx: int = 12, mode: int = 3,
                    use_reservoir: bool = True) -> bytes:
    """A structurally valid LSF stream of n_frames frames.

    mode: 3 = mono, 0 = stereo, 1 = joint stereo (mode_ext randomized
    per frame: intensity / MS / both — header byte 3 is not part of
    minimp3's hdr_compare mask, so per-frame variation is legal).
    """
    rng = np.random.default_rng(seed)
    nch = 1 if mode == 3 else 2
    out = bytearray()
    oracle_remains = 0   # minimp3 model: unconsumed-tail reservoir
    raw_history = 0      # zenmp3 model: last-511-raw-bytes reservoir
    block_state = [0] * nch  # per-channel legal window sequence
    for fi in range(n_frames):
        padding = int(rng.integers(0, 2))
        fb = frame_size(version25, fs_idx, bitrate_idx, padding)
        mode_ext = int(rng.integers(0, 4)) if mode == 1 else 0
        hdr = make_header(version25, fs_idx, bitrate_idx, padding,
                          mode, mode_ext)
        side_len = 9 if nch == 1 else 17
        md_len = fb - 4 - side_len
        assert md_len > 0, "bitrate too low for this generator"
        # main_data_begin: agree-on-availability ranges only (see
        # module docstring); frame 0 must be 0
        mdb = 0
        if use_reservoir and fi > 0:
            r = rng.random()
            if r < 0.4 and oracle_remains > 0:
                mdb = int(rng.integers(1, min(oracle_remains, 255) + 1))
            elif r < 0.5 and raw_history < 255:
                mdb = int(rng.integers(raw_history + 1, 256))  # both skip
        decoded = mdb <= oracle_remains
        side, p23_sum = _side_info(
            rng, nch, md_len, mdb, intensity=(mode == 1),
            # a skipped frame's block types never reach the IMDCT, so
            # the legal-sequence state must not advance through them
            block_state=block_state if decoded else list(block_state),
        )
        md = rng.integers(0, 256, md_len, dtype=np.uint8).tobytes()
        # never let random payload look like a Xing/Info/VBRI tag frame
        if md[:4] in (b"Xing", b"Info", b"VBRI"):
            md = b"\x00" + md[1:]
        frame = hdr + side + md
        assert len(frame) == fb, (len(frame), fb)
        out += frame
        # advance both reservoir models
        if mdb <= oracle_remains:  # frame decoded by both
            assembled = mdb + md_len
            consumed = (p23_sum + 7) // 8
            oracle_remains = min(511, max(0, assembled - consumed))
        else:                      # frame skipped by both: data banked
            oracle_remains = min(511, oracle_remains + md_len)
        raw_history = min(511, raw_history + md_len)
    return bytes(out)


def stream_configs():
    """The LSF coverage grid: (name, kwargs) pairs."""
    cfgs = []
    for v25, vname in ((False, "m2"), (True, "m25")):
        for fs_idx in range(3):
            cfgs.append((f"{vname}_fs{fs_idx}_mono",
                         dict(version25=v25, fs_idx=fs_idx, mode=3)))
        cfgs.append((f"{vname}_stereo", dict(version25=v25, mode=0)))
        cfgs.append((f"{vname}_joint", dict(version25=v25, mode=1)))
        cfgs.append((f"{vname}_joint_hr",
                     dict(version25=v25, fs_idx=1, mode=1,
                          bitrate_idx=14)))
    return cfgs
