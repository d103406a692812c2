#!/usr/bin/env python3
"""Generate native/zenmp3_tables.h — the ISO/IEC 11172-3 Layer III
standard data tables (Huffman codebooks, scalefactor band widths,
scalefactor partition sizes, synthesis window D).

These are *standardized data*, not code: every conforming decoder
ships byte-identical copies.  This generator recovers them in
canonical form from the public decoder sources the reference vendors
(minimp3's flattened Huffman lookup arrays are interpreted back into
(codeword, length, x, y) lists; musepack's plain Di_opt float table
yields the D window), so the repo never needs the ISO document and
the provenance is mechanically reproducible:

    python scripts/gen_mp3_tables.py > native/zenmp3_tables.h

The generated header is committed because the reference mount is not
guaranteed present at build time.
"""
import re
import sys

MINIMP3 = "/root/reference/vendor/libnyquist/third_party/minimp3/minimp3.h"
MUSEPACK_SYNTH = (
    "/root/reference/vendor/libnyquist/third_party/musepack/libmpcdec/"
    "synth_filter.c"
)


def _parse_int_array(text, name, after=None):
    """Extract a flat list of ints from `static ... name[...] = { ... };`"""
    start = text.index(name, text.index(after) if after else 0)
    open_b = text.index("{", start)
    depth = 0
    i = open_b
    while True:
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                break
        i += 1
    body = text[open_b : i + 1]
    return [int(m) for m in re.findall(r"-?\d+", body)]


def _parse_int_rows(text, name, row_len):
    """Extract a [N][row_len] array respecting INNER braces: C permits
    each braced row to list fewer than row_len entries (the rest are
    zero-initialized).  minimp3's g_scf_mixed rows are ragged (37-40
    entries), so flattening + re-slicing at row_len shifts every row
    after the first — the round-4 mixed-block parity bug."""
    start = text.index(name)
    open_b = text.index("{", start)
    depth = 0
    i = open_b
    rows = []
    cur_start = None
    while True:
        c = text[i]
        if c == "{":
            depth += 1
            if depth == 2:
                cur_start = i
        elif c == "}":
            if depth == 2:
                vals = [int(m) for m in
                        re.findall(r"-?\d+", text[cur_start : i + 1])]
                assert len(vals) <= row_len, (name, len(vals))
                rows.append(vals + [0] * (row_len - len(vals)))
            depth -= 1
            if depth == 0:
                break
        i += 1
    return rows


def extract_huffman(tabs, tabindex, linbits):
    """Interpret minimp3's multi-level flattened lookups into canonical
    per-table codeword lists [(code, length, x, y)]."""

    def walk(tbase, off, w, prefix, prefix_len, out, seen):
        # `off` is relative to the table's own base (the flattened
        # sub-table links are table-relative offsets)
        for idx in range(1 << w):
            leaf = tabs[tbase + off + idx]
            if leaf < 0:
                nw = leaf & 7
                noff = -(leaf >> 3)
                walk(tbase, noff, nw, (prefix << w) | idx, prefix_len + w,
                     out, seen)
            else:
                ln = leaf >> 8
                assert 0 < ln <= w, (tbase, off, idx, leaf)
                code_top = idx >> (w - ln)
                code = (prefix << ln) | code_top
                total = prefix_len + ln
                key = (code, total)
                if key in seen:
                    continue
                seen.add(key)
                x = leaf & 15
                y = (leaf >> 4) & 15
                out.append((code, total, x, y))

    tables = {}
    for t in range(32):
        base = tabindex[t]
        if t == 0 or base == 0:
            # table 0 codes nothing (all-zero region); 4 and 14 do
            # not exist in the standard
            tables[t] = []
            continue
        out = []
        walk(base, 0, 5, 0, 0, out, set())
        out.sort(key=lambda e: (e[1], e[0]))
        tables[t] = out
    return tables


def extract_count1(tab):
    """count1 lookup (4-bit root + optional second level) to canonical
    [(code, length, v-bitmap)]."""
    out = []
    seen = set()
    for idx in range(16):
        leaf = tab[idx]
        if leaf & 8:
            ln = leaf & 7
            code = idx >> (4 - ln)
            key = (code, ln)
            if key in seen:
                continue
            seen.add(key)
            out.append((code, ln, leaf >> 4))
        else:
            base = leaf >> 3
            extra = leaf & 3
            for e in range(1 << extra):
                leaf2 = tab[base + e]
                ln = leaf2 & 7
                full = (idx << extra) | e
                code = full >> (4 + extra - ln)
                key = (code, ln)
                if key in seen:
                    continue
                seen.add(key)
                out.append((code, ln, leaf2 >> 4))
    out.sort(key=lambda e: (e[1], e[0]))
    return out


def main():
    mm = open(MINIMP3).read()
    tabs = _parse_int_array(mm, "tabs[]")
    tab32 = _parse_int_array(mm, "tab32[]")
    tab33 = _parse_int_array(mm, "tab33[]")
    tabindex = _parse_int_array(mm, "tabindex[2*16]")[:16] + _parse_int_array(
        mm, "tabindex[2*16]"
    )[16:]
    tabindex = _parse_int_array(mm, "tabindex[2*16]")
    linbits = _parse_int_array(mm, "g_linbits[]")
    scf_long = _parse_int_rows(mm, "g_scf_long[8][23]", 23)
    scf_short = _parse_int_rows(mm, "g_scf_short[8][40]", 40)
    scf_mixed = _parse_int_rows(mm, "g_scf_mixed[8][40]", 40)
    scf_part = _parse_int_array(mm, "g_scf_partitions[3][28]")
    scfc_decode = _parse_int_array(mm, "g_scfc_decode[16]")
    gmod = _parse_int_array(mm, "g_mod[6*4]")
    preamp = _parse_int_array(mm, "g_preamp[10]")

    # big-values tables: tabindex picks the lookup start per table id;
    # ids 4 and 14 are unused per the standard
    huff = extract_huffman(tabs, tabindex, linbits)
    huff[4] = []
    huff[14] = []
    c1a = extract_count1(tab32)
    c1b = extract_count1(tab33)

    ms = open(MUSEPACK_SYNTH).read()
    di = _parse_int_array(ms, "Di_opt [32] [16]")
    assert len(di) == 512
    # Di_opt[k][i] == D[k + 32 i] * 65536 (the ISO synthesis window)
    D = [0.0] * 512
    for k in range(32):
        for i in range(16):
            D[k + 32 * i] = di[k * 16 + i] / 65536.0

    w = sys.stdout.write
    w("// zenmp3_tables.h — ISO/IEC 11172-3 Layer III standard data\n")
    w("// tables in canonical form.  GENERATED by\n")
    w("// scripts/gen_mp3_tables.py (see its docstring for provenance);\n")
    w("// do not edit by hand.\n")
    w("#pragma once\n#include <cstdint>\n\n")

    w("// Huffman codeword: code (MSB-first), length, packed (x<<4)|y\n")
    w("struct Mp3Huff { uint32_t code; uint8_t len; uint8_t xy; };\n\n")
    for t in range(32):
        entries = huff[t]
        w(f"static const Mp3Huff kHuffTab{t}[] = {{\n")
        for code, ln, x, y in entries:
            w(f"  {{{code}u, {ln}, 0x{(x << 4) | y:02x}}},\n")
        if not entries:
            w("  {0u, 0, 0},  // unused table id\n")
        w("};\n")
    w("\nstatic const Mp3Huff* const kHuffTabs[32] = {\n")
    for t in range(32):
        w(f"  kHuffTab{t},\n")
    w("};\n")
    w("static const uint16_t kHuffTabLen[32] = {\n  ")
    w(", ".join(str(len(huff[t])) for t in range(32)))
    w("\n};\n")
    w("static const uint8_t kHuffLinbits[32] = {\n  ")
    w(", ".join(str(v) for v in linbits))
    w("\n};\n\n")

    w("// count1 (quad) tables: value nibble is the v0..v3 bitmap\n")
    for name, tab in (("A", c1a), ("B", c1b)):
        w(f"static const Mp3Huff kCount1{name}[] = {{\n")
        for code, ln, v in tab:
            w(f"  {{{code}u, {ln}, 0x{v:02x}}},\n")
        w("};\n")
    w(f"static const uint16_t kCount1ALen = {len(c1a)};\n")
    w(f"static const uint16_t kCount1BLen = {len(c1b)};\n\n")

    w("// scalefactor band widths, 8 sample-rate rows (see side-info\n")
    w("// sr index mapping), zero-terminated\n")
    w("static const uint8_t kScfLong[8][23] = {\n")
    for r in range(8):
        w("  {" + ",".join(str(v) for v in scf_long[r]) + "},\n")
    w("};\n")
    w("static const uint8_t kScfShort[8][40] = {\n")
    for r in range(8):
        w("  {" + ",".join(str(v) for v in scf_short[r]) + "},\n")
    w("};\n")
    w("static const uint8_t kScfMixed[8][40] = {\n")
    for r in range(8):
        w("  {" + ",".join(str(v) for v in scf_mixed[r]) + "},\n")
    w("};\n\n")

    w("// scalefactor partition sizes (long/mixed/short rows x LSF sets)\n")
    w("static const uint8_t kScfPartitions[3][28] = {\n")
    for r in range(3):
        w("  {" + ",".join(str(v) for v in scf_part[r * 28 : r * 28 + 28]) + "},\n")
    w("};\n")
    w("static const uint8_t kScfcDecode[16] = {")
    w(",".join(str(v) for v in scfc_decode))
    w("};\n")
    w("static const uint8_t kScfMod[24] = {")
    w(",".join(str(v) for v in gmod))
    w("};\n")
    w("static const uint8_t kPreamp[10] = {")
    w(",".join(str(v) for v in preamp))
    w("};\n\n")

    w("// MPEG-1 audio synthesis window D (the 512-tap prototype)\n")
    w("static const float kSynthD[512] = {\n")
    for i in range(0, 512, 8):
        w("  " + ", ".join(f"{v:.10e}f" for v in D[i : i + 8]) + ",\n")
    w("};\n")


if __name__ == "__main__":
    main()
