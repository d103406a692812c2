#!/usr/bin/env python3
"""Generate native/zenopus_tables.h — the normative constant tables for
the from-scratch Opus decoder (native/zenopus*.cpp).

Every array here is RFC 6716 normative data (SILK iCDF/codebook tables
from RFC 6716 §4.2 appendices, CELT mode/probability tables from
§4.3): constant spec data, not code.  As with the MP3/Musepack table
headers (scripts/gen_mp3_tables.py precedent), the generator recovers
them in canonical form from the reference implementation's table files
(the IETF reference codec the RFC normatively cites), and the emitted
header is checked in with this script as its reproducible provenance.

Source files parsed (read-only mount):
  /root/reference/vendor/libnyquist/third_party/opus/silk/tables_*.c
  .../silk/table_LSF_cos.c .../silk/pitch_est_tables.c
  .../silk/resampler_rom.c .../silk/resampler.c
  .../celt/static_modes_float.h .../celt/quant_bands.c
  .../celt/modes.c .../celt/rate.c .../celt/bands.c .../celt/celt.c

Run: python scripts/gen_opus_tables.py  (rewrites native/zenopus_tables.h)
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

OPUS = Path("/root/reference/vendor/libnyquist/third_party/opus")
OUT = Path(__file__).resolve().parent.parent / "native" / "zenopus_tables.h"


def strip_comments(text: str) -> str:
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    return re.sub(r"//[^\n]*", " ", text)


def extract(path: Path, name: str, expect: int, float_vals: bool = False):
    """Extract the flattened initializer of C array `name` from `path`."""
    text = strip_comments(path.read_text())
    m = re.search(re.escape(name) + r"\s*\[[^=]*=\s*\{", text)
    if not m:
        raise SystemExit(f"{path.name}: array {name} not found")
    i = m.end() - 1  # at the opening brace
    depth = 0
    j = i
    while True:
        c = text[j]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                break
        j += 1
    body = text[i + 1 : j].replace("{", " ").replace("}", " ")
    vals = []
    for tok in body.split(","):
        tok = tok.strip()
        if not tok:
            continue
        tok = re.sub(r"[fFuUlL]+$", "", tok)
        # tolerate simple arithmetic like "39083 - 65536"
        if not re.fullmatch(r"[-+0-9xXa-fA-F.eE\s()*/]+", tok):
            raise SystemExit(f"{path.name}:{name}: unparseable element {tok!r}")
        vals.append(float(eval(tok)) if float_vals else int(eval(tok)))
    if len(vals) != expect:
        raise SystemExit(f"{path.name}:{name}: got {len(vals)} values, want {expect}")
    return vals


def fmt(vals, per_line: int = 12, float_vals: bool = False) -> str:
    out, line = [], []
    for v in vals:
        line.append(f"{v:.9e}f" if float_vals else str(v))
        if len(line) == per_line:
            out.append("  " + ", ".join(line) + ",")
            line = []
    if line:
        out.append("  " + ", ".join(line) + ",")
    text = "\n".join(out)
    return text[:-1] if text.endswith(",") else text


def main() -> None:
    silk = OPUS / "silk"
    celt = OPUS / "celt"
    chunks: list[str] = []

    def emit(ctype, cname, dims, vals, per_line=12, float_vals=False):
        d = "".join(f"[{x}]" for x in dims)
        chunks.append(f"static const {ctype} {cname}{d} = {{\n"
                      f"{fmt(vals, per_line, float_vals)}\n}};\n")

    # ---- SILK: entropy tables -------------------------------------------
    t = silk / "tables_other.c"
    emit("uint8_t", "kSilkStereoPredJointICDF", [25], extract(t, "silk_stereo_pred_joint_iCDF", 25))
    emit("uint8_t", "kSilkStereoOnlyMidICDF", [2], extract(t, "silk_stereo_only_code_mid_iCDF", 2))
    emit("int16_t", "kSilkStereoPredQuantQ13", [16], extract(t, "silk_stereo_pred_quant_Q13", 16))
    emit("uint8_t", "kSilkLBRR2FlagsICDF", [3], extract(t, "silk_LBRR_flags_2_iCDF", 3))
    emit("uint8_t", "kSilkLBRR3FlagsICDF", [7], extract(t, "silk_LBRR_flags_3_iCDF", 7))
    emit("uint8_t", "kSilkLsbICDF", [2], extract(t, "silk_lsb_iCDF", 2))
    emit("uint8_t", "kSilkLTPScaleICDF", [3], extract(t, "silk_LTPscale_iCDF", 3))
    emit("uint8_t", "kSilkTypeOffsetVADICDF", [4], extract(t, "silk_type_offset_VAD_iCDF", 4))
    emit("uint8_t", "kSilkTypeOffsetNoVADICDF", [2], extract(t, "silk_type_offset_no_VAD_iCDF", 2))
    emit("uint8_t", "kSilkNLSFInterpICDF", [5], extract(t, "silk_NLSF_interpolation_factor_iCDF", 5))
    # silk_Quantization_Offsets_Q10 initializer names define.h constants
    # (OFFSET_{UV,V}{L,H}_Q10, silk/define.h:125-128): [sigtype>>1][offsetType]
    chunks.append("static const int16_t kSilkQuantOffsetsQ10[2][2] = {\n"
                  "  100, 240,   // unvoiced/inactive: low, high\n"
                  "  32, 100     // voiced: low, high\n};\n")
    emit("int16_t", "kSilkLTPScalesQ14", [3], extract(t, "silk_LTPScales_table_Q14", 3))
    emit("uint8_t", "kSilkUniform3ICDF", [3], extract(t, "silk_uniform3_iCDF", 3))
    emit("uint8_t", "kSilkUniform4ICDF", [4], extract(t, "silk_uniform4_iCDF", 4))
    emit("uint8_t", "kSilkUniform5ICDF", [5], extract(t, "silk_uniform5_iCDF", 5))
    emit("uint8_t", "kSilkUniform6ICDF", [6], extract(t, "silk_uniform6_iCDF", 6))
    emit("uint8_t", "kSilkUniform8ICDF", [8], extract(t, "silk_uniform8_iCDF", 8))
    emit("uint8_t", "kSilkNLSFExtICDF", [7], extract(t, "silk_NLSF_EXT_iCDF", 7))

    t = silk / "tables_gain.c"
    emit("uint8_t", "kSilkGainICDF", [3, 8], extract(t, "silk_gain_iCDF", 24))
    emit("uint8_t", "kSilkDeltaGainICDF", [41], extract(t, "silk_delta_gain_iCDF", 41))

    t = silk / "tables_pitch_lag.c"
    emit("uint8_t", "kSilkPitchLagICDF", [32], extract(t, "silk_pitch_lag_iCDF", 32))
    emit("uint8_t", "kSilkPitchDeltaICDF", [21], extract(t, "silk_pitch_delta_iCDF", 21))
    emit("uint8_t", "kSilkPitchContourICDF", [34], extract(t, "silk_pitch_contour_iCDF", 34))
    emit("uint8_t", "kSilkPitchContourNBICDF", [11], extract(t, "silk_pitch_contour_NB_iCDF", 11))
    emit("uint8_t", "kSilkPitchContour10msICDF", [12], extract(t, "silk_pitch_contour_10_ms_iCDF", 12))
    emit("uint8_t", "kSilkPitchContour10msNBICDF", [3], extract(t, "silk_pitch_contour_10_ms_NB_iCDF", 3))

    t = silk / "pitch_est_tables.c"
    emit("int8_t", "kSilkLagCBStage2", [4, 11], extract(t, "silk_CB_lags_stage2", 44))
    emit("int8_t", "kSilkLagCBStage3", [4, 34], extract(t, "silk_CB_lags_stage3", 136))
    emit("int8_t", "kSilkLagCBStage2_10ms", [2, 3], extract(t, "silk_CB_lags_stage2_10_ms", 6))
    emit("int8_t", "kSilkLagCBStage3_10ms", [2, 12], extract(t, "silk_CB_lags_stage3_10_ms", 24))

    t = silk / "tables_pulses_per_block.c"
    emit("uint8_t", "kSilkMaxPulses", [4], extract(t, "silk_max_pulses_table", 4))
    emit("uint8_t", "kSilkPulsesPerBlockICDF", [10, 18], extract(t, "silk_pulses_per_block_iCDF", 180))
    emit("uint8_t", "kSilkRateLevelsICDF", [2, 9], extract(t, "silk_rate_levels_iCDF", 18))
    emit("uint8_t", "kSilkShellCodeTable0", [152], extract(t, "silk_shell_code_table0", 152))
    emit("uint8_t", "kSilkShellCodeTable1", [152], extract(t, "silk_shell_code_table1", 152))
    emit("uint8_t", "kSilkShellCodeTable2", [152], extract(t, "silk_shell_code_table2", 152))
    emit("uint8_t", "kSilkShellCodeTable3", [152], extract(t, "silk_shell_code_table3", 152))
    emit("uint8_t", "kSilkShellCodeOffsets", [17], extract(t, "silk_shell_code_table_offsets", 17))
    emit("uint8_t", "kSilkSignICDF", [42], extract(t, "silk_sign_iCDF", 42))

    t = silk / "tables_LTP.c"
    emit("uint8_t", "kSilkLTPPerIndexICDF", [3], extract(t, "silk_LTP_per_index_iCDF", 3))
    emit("uint8_t", "kSilkLTPGainICDF0", [8], extract(t, "silk_LTP_gain_iCDF_0", 8))
    emit("uint8_t", "kSilkLTPGainICDF1", [16], extract(t, "silk_LTP_gain_iCDF_1", 16))
    emit("uint8_t", "kSilkLTPGainICDF2", [32], extract(t, "silk_LTP_gain_iCDF_2", 32))
    emit("int8_t", "kSilkLTPGainVQ0", [8, 5], extract(t, "silk_LTP_gain_vq_0", 40))
    emit("int8_t", "kSilkLTPGainVQ1", [16, 5], extract(t, "silk_LTP_gain_vq_1", 80))
    emit("int8_t", "kSilkLTPGainVQ2", [32, 5], extract(t, "silk_LTP_gain_vq_2", 160))

    # ---- SILK: NLSF codebooks ------------------------------------------
    t = silk / "tables_NLSF_CB_NB_MB.c"
    emit("uint8_t", "kSilkNLSFCB1NBMB", [320], extract(t, "silk_NLSF_CB1_NB_MB_Q8", 320))
    emit("uint8_t", "kSilkNLSFCB1ICDFNBMB", [64], extract(t, "silk_NLSF_CB1_iCDF_NB_MB", 64))
    emit("uint8_t", "kSilkNLSFCB2SelNBMB", [160], extract(t, "silk_NLSF_CB2_SELECT_NB_MB", 160))
    emit("uint8_t", "kSilkNLSFCB2ICDFNBMB", [72], extract(t, "silk_NLSF_CB2_iCDF_NB_MB", 72))
    emit("uint8_t", "kSilkNLSFPredNBMB", [18], extract(t, "silk_NLSF_PRED_NB_MB_Q8", 18))
    emit("int16_t", "kSilkNLSFDeltaMinNBMB", [11], extract(t, "silk_NLSF_DELTA_MIN_NB_MB_Q15", 11))

    t = silk / "tables_NLSF_CB_WB.c"
    emit("uint8_t", "kSilkNLSFCB1WB", [512], extract(t, "silk_NLSF_CB1_WB_Q8", 512))
    emit("uint8_t", "kSilkNLSFCB1ICDFWB", [64], extract(t, "silk_NLSF_CB1_iCDF_WB", 64))
    emit("uint8_t", "kSilkNLSFCB2SelWB", [256], extract(t, "silk_NLSF_CB2_SELECT_WB", 256))
    emit("uint8_t", "kSilkNLSFCB2ICDFWB", [72], extract(t, "silk_NLSF_CB2_iCDF_WB", 72))
    emit("uint8_t", "kSilkNLSFPredWB", [30], extract(t, "silk_NLSF_PRED_WB_Q8", 30))
    emit("int16_t", "kSilkNLSFDeltaMinWB", [17], extract(t, "silk_NLSF_DELTA_MIN_WB_Q15", 17))

    t = silk / "table_LSF_cos.c"
    emit("int16_t", "kSilkLSFCosTabQ12", [129], extract(t, "silk_LSFCosTab_FIX_Q12", 129))

    # ---- SILK: resampler -----------------------------------------------
    t = silk / "resampler_rom.c"
    emit("int16_t", "kSilkResamplerFracFIR12", [12, 4], extract(t, "silk_resampler_frac_FIR_12", 48))
    # the two up2-HQ allpass coefficient triples live in resampler_rom.h
    t = silk / "resampler_rom.h"
    emit("int16_t", "kSilkResamplerUp2HQ0", [3], extract(t, "silk_resampler_up2_hq_0", 3))
    emit("int16_t", "kSilkResamplerUp2HQ1", [3], extract(t, "silk_resampler_up2_hq_1", 3))
    t = silk / "resampler.c"
    emit("int8_t", "kSilkResamplerDelayDec", [3, 5], extract(t, "delay_matrix_dec", 15))

    # ---- CELT: 48 kHz mode + probability tables ------------------------
    t = celt / "static_modes_float.h"
    emit("float", "kCeltWindow120", [120], extract(t, "window120", 120, float_vals=True),
         per_line=4, float_vals=True)
    emit("int16_t", "kCeltLogN400", [21], extract(t, "logN400", 21))
    emit("float", "kCeltMdctTwiddles960", [481], extract(t, "mdct_twiddles960", 481, float_vals=True),
         per_line=4, float_vals=True)
    # kiss FFT mode data: the shared N=480 twiddle factors (complex,
    # interleaved) and the per-size bit-reversal tables
    emit("float", "kCeltFftTwiddles", [960], extract(t, "fft_twiddles48000_960", 960, float_vals=True),
         per_line=4, float_vals=True)
    emit("int16_t", "kCeltFftBitrev480", [480], extract(t, "fft_bitrev480", 480))
    emit("int16_t", "kCeltFftBitrev240", [240], extract(t, "fft_bitrev240", 240))
    emit("int16_t", "kCeltFftBitrev120", [120], extract(t, "fft_bitrev120", 120))
    emit("int16_t", "kCeltFftBitrev60", [60], extract(t, "fft_bitrev60", 60))
    emit("int16_t", "kCeltCacheIndex", [105], extract(t, "cache_index50", 105))
    emit("uint8_t", "kCeltCacheBits", [392], extract(t, "cache_bits50", 392))
    emit("uint8_t", "kCeltCacheCaps", [168], extract(t, "cache_caps50", 168))

    t = celt / "quant_bands.c"
    emit("uint8_t", "kCeltEnergyProbModel", [4, 2, 42], extract(t, "e_prob_model", 336))
    emit("uint8_t", "kCeltSmallEnergyICDF", [3], extract(t, "small_energy_icdf", 3))

    t = celt / "modes.c"
    emit("int16_t", "kCeltEBands5ms", [22], extract(t, "eband5ms", 22))
    emit("uint8_t", "kCeltBandAllocation", [11, 21], extract(t, "band_allocation", 231))

    t = celt / "rate.c"
    emit("uint8_t", "kCeltLog2FracTable", [24], extract(t, "LOG2_FRAC_TABLE", 24))

    t = celt / "bands.c"
    emit("int32_t", "kCeltOrderyTable", [30], extract(t, "ordery_table", 30))

    t = celt / "celt.c"
    emit("int8_t", "kCeltTfSelectTable", [4, 8], extract(t, "tf_select_table", 32))

    header = (
        "// zenopus_tables.h — GENERATED by scripts/gen_opus_tables.py; do not edit.\n"
        "//\n"
        "// RFC 6716 normative constant tables for the from-scratch Opus\n"
        "// decoder: SILK entropy/codebook/resampler data (RFC 6716 §4.2)\n"
        "// and the CELT 48 kHz static mode + probability models (§4.3).\n"
        "// Recovered in canonical form from the IETF reference codec's\n"
        "// table files on the read-only reference mount (see generator\n"
        "// docstring for the exact file list).  Data, not code.\n"
        "#pragma once\n"
        "#include <cstdint>\n\n"
    )
    small = (
        "// Small inline iCDFs (celt/celt.h:145-149): spread, tapset, trim.\n"
        "static const uint8_t kCeltSpreadICDF[4] = {25, 23, 2, 0};\n"
        "static const uint8_t kCeltTapsetICDF[3] = {2, 1, 0};\n"
        "static const uint8_t kCeltTrimICDF[11] = {126, 124, 119, 109, 87, 41, 19, 9, 4, 2, 0};\n"
    )
    OUT.write_text(header + "\n".join(chunks) + "\n" + small)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    sys.exit(main())
