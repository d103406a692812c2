// zenopus_silk.cpp — from-scratch SILK decoder (RFC 6716 §4.2).
//
// SILK decode is specified in fixed point, so this implementation is
// bit-exact against the IETF reference decoder by construction: every
// Q-arithmetic step mirrors the normative semantics studied from
// silk/dec_API.c, decode_{frame,indices,parameters,core,pulses,pitch}.c,
// shell_coder.c, code_signs.c, gain_quant.c, NLSF_{decode,unpack,
// stabilize}.c, NLSF2A.c, LPC_inv_pred_gain.c, stereo_{decode_pred,
// MS_to_LR}.c, resampler*.c — expressed here as original code over the
// wrap-defined helpers in zenopus.h.  Validated int16-exact against a
// test-time-compiled libopus oracle (tests/test_opus.py).
//
// PLC/CNG are implemented (SilkChannel::{decode_frame_lost,plc_update,
// plc_glue,cng_run} below): the file-decode front door never loses packets, but
// DTX streams and mode transitions route through the concealment path
// (opus_decoder.c:306,448 semantics), and the concealment output is
// validated bit-exact against the libopus oracle like every other mode
// (tests/test_opus.py::test_dtx_plc_cng_bit_exact and the transition
// tests).

#include "zenopus.h"
#include "zenopus_tables.h"


namespace zop {
namespace {

constexpr int kMaxLpcOrder = 16;
constexpr int kLtpOrder = 5;
constexpr int kMaxNbSubfr = 4;
constexpr int kQuantLevelAdjustQ10 = 80;
constexpr int kNLevelsQGain = 64;
constexpr int kMinDeltaGainQuant = -4;
constexpr int kMaxDeltaGainQuant = 36;
// gain_quant.c:34-36 with MIN_QGAIN_DB 2, MAX_QGAIN_DB 88, N_LEVELS 64
constexpr int kGainOffset = (2 * 128) / 6 + 16 * 128;                  // 2090
constexpr int kGainInvScaleQ16 = (65536 * ((88 - 2) * 128 / 6)) / 63;  // 1909069...
constexpr int kNlsfQuantMaxAmp = 4;

struct NlsfCB {
  int n_vectors, order;
  int16_t quant_step_q16, inv_quant_step_q6;
  const uint8_t* cb1;
  const uint8_t* cb1_icdf;
  const uint8_t* pred;
  const uint8_t* ec_sel;
  const uint8_t* ec_icdf;
  const int16_t* delta_min;
};

// struct constants from tables_NLSF_CB_{NB_MB,WB}.c initializers:
// SILK_FIX_CONST(0.18,16)=11796, (1/0.18,6)=355; (0.15,16)=9830, (1/0.15,6)=427
const NlsfCB kNlsfNBMB = {32, 10, 11796, 355,
                          kSilkNLSFCB1NBMB, kSilkNLSFCB1ICDFNBMB, kSilkNLSFPredNBMB,
                          kSilkNLSFCB2SelNBMB, kSilkNLSFCB2ICDFNBMB, kSilkNLSFDeltaMinNBMB};
const NlsfCB kNlsfWB = {32, 16, 9830, 427,
                        kSilkNLSFCB1WB, kSilkNLSFCB1ICDFWB, kSilkNLSFPredWB,
                        kSilkNLSFCB2SelWB, kSilkNLSFCB2ICDFWB, kSilkNLSFDeltaMinWB};

const uint8_t* const kLtpGainICDF[3] = {kSilkLTPGainICDF0, kSilkLTPGainICDF1, kSilkLTPGainICDF2};
const int8_t* const kLtpGainVQ[3] = {&kSilkLTPGainVQ0[0][0], &kSilkLTPGainVQ1[0][0],
                                     &kSilkLTPGainVQ2[0][0]};

// ---- NLSF chain -----------------------------------------------------------

void nlsf_unpack(int16_t ec_ix[], uint8_t pred_q8[], const NlsfCB& cb, int cb1_index) {
  const uint8_t* sel = &cb.ec_sel[cb1_index * cb.order / 2];
  for (int i = 0; i < cb.order; i += 2) {
    uint8_t entry = *sel++;
    ec_ix[i] = static_cast<int16_t>(((entry >> 1) & 7) * (2 * kNlsfQuantMaxAmp + 1));
    pred_q8[i] = cb.pred[i + (entry & 1) * (cb.order - 1)];
    ec_ix[i + 1] = static_cast<int16_t>(((entry >> 5) & 7) * (2 * kNlsfQuantMaxAmp + 1));
    pred_q8[i + 1] = cb.pred[i + ((entry >> 4) & 1) * (cb.order - 1) + 1];
  }
}

// NLSF_decode.c:35-57 — backward prediction, run high-to-low
void nlsf_residual_dequant(int16_t x_q10[], const int8_t indices[], const uint8_t pred_q8[],
                           int quant_step_q16, int order) {
  int32_t out_q10 = 0;
  for (int i = order - 1; i >= 0; i--) {
    int32_t pred_q10 = smulbb(out_q10, pred_q8[i]) >> 8;
    out_q10 = lshift32(indices[i], 10);
    if (out_q10 > 0) {
      out_q10 -= 102;  // SILK_FIX_CONST(NLSF_QUANT_LEVEL_ADJ=0.1, 10)
    } else if (out_q10 < 0) {
      out_q10 += 102;
    }
    out_q10 = smlawb(pred_q10, out_q10, quant_step_q16);
    x_q10[i] = static_cast<int16_t>(out_q10);
  }
}

// NLSF_VQ_weights_laroia.c: NLSF_W_Q = 2
void nlsf_weights_laroia(int16_t w_qw[], const int16_t nlsf_q15[], int d) {
  int32_t tmp1 = nlsf_q15[0] > 1 ? nlsf_q15[0] : 1;
  tmp1 = (1 << 17) / tmp1;
  int32_t tmp2 = (nlsf_q15[1] - nlsf_q15[0]) > 1 ? nlsf_q15[1] - nlsf_q15[0] : 1;
  tmp2 = (1 << 17) / tmp2;
  w_qw[0] = static_cast<int16_t>(tmp1 + tmp2 < 32767 ? tmp1 + tmp2 : 32767);
  for (int k = 1; k < d - 1; k += 2) {
    tmp1 = (nlsf_q15[k + 1] - nlsf_q15[k]) > 1 ? nlsf_q15[k + 1] - nlsf_q15[k] : 1;
    tmp1 = (1 << 17) / tmp1;
    w_qw[k] = static_cast<int16_t>(tmp1 + tmp2 < 32767 ? tmp1 + tmp2 : 32767);
    tmp2 = (nlsf_q15[k + 2] - nlsf_q15[k + 1]) > 1 ? nlsf_q15[k + 2] - nlsf_q15[k + 1] : 1;
    tmp2 = (1 << 17) / tmp2;
    w_qw[k + 1] = static_cast<int16_t>(tmp1 + tmp2 < 32767 ? tmp1 + tmp2 : 32767);
  }
  tmp1 = ((1 << 15) - nlsf_q15[d - 1]) > 1 ? (1 << 15) - nlsf_q15[d - 1] : 1;
  tmp1 = (1 << 17) / tmp1;
  w_qw[d - 1] = static_cast<int16_t>(tmp1 + tmp2 < 32767 ? tmp1 + tmp2 : 32767);
}

void insertion_sort_i16(int16_t* a, int n) {
  for (int i = 1; i < n; i++) {
    int16_t v = a[i];
    int j = i - 1;
    while (j >= 0 && a[j] > v) {
      a[j + 1] = a[j];
      j--;
    }
    a[j + 1] = v;
  }
}

void nlsf_stabilize(int16_t nlsf_q15[], const int16_t delta_min_q15[], int l) {
  constexpr int kMaxLoops = 20;
  int loops = 0;
  for (; loops < kMaxLoops; loops++) {
    int32_t min_diff = nlsf_q15[0] - delta_min_q15[0];
    int idx = 0;
    for (int i = 1; i <= l - 1; i++) {
      int32_t diff = nlsf_q15[i] - (nlsf_q15[i - 1] + delta_min_q15[i]);
      if (diff < min_diff) {
        min_diff = diff;
        idx = i;
      }
    }
    int32_t diff = (1 << 15) - (nlsf_q15[l - 1] + delta_min_q15[l]);
    if (diff < min_diff) {
      min_diff = diff;
      idx = l;
    }
    if (min_diff >= 0) return;
    if (idx == 0) {
      nlsf_q15[0] = delta_min_q15[0];
    } else if (idx == l) {
      nlsf_q15[l - 1] = static_cast<int16_t>((1 << 15) - delta_min_q15[l]);
    } else {
      int32_t min_center = 0;
      for (int k = 0; k < idx; k++) min_center += delta_min_q15[k];
      min_center += delta_min_q15[idx] >> 1;
      int32_t max_center = 1 << 15;
      for (int k = l; k > idx; k--) max_center -= delta_min_q15[k];
      max_center -= delta_min_q15[idx] >> 1;
      int32_t center = rshift_round(nlsf_q15[idx - 1] + nlsf_q15[idx], 1);
      if (center < min_center) center = min_center;
      if (center > max_center) center = max_center;
      nlsf_q15[idx - 1] = static_cast<int16_t>(center - (delta_min_q15[idx] >> 1));
      nlsf_q15[idx] = static_cast<int16_t>(nlsf_q15[idx - 1] + delta_min_q15[idx]);
    }
  }
  if (loops == kMaxLoops) {  // fallback: sort + clamp pass (rare)
    insertion_sort_i16(nlsf_q15, l);
    nlsf_q15[0] = static_cast<int16_t>(
        nlsf_q15[0] > delta_min_q15[0] ? nlsf_q15[0] : delta_min_q15[0]);
    for (int i = 1; i < l; i++) {
      int32_t lo = nlsf_q15[i - 1] + delta_min_q15[i];
      nlsf_q15[i] = static_cast<int16_t>(nlsf_q15[i] > lo ? nlsf_q15[i] : lo);
    }
    int32_t hi = (1 << 15) - delta_min_q15[l];
    nlsf_q15[l - 1] = static_cast<int16_t>(nlsf_q15[l - 1] < hi ? nlsf_q15[l - 1] : hi);
    for (int i = l - 2; i >= 0; i--) {
      int32_t cap = nlsf_q15[i + 1] - delta_min_q15[i + 1];
      nlsf_q15[i] = static_cast<int16_t>(nlsf_q15[i] < cap ? nlsf_q15[i] : cap);
    }
  }
}

void bwexpander_32(int32_t* ar, int d, int32_t chirp_q16) {
  int32_t chirp_minus_one = chirp_q16 - 65536;
  for (int i = 0; i < d - 1; i++) {
    ar[i] = smulww(chirp_q16, ar[i]);
    chirp_q16 = wrap32(int64_t(chirp_q16) +
                       rshift_round(wrap32(int64_t(chirp_q16) * chirp_minus_one), 16));
  }
  ar[d - 1] = smulww(chirp_q16, ar[d - 1]);
}

// LPC_inv_pred_gain.c (QA=24): Q30 inverse energy gain, 0 if unstable
int32_t lpc_inverse_pred_gain(const int16_t* a_q12, int order) {
  constexpr int kQA = 24;
  constexpr int32_t kALimit = 16773022;  // SILK_FIX_CONST(0.99975, 24)
  int32_t atmp[2][kMaxLpcOrder];
  int32_t* anew = atmp[order & 1];
  int32_t dc_resp = 0;
  for (int k = 0; k < order; k++) {
    dc_resp += a_q12[k];
    anew[k] = lshift32(a_q12[k], kQA - 12);
  }
  if (dc_resp >= 4096) return 0;
  int32_t inv_gain_q30 = 1 << 30;
  for (int k = order - 1; k > 0; k--) {
    if (anew[k] > kALimit || anew[k] < -kALimit) return 0;
    int32_t rc_q31 = wrap32(-lshift64(anew[k], 31 - kQA));
    int32_t rc_mult1_q30 = (1 << 30) - smmul(rc_q31, rc_q31);
    int mult2q = 32 - clz32(static_cast<uint32_t>(silk_abs32(rc_mult1_q30)));
    int32_t rc_mult2 = inverse32_varq(rc_mult1_q30, mult2q + 30);
    inv_gain_q30 = wrap32(lshift64(int64_t(smmul(inv_gain_q30, rc_mult1_q30)), 2));
    const int32_t* aold = anew;
    anew = atmp[k & 1];
    for (int n = 0; n < k; n++) {
      int32_t tmp = wrap32(int64_t(aold[n]) -
                           rshift_round64(int64_t(aold[k - n - 1]) * rc_q31, 31));
      anew[n] = static_cast<int32_t>(rshift_round64(int64_t(tmp) * rc_mult2, mult2q));
    }
  }
  if (anew[0] > kALimit || anew[0] < -kALimit) return 0;
  int32_t rc_q31 = wrap32(-lshift64(anew[0], 31 - kQA));
  int32_t rc_mult1_q30 = (1 << 30) - smmul(rc_q31, rc_q31);
  inv_gain_q30 = wrap32(lshift64(int64_t(smmul(inv_gain_q30, rc_mult1_q30)), 2));
  return inv_gain_q30;
}

// NLSF2A.c (QA=16): LSFs → monic AR coefficients Q12
void nlsf2a(int16_t* a_q12, const int16_t* nlsf, int d) {
  constexpr int kQA = 16;
  static const uint8_t kOrdering16[16] = {0, 15, 8, 7, 4, 11, 12, 3,
                                          2, 13, 10, 5, 6, 9, 14, 1};
  static const uint8_t kOrdering10[10] = {0, 9, 6, 3, 4, 5, 8, 1, 2, 7};
  const uint8_t* ordering = (d == 16) ? kOrdering16 : kOrdering10;
  int32_t cos_lsf_qa[kMaxLpcOrder] = {};  // ordering[] is a permutation; zero-init quiets GCC
  for (int k = 0; k < d; k++) {
    int32_t f_int = nlsf[k] >> 8;
    int32_t f_frac = nlsf[k] - (f_int << 8);
    int32_t cos_val = kSilkLSFCosTabQ12[f_int];
    int32_t delta = kSilkLSFCosTabQ12[f_int + 1] - cos_val;
    cos_lsf_qa[ordering[k]] = rshift_round(wrap32((lshift64(int64_t(cos_val), 8)) + delta * f_frac),
                                           20 - kQA);
  }
  int dd = d >> 1;
  int32_t p[kMaxLpcOrder / 2 + 1], q[kMaxLpcOrder / 2 + 1];
  auto find_poly = [dd](int32_t* out, const int32_t* clsf) {
    out[0] = 1 << kQA;
    out[1] = -clsf[0];
    for (int k = 1; k < dd; k++) {
      int32_t ftmp = clsf[2 * k];
      out[k + 1] = wrap32((lshift64(int64_t(out[k - 1]), 1)) -
                          rshift_round64(int64_t(ftmp) * out[k], kQA));
      for (int n = k; n > 1; n--) {
        out[n] = wrap32(int64_t(out[n]) + out[n - 2] -
                        rshift_round64(int64_t(ftmp) * out[n - 1], kQA));
      }
      out[1] -= ftmp;
    }
  };
  find_poly(p, &cos_lsf_qa[0]);
  find_poly(q, &cos_lsf_qa[1]);
  int32_t a32_qa1[kMaxLpcOrder];
  for (int k = 0; k < dd; k++) {
    int32_t ptmp = p[k + 1] + p[k];
    int32_t qtmp = q[k + 1] - q[k];
    a32_qa1[k] = wrap32(-int64_t(qtmp) - ptmp);
    a32_qa1[d - k - 1] = wrap32(int64_t(qtmp) - ptmp);
  }
  int i = 0;
  for (; i < 10; i++) {
    int32_t maxabs = 0;
    int idx = 0;
    for (int k = 0; k < d; k++) {
      int32_t absval = silk_abs32(a32_qa1[k]);
      if (absval > maxabs) {
        maxabs = absval;
        idx = k;
      }
    }
    maxabs = rshift_round(maxabs, kQA + 1 - 12);
    if (maxabs > 32767) {
      maxabs = maxabs < 163838 ? maxabs : 163838;
      int32_t sc_q16 = 65470 -  // SILK_FIX_CONST(0.999, 16)
                       ((maxabs - 32767) << 14) / ((maxabs * (idx + 1)) >> 2);
      bwexpander_32(a32_qa1, d, sc_q16);
    } else {
      break;
    }
  }
  if (i == 10) {
    for (int k = 0; k < d; k++) {
      a_q12[k] = static_cast<int16_t>(sat16(rshift_round(a32_qa1[k], kQA + 1 - 12)));
      a32_qa1[k] = lshift32(a_q12[k], kQA + 1 - 12);
    }
  } else {
    for (int k = 0; k < d; k++) {
      a_q12[k] = static_cast<int16_t>(rshift_round(a32_qa1[k], kQA + 1 - 12));
    }
  }
  for (i = 0; i < 16; i++) {  // MAX_LPC_STABILIZE_ITERATIONS
    // SILK_FIX_CONST(1/MAX_PREDICTION_POWER_GAIN=1e-4, 30) = 107374
    if (lpc_inverse_pred_gain(a_q12, d) < 107374) {
      bwexpander_32(a32_qa1, d, 65536 - (2 << i));
      for (int k = 0; k < d; k++) {
        a_q12[k] = static_cast<int16_t>(rshift_round(a32_qa1[k], kQA + 1 - 12));
      }
    } else {
      break;
    }
  }
}

// gain_quant.c:95-124
void gains_dequant(int32_t gain_q16[], const int8_t ind[], int8_t* prev_ind, bool conditional,
                   int nb_subfr) {
  for (int k = 0; k < nb_subfr; k++) {
    if (k == 0 && !conditional) {
      int v = *prev_ind - 16;
      *prev_ind = static_cast<int8_t>(ind[k] > v ? ind[k] : v);
    } else {
      int ind_tmp = ind[k] + kMinDeltaGainQuant;
      int thresh = 2 * kMaxDeltaGainQuant - kNLevelsQGain + *prev_ind;
      if (ind_tmp > thresh) {
        *prev_ind = static_cast<int8_t>(*prev_ind + 2 * ind_tmp - thresh);
      } else {
        *prev_ind = static_cast<int8_t>(*prev_ind + ind_tmp);
      }
    }
    if (*prev_ind < 0) *prev_ind = 0;
    if (*prev_ind > kNLevelsQGain - 1) *prev_ind = kNLevelsQGain - 1;
    int32_t log_q7 = smulwb(kGainInvScaleQ16, *prev_ind) + kGainOffset;
    gain_q16[k] = silk_log2lin(log_q7 < 3967 ? log_q7 : 3967);
  }
}

// decode_pitch.c: lag codebooks per fs/nb_subfr
void decode_pitch(int16_t lag_index, int8_t contour_index, int pitch_lags[], int fs_khz,
                  int nb_subfr) {
  const int8_t* cb;
  int cb_size, rows;
  if (fs_khz == 8) {
    if (nb_subfr == 4) {
      cb = &kSilkLagCBStage2[0][0];
      cb_size = 11;
      rows = 4;
    } else {
      cb = &kSilkLagCBStage2_10ms[0][0];
      cb_size = 3;
      rows = 2;
    }
  } else {
    if (nb_subfr == 4) {
      cb = &kSilkLagCBStage3[0][0];
      cb_size = 34;
      rows = 4;
    } else {
      cb = &kSilkLagCBStage3_10ms[0][0];
      cb_size = 12;
      rows = 2;
    }
  }
  (void)rows;
  int min_lag = 2 * fs_khz, max_lag = 18 * fs_khz;
  int lag = min_lag + lag_index;
  for (int k = 0; k < nb_subfr; k++) {
    int v = lag + cb[k * cb_size + contour_index];
    pitch_lags[k] = v < min_lag ? min_lag : (v > max_lag ? max_lag : v);
  }
}

// bwexpander.c (int16): deliberately RSHIFT_ROUND(MUL), not SMULWB
void bwexpander_16(int16_t* ar, int d, int32_t chirp_q16) {
  int32_t chirp_minus_one = chirp_q16 - 65536;
  for (int i = 0; i < d - 1; i++) {
    ar[i] = static_cast<int16_t>(rshift_round(wrap32(int64_t(chirp_q16) * ar[i]), 16));
    chirp_q16 = wrap32(int64_t(chirp_q16) +
                       rshift_round(wrap32(int64_t(chirp_q16) * chirp_minus_one), 16));
  }
  ar[d - 1] = static_cast<int16_t>(rshift_round(wrap32(int64_t(chirp_q16) * ar[d - 1]), 16));
}

// sum_sqr_shift.c: energy with dynamic right-shift, wrap-faithful
void sum_sqr_shift(int32_t* energy, int* shift, const int16_t* x, int len) {
  int32_t nrg = 0;
  int shft = 0;
  int i = 0;
  len--;
  for (; i < len; i += 2) {
    nrg = smlabb(nrg, x[i], x[i]);
    nrg = smlabb(nrg, x[i + 1], x[i + 1]);
    if (nrg < 0) {
      // NB: the reference re-accumulates x[i], x[i+1] in the next loop
      // (sum_sqr_shift.c:48-55 breaks without advancing i); mirrored.
      nrg = static_cast<int32_t>(static_cast<uint32_t>(nrg) >> 2);
      shft = 2;
      break;
    }
  }
  for (; i < len; i += 2) {
    int32_t tmp = smulbb(x[i], x[i]);
    tmp = smlabb(tmp, x[i + 1], x[i + 1]);
    nrg = wrap32(int64_t(nrg) + (static_cast<uint32_t>(tmp) >> shft));
    if (nrg < 0) {
      nrg = static_cast<int32_t>(static_cast<uint32_t>(nrg) >> 2);
      shft += 2;
    }
  }
  if (i == len) {
    int32_t tmp = smulbb(x[i], x[i]);
    nrg = wrap32(int64_t(nrg) + (static_cast<uint32_t>(tmp) >> shft));
  }
  if (nrg & 0xC0000000) {
    nrg = static_cast<int32_t>(static_cast<uint32_t>(nrg) >> 2);
    shft += 2;
  }
  *shift = shft;
  *energy = nrg;
}

// LPC_analysis_filter.c float-build branch (whitens outBuf for LTP state)
void lpc_analysis_filter(int16_t* out, const int16_t* in, const int16_t* b, int len, int d) {
  for (int ix = d; ix < len; ix++) {
    const int16_t* p = &in[ix - 1];
    int32_t out32_q12 = smulbb(p[0], b[0]);
    for (int j = 1; j < d; j++) out32_q12 = smlabb(out32_q12, p[-j], b[j]);
    out32_q12 = wrap32((lshift64(int64_t(p[1]), 12)) - out32_q12);
    out[ix] = static_cast<int16_t>(sat16(rshift_round(out32_q12, 12)));
  }
  for (int j = 0; j < d; j++) out[j] = 0;
}

}  // namespace

// ---- SilkResampler --------------------------------------------------------

void SilkResampler::init(int fs_khz) {
  fs_in_khz = fs_khz;
  std::memset(iir, 0, sizeof iir);
  std::memset(fir, 0, sizeof fir);
  std::memset(delay_buf, 0, sizeof delay_buf);
  // delay_matrix_dec rows 8/12/16 kHz, column 48 kHz (resampler.c:63-67)
  input_delay = kSilkResamplerDelayDec[fs_khz == 8 ? 0 : (fs_khz == 12 ? 1 : 2)][4];
  // invRatio for the IIR_FIR (2x upsampled) path, rounded up (resampler.c:155-160)
  int32_t fs_in = fs_khz * 1000, fs_out = 48000;
  inv_ratio_q16 = ((fs_in << 15) / fs_out) << 2;
  while (smulww(inv_ratio_q16, fs_out) < (fs_in << 1)) inv_ratio_q16++;
}

namespace {
// resampler_private_up2_HQ.c: 3-stage allpass pair, Q10 state
void up2_hq(int32_t* s, int16_t* out, const int16_t* in, int len) {
  for (int k = 0; k < len; k++) {
    int32_t in32 = lshift32(in[k], 10);
    int32_t y = wrap32(int64_t(in32) - s[0]);
    int32_t x = smulwb(y, kSilkResamplerUp2HQ0[0]);
    int32_t out1 = wrap32(int64_t(s[0]) + x);
    s[0] = wrap32(int64_t(in32) + x);
    y = wrap32(int64_t(out1) - s[1]);
    x = smulwb(y, kSilkResamplerUp2HQ0[1]);
    int32_t out2 = wrap32(int64_t(s[1]) + x);
    s[1] = wrap32(int64_t(out1) + x);
    y = wrap32(int64_t(out2) - s[2]);
    x = smlawb(y, y, kSilkResamplerUp2HQ0[2]);
    out1 = wrap32(int64_t(s[2]) + x);
    s[2] = wrap32(int64_t(out2) + x);
    out[2 * k] = static_cast<int16_t>(sat16(rshift_round(out1, 10)));
    y = wrap32(int64_t(in32) - s[3]);
    x = smulwb(y, kSilkResamplerUp2HQ1[0]);
    out1 = wrap32(int64_t(s[3]) + x);
    s[3] = wrap32(int64_t(in32) + x);
    y = wrap32(int64_t(out1) - s[4]);
    x = smulwb(y, kSilkResamplerUp2HQ1[1]);
    out2 = wrap32(int64_t(s[4]) + x);
    s[4] = wrap32(int64_t(out1) + x);
    y = wrap32(int64_t(out2) - s[5]);
    x = smlawb(y, y, kSilkResamplerUp2HQ1[2]);
    out1 = wrap32(int64_t(s[5]) + x);
    s[5] = wrap32(int64_t(out2) + x);
    out[2 * k + 1] = static_cast<int16_t>(sat16(rshift_round(out1, 10)));
  }
}
}  // namespace

void SilkResampler::process(int16_t* out, const int16_t* in, int n_in) {
  // silk_resampler(): route 1 ms through the delay buffer, rest direct
  int n_head = fs_in_khz - input_delay;
  std::memcpy(&delay_buf[input_delay], in, n_head * sizeof(int16_t));
  // IIR_FIR over (delayBuf, 1ms) then (in+n_head, n_in-1ms)
  auto iir_fir = [this](int16_t* dst, const int16_t* src, int len) {
    constexpr int kFirTaps = 8;  // RESAMPLER_ORDER_FIR_12
    int batch = fs_in_khz * 10;  // RESAMPLER_MAX_BATCH_SIZE_MS
    std::vector<int16_t> buf(2 * batch + kFirTaps);
    std::memcpy(buf.data(), fir, kFirTaps * sizeof(int16_t));
    int n_done;
    for (;;) {
      int n = len < batch ? len : batch;
      up2_hq(iir, &buf[kFirTaps], src, n);
      int32_t max_index_q16 = n << 17;  // +1 for the 2x upsampling
      for (int32_t index_q16 = 0; index_q16 < max_index_q16;
           index_q16 += inv_ratio_q16) {
        int32_t table_index = smulwb(index_q16 & 0xFFFF, 12);
        const int16_t* bp = &buf[index_q16 >> 16];
        int32_t res = smulbb(bp[0], kSilkResamplerFracFIR12[table_index][0]);
        res = smlabb(res, bp[1], kSilkResamplerFracFIR12[table_index][1]);
        res = smlabb(res, bp[2], kSilkResamplerFracFIR12[table_index][2]);
        res = smlabb(res, bp[3], kSilkResamplerFracFIR12[table_index][3]);
        res = smlabb(res, bp[4], kSilkResamplerFracFIR12[11 - table_index][3]);
        res = smlabb(res, bp[5], kSilkResamplerFracFIR12[11 - table_index][2]);
        res = smlabb(res, bp[6], kSilkResamplerFracFIR12[11 - table_index][1]);
        res = smlabb(res, bp[7], kSilkResamplerFracFIR12[11 - table_index][0]);
        *dst++ = static_cast<int16_t>(sat16(rshift_round(res, 15)));
      }
      src += n;
      len -= n;
      n_done = n;
      if (len > 0) {
        std::memcpy(buf.data(), &buf[n << 1], kFirTaps * sizeof(int16_t));
      } else {
        break;
      }
    }
    std::memcpy(fir, &buf[n_done << 1], kFirTaps * sizeof(int16_t));
  };
  iir_fir(out, delay_buf, fs_in_khz);
  iir_fir(out + 48, in + n_head, n_in - fs_in_khz);
  std::memcpy(delay_buf, &in[n_in - input_delay], input_delay * sizeof(int16_t));
}

// ---- SilkChannel ----------------------------------------------------------

void SilkChannel::reset() {
  *this = SilkChannel{};
}

void SilkChannel::set_fs(int fs_khz_new) {
  subfr_len = 5 * fs_khz_new;
  int new_frame_len = nb_subfr * subfr_len;
  if (fs_khz != fs_khz_new) resampler.init(fs_khz_new);
  if (fs_khz != fs_khz_new || new_frame_len != frame_len) {
    if (fs_khz_new == 8) {
      pitch_contour_icdf = nb_subfr == 4 ? kSilkPitchContourNBICDF : kSilkPitchContour10msNBICDF;
    } else {
      pitch_contour_icdf = nb_subfr == 4 ? kSilkPitchContourICDF : kSilkPitchContour10msICDF;
    }
    if (fs_khz != fs_khz_new) {
      ltp_mem = 20 * fs_khz_new;
      if (fs_khz_new == 8 || fs_khz_new == 12) {
        lpc_order = 10;
        wb = false;
      } else {
        lpc_order = 16;
        wb = true;
      }
      lag_low_icdf = fs_khz_new == 16 ? kSilkUniform8ICDF
                                      : (fs_khz_new == 12 ? kSilkUniform6ICDF : kSilkUniform4ICDF);
      first_frame_after_reset = true;
      lag_prev = 100;
      last_gain_index = 10;
      prev_signal_type = 0;
      std::memset(out_buf, 0, sizeof out_buf);
      std::memset(slpc_q14, 0, sizeof slpc_q14);
    }
    fs_khz = fs_khz_new;
    frame_len = new_frame_len;
  }
}

void SilkChannel::decode_indices(RangeDec& rd, int frame_idx, bool decode_lbrr,
                                 int cond_coding) {
  constexpr int kCondConditionally = 2;
  constexpr int kCondIndependently = 0;
  const NlsfCB& cb = wb ? kNlsfWB : kNlsfNBMB;
  int ix;
  if (decode_lbrr || vad_flags[frame_idx]) {
    ix = rd.icdf(kSilkTypeOffsetVADICDF, 8) + 2;
  } else {
    ix = rd.icdf(kSilkTypeOffsetNoVADICDF, 8);
  }
  ind.signal_type = static_cast<int8_t>(ix >> 1);
  ind.quant_offset = static_cast<int8_t>(ix & 1);

  if (cond_coding == kCondConditionally) {
    ind.gains[0] = static_cast<int8_t>(rd.icdf(kSilkDeltaGainICDF, 8));
  } else {
    ind.gains[0] = static_cast<int8_t>(rd.icdf(kSilkGainICDF[ind.signal_type], 8) << 3);
    ind.gains[0] = static_cast<int8_t>(ind.gains[0] + rd.icdf(kSilkUniform8ICDF, 8));
  }
  for (int i = 1; i < nb_subfr; i++) {
    ind.gains[i] = static_cast<int8_t>(rd.icdf(kSilkDeltaGainICDF, 8));
  }

  ind.nlsf[0] = static_cast<int8_t>(
      rd.icdf(&cb.cb1_icdf[(ind.signal_type >> 1) * cb.n_vectors], 8));
  int16_t ec_ix[kMaxLpcOrder];
  uint8_t pred_q8[kMaxLpcOrder];
  nlsf_unpack(ec_ix, pred_q8, cb, ind.nlsf[0]);
  for (int i = 0; i < cb.order; i++) {
    ix = rd.icdf(&cb.ec_icdf[ec_ix[i]], 8);
    if (ix == 0) {
      ix -= rd.icdf(kSilkNLSFExtICDF, 8);
    } else if (ix == 2 * kNlsfQuantMaxAmp) {
      ix += rd.icdf(kSilkNLSFExtICDF, 8);
    }
    ind.nlsf[i + 1] = static_cast<int8_t>(ix - kNlsfQuantMaxAmp);
  }

  if (nb_subfr == kMaxNbSubfr) {
    ind.nlsf_interp_q2 = static_cast<int8_t>(rd.icdf(kSilkNLSFInterpICDF, 8));
  } else {
    ind.nlsf_interp_q2 = 4;
  }

  if (ind.signal_type == 2) {  // TYPE_VOICED
    bool absolute = true;
    if (cond_coding == kCondConditionally && ec_prev_signal_type == 2) {
      int delta = rd.icdf(kSilkPitchDeltaICDF, 8);
      if (delta > 0) {
        ind.lag_index = static_cast<int16_t>(ec_prev_lag_index + (delta - 9));
        absolute = false;
      }
    }
    if (absolute) {
      ind.lag_index = static_cast<int16_t>(rd.icdf(kSilkPitchLagICDF, 8) * (fs_khz >> 1));
      ind.lag_index = static_cast<int16_t>(ind.lag_index + rd.icdf(lag_low_icdf, 8));
    }
    ec_prev_lag_index = ind.lag_index;
    ind.contour_index = static_cast<int8_t>(rd.icdf(pitch_contour_icdf, 8));
    ind.per_index = static_cast<int8_t>(rd.icdf(kSilkLTPPerIndexICDF, 8));
    for (int k = 0; k < nb_subfr; k++) {
      ind.ltp_index[k] = static_cast<int8_t>(rd.icdf(kLtpGainICDF[ind.per_index], 8));
    }
    if (cond_coding == kCondIndependently) {
      ind.ltp_scale_index = static_cast<int8_t>(rd.icdf(kSilkLTPScaleICDF, 8));
    } else {
      ind.ltp_scale_index = 0;
    }
  }
  ec_prev_signal_type = ind.signal_type;
  ind.seed = static_cast<int8_t>(rd.icdf(kSilkUniform4ICDF, 8));
}

void SilkChannel::decode_pulses(RangeDec& rd, int32_t* pulses) const {
  constexpr int kShellLen = 16, kMaxPulses = 16, kNRateLevels = 10;
  int rate_level = rd.icdf(kSilkRateLevelsICDF[ind.signal_type >> 1], 8);
  int iter = frame_len >> 4;
  if (iter * kShellLen < frame_len) iter++;  // 10 ms @ 12 kHz → 120 samples
  int sum_pulses[20], n_lshifts[20];
  const uint8_t* cdf = kSilkPulsesPerBlockICDF[rate_level];
  for (int i = 0; i < iter; i++) {
    n_lshifts[i] = 0;
    sum_pulses[i] = rd.icdf(cdf, 8);
    while (sum_pulses[i] == kMaxPulses + 1) {
      n_lshifts[i]++;
      sum_pulses[i] =
          rd.icdf(kSilkPulsesPerBlockICDF[kNRateLevels - 1] + (n_lshifts[i] == 10 ? 1 : 0), 8);
    }
  }
  for (int i = 0; i < iter; i++) {
    int32_t* blk = &pulses[i * kShellLen];
    if (sum_pulses[i] > 0) {
      // shell_coder.c binary-split order over the 16-sample block
      auto split = [&rd](int p, const uint8_t* table, int32_t* c1, int32_t* c2) {
        if (p > 0) {
          *c1 = rd.icdf(&table[kSilkShellCodeOffsets[p]], 8);
          *c2 = p - *c1;
        } else {
          *c1 = *c2 = 0;
        }
      };
      int32_t p3[2], p2[4], p1[8];
      split(sum_pulses[i], kSilkShellCodeTable3, &p3[0], &p3[1]);
      split(static_cast<int>(p3[0]), kSilkShellCodeTable2, &p2[0], &p2[1]);
      split(static_cast<int>(p2[0]), kSilkShellCodeTable1, &p1[0], &p1[1]);
      split(static_cast<int>(p1[0]), kSilkShellCodeTable0, &blk[0], &blk[1]);
      split(static_cast<int>(p1[1]), kSilkShellCodeTable0, &blk[2], &blk[3]);
      split(static_cast<int>(p2[1]), kSilkShellCodeTable1, &p1[2], &p1[3]);
      split(static_cast<int>(p1[2]), kSilkShellCodeTable0, &blk[4], &blk[5]);
      split(static_cast<int>(p1[3]), kSilkShellCodeTable0, &blk[6], &blk[7]);
      split(static_cast<int>(p3[1]), kSilkShellCodeTable2, &p2[2], &p2[3]);
      split(static_cast<int>(p2[2]), kSilkShellCodeTable1, &p1[4], &p1[5]);
      split(static_cast<int>(p1[4]), kSilkShellCodeTable0, &blk[8], &blk[9]);
      split(static_cast<int>(p1[5]), kSilkShellCodeTable0, &blk[10], &blk[11]);
      split(static_cast<int>(p2[3]), kSilkShellCodeTable1, &p1[6], &p1[7]);
      split(static_cast<int>(p1[6]), kSilkShellCodeTable0, &blk[12], &blk[13]);
      split(static_cast<int>(p1[7]), kSilkShellCodeTable0, &blk[14], &blk[15]);
    } else {
      std::memset(blk, 0, kShellLen * sizeof(int32_t));
    }
  }
  for (int i = 0; i < iter; i++) {
    if (n_lshifts[i] > 0) {
      int n_ls = n_lshifts[i];
      int32_t* blk = &pulses[i * kShellLen];
      for (int k = 0; k < kShellLen; k++) {
        int32_t abs_q = blk[k];
        for (int j = 0; j < n_ls; j++) {
          abs_q = wrap32(lshift64(int64_t(abs_q), 1));
          abs_q += rd.icdf(kSilkLsbICDF, 8);
        }
        blk[k] = abs_q;
      }
      sum_pulses[i] |= n_ls << 5;
    }
  }
  // code_signs.c
  int n_blocks = (frame_len + kShellLen / 2) >> 4;
  const uint8_t* sign_base = &kSilkSignICDF[7 * (ind.quant_offset + (ind.signal_type << 1))];
  uint8_t icdf2[2] = {0, 0};
  int32_t* q = pulses;
  for (int i = 0; i < n_blocks; i++) {
    int p = sum_pulses[i];
    if (p > 0) {
      int idx = p & 0x1F;
      icdf2[0] = sign_base[idx < 6 ? idx : 6];
      for (int j = 0; j < kShellLen; j++) {
        if (q[j] > 0 && rd.icdf(icdf2, 8) == 0) q[j] = -q[j];
      }
    }
    q += kShellLen;
  }
}

void SilkChannel::decode_frame(RangeDec& rd, int16_t* out, int cond_coding) {
  constexpr int kCondConditionally = 2;
  int32_t pulses[320 + 16];
  decode_indices(rd, frames_decoded, /*decode_lbrr=*/false, cond_coding);
  decode_pulses(rd, pulses);

  // ---- decode_parameters.c -------------------------------------------
  int32_t gains_q16[kMaxNbSubfr];
  gains_dequant(gains_q16, ind.gains, &last_gain_index,
                cond_coding == kCondConditionally, nb_subfr);
  const NlsfCB& cb = wb ? kNlsfWB : kNlsfNBMB;
  int16_t nlsf_q15[kMaxLpcOrder];
  {
    for (int i = 0; i < cb.order; i++) {
      nlsf_q15[i] = static_cast<int16_t>(static_cast<int32_t>(cb.cb1[ind.nlsf[0] * cb.order + i])
                                         << 7);
    }
    int16_t ec_ix[kMaxLpcOrder];
    uint8_t pred_q8[kMaxLpcOrder];
    nlsf_unpack(ec_ix, pred_q8, cb, ind.nlsf[0]);
    int16_t res_q10[kMaxLpcOrder];
    nlsf_residual_dequant(res_q10, &ind.nlsf[1], pred_q8, cb.quant_step_q16, cb.order);
    int16_t w_qw[kMaxLpcOrder];
    nlsf_weights_laroia(w_qw, nlsf_q15, cb.order);
    for (int i = 0; i < cb.order; i++) {
      int32_t w_q9 = sqrt_approx(static_cast<int32_t>(w_qw[i]) << 16);  // 18 - NLSF_W_Q
      int32_t v = nlsf_q15[i] + lshift32(res_q10[i], 14) / w_q9;
      nlsf_q15[i] = static_cast<int16_t>(v < 0 ? 0 : (v > 32767 ? 32767 : v));
    }
    nlsf_stabilize(nlsf_q15, cb.delta_min, cb.order);
  }
  int16_t pred_coef_q12[2][kMaxLpcOrder];
  nlsf2a(pred_coef_q12[1], nlsf_q15, lpc_order);
  if (first_frame_after_reset) ind.nlsf_interp_q2 = 4;
  if (ind.nlsf_interp_q2 < 4) {
    int16_t nlsf0[kMaxLpcOrder];
    for (int i = 0; i < lpc_order; i++) {
      nlsf0[i] = static_cast<int16_t>(prev_nlsf_q15[i] +
                                      ((ind.nlsf_interp_q2 * (nlsf_q15[i] - prev_nlsf_q15[i])) >> 2));
    }
    nlsf2a(pred_coef_q12[0], nlsf0, lpc_order);
  } else {
    std::memcpy(pred_coef_q12[0], pred_coef_q12[1], lpc_order * sizeof(int16_t));
  }
  std::memcpy(prev_nlsf_q15, nlsf_q15, lpc_order * sizeof(int16_t));

  // decode_parameters.c:82-86 — BWE after packet loss
  if (loss_cnt) {
    bwexpander_16(pred_coef_q12[0], lpc_order, 63570);  // BWE_AFTER_LOSS_Q16
    bwexpander_16(pred_coef_q12[1], lpc_order, 63570);
  }

  int pitch_lags[kMaxNbSubfr] = {};
  int16_t ltp_coef_q14[kMaxNbSubfr * kLtpOrder] = {};
  int32_t ltp_scale_q14 = 0;
  if (ind.signal_type == 2) {
    decode_pitch(ind.lag_index, ind.contour_index, pitch_lags, fs_khz, nb_subfr);
    const int8_t* cbk = kLtpGainVQ[ind.per_index];
    for (int k = 0; k < nb_subfr; k++) {
      for (int i = 0; i < kLtpOrder; i++) {
        ltp_coef_q14[k * kLtpOrder + i] =
            static_cast<int16_t>(lshift32(cbk[ind.ltp_index[k] * kLtpOrder + i], 7));
      }
    }
    ltp_scale_q14 = kSilkLTPScalesQ14[ind.ltp_scale_index];
  }

  // ---- decode_core.c --------------------------------------------------
  int32_t offset_q10 = kSilkQuantOffsetsQ10[ind.signal_type >> 1][ind.quant_offset];
  bool nlsf_interp_flag = ind.nlsf_interp_q2 < 4;
  int32_t rand_seed = ind.seed;
  for (int i = 0; i < frame_len; i++) {
    rand_seed = lcg_rand(rand_seed);
    int32_t e = lshift32(pulses[i], 14);
    if (e > 0) {
      e -= kQuantLevelAdjustQ10 << 4;
    } else if (e < 0) {
      e += kQuantLevelAdjustQ10 << 4;
    }
    e += offset_q10 << 4;
    if (rand_seed < 0) e = -e;
    exc_q14[i] = e;
    rand_seed = wrap32(int64_t(rand_seed) + pulses[i]);
  }

  int32_t slpc[80 + kMaxLpcOrder + 320];  // MAX_SUB_FRAME + order, reused across subframes
  std::memcpy(slpc, slpc_q14, kMaxLpcOrder * sizeof(int32_t));
  int16_t sltp[320];
  int32_t sltp_q15[320 + 320];
  int32_t* pexc = exc_q14;
  int16_t* pxq = out;
  int sltp_buf_idx = ltp_mem;
  int32_t res_q14_buf[80];
  for (int k = 0; k < nb_subfr; k++) {
    int32_t* pres = res_q14_buf;
    const int16_t* a_q12 = pred_coef_q12[k >> 1];
    int16_t* b_q14 = &ltp_coef_q14[k * kLtpOrder];
    int signal_type = ind.signal_type;
    // decode_core.c:128-137 — soften a voiced-PLC → unvoiced edge
    if (loss_cnt && prev_signal_type == 2 && ind.signal_type != 2 && k < kMaxNbSubfr / 2) {
      std::memset(b_q14, 0, kLtpOrder * sizeof(int16_t));
      b_q14[kLtpOrder / 2] = 4096;  // SILK_FIX_CONST(0.25, 14)
      signal_type = 2;
      pitch_lags[k] = lag_prev;
    }
    int32_t gain_q10 = gains_q16[k] >> 6;
    int32_t inv_gain_q31 = inverse32_varq(gains_q16[k], 47);
    int32_t gain_adj_q16 = 1 << 16;
    if (gains_q16[k] != prev_gain_q16) {
      gain_adj_q16 = div32_varq(prev_gain_q16, gains_q16[k], 16);
      for (int i = 0; i < kMaxLpcOrder; i++) slpc[i] = smulww(gain_adj_q16, slpc[i]);
    }
    prev_gain_q16 = gains_q16[k];

    int lag = 0;
    if (signal_type == 2) {
      lag = pitch_lags[k];
      if (k == 0 || (k == 2 && nlsf_interp_flag)) {
        int start_idx = ltp_mem - lag - lpc_order - kLtpOrder / 2;
        if (start_idx <= 0) fail();
        if (k == 2) {
          std::memcpy(&out_buf[ltp_mem], out, 2 * subfr_len * sizeof(int16_t));
        }
        lpc_analysis_filter(&sltp[start_idx], &out_buf[start_idx + k * subfr_len], a_q12,
                            ltp_mem - start_idx, lpc_order);
        int32_t ig = inv_gain_q31;
        if (k == 0) ig = wrap32(lshift64(int64_t(smulwb(inv_gain_q31, ltp_scale_q14)), 2));
        for (int i = 0; i < lag + kLtpOrder / 2; i++) {
          sltp_q15[sltp_buf_idx - i - 1] = smulwb(ig, sltp[ltp_mem - i - 1]);
        }
      } else if (gain_adj_q16 != 1 << 16) {
        for (int i = 0; i < lag + kLtpOrder / 2; i++) {
          sltp_q15[sltp_buf_idx - i - 1] = smulww(gain_adj_q16, sltp_q15[sltp_buf_idx - i - 1]);
        }
      }
    }

    if (signal_type == 2) {
      const int32_t* pred_lag = &sltp_q15[sltp_buf_idx - lag + kLtpOrder / 2];
      for (int i = 0; i < subfr_len; i++) {
        int32_t ltp_pred_q13 = 2;
        ltp_pred_q13 = smlawb(ltp_pred_q13, pred_lag[0], b_q14[0]);
        ltp_pred_q13 = smlawb(ltp_pred_q13, pred_lag[-1], b_q14[1]);
        ltp_pred_q13 = smlawb(ltp_pred_q13, pred_lag[-2], b_q14[2]);
        ltp_pred_q13 = smlawb(ltp_pred_q13, pred_lag[-3], b_q14[3]);
        ltp_pred_q13 = smlawb(ltp_pred_q13, pred_lag[-4], b_q14[4]);
        pred_lag++;
        pres[i] = add_lshift32(pexc[i], ltp_pred_q13, 1);
        sltp_q15[sltp_buf_idx] = wrap32(lshift64(int64_t(pres[i]), 1));
        sltp_buf_idx++;
      }
    } else {
      pres = pexc;
    }

    for (int i = 0; i < subfr_len; i++) {
      int32_t lpc_pred_q10 = lpc_order >> 1;
      for (int j = 0; j < lpc_order; j++) {
        lpc_pred_q10 = smlawb(lpc_pred_q10, slpc[kMaxLpcOrder + i - 1 - j], a_q12[j]);
      }
      slpc[kMaxLpcOrder + i] = add_lshift32(pres[i], lpc_pred_q10, 4);
      pxq[i] = static_cast<int16_t>(
          sat16(rshift_round(smulww(slpc[kMaxLpcOrder + i], gain_q10), 8)));
    }
    std::memmove(slpc, &slpc[subfr_len], kMaxLpcOrder * sizeof(int32_t));
    pexc += subfr_len;
    pxq += subfr_len;
  }
  std::memcpy(slpc_q14, slpc, kMaxLpcOrder * sizeof(int32_t));

  // decode_frame.c epilogue, in reference order: PLC state update,
  // loss-count reset, output-history slide, loss glue, CNG update
  plc_update(pitch_lags, ltp_coef_q14, ltp_scale_q14, pred_coef_q12[1], gains_q16);
  loss_cnt = 0;
  prev_signal_type = ind.signal_type;
  first_frame_after_reset = false;
  int mv_len = ltp_mem - frame_len;
  std::memmove(out_buf, &out_buf[frame_len], mv_len * sizeof(int16_t));
  std::memcpy(&out_buf[mv_len], out, frame_len * sizeof(int16_t));
  plc_glue(out, frame_len);
  cng_run(gains_q16, out, frame_len);
  lag_prev = pitch_lags[nb_subfr - 1];
}

// silk/PLC.c silk_PLC_update: remember concealment parameters
void SilkChannel::plc_update(const int pitch_lags[], const int16_t ltp_coef[],
                             int32_t ltp_scale_q14, const int16_t pred1_q12[],
                             const int32_t gains_q16[]) {
  if (fs_khz != plc.fs_khz) {
    plc.pitch_l_q8 = lshift32(frame_len, 7);
    plc.prev_gain_q16[0] = plc.prev_gain_q16[1] = 65536;
    plc.subfr_length = 20;
    plc.nb_subfr = 2;
    plc.fs_khz = fs_khz;
  }
  prev_signal_type = ind.signal_type;
  int32_t ltp_gain = 0;
  if (ind.signal_type == 2) {
    for (int j = 0; j * subfr_len < pitch_lags[nb_subfr - 1]; j++) {
      if (j == nb_subfr) break;
      int32_t tmp = 0;
      for (int i = 0; i < kLtpOrder; i++) {
        tmp += ltp_coef[(nb_subfr - 1 - j) * kLtpOrder + i];
      }
      if (tmp > ltp_gain) {
        ltp_gain = tmp;
        std::memcpy(plc.ltp_coef_q14, &ltp_coef[(nb_subfr - 1 - j) * kLtpOrder],
                    kLtpOrder * sizeof(int16_t));
        plc.pitch_l_q8 = lshift32(pitch_lags[nb_subfr - 1 - j], 8);
      }
    }
    std::memset(plc.ltp_coef_q14, 0, kLtpOrder * sizeof(int16_t));
    plc.ltp_coef_q14[kLtpOrder / 2] = static_cast<int16_t>(ltp_gain);
    if (ltp_gain < 11469) {  // V_PITCH_GAIN_START_MIN_Q14
      int32_t scale_q10 = (11469 << 10) / (ltp_gain > 1 ? ltp_gain : 1);
      for (int i = 0; i < kLtpOrder; i++) {
        plc.ltp_coef_q14[i] =
            static_cast<int16_t>(smulbb(plc.ltp_coef_q14[i], scale_q10) >> 10);
      }
    } else if (ltp_gain > 15565) {  // V_PITCH_GAIN_START_MAX_Q14
      int32_t scale_q14 = (15565 << 14) / (ltp_gain > 1 ? ltp_gain : 1);
      for (int i = 0; i < kLtpOrder; i++) {
        plc.ltp_coef_q14[i] =
            static_cast<int16_t>(smulbb(plc.ltp_coef_q14[i], scale_q14) >> 14);
      }
    }
  } else {
    plc.pitch_l_q8 = lshift32(smulbb(fs_khz, 18), 8);
    std::memset(plc.ltp_coef_q14, 0, kLtpOrder * sizeof(int16_t));
  }
  std::memcpy(plc.prev_lpc_q12, pred1_q12, lpc_order * sizeof(int16_t));
  plc.prev_ltp_scale_q14 = static_cast<int16_t>(ltp_scale_q14);
  std::memcpy(plc.prev_gain_q16, &gains_q16[nb_subfr - 2], 2 * sizeof(int32_t));
  plc.subfr_length = subfr_len;
  plc.nb_subfr = nb_subfr;
}

// silk/PLC.c silk_PLC_glue_frames: fade in the first good frame
void SilkChannel::plc_glue(int16_t* frame, int length) {
  if (loss_cnt) {
    sum_sqr_shift(&plc.conc_energy, &plc.conc_energy_shift, frame, length);
    plc.last_frame_lost = 1;
  } else {
    if (plc.last_frame_lost) {
      int32_t energy;
      int energy_shift;
      sum_sqr_shift(&energy, &energy_shift, frame, length);
      if (energy_shift > plc.conc_energy_shift) {
        plc.conc_energy >>= (energy_shift - plc.conc_energy_shift);
      } else if (energy_shift < plc.conc_energy_shift) {
        energy >>= (plc.conc_energy_shift - energy_shift);
      }
      if (energy > plc.conc_energy) {
        int lz = clz32(static_cast<uint32_t>(plc.conc_energy)) - 1;
        plc.conc_energy = lshift32(plc.conc_energy, lz);
        int sh = 24 - lz;
        energy >>= (sh > 0 ? sh : 0);
        int32_t frac_q24 = plc.conc_energy / (energy > 1 ? energy : 1);
        int32_t gain_q16 = lshift32(sqrt_approx(frac_q24), 4);
        int32_t slope_q16 = ((1 << 16) - gain_q16) / length;
        slope_q16 = lshift32(slope_q16, 2);
        for (int i = 0; i < length; i++) {
          frame[i] = static_cast<int16_t>(smulwb(gain_q16, frame[i]));
          gain_q16 += slope_q16;
          if (gain_q16 > 1 << 16) break;
        }
      }
    }
    plc.last_frame_lost = 0;
  }
}

// silk/CNG.c: estimate during silence, synthesize during loss/DTX
void SilkChannel::cng_run(const int32_t gains_q16[], int16_t* frame, int length) {
  if (fs_khz != cng.fs_khz) {
    int32_t step = 32767 / (lpc_order + 1);
    int32_t acc = 0;
    for (int i = 0; i < lpc_order; i++) {
      acc += step;
      cng.smth_nlsf_q15[i] = static_cast<int16_t>(acc);
    }
    cng.smth_gain_q16 = 0;
    cng.rand_seed = 3176576;
    cng.fs_khz = fs_khz;
  }
  if (loss_cnt == 0 && prev_signal_type == 0) {
    for (int i = 0; i < lpc_order; i++) {
      cng.smth_nlsf_q15[i] = static_cast<int16_t>(
          cng.smth_nlsf_q15[i] +
          smulwb(static_cast<int32_t>(prev_nlsf_q15[i]) - cng.smth_nlsf_q15[i], 16348));
    }
    int32_t max_gain = 0;
    int subfr = 0;
    for (int i = 0; i < nb_subfr; i++) {
      if (gains_q16[i] > max_gain) {
        max_gain = gains_q16[i];
        subfr = i;
      }
    }
    std::memmove(&cng.exc_buf_q14[subfr_len], cng.exc_buf_q14,
                 (nb_subfr - 1) * subfr_len * sizeof(int32_t));
    std::memcpy(cng.exc_buf_q14, &exc_q14[subfr * subfr_len], subfr_len * sizeof(int32_t));
    for (int i = 0; i < nb_subfr; i++) {
      cng.smth_gain_q16 =
          wrap32(int64_t(cng.smth_gain_q16) + smulwb(gains_q16[i] - cng.smth_gain_q16, 4634));
    }
  }
  if (loss_cnt) {
    int32_t sig_q10[320 + kMaxLpcOrder];
    int exc_mask = 255;  // CNG_BUF_MASK_MAX
    while (exc_mask > length) exc_mask >>= 1;
    int32_t seed = cng.rand_seed;
    for (int i = 0; i < length; i++) {
      seed = lcg_rand(seed);
      int idx = (seed >> 24) & exc_mask;
      sig_q10[kMaxLpcOrder + i] = static_cast<int16_t>(
          sat16(smulww(cng.exc_buf_q14[idx], cng.smth_gain_q16 >> 4)));
    }
    cng.rand_seed = seed;
    int16_t a_q12[kMaxLpcOrder];
    nlsf2a(a_q12, cng.smth_nlsf_q15, lpc_order);
    std::memcpy(sig_q10, cng.synth_state, kMaxLpcOrder * sizeof(int32_t));
    for (int i = 0; i < length; i++) {
      int32_t sum_q6 = lpc_order >> 1;
      for (int j = 0; j < lpc_order; j++) {
        sum_q6 = smlawb(sum_q6, sig_q10[kMaxLpcOrder + i - 1 - j], a_q12[j]);
      }
      sig_q10[kMaxLpcOrder + i] = add_lshift32(sig_q10[kMaxLpcOrder + i], sum_q6, 4);
      frame[i] = static_cast<int16_t>(sat16(frame[i] + rshift_round(sum_q6, 6)));
    }
    std::memcpy(cng.synth_state, &sig_q10[length], kMaxLpcOrder * sizeof(int32_t));
  } else {
    std::memset(cng.synth_state, 0, lpc_order * sizeof(int32_t));
  }
}

// silk/PLC.c silk_PLC_conceal + the lost branch of silk_decode_frame
void SilkChannel::decode_frame_lost(int16_t* out) {
  static const int16_t kHarmAtt[2] = {32440, 31130};
  static const int16_t kRandAttV[2] = {31130, 26214};
  static const int16_t kRandAttUV[2] = {32440, 29491};
  if (fs_khz != plc.fs_khz) {
    plc.pitch_l_q8 = lshift32(frame_len, 7);
    plc.prev_gain_q16[0] = plc.prev_gain_q16[1] = 65536;
    plc.subfr_length = 20;
    plc.nb_subfr = 2;
    plc.fs_khz = fs_khz;
  }
  int32_t prev_gain_q10[2] = {plc.prev_gain_q16[0] >> 6, plc.prev_gain_q16[1] >> 6};
  if (first_frame_after_reset) std::memset(plc.prev_lpc_q12, 0, sizeof plc.prev_lpc_q12);

  int16_t exc_buf[2 * 80];
  for (int k = 0; k < 2; k++) {
    for (int i = 0; i < plc.subfr_length; i++) {
      exc_buf[k * plc.subfr_length + i] = static_cast<int16_t>(sat16(
          smulww(exc_q14[i + (k + plc.nb_subfr - 2) * plc.subfr_length], prev_gain_q10[k]) >>
          8));
    }
  }
  int32_t energy1, energy2;
  int shift1, shift2;
  sum_sqr_shift(&energy1, &shift1, exc_buf, plc.subfr_length);
  sum_sqr_shift(&energy2, &shift2, &exc_buf[plc.subfr_length], plc.subfr_length);
  const int32_t* rand_ptr;
  if ((energy1 >> shift2) < (energy2 >> shift1)) {
    int base = (plc.nb_subfr - 1) * plc.subfr_length - 128;
    rand_ptr = &exc_q14[base > 0 ? base : 0];
  } else {
    int base = plc.nb_subfr * plc.subfr_length - 128;
    rand_ptr = &exc_q14[base > 0 ? base : 0];
  }

  int16_t* b_q14 = plc.ltp_coef_q14;
  int16_t rand_scale_q14 = plc.rand_scale_q14;
  int att = loss_cnt < 1 ? loss_cnt : 1;
  int32_t harm_gain_q15 = kHarmAtt[att];
  int32_t rand_gain_q15 = prev_signal_type == 2 ? kRandAttV[att] : kRandAttUV[att];
  bwexpander_16(plc.prev_lpc_q12, lpc_order, 64881);  // SILK_FIX_CONST(0.99, 16)
  int16_t a_q12[kMaxLpcOrder];
  std::memcpy(a_q12, plc.prev_lpc_q12, lpc_order * sizeof(int16_t));

  if (loss_cnt == 0) {
    rand_scale_q14 = 1 << 14;
    if (prev_signal_type == 2) {
      for (int i = 0; i < kLtpOrder; i++) rand_scale_q14 -= b_q14[i];
      if (rand_scale_q14 < 3277) rand_scale_q14 = 3277;
      rand_scale_q14 =
          static_cast<int16_t>(smulbb(rand_scale_q14, plc.prev_ltp_scale_q14) >> 14);
    } else {
      int32_t inv_gain_q30 = lpc_inverse_pred_gain(plc.prev_lpc_q12, lpc_order);
      int32_t down_q30 = inv_gain_q30 < (1 << 27) ? inv_gain_q30 : (1 << 27);
      if (down_q30 < (1 << 22)) down_q30 = 1 << 22;
      down_q30 = lshift32(down_q30, 3);
      rand_gain_q15 = smulwb(down_q30, rand_gain_q15) >> 14;
    }
  }

  int32_t rand_seed = plc.rand_seed;
  int lag = rshift_round(plc.pitch_l_q8, 8);
  int sltp_buf_idx = ltp_mem;
  int idx = ltp_mem - lag - lpc_order - kLtpOrder / 2;
  if (idx <= 0) fail();
  int16_t sltp[320];
  int32_t sltp_q14[320 + 320];
  lpc_analysis_filter(&sltp[idx], &out_buf[idx], a_q12, ltp_mem - idx, lpc_order);
  int32_t inv_gain_q30 = inverse32_varq(plc.prev_gain_q16[1], 46);
  if (inv_gain_q30 > (INT32_MAX >> 1)) inv_gain_q30 = INT32_MAX >> 1;
  for (int i = idx + lpc_order; i < ltp_mem; i++) {
    sltp_q14[i] = smulwb(inv_gain_q30, sltp[i]);
  }
  for (int k = 0; k < nb_subfr; k++) {
    const int32_t* pred_lag = &sltp_q14[sltp_buf_idx - lag + kLtpOrder / 2];
    for (int i = 0; i < subfr_len; i++) {
      int32_t ltp_pred_q12 = 2;
      ltp_pred_q12 = smlawb(ltp_pred_q12, pred_lag[0], b_q14[0]);
      ltp_pred_q12 = smlawb(ltp_pred_q12, pred_lag[-1], b_q14[1]);
      ltp_pred_q12 = smlawb(ltp_pred_q12, pred_lag[-2], b_q14[2]);
      ltp_pred_q12 = smlawb(ltp_pred_q12, pred_lag[-3], b_q14[3]);
      ltp_pred_q12 = smlawb(ltp_pred_q12, pred_lag[-4], b_q14[4]);
      pred_lag++;
      rand_seed = lcg_rand(rand_seed);
      int ridx = (rand_seed >> 25) & 127;
      sltp_q14[sltp_buf_idx] = lshift32(smlawb(ltp_pred_q12, rand_ptr[ridx], rand_scale_q14), 2);
      sltp_buf_idx++;
    }
    for (int j = 0; j < kLtpOrder; j++) {
      b_q14[j] = static_cast<int16_t>(smulbb(harm_gain_q15, b_q14[j]) >> 15);
    }
    rand_scale_q14 = static_cast<int16_t>(smulbb(rand_scale_q14, rand_gain_q15) >> 15);
    plc.pitch_l_q8 = smlawb(plc.pitch_l_q8, plc.pitch_l_q8, 655);  // PITCH_DRIFT_FAC_Q16
    int32_t max_lag_q8 = lshift32(smulbb(18, fs_khz), 8);
    if (plc.pitch_l_q8 > max_lag_q8) plc.pitch_l_q8 = max_lag_q8;
    lag = rshift_round(plc.pitch_l_q8, 8);
  }

  int32_t* slpc_ptr = &sltp_q14[ltp_mem - kMaxLpcOrder];
  std::memcpy(slpc_ptr, slpc_q14, kMaxLpcOrder * sizeof(int32_t));
  for (int i = 0; i < frame_len; i++) {
    int32_t lpc_pred_q10 = lpc_order >> 1;
    for (int j = 0; j < lpc_order; j++) {
      lpc_pred_q10 = smlawb(lpc_pred_q10, slpc_ptr[kMaxLpcOrder + i - 1 - j], a_q12[j]);
    }
    slpc_ptr[kMaxLpcOrder + i] = add_lshift32(slpc_ptr[kMaxLpcOrder + i], lpc_pred_q10, 4);
    out[i] = static_cast<int16_t>(
        sat16(rshift_round(smulww(slpc_ptr[kMaxLpcOrder + i], prev_gain_q10[1]), 8)));
  }
  std::memcpy(slpc_q14, &slpc_ptr[frame_len], kMaxLpcOrder * sizeof(int32_t));
  plc.rand_seed = rand_seed;
  plc.rand_scale_q14 = rand_scale_q14;
  loss_cnt++;

  // silk_decode_frame epilogue for the lost branch
  int mv_len = ltp_mem - frame_len;
  std::memmove(out_buf, &out_buf[frame_len], mv_len * sizeof(int16_t));
  std::memcpy(&out_buf[mv_len], out, frame_len * sizeof(int16_t));
  plc_glue(out, frame_len);
  int32_t dummy_gains[kMaxNbSubfr] = {};
  cng_run(dummy_gains, out, frame_len);
  lag_prev = lag;
}

// ---- SilkDecoder (dec_API.c) ----------------------------------------------

void SilkDecoder::reset() {
  ch[0].reset();
  ch[1].reset();
  n_channels_internal = 0;
  stereo_pred_prev_q13[0] = stereo_pred_prev_q13[1] = 0;
  stereo_smid[0] = stereo_smid[1] = 0;
  stereo_sside[0] = stereo_sside[1] = 0;
  prev_decode_only_middle = 0;
}

namespace {
void stereo_decode_pred(RangeDec& rd, int32_t pred_q13[2]) {
  int ix[2][3];
  int n = rd.icdf(kSilkStereoPredJointICDF, 8);
  ix[0][2] = n / 5;
  ix[1][2] = n - 5 * ix[0][2];
  for (n = 0; n < 2; n++) {
    ix[n][0] = rd.icdf(kSilkUniform3ICDF, 8);
    ix[n][1] = rd.icdf(kSilkUniform5ICDF, 8);
  }
  for (n = 0; n < 2; n++) {
    ix[n][0] += 3 * ix[n][2];
    int32_t low_q13 = kSilkStereoPredQuantQ13[ix[n][0]];
    // SILK_FIX_CONST(0.5/STEREO_QUANT_SUB_STEPS=0.1, 16) = 6554
    int32_t step_q13 = smulwb(kSilkStereoPredQuantQ13[ix[n][0] + 1] - low_q13, 6554);
    pred_q13[n] = smlabb(low_q13, step_q13, 2 * ix[n][1] + 1);
  }
  pred_q13[0] -= pred_q13[1];
}

// stereo_MS_to_LR.c; x1/x2 carry 2 leading history samples
void stereo_ms_to_lr(int16_t* pred_prev_q13, int16_t* smid, int16_t* sside, int16_t* x1,
                     int16_t* x2, const int32_t pred_q13[2], int fs_khz, int frame_len) {
  std::memcpy(x1, smid, 2 * sizeof(int16_t));
  std::memcpy(x2, sside, 2 * sizeof(int16_t));
  std::memcpy(smid, &x1[frame_len], 2 * sizeof(int16_t));
  std::memcpy(sside, &x2[frame_len], 2 * sizeof(int16_t));
  int32_t pred0 = pred_prev_q13[0], pred1 = pred_prev_q13[1];
  int interp_len = 8 * fs_khz;  // STEREO_INTERP_LEN_MS
  int32_t denom_q16 = (1 << 16) / interp_len;
  int32_t delta0 = rshift_round(smulbb(pred_q13[0] - pred_prev_q13[0], denom_q16), 16);
  int32_t delta1 = rshift_round(smulbb(pred_q13[1] - pred_prev_q13[1], denom_q16), 16);
  for (int n = 0; n < interp_len; n++) {
    pred0 += delta0;
    pred1 += delta1;
    int32_t sum = wrap32(lshift64(int64_t(add_lshift32(x1[n] + x1[n + 2], x1[n + 1], 1)), 9));
    sum = smlawb(wrap32(lshift64(int64_t(x2[n + 1]), 8)), sum, pred0);
    sum = smlawb(sum, wrap32(lshift64(int64_t(x1[n + 1]), 11)), pred1);
    x2[n + 1] = static_cast<int16_t>(sat16(rshift_round(sum, 8)));
  }
  pred0 = pred_q13[0];
  pred1 = pred_q13[1];
  for (int n = interp_len; n < frame_len; n++) {
    int32_t sum = wrap32(lshift64(int64_t(add_lshift32(x1[n] + x1[n + 2], x1[n + 1], 1)), 9));
    sum = smlawb(wrap32(lshift64(int64_t(x2[n + 1]), 8)), sum, pred0);
    sum = smlawb(sum, wrap32(lshift64(int64_t(x1[n + 1]), 11)), pred1);
    x2[n + 1] = static_cast<int16_t>(sat16(rshift_round(sum, 8)));
  }
  pred_prev_q13[0] = static_cast<int16_t>(pred_q13[0]);
  pred_prev_q13[1] = static_cast<int16_t>(pred_q13[1]);
  for (int n = 0; n < frame_len; n++) {
    int32_t sum = x1[n + 1] + static_cast<int32_t>(x2[n + 1]);
    int32_t diff = x1[n + 1] - static_cast<int32_t>(x2[n + 1]);
    x1[n + 1] = static_cast<int16_t>(sat16(sum));
    x2[n + 1] = static_cast<int16_t>(sat16(diff));
  }
}
}  // namespace

int SilkDecoder::decode(RangeDec& rd, int channels, int duration_ms, Bandwidth bw,
                        int16_t* out, int out_channels) {
  constexpr int kCondIndependently = 0, kCondIndependentlyNoLtpScaling = 1,
                kCondConditionally = 2;
  if (channels < 1 || channels > 2) fail();
  int fs_khz = bw == kBwNB ? 8 : (bw == kBwMB ? 12 : 16);
  int n_frames, nb_subfr;
  if (duration_ms == 10) {
    n_frames = 1;
    nb_subfr = 2;
  } else if (duration_ms == 20) {
    n_frames = 1;
    nb_subfr = 4;
  } else if (duration_ms == 40) {
    n_frames = 2;
    nb_subfr = 4;
  } else if (duration_ms == 60) {
    n_frames = 3;
    nb_subfr = 4;
  } else {
    fail();
  }

  // Mono → stereo transition: reset the new side channel (dec_API.c:116)
  if (channels > n_channels_internal && n_channels_internal > 0) ch[1].reset();
  bool stereo_to_mono = channels == 1 && n_channels_internal == 2 &&
                        fs_khz == ch[0].fs_khz;
  for (int n = 0; n < channels; n++) {
    ch[n].frames_decoded = 0;
    ch[n].frames_per_packet = n_frames;
    ch[n].nb_subfr = nb_subfr;
    ch[n].set_fs(fs_khz);
  }
  if (out_channels == 2 && channels == 2 && n_channels_internal <= 1) {
    stereo_pred_prev_q13[0] = stereo_pred_prev_q13[1] = 0;
    stereo_sside[0] = stereo_sside[1] = 0;
    ch[1].resampler = ch[0].resampler;
  }
  n_channels_internal = channels;

  // Header: VAD + LBRR flags (dec_API.c:175-195)
  for (int n = 0; n < channels; n++) {
    for (int i = 0; i < n_frames; i++) ch[n].vad_flags[i] = rd.bit_logp(1) != 0;
    ch[n].lbrr_present = rd.bit_logp(1) != 0;
    std::memset(ch[n].lbrr_flags, 0, sizeof ch[n].lbrr_flags);
  }
  for (int n = 0; n < channels; n++) {
    if (ch[n].lbrr_present) {
      if (n_frames == 1) {
        ch[n].lbrr_flags[0] = true;
      } else {
        int sym = rd.icdf(n_frames == 2 ? kSilkLBRR2FlagsICDF : kSilkLBRR3FlagsICDF, 8) + 1;
        for (int i = 0; i < n_frames; i++) ch[n].lbrr_flags[i] = ((sym >> i) & 1) != 0;
      }
    }
  }
  // Skip-decode LBRR frames (regular decode never synthesizes them)
  for (int i = 0; i < n_frames; i++) {
    for (int n = 0; n < channels; n++) {
      if (!ch[n].lbrr_flags[i]) continue;
      int32_t dummy_pulses[320 + 16];
      if (channels == 2 && n == 0) {
        int32_t dummy_pred[2];
        stereo_decode_pred(rd, dummy_pred);
        if (!ch[1].lbrr_flags[i]) rd.icdf(kSilkStereoOnlyMidICDF, 8);
      }
      int cond = (i > 0 && ch[n].lbrr_flags[i - 1]) ? kCondConditionally : kCondIndependently;
      ch[n].decode_indices(rd, i, /*decode_lbrr=*/true, cond);
      ch[n].decode_pulses(rd, dummy_pulses);
    }
  }

  int frame_len = ch[0].frame_len;
  int out_per_frame = frame_len * 48 / fs_khz;
  int decode_only_middle = 0;

  for (int f = 0; f < n_frames; f++) {
    int32_t ms_pred_q13[2] = {0, 0};
    if (channels == 2) {
      stereo_decode_pred(rd, ms_pred_q13);
      if (ch[1].vad_flags[f] == 0) {
        decode_only_middle = rd.icdf(kSilkStereoOnlyMidICDF, 8);
      } else {
        decode_only_middle = 0;
      }
      if (decode_only_middle == 0 && prev_decode_only_middle == 1) {
        std::memset(ch[1].out_buf, 0, sizeof ch[1].out_buf);
        std::memset(ch[1].slpc_q14, 0, sizeof ch[1].slpc_q14);
        ch[1].lag_prev = 100;
        ch[1].last_gain_index = 10;
        ch[1].prev_signal_type = 0;
        ch[1].first_frame_after_reset = true;
      }
    }

    int16_t tmp[2][320 + 2];
    bool has_side = !decode_only_middle;
    for (int n = 0; n < channels; n++) {
      if (n == 0 || has_side) {
        int frame_index = ch[0].frames_decoded - n;
        int cond;
        if (frame_index <= 0) {
          cond = kCondIndependently;
        } else if (n > 0 && prev_decode_only_middle) {
          cond = kCondIndependentlyNoLtpScaling;
        } else {
          cond = kCondConditionally;
        }
        ch[n].decode_frame(rd, &tmp[n][2], cond);
      } else {
        std::memset(&tmp[n][2], 0, frame_len * sizeof(int16_t));
      }
      ch[n].frames_decoded++;
    }

    if (out_channels == 2 && channels == 2) {
      stereo_ms_to_lr(stereo_pred_prev_q13, stereo_smid, stereo_sside, tmp[0], tmp[1],
                      ms_pred_q13, fs_khz, frame_len);
    } else {
      std::memcpy(tmp[0], stereo_smid, 2 * sizeof(int16_t));
      std::memcpy(stereo_smid, &tmp[0][frame_len], 2 * sizeof(int16_t));
    }

    int16_t resampled[2][960];
    int n_out = channels < out_channels ? channels : out_channels;
    for (int n = 0; n < n_out; n++) {
      ch[n].resampler.process(resampled[n], &tmp[n][1], frame_len);
    }
    if (out_channels == 2 && channels == 1) {
      if (stereo_to_mono) {
        ch[1].resampler.process(resampled[1], &tmp[0][1], frame_len);
      } else {
        std::memcpy(resampled[1], resampled[0], out_per_frame * sizeof(int16_t));
      }
    }
    int16_t* dst = out + f * out_per_frame * out_channels;
    if (out_channels == 2) {
      for (int i = 0; i < out_per_frame; i++) {
        dst[2 * i] = resampled[0][i];
        dst[2 * i + 1] = resampled[1][i];
      }
    } else {
      std::memcpy(dst, resampled[0], out_per_frame * sizeof(int16_t));
    }
    prev_decode_only_middle = decode_only_middle;
  }
  return n_frames * out_per_frame;
}

int SilkDecoder::decode_lost(int duration_ms, int16_t* out, int out_channels) {
  // dec_API.c with lostFlag == FLAG_PACKET_LOST: conceal one frame per
  // channel at the carried fs/channel layout, unmix, resample.
  int channels = n_channels_internal > 0 ? n_channels_internal : 1;
  int nb_subfr = duration_ms == 10 ? 2 : 4;
  for (int n = 0; n < channels; n++) {
    if (ch[n].fs_khz == 0) ch[n].set_fs(16);  // never decoded: arbitrary but defined
    ch[n].nb_subfr = nb_subfr;
    ch[n].frames_per_packet = 1;
    ch[n].set_fs(ch[n].fs_khz);
  }
  n_channels_internal = channels;
  int fs_khz = ch[0].fs_khz;
  int frame_len = ch[0].frame_len;
  int out_per_frame = frame_len * 48 / fs_khz;
  int32_t ms_pred_q13[2] = {stereo_pred_prev_q13[0], stereo_pred_prev_q13[1]};
  bool has_side = !prev_decode_only_middle;

  int16_t tmp[2][320 + 2];
  for (int n = 0; n < channels; n++) {
    if (n == 0 || has_side) {
      ch[n].decode_frame_lost(&tmp[n][2]);
    } else {
      std::memset(&tmp[n][2], 0, frame_len * sizeof(int16_t));
    }
    ch[n].frames_decoded++;
  }
  if (out_channels == 2 && channels == 2) {
    stereo_ms_to_lr(stereo_pred_prev_q13, stereo_smid, stereo_sside, tmp[0], tmp[1],
                    ms_pred_q13, fs_khz, frame_len);
  } else {
    std::memcpy(tmp[0], stereo_smid, 2 * sizeof(int16_t));
    std::memcpy(stereo_smid, &tmp[0][frame_len], 2 * sizeof(int16_t));
  }
  int16_t resampled[2][960];
  int n_out = channels < out_channels ? channels : out_channels;
  for (int n = 0; n < n_out; n++) {
    ch[n].resampler.process(resampled[n], &tmp[n][1], frame_len);
  }
  if (out_channels == 2 && channels == 1) {
    std::memcpy(resampled[1], resampled[0], out_per_frame * sizeof(int16_t));
  }
  if (out_channels == 2) {
    for (int i = 0; i < out_per_frame; i++) {
      out[2 * i] = resampled[0][i];
      out[2 * i + 1] = resampled[1][i];
    }
  } else {
    std::memcpy(out, resampled[0], out_per_frame * sizeof(int16_t));
  }
  for (int n = 0; n < channels; n++) ch[n].last_gain_index = 10;
  return out_per_frame;
}

}  // namespace zop
