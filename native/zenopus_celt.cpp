// zenopus_celt.cpp — from-scratch CELT decoder (RFC 6716 §4.3).
//
// CELT is the MDCT layer of Opus: coarse/fine band energies, PVQ band
// shapes with recursive splitting, transient handling, spreading
// rotations, anti-collapse, the pitch post-filter and de-emphasis.
// The bit-allocation and all bitstream-facing integer computations are
// normative and mirrored exactly (celt/rate.c, bands.c, cwrs.c,
// quant_bands.c, laplace.c semantics); the signal path follows the
// float build's arithmetic (celt/arch.h float macros are plain float
// ops), so output matches the reference float decoder to float
// precision — validated against the test-time-compiled libopus oracle
// (tests/test_opus.py).  The 48 kHz/960 static mode constants live in
// zenopus_tables.h (GENERATED; see scripts/gen_opus_tables.py).
//
// The inverse MDCT keeps the reference's pre-rotate / complex IFFT /
// post-rotate / TDAC-mirror structure (celt/mdct.c:275-380) with the
// mode's twiddle table, but runs the inner complex IFFT as a direct
// double-precision transform instead of rebuilding kiss_fft — same
// math, tighter rounding, no vendored scheduling.

#include "zenopus.h"
#include "zenopus_tables.h"

#include <algorithm>
#include <cmath>

namespace zop {

const float* celt_mode_window() { return kCeltWindow120; }

namespace {

constexpr int kNbEBands = 21;
constexpr int kOverlap = 120;
constexpr int kShortMdct = 120;
constexpr int kMaxLM = 3;
constexpr int kDecodeBufferSize = 2048;
constexpr int kBitRes = 3;
constexpr int kCombMinPeriod = 15;
constexpr float kPi = 3.141592653f;

// float build elementary functions (celt/mathops.h:84-137, FLOAT_APPROX
// off).  NB: C promotes the float args to double for sqrt/cos/exp; the
// C++ float overloads (sqrtf/cosf) differ by an ulp, so promote
// explicitly to stay bit-identical with the reference build.
inline float celt_sqrt(float x) { return static_cast<float>(std::sqrt(static_cast<double>(x))); }
inline float celt_rsqrt(float x) { return 1.f / celt_sqrt(x); }
inline float celt_exp2(float x) { return static_cast<float>(std::exp(0.6931471805599453094 * x)); }
inline float celt_cos_norm(float x) {
  return static_cast<float>(std::cos(static_cast<double>((.5f * kPi) * x)));
}

inline uint32_t celt_lcg(uint32_t seed) { return 1664525u * seed + 1013904223u; }
inline int imin(int a, int b) { return a < b ? a : b; }
inline int imax(int a, int b) { return a > b ? a : b; }
inline int32_t frac_mul16(int32_t a, int32_t b) {
  return (16384 + static_cast<int32_t>(static_cast<int16_t>(a)) * static_cast<int16_t>(b)) >> 15;
}
inline int ec_ilog(uint32_t v) { return v ? 32 - clz32(v) : 0; }

// mathops.c isqrt32: largest g with g*g <= val
unsigned isqrt32(uint32_t val) {
  unsigned g = 0;
  int bshift = (ec_ilog(val) - 1) >> 1;
  unsigned b = 1u << bshift;
  do {
    uint32_t t = ((static_cast<uint32_t>(g) << 1) + b) << bshift;
    if (t <= val) {
      g += b;
      val -= t;
    }
    b >>= 1;
    bshift--;
  } while (bshift >= 0);
  return g;
}

// bands.c:46-59
int16_t bitexact_cos(int16_t x) {
  int32_t tmp = (4096 + static_cast<int32_t>(x) * x) >> 13;
  int16_t x2 = static_cast<int16_t>(tmp);
  x2 = static_cast<int16_t>(
      (32767 - x2) + frac_mul16(x2, -7651 + frac_mul16(x2, 8277 + frac_mul16(-626, x2))));
  return static_cast<int16_t>(1 + x2);
}

int bitexact_log2tan(int isin, int icos) {
  int lc = ec_ilog(static_cast<uint32_t>(icos));
  int ls = ec_ilog(static_cast<uint32_t>(isin));
  icos <<= 15 - lc;
  isin <<= 15 - ls;
  return (ls - lc) * (1 << 11) + frac_mul16(isin, frac_mul16(isin, -2597) + 7932) -
         frac_mul16(icos, frac_mul16(icos, -2597) + 7932);
}

// eMeans: mean band energy, Q4-quantized then floated (quant_bands.c:44-58)
const int8_t kEMeansQ4[25] = {103, 100, 92, 85, 81, 77, 72, 70, 78, 75, 73, 71, 78,
                              74, 69, 72, 70, 74, 76, 71, 60, 60, 60, 60, 60};

// quant_bands.c:63-65 (float forms)
const float kPredCoef[4] = {29440.f / 32768.f, 26112.f / 32768.f, 21248.f / 32768.f,
                            16384.f / 32768.f};
const float kBetaCoef[4] = {30147.f / 32768.f, 22282.f / 32768.f, 12124.f / 32768.f,
                            6554.f / 32768.f};
const float kBetaIntra = 4915.f / 32768.f;

// ---- rate / allocation (rate.h + rate.c, exact integer math) ---------------

int bits2pulses(int band, int LM, int bits) {
  LM++;
  const uint8_t* cache = kCeltCacheBits + kCeltCacheIndex[LM * kNbEBands + band];
  int lo = 0, hi = cache[0];
  bits--;
  for (int i = 0; i < 6; i++) {  // LOG_MAX_PSEUDO
    int mid = (lo + hi + 1) >> 1;
    if (static_cast<int>(cache[mid]) >= bits) {
      hi = mid;
    } else {
      lo = mid;
    }
  }
  if (bits - (lo == 0 ? -1 : static_cast<int>(cache[lo])) <= static_cast<int>(cache[hi]) - bits) {
    return lo;
  }
  return hi;
}

int pulses2bits(int band, int LM, int pulses) {
  LM++;
  const uint8_t* cache = kCeltCacheBits + kCeltCacheIndex[LM * kNbEBands + band];
  return pulses == 0 ? 0 : cache[pulses] + 1;
}

inline int get_pulses(int i) { return i < 8 ? i : (8 + (i & 7)) << ((i >> 3) - 1); }

void init_caps(int* cap, int LM, int C) {
  for (int i = 0; i < kNbEBands; i++) {
    int N = (kCeltEBands5ms[i + 1] - kCeltEBands5ms[i]) << LM;
    cap[i] = (kCeltCacheCaps[kNbEBands * (2 * LM + C - 1) + i] + 64) * C * N >> 2;
  }
}

// rate.c interp_bits2pulses + compute_allocation, decoder side only
int interp_bits2pulses(int start, int end, int skip_start, const int* bits1, const int* bits2,
                       const int* thresh, const int* cap, int32_t total, int32_t* _balance,
                       int skip_rsv, int* intensity, int intensity_rsv, int* dual_stereo,
                       int dual_stereo_rsv, int* bits, int* ebits, int* fine_priority, int C,
                       int LM, RangeDec& ec) {
  constexpr int kAllocSteps = 6;
  const int16_t* e = kCeltEBands5ms;
  int alloc_floor = C << kBitRes;
  int stereo = C > 1 ? 1 : 0;
  int logM = LM << kBitRes;
  int lo = 0, hi = 1 << kAllocSteps;
  for (int i = 0; i < kAllocSteps; i++) {
    int mid = (lo + hi) >> 1;
    int32_t psum = 0;
    int done = 0;
    for (int j = end; j-- > start;) {
      int tmp = bits1[j] + (mid * static_cast<int32_t>(bits2[j]) >> kAllocSteps);
      if (tmp >= thresh[j] || done) {
        done = 1;
        psum += imin(tmp, cap[j]);
      } else if (tmp >= alloc_floor) {
        psum += alloc_floor;
      }
    }
    if (psum > total) {
      hi = mid;
    } else {
      lo = mid;
    }
  }
  int32_t psum = 0;
  int done = 0;
  for (int j = end; j-- > start;) {
    int tmp = bits1[j] + (lo * bits2[j] >> kAllocSteps);
    if (tmp < thresh[j] && !done) {
      tmp = tmp >= alloc_floor ? alloc_floor : 0;
    } else {
      done = 1;
    }
    tmp = imin(tmp, cap[j]);
    bits[j] = tmp;
    psum += tmp;
  }
  int codedBands;
  for (codedBands = end;; codedBands--) {
    int j = codedBands - 1;
    if (j <= skip_start) {
      total += skip_rsv;
      break;
    }
    int32_t left = total - psum;
    int32_t percoeff = left / (e[codedBands] - e[start]);
    left -= (e[codedBands] - e[start]) * percoeff;
    int rem = imax(static_cast<int>(left) - (e[j] - e[start]), 0);
    int band_width = e[codedBands] - e[j];
    int band_bits = static_cast<int>(bits[j] + percoeff * band_width + rem);
    if (band_bits >= imax(thresh[j], alloc_floor + (1 << kBitRes))) {
      if (ec.bit_logp(1)) break;
      psum += 1 << kBitRes;
      band_bits -= 1 << kBitRes;
    }
    psum -= bits[j] + intensity_rsv;
    if (intensity_rsv > 0) intensity_rsv = kCeltLog2FracTable[j - start];
    psum += intensity_rsv;
    if (band_bits >= alloc_floor) {
      psum += alloc_floor;
      bits[j] = alloc_floor;
    } else {
      bits[j] = 0;
    }
  }
  if (intensity_rsv > 0) {
    *intensity = start + static_cast<int>(ec.dec_uint(codedBands + 1 - start));
  } else {
    *intensity = 0;
  }
  if (*intensity <= start) {
    total += dual_stereo_rsv;
    dual_stereo_rsv = 0;
  }
  *dual_stereo = dual_stereo_rsv > 0 ? ec.bit_logp(1) : 0;

  int32_t left = total - psum;
  int32_t percoeff = left / (e[codedBands] - e[start]);
  left -= (e[codedBands] - e[start]) * percoeff;
  for (int j = start; j < codedBands; j++) bits[j] += static_cast<int>(percoeff) * (e[j + 1] - e[j]);
  for (int j = start; j < codedBands; j++) {
    int tmp = static_cast<int>(imin(static_cast<int>(left), e[j + 1] - e[j]));
    bits[j] += tmp;
    left -= tmp;
  }
  int32_t balance = 0;
  int j;
  for (j = start; j < codedBands; j++) {
    int N0 = e[j + 1] - e[j];
    int N = N0 << LM;
    int32_t bit = bits[j] + balance;
    int32_t excess = 0;
    if (N > 1) {
      excess = imax(static_cast<int>(bit) - cap[j], 0);
      bits[j] = static_cast<int>(bit - excess);
      int den = C * N + ((C == 2 && N > 2 && !*dual_stereo && j < *intensity) ? 1 : 0);
      int NClogN = den * (kCeltLogN400[j] + logM);
      int offset = (NClogN >> 1) - den * 21;  // FINE_OFFSET
      if (N == 2) offset += den << kBitRes >> 2;
      if (bits[j] + offset < (den * 2) << kBitRes) {
        offset += NClogN >> 2;
      } else if (bits[j] + offset < (den * 3) << kBitRes) {
        offset += NClogN >> 3;
      }
      ebits[j] = imax(0, (bits[j] + offset + (den << (kBitRes - 1))) / (den << kBitRes));
      if (C * ebits[j] > (bits[j] >> kBitRes)) ebits[j] = bits[j] >> stereo >> kBitRes;
      ebits[j] = imin(ebits[j], 8);  // MAX_FINE_BITS
      fine_priority[j] = ebits[j] * (den << kBitRes) >= bits[j] + offset ? 1 : 0;
      bits[j] -= C * ebits[j] << kBitRes;
    } else {
      excess = imax(0, static_cast<int>(bit) - (C << kBitRes));
      bits[j] = static_cast<int>(bit - excess);
      ebits[j] = 0;
      fine_priority[j] = 1;
    }
    if (excess > 0) {
      int extra_fine = imin(static_cast<int>(excess) >> (stereo + kBitRes), 8 - ebits[j]);
      ebits[j] += extra_fine;
      int32_t extra_bits = extra_fine * C << kBitRes;
      fine_priority[j] = extra_bits >= excess - balance ? 1 : 0;
      excess -= extra_bits;
    }
    balance = excess;
  }
  *_balance = balance;
  for (; j < end; j++) {
    ebits[j] = bits[j] >> stereo >> kBitRes;
    bits[j] = 0;
    fine_priority[j] = ebits[j] < 1 ? 1 : 0;
  }
  return codedBands;
}

int compute_allocation(int start, int end, const int* offsets, const int* cap, int alloc_trim,
                       int* intensity, int* dual_stereo, int32_t total, int32_t* balance,
                       int* pulses, int* ebits, int* fine_priority, int C, int LM,
                       RangeDec& ec) {
  const int16_t* e = kCeltEBands5ms;
  total = imax(static_cast<int>(total), 0);
  int len = kNbEBands;
  int skip_start = start;
  int skip_rsv = total >= 1 << kBitRes ? 1 << kBitRes : 0;
  total -= skip_rsv;
  int intensity_rsv = 0, dual_stereo_rsv = 0;
  if (C == 2) {
    intensity_rsv = kCeltLog2FracTable[end - start];
    if (intensity_rsv > total) {
      intensity_rsv = 0;
    } else {
      total -= intensity_rsv;
      dual_stereo_rsv = total >= 1 << kBitRes ? 1 << kBitRes : 0;
      total -= dual_stereo_rsv;
    }
  }
  int bits1[kNbEBands], bits2[kNbEBands], thresh[kNbEBands], trim_offset[kNbEBands];
  for (int j = start; j < end; j++) {
    thresh[j] = imax(C << kBitRes, (3 * (e[j + 1] - e[j]) << LM << kBitRes) >> 4);
    trim_offset[j] = C * (e[j + 1] - e[j]) * (alloc_trim - 5 - LM) * (end - j - 1) *
                     (1 << (LM + kBitRes)) >> 6;
    if ((e[j + 1] - e[j]) << LM == 1) trim_offset[j] -= C << kBitRes;
  }
  int lo = 1, hi = 11 - 1;  // nbAllocVectors - 1
  do {
    int done = 0;
    int32_t psum = 0;
    int mid = (lo + hi) >> 1;
    for (int j = end; j-- > start;) {
      int N = e[j + 1] - e[j];
      int bitsj = C * N * kCeltBandAllocation[mid][j] << LM >> 2;
      if (bitsj > 0) bitsj = imax(0, bitsj + trim_offset[j]);
      bitsj += offsets[j];
      if (bitsj >= thresh[j] || done) {
        done = 1;
        psum += imin(bitsj, cap[j]);
      } else if (bitsj >= C << kBitRes) {
        psum += C << kBitRes;
      }
    }
    if (psum > total) {
      hi = mid - 1;
    } else {
      lo = mid + 1;
    }
  } while (lo <= hi);
  hi = lo--;
  for (int j = start; j < end; j++) {
    int N = e[j + 1] - e[j];
    int bits1j = C * N * kCeltBandAllocation[lo][j] << LM >> 2;
    int bits2j = hi >= 11 ? cap[j] : C * N * kCeltBandAllocation[hi][j] << LM >> 2;
    if (bits1j > 0) bits1j = imax(0, bits1j + trim_offset[j]);
    if (bits2j > 0) bits2j = imax(0, bits2j + trim_offset[j]);
    if (lo > 0) bits1j += offsets[j];
    bits2j += offsets[j];
    if (offsets[j] > 0) skip_start = j;
    bits2j = imax(0, bits2j - bits1j);
    bits1[j] = bits1j;
    bits2[j] = bits2j;
  }
  (void)len;
  return interp_bits2pulses(start, end, skip_start, bits1, bits2, thresh, cap, total, balance,
                            skip_rsv, intensity, intensity_rsv, dual_stereo, dual_stereo_rsv,
                            pulses, ebits, fine_priority, C, LM, ec);
}

// ---- energy envelope (quant_bands.c + laplace.c) ----------------------------

int laplace_decode(RangeDec& rd, unsigned fs, int decay) {
  constexpr int kMinP = 1, kNMin = 16;
  int val = 0;
  unsigned fl = 0;
  unsigned fm = rd.decode_bin(15);
  if (fm >= fs) {
    val++;
    fl = fs;
    unsigned ft = 32768 - kMinP * (2 * kNMin) - fs;
    fs = (ft * static_cast<uint32_t>(16384 - decay) >> 15) + kMinP;
    while (fs > kMinP && fm >= fl + 2 * fs) {
      fs *= 2;
      fl += fs;
      fs = ((fs - 2 * kMinP) * static_cast<uint32_t>(decay)) >> 15;
      fs += kMinP;
      val++;
    }
    if (fs <= kMinP) {
      int di = (fm - fl) >> 1;  // LAPLACE_LOG_MINP+1
      val += di;
      fl += 2 * di * kMinP;
    }
    if (fm < fl + fs) {
      val = -val;
    } else {
      fl += fs;
    }
  }
  rd.update(fl, imin(static_cast<int>(fl + fs), 32768), 32768);
  return val;
}

void unquant_coarse_energy(int start, int end, float* old_e, int intra, RangeDec& rd, int C,
                           int LM) {
  const uint8_t* prob = &kCeltEnergyProbModel[LM][intra ? 1 : 0][0];
  float coef = intra ? 0.f : kPredCoef[LM];
  float beta = intra ? kBetaIntra : kBetaCoef[LM];
  int32_t budget = static_cast<int32_t>(rd.storage) * 8;
  float prev[2] = {0, 0};
  for (int i = start; i < end; i++) {
    int c = 0;
    do {
      int qi;
      int32_t tell = rd.tell();
      if (budget - tell >= 15) {
        int pi = 2 * imin(i, 20);
        qi = laplace_decode(rd, static_cast<unsigned>(prob[pi]) << 7, prob[pi + 1] << 6);
      } else if (budget - tell >= 2) {
        qi = rd.icdf(kCeltSmallEnergyICDF, 2);
        qi = (qi >> 1) ^ -(qi & 1);
      } else if (budget - tell >= 1) {
        qi = -rd.bit_logp(1);
      } else {
        qi = -1;
      }
      float q = static_cast<float>(qi);
      old_e[i + c * kNbEBands] = old_e[i + c * kNbEBands] > -9.f ? old_e[i + c * kNbEBands] : -9.f;
      float tmp = coef * old_e[i + c * kNbEBands] + prev[c] + q;
      old_e[i + c * kNbEBands] = tmp;
      prev[c] = prev[c] + q - beta * q;
    } while (++c < C);
  }
}

void unquant_fine_energy(int start, int end, float* old_e, const int* fine_quant, RangeDec& rd,
                         int C) {
  for (int i = start; i < end; i++) {
    if (fine_quant[i] <= 0) continue;
    int c = 0;
    do {
      int q2 = static_cast<int>(rd.dec_bits(static_cast<unsigned>(fine_quant[i])));
      float offset = (q2 + .5f) * (1 << (14 - fine_quant[i])) * (1.f / 16384) - .5f;
      old_e[i + c * kNbEBands] += offset;
    } while (++c < C);
  }
}

void unquant_energy_finalise(int start, int end, float* old_e, const int* fine_quant,
                             const int* fine_priority, int bits_left, RangeDec& rd, int C) {
  for (int prio = 0; prio < 2; prio++) {
    for (int i = start; i < end && bits_left >= C; i++) {
      if (fine_quant[i] >= 8 || fine_priority[i] != prio) continue;
      int c = 0;
      do {
        int q2 = static_cast<int>(rd.dec_bits(1));
        float offset = (q2 - .5f) * (1 << (14 - fine_quant[i] - 1)) * (1.f / 16384);
        old_e[i + c * kNbEBands] += offset;
        bits_left--;
      } while (++c < C);
    }
  }
}

void tf_decode(int start, int end, int is_transient, int* tf_res, int LM, RangeDec& rd) {
  uint32_t budget = rd.storage * 8;
  uint32_t tell = static_cast<uint32_t>(rd.tell());
  int logp = is_transient ? 2 : 4;
  int tf_select_rsv = LM > 0 && tell + logp + 1 <= budget;
  budget -= static_cast<uint32_t>(tf_select_rsv);
  int tf_changed = 0, curr = 0;
  for (int i = start; i < end; i++) {
    if (tell + logp <= budget) {
      curr ^= rd.bit_logp(static_cast<unsigned>(logp));
      tell = static_cast<uint32_t>(rd.tell());
      tf_changed |= curr;
    }
    tf_res[i] = curr;
    logp = is_transient ? 4 : 5;
  }
  int tf_select = 0;
  if (tf_select_rsv &&
      kCeltTfSelectTable[LM][4 * is_transient + 0 + tf_changed] !=
          kCeltTfSelectTable[LM][4 * is_transient + 2 + tf_changed]) {
    tf_select = rd.bit_logp(1);
  }
  for (int i = start; i < end; i++) {
    tf_res[i] = kCeltTfSelectTable[LM][4 * is_transient + 2 * tf_select + tf_res[i]];
  }
}

// ---- PVQ codeword decode (cwrs.c SMALL_FOOTPRINT row recurrences) ----------

void unext(uint32_t* ui, unsigned len, uint32_t ui0) {
  unsigned j = 1;
  do {
    uint32_t ui1 = ui[j] + ui[j - 1] + ui0;
    ui[j - 1] = ui0;
    ui0 = ui1;
  } while (++j < len);
  ui[j - 1] = ui0;
}

void uprev(uint32_t* ui, unsigned n, uint32_t ui0) {
  unsigned j = 1;
  do {
    uint32_t ui1 = ui[j] - ui[j - 1] - ui0;
    ui[j - 1] = ui0;
    ui0 = ui1;
  } while (++j < n);
  ui[j - 1] = ui0;
}

uint32_t ncwrs_urow(unsigned n, unsigned k, uint32_t* u) {
  unsigned len = k + 2;
  u[0] = 0;
  u[1] = 1;
  for (unsigned j = 2; j < len; j++) u[j] = (j << 1) - 1;
  for (unsigned j = 2; j < n; j++) unext(u + 1, k + 1, 1);
  return u[k] + u[k + 1];
}

void cwrsi(int n, int k, uint32_t i, int* y, uint32_t* u) {
  int j = 0;
  do {
    uint32_t p = u[k + 1];
    int s = -static_cast<int>(i >= p);
    i -= p & static_cast<uint32_t>(s);
    int yj = k;
    p = u[k];
    while (p > i) p = u[--k];
    i -= p;
    yj -= k;
    y[j] = (yj + s) ^ s;
    uprev(u, static_cast<unsigned>(k + 2), 0);
  } while (++j < n);
}

void decode_pulses(int* y, int n, int k, RangeDec& rd) {
  std::vector<uint32_t> u(static_cast<size_t>(k) + 2);
  cwrsi(n, k, rd.dec_uint(ncwrs_urow(static_cast<unsigned>(n), static_cast<unsigned>(k),
                                     u.data())),
        y, u.data());
}

// ---- VQ (vq.c float semantics) ----------------------------------------------

void exp_rotation1(float* X, int len, int stride, float c, float s) {
  float* p = X;
  for (int i = 0; i < len - stride; i++) {
    float x1 = p[0];
    float x2 = p[stride];
    p[stride] = c * x2 + s * x1;
    *p++ = c * x1 - s * x2;
  }
  p = &X[len - 2 * stride - 1];
  for (int i = len - 2 * stride - 1; i >= 0; i--) {
    float x1 = p[0];
    float x2 = p[stride];
    p[stride] = c * x2 + s * x1;
    *p-- = c * x1 - s * x2;
  }
}

void exp_rotation(float* X, int len, int dir, int stride, int K, int spread) {
  static const int kSpreadFactor[3] = {15, 10, 5};
  if (2 * K >= len || spread == 0) return;  // SPREAD_NONE
  int factor = kSpreadFactor[spread - 1];
  float gain = static_cast<float>(1.f * len) / (len + factor * K);
  float theta = .5f * (gain * gain);
  float c = celt_cos_norm(theta);
  float s = celt_cos_norm(1.f - theta);
  int stride2 = 0;
  if (len >= 8 * stride) {
    stride2 = 1;
    while ((stride2 * stride2 + stride2) * stride + (stride >> 2) < len) stride2++;
  }
  len /= stride;
  for (int i = 0; i < stride; i++) {
    if (dir < 0) {
      if (stride2) exp_rotation1(X + i * len, len, stride2, s, c);
      exp_rotation1(X + i * len, len, 1, c, s);
    } else {
      exp_rotation1(X + i * len, len, 1, c, -s);
      if (stride2) exp_rotation1(X + i * len, len, stride2, s, -c);
    }
  }
}

void renormalise_vector(float* X, int N, float gain) {
  float E = 1e-15f;  // EPSILON
  for (int i = 0; i < N; i++) E += X[i] * X[i];
  float g = celt_rsqrt(E) * gain;
  for (int i = 0; i < N; i++) X[i] = g * X[i];
}

unsigned extract_collapse_mask(const int* iy, int N, int B) {
  if (B <= 1) return 1;
  int N0 = N / B;
  unsigned mask = 0;
  for (int i = 0; i < B; i++) {
    for (int j = 0; j < N0; j++) mask |= static_cast<unsigned>(iy[i * N0 + j] != 0) << i;
  }
  return mask;
}

unsigned alg_unquant(float* X, int N, int K, int spread, int B, RangeDec& rd, float gain) {
  std::vector<int> iy(static_cast<size_t>(N));
  decode_pulses(iy.data(), N, K, rd);
  float Ryy = 0;
  for (int i = 0; i < N; i++) Ryy += static_cast<float>(iy[i]) * iy[i];
  float g = celt_rsqrt(Ryy) * gain;
  for (int i = 0; i < N; i++) X[i] = g * iy[i];
  exp_rotation(X, N, -1, B, K, spread);
  return extract_collapse_mask(iy.data(), N, B);
}

// ---- band shaping machinery (bands.c, decoder side) -------------------------

void haar1(float* X, int N0, int stride) {
  N0 >>= 1;
  for (int i = 0; i < stride; i++) {
    for (int j = 0; j < N0; j++) {
      float tmp1 = .70710678f * X[stride * 2 * j + i];
      float tmp2 = .70710678f * X[stride * (2 * j + 1) + i];
      X[stride * 2 * j + i] = tmp1 + tmp2;
      X[stride * (2 * j + 1) + i] = tmp1 - tmp2;
    }
  }
}

void interleave_hadamard(float* X, int N0, int stride, int hadamard) {
  int N = N0 * stride;
  std::vector<float> tmp(static_cast<size_t>(N));
  if (hadamard) {
    const int32_t* ordery = kCeltOrderyTable + stride - 2;
    for (int i = 0; i < stride; i++) {
      for (int j = 0; j < N0; j++) tmp[static_cast<size_t>(j) * stride + i] = X[ordery[i] * N0 + j];
    }
  } else {
    for (int i = 0; i < stride; i++) {
      for (int j = 0; j < N0; j++) tmp[static_cast<size_t>(j) * stride + i] = X[i * N0 + j];
    }
  }
  std::memcpy(X, tmp.data(), static_cast<size_t>(N) * sizeof(float));
}

void deinterleave_hadamard(float* X, int N0, int stride, int hadamard) {
  int N = N0 * stride;
  std::vector<float> tmp(static_cast<size_t>(N));
  if (hadamard) {
    const int32_t* ordery = kCeltOrderyTable + stride - 2;
    for (int i = 0; i < stride; i++) {
      for (int j = 0; j < N0; j++) tmp[static_cast<size_t>(ordery[i]) * N0 + j] = X[j * stride + i];
    }
  } else {
    for (int i = 0; i < stride; i++) {
      for (int j = 0; j < N0; j++) tmp[static_cast<size_t>(i) * N0 + j] = X[j * stride + i];
    }
  }
  std::memcpy(X, tmp.data(), static_cast<size_t>(N) * sizeof(float));
}

int compute_qn(int N, int b, int offset, int pulse_cap, int stereo) {
  static const int16_t kExp2Table8[8] = {16384, 17866, 19483, 21247, 23170, 25267, 27554, 30048};
  int N2 = 2 * N - 1;
  if (stereo && N == 2) N2--;
  int qb = imin(b - pulse_cap - (4 << kBitRes), (b + N2 * offset) / N2);
  qb = imin(8 << kBitRes, qb);
  if (qb < (1 << kBitRes >> 1)) return 1;
  int qn = kExp2Table8[qb & 0x7] >> (14 - (qb >> kBitRes));
  return (qn + 1) >> 1 << 1;
}

// x86/pitch_sse.h dual_inner_prod: 4-lane partial sums with the SSE
// horizontal-add order ((s0+s2)+(s1+s3)) plus a sequential tail
void dual_inner_prod(const float* x, const float* y01, const float* y02, int N, float* xy1,
                     float* xy2) {
  float s1[4] = {0, 0, 0, 0}, s2[4] = {0, 0, 0, 0};
  int i = 0;
  for (; i < N - 3; i += 4) {
    for (int k = 0; k < 4; k++) s1[k] += x[i + k] * y01[i + k];
    for (int k = 0; k < 4; k++) s2[k] += x[i + k] * y02[i + k];
  }
  *xy1 = (s1[0] + s1[2]) + (s1[1] + s1[3]);
  *xy2 = (s2[0] + s2[2]) + (s2[1] + s2[3]);
  for (; i < N; i++) {
    *xy1 += x[i] * y01[i];
    *xy2 += x[i] * y02[i];
  }
}

void stereo_merge(float* X, float* Y, float mid, int N) {
  float xp = 0, side = 0;
  dual_inner_prod(Y, X, Y, N, &xp, &side);
  xp = mid * xp;
  float mid2 = mid;  // SHR32 is a no-op in the float build
  float El = mid2 * mid2 + side - 2 * xp;
  float Er = mid2 * mid2 + side + 2 * xp;
  if (Er < 6e-4f || El < 6e-4f) {
    for (int j = 0; j < N; j++) Y[j] = X[j];
    return;
  }
  float lgain = celt_rsqrt(El);
  float rgain = celt_rsqrt(Er);
  for (int j = 0; j < N; j++) {
    float l = mid * X[j];
    float r = Y[j];
    X[j] = lgain * (l - r);
    Y[j] = rgain * (l + r);
  }
}

struct BandCtx {
  RangeDec* ec;
  int i;
  int intensity;
  int spread;
  int tf_change;
  int32_t remaining_bits;
  uint32_t seed;
};

struct SplitCtx {
  int inv, imid, iside, delta, itheta, qalloc;
};

void compute_theta(BandCtx* ctx, SplitCtx* sctx, int N, int* b, int B, int B0, int LM,
                   int stereo, int* fill) {
  RangeDec& ec = *ctx->ec;
  int i = ctx->i;
  int pulse_cap = kCeltLogN400[i] + LM * (1 << kBitRes);
  int offset = (pulse_cap >> 1) - (stereo && N == 2 ? 16 : 4);  // QTHETA_OFFSET{_TWOPHASE}
  int qn = compute_qn(N, *b, offset, pulse_cap, stereo);
  if (stereo && i >= ctx->intensity) qn = 1;
  int itheta = 0;
  int inv = 0;
  int32_t tell = static_cast<int32_t>(ec.tell_frac());
  if (qn != 1) {
    if (stereo && N > 2) {
      constexpr int kP0 = 3;
      int x0 = qn / 2;
      int ft = kP0 * (x0 + 1) + x0;
      int fs = static_cast<int>(ec.decode(static_cast<unsigned>(ft)));
      int x = fs < (x0 + 1) * kP0 ? fs / kP0 : x0 + 1 + (fs - (x0 + 1) * kP0);
      ec.update(static_cast<unsigned>(x <= x0 ? kP0 * x : (x - 1 - x0) + (x0 + 1) * kP0),
                static_cast<unsigned>(x <= x0 ? kP0 * (x + 1) : (x - x0) + (x0 + 1) * kP0),
                static_cast<unsigned>(ft));
      itheta = x;
    } else if (B0 > 1 || stereo) {
      itheta = static_cast<int>(ec.dec_uint(static_cast<uint32_t>(qn + 1)));
    } else {
      int ft = ((qn >> 1) + 1) * ((qn >> 1) + 1);
      int fm = static_cast<int>(ec.decode(static_cast<unsigned>(ft)));
      int fs, fl;
      if (fm < ((qn >> 1) * ((qn >> 1) + 1) >> 1)) {
        itheta = static_cast<int>((isqrt32(8 * static_cast<uint32_t>(fm) + 1) - 1) >> 1);
        fs = itheta + 1;
        fl = itheta * (itheta + 1) >> 1;
      } else {
        itheta = static_cast<int>(
            (2 * (qn + 1) - isqrt32(8 * static_cast<uint32_t>(ft - fm - 1) + 1)) >> 1);
        fs = qn + 1 - itheta;
        fl = ft - ((qn + 1 - itheta) * (qn + 2 - itheta) >> 1);
      }
      ec.update(static_cast<unsigned>(fl), static_cast<unsigned>(fl + fs),
                static_cast<unsigned>(ft));
    }
    itheta = static_cast<int>(static_cast<int32_t>(itheta) * 16384 / qn);
  } else if (stereo) {
    inv = *b > 2 << kBitRes && ctx->remaining_bits > 2 << kBitRes ? ec.bit_logp(2) : 0;
    itheta = 0;
  }
  int qalloc = static_cast<int>(ec.tell_frac()) - tell;
  *b -= qalloc;

  int imid, iside, delta;
  if (itheta == 0) {
    imid = 32767;
    iside = 0;
    *fill &= (1 << B) - 1;
    delta = -16384;
  } else if (itheta == 16384) {
    imid = 0;
    iside = 32767;
    *fill &= ((1 << B) - 1) << B;
    delta = 16384;
  } else {
    imid = bitexact_cos(static_cast<int16_t>(itheta));
    iside = bitexact_cos(static_cast<int16_t>(16384 - itheta));
    delta = frac_mul16((N - 1) << 7, bitexact_log2tan(iside, imid));
  }
  sctx->inv = inv;
  sctx->imid = imid;
  sctx->iside = iside;
  sctx->delta = delta;
  sctx->itheta = itheta;
  sctx->qalloc = qalloc;
}

unsigned quant_band(BandCtx* ctx, float* X, int N, int b, int B, float* lowband, int LM,
                    float* lowband_out, float gain, float* lowband_scratch, int fill);

unsigned quant_band_n1(BandCtx* ctx, float* X, float* Y, float* lowband_out) {
  RangeDec& ec = *ctx->ec;
  int stereo = Y != nullptr;
  float* x = X;
  int c = 0;
  do {
    int sign = 0;
    if (ctx->remaining_bits >= 1 << kBitRes) {
      sign = static_cast<int>(ec.dec_bits(1));
      ctx->remaining_bits -= 1 << kBitRes;
    }
    x[0] = sign ? -1.f : 1.f;  // NORM_SCALING
    x = Y;
  } while (++c < 1 + stereo);
  if (lowband_out) lowband_out[0] = X[0];
  return 1;
}

unsigned quant_partition(BandCtx* ctx, float* X, int N, int b, int B, float* lowband, int LM,
                         float gain, int fill) {
  RangeDec& ec = *ctx->ec;
  int i = ctx->i;
  unsigned cm = 0;
  int B0 = B;
  const uint8_t* cache = kCeltCacheBits + kCeltCacheIndex[(LM + 1) * kNbEBands + i];
  if (LM != -1 && b > cache[cache[0]] + 12 && N > 2) {
    N >>= 1;
    float* Y = X + N;
    LM -= 1;
    if (B == 1) fill = (fill & 1) | (fill << 1);
    B = (B + 1) >> 1;
    SplitCtx sctx;
    compute_theta(ctx, &sctx, N, &b, B, B0, LM, 0, &fill);
    int imid = sctx.imid, iside = sctx.iside, delta = sctx.delta, itheta = sctx.itheta;
    float mid = (1.f / 32768) * imid;
    float side = (1.f / 32768) * iside;
    if (B0 > 1 && (itheta & 0x3fff)) {
      if (itheta > 8192) {
        delta -= delta >> (4 - LM);
      } else {
        delta = imin(0, delta + (N << kBitRes >> (5 - LM)));
      }
    }
    int mbits = imax(0, imin(b, (b - delta) / 2));
    int sbits = b - mbits;
    ctx->remaining_bits -= sctx.qalloc;
    float* next_lowband2 = lowband ? lowband + N : nullptr;
    int32_t rebalance = ctx->remaining_bits;
    if (mbits >= sbits) {
      cm = quant_partition(ctx, X, N, mbits, B, lowband, LM, gain * mid, fill);
      rebalance = mbits - (rebalance - ctx->remaining_bits);
      if (rebalance > 3 << kBitRes && itheta != 0) sbits += rebalance - (3 << kBitRes);
      cm |= quant_partition(ctx, Y, N, sbits, B, next_lowband2, LM, gain * side, fill >> B)
            << (B0 >> 1);
    } else {
      cm = quant_partition(ctx, Y, N, sbits, B, next_lowband2, LM, gain * side, fill >> B)
           << (B0 >> 1);
      rebalance = sbits - (rebalance - ctx->remaining_bits);
      if (rebalance > 3 << kBitRes && itheta != 16384) mbits += rebalance - (3 << kBitRes);
      cm |= quant_partition(ctx, X, N, mbits, B, lowband, LM, gain * mid, fill);
    }
  } else {
    int q = bits2pulses(i, LM, b);
    int curr_bits = pulses2bits(i, LM, q);
    ctx->remaining_bits -= curr_bits;
    while (ctx->remaining_bits < 0 && q > 0) {
      ctx->remaining_bits += curr_bits;
      q--;
      curr_bits = pulses2bits(i, LM, q);
      ctx->remaining_bits -= curr_bits;
    }
    if (q != 0) {
      int K = get_pulses(q);
      cm = alg_unquant(X, N, K, ctx->spread, B, ec, gain);
    } else {
      unsigned cm_mask = static_cast<unsigned>((1UL << B) - 1);
      fill &= static_cast<int>(cm_mask);
      if (!fill) {
        std::memset(X, 0, static_cast<size_t>(N) * sizeof(float));
      } else {
        if (lowband == nullptr) {
          for (int j = 0; j < N; j++) {
            ctx->seed = celt_lcg(ctx->seed);
            X[j] = static_cast<float>(static_cast<int32_t>(ctx->seed) >> 20);
          }
          cm = cm_mask;
        } else {
          for (int j = 0; j < N; j++) {
            ctx->seed = celt_lcg(ctx->seed);
            float tmp = 1.0f / 256;  // ~48 dB below the folding level
            tmp = (ctx->seed & 0x8000) ? tmp : -tmp;
            X[j] = lowband[j] + tmp;
          }
          cm = static_cast<unsigned>(fill);
        }
        renormalise_vector(X, N, gain);
      }
    }
  }
  return cm;
}

unsigned quant_band(BandCtx* ctx, float* X, int N, int b, int B, float* lowband, int LM,
                    float* lowband_out, float gain, float* lowband_scratch, int fill) {
  int N0 = N;
  int N_B = N;
  int B0 = B;
  int time_divide = 0;
  int recombine = 0;
  int tf_change = ctx->tf_change;
  int long_blocks = B0 == 1;
  unsigned cm = 0;
  N_B /= B;

  if (N == 1) return quant_band_n1(ctx, X, nullptr, lowband_out);

  if (tf_change > 0) recombine = tf_change;
  if (lowband_scratch && lowband && (recombine || ((N_B & 1) == 0 && tf_change < 0) || B0 > 1)) {
    std::memcpy(lowband_scratch, lowband, static_cast<size_t>(N) * sizeof(float));
    lowband = lowband_scratch;
  }
  for (int k = 0; k < recombine; k++) {
    static const uint8_t kBitInterleave[16] = {0, 1, 1, 1, 2, 3, 3, 3, 2, 3, 3, 3, 2, 3, 3, 3};
    if (lowband) haar1(lowband, N >> k, 1 << k);
    fill = kBitInterleave[fill & 0xF] | kBitInterleave[fill >> 4] << 2;
  }
  B >>= recombine;
  N_B <<= recombine;
  while ((N_B & 1) == 0 && tf_change < 0) {
    if (lowband) haar1(lowband, N_B, B);
    fill |= fill << B;
    B <<= 1;
    N_B >>= 1;
    time_divide++;
    tf_change++;
  }
  B0 = B;
  int N_B0 = N_B;
  if (B0 > 1 && lowband) deinterleave_hadamard(lowband, N_B >> recombine, B0 << recombine,
                                               long_blocks);

  cm = quant_partition(ctx, X, N, b, B, lowband, LM, gain, fill);

  // resynthesis (decoder always)
  if (B0 > 1) interleave_hadamard(X, N_B >> recombine, B0 << recombine, long_blocks);
  N_B = N_B0;
  B = B0;
  for (int k = 0; k < time_divide; k++) {
    B >>= 1;
    N_B <<= 1;
    cm |= cm >> B;
    haar1(X, N_B, B);
  }
  for (int k = 0; k < recombine; k++) {
    static const uint8_t kBitDeinterleave[16] = {0x00, 0x03, 0x0C, 0x0F, 0x30, 0x33, 0x3C, 0x3F,
                                                 0xC0, 0xC3, 0xCC, 0xCF, 0xF0, 0xF3, 0xFC, 0xFF};
    cm = kBitDeinterleave[cm];
    haar1(X, N0 >> k, 1 << k);
  }
  B <<= recombine;
  if (lowband_out) {
    float n = celt_sqrt(static_cast<float>(N0));
    for (int j = 0; j < N0; j++) lowband_out[j] = n * X[j];
  }
  cm &= static_cast<unsigned>((1 << B) - 1);
  return cm;
}

unsigned quant_band_stereo(BandCtx* ctx, float* X, float* Y, int N, int b, int B, float* lowband,
                           int LM, float* lowband_out, float* lowband_scratch, int fill) {
  RangeDec& ec = *ctx->ec;
  unsigned cm = 0;
  if (N == 1) return quant_band_n1(ctx, X, Y, lowband_out);
  int orig_fill = fill;
  SplitCtx sctx;
  compute_theta(ctx, &sctx, N, &b, B, B, LM, 1, &fill);
  int inv = sctx.inv, imid = sctx.imid, iside = sctx.iside, delta = sctx.delta,
      itheta = sctx.itheta, qalloc = sctx.qalloc;
  float mid = (1.f / 32768) * imid;
  float side = (1.f / 32768) * iside;
  if (N == 2) {
    int mbits = b;
    int sbits = 0;
    if (itheta != 0 && itheta != 16384) sbits = 1 << kBitRes;
    mbits -= sbits;
    int c = itheta > 8192;
    ctx->remaining_bits -= qalloc + sbits;
    float* x2 = c ? Y : X;
    float* y2 = c ? X : Y;
    int sign = 0;
    if (sbits) sign = static_cast<int>(ec.dec_bits(1));
    sign = 1 - 2 * sign;
    cm = quant_band(ctx, x2, N, mbits, B, lowband, LM, lowband_out, 1.f, lowband_scratch,
                    orig_fill);
    y2[0] = -static_cast<float>(sign) * x2[1];
    y2[1] = static_cast<float>(sign) * x2[0];
    X[0] = mid * X[0];
    X[1] = mid * X[1];
    Y[0] = side * Y[0];
    Y[1] = side * Y[1];
    float tmp = X[0];
    X[0] = tmp - Y[0];
    Y[0] = tmp + Y[0];
    tmp = X[1];
    X[1] = tmp - Y[1];
    Y[1] = tmp + Y[1];
  } else {
    int mbits = imax(0, imin(b, (b - delta) / 2));
    int sbits = b - mbits;
    ctx->remaining_bits -= qalloc;
    int32_t rebalance = ctx->remaining_bits;
    if (mbits >= sbits) {
      cm = quant_band(ctx, X, N, mbits, B, lowband, LM, lowband_out, 1.f, lowband_scratch, fill);
      rebalance = mbits - (rebalance - ctx->remaining_bits);
      if (rebalance > 3 << kBitRes && itheta != 0) sbits += rebalance - (3 << kBitRes);
      cm |= quant_band(ctx, Y, N, sbits, B, nullptr, LM, nullptr, side, nullptr, fill >> B);
    } else {
      cm = quant_band(ctx, Y, N, sbits, B, nullptr, LM, nullptr, side, nullptr, fill >> B);
      rebalance = sbits - (rebalance - ctx->remaining_bits);
      if (rebalance > 3 << kBitRes && itheta != 16384) mbits += rebalance - (3 << kBitRes);
      cm |= quant_band(ctx, X, N, mbits, B, lowband, LM, lowband_out, 1.f, lowband_scratch, fill);
    }
  }
  if (N != 2) stereo_merge(X, Y, mid, N);
  if (inv) {
    for (int j = 0; j < N; j++) Y[j] = -Y[j];
  }
  return cm;
}

// bands.c quant_all_bands, decoder side
void quant_all_bands(int start, int end, float* X_, float* Y_, uint8_t* collapse_masks,
                     const int* pulses, int shortBlocks, int spread, int dual_stereo,
                     int intensity, const int* tf_res, int32_t total_bits, int32_t balance,
                     RangeDec& rd, int LM, int codedBands, uint32_t* seed) {
  const int16_t* eBands = kCeltEBands5ms;
  int M = 1 << LM;
  int B = shortBlocks ? M : 1;
  int norm_offset = M * eBands[start];
  int C = Y_ != nullptr ? 2 : 1;
  std::vector<float> norm_buf(static_cast<size_t>(C) * (M * eBands[kNbEBands - 1] - norm_offset));
  float* norm = norm_buf.data();
  float* norm2 = norm + M * eBands[kNbEBands - 1] - norm_offset;
  float* lowband_scratch = X_ + M * eBands[kNbEBands - 1];
  int lowband_offset = 0;
  int update_lowband = 1;
  BandCtx ctx;
  ctx.ec = &rd;
  ctx.intensity = intensity;
  ctx.seed = *seed;
  ctx.spread = spread;
  for (int i = start; i < end; i++) {
    ctx.i = i;
    int last = (i == end - 1);
    float* X = X_ + M * eBands[i];
    float* Y = Y_ != nullptr ? Y_ + M * eBands[i] : nullptr;
    int N = M * eBands[i + 1] - M * eBands[i];
    int32_t tell = static_cast<int32_t>(rd.tell_frac());
    if (i != start) balance -= tell;
    int32_t remaining_bits = total_bits - tell - 1;
    ctx.remaining_bits = remaining_bits;
    int b = 0;
    if (i <= codedBands - 1) {
      int32_t curr_balance = balance / imin(3, codedBands - i);
      b = imax(0, imin(16383, imin(static_cast<int>(remaining_bits + 1),
                                   pulses[i] + static_cast<int>(curr_balance))));
    }
    if (M * eBands[i] - N >= M * eBands[start] && (update_lowband || lowband_offset == 0)) {
      lowband_offset = i;
    }
    ctx.tf_change = tf_res[i];
    float* scratch = lowband_scratch;
    if (i == end - 1) scratch = nullptr;
    int effective_lowband = -1;
    unsigned x_cm, y_cm;
    if (lowband_offset != 0 && (spread != 3 || B > 1 || ctx.tf_change < 0)) {
      effective_lowband = imax(0, M * eBands[lowband_offset] - norm_offset - N);
      int fold_start = lowband_offset;
      while (M * eBands[--fold_start] > effective_lowband + norm_offset) {
      }
      int fold_end = lowband_offset - 1;
      while (M * eBands[++fold_end] < effective_lowband + norm_offset + N) {
      }
      x_cm = y_cm = 0;
      int fold_i = fold_start;
      do {
        x_cm |= collapse_masks[fold_i * C + 0];
        y_cm |= collapse_masks[fold_i * C + C - 1];
      } while (++fold_i < fold_end);
    } else {
      x_cm = y_cm = static_cast<unsigned>((1 << B) - 1);
    }
    if (dual_stereo && i == intensity) {
      dual_stereo = 0;
      for (int j = 0; j < M * eBands[i] - norm_offset; j++) {
        norm[j] = .5f * (norm[j] + norm2[j]);
      }
    }
    if (dual_stereo) {
      x_cm = quant_band(&ctx, X, N, b / 2, B,
                        effective_lowband != -1 ? norm + effective_lowband : nullptr, LM,
                        last ? nullptr : norm + M * eBands[i] - norm_offset, 1.f, scratch,
                        static_cast<int>(x_cm));
      y_cm = quant_band(&ctx, Y, N, b / 2, B,
                        effective_lowband != -1 ? norm2 + effective_lowband : nullptr, LM,
                        last ? nullptr : norm2 + M * eBands[i] - norm_offset, 1.f, scratch,
                        static_cast<int>(y_cm));
    } else {
      if (Y != nullptr) {
        x_cm = quant_band_stereo(&ctx, X, Y, N, b, B,
                                 effective_lowband != -1 ? norm + effective_lowband : nullptr, LM,
                                 last ? nullptr : norm + M * eBands[i] - norm_offset, scratch,
                                 static_cast<int>(x_cm | y_cm));
      } else {
        x_cm = quant_band(&ctx, X, N, b, B,
                          effective_lowband != -1 ? norm + effective_lowband : nullptr, LM,
                          last ? nullptr : norm + M * eBands[i] - norm_offset, 1.f, scratch,
                          static_cast<int>(x_cm | y_cm));
      }
      y_cm = x_cm;
    }
    collapse_masks[i * C + 0] = static_cast<uint8_t>(x_cm);
    collapse_masks[i * C + C - 1] = static_cast<uint8_t>(y_cm);
    balance += pulses[i] + tell;
    update_lowband = b > (N << kBitRes);
  }
  *seed = ctx.seed;
}

// bands.c anti_collapse (float arithmetic)
void anti_collapse(float* X_, const uint8_t* collapse_masks, int LM, int C, int size, int start,
                   int end, const float* logE, const float* prev1logE, const float* prev2logE,
                   const int* pulses, uint32_t seed) {
  for (int i = start; i < end; i++) {
    int N0 = kCeltEBands5ms[i + 1] - kCeltEBands5ms[i];
    int depth = (1 + pulses[i]) / ((kCeltEBands5ms[i + 1] - kCeltEBands5ms[i]) << LM);
    float thresh = .5f * celt_exp2(-.125f * depth);
    float sqrt_1 = celt_rsqrt(static_cast<float>(N0 << LM));
    int c = 0;
    do {
      float prev1 = prev1logE[c * kNbEBands + i];
      float prev2 = prev2logE[c * kNbEBands + i];
      if (C == 1) {
        prev1 = prev1 > prev1logE[kNbEBands + i] ? prev1 : prev1logE[kNbEBands + i];
        prev2 = prev2 > prev2logE[kNbEBands + i] ? prev2 : prev2logE[kNbEBands + i];
      }
      float ediff = logE[c * kNbEBands + i] - (prev1 < prev2 ? prev1 : prev2);
      if (ediff < 0) ediff = 0;
      float r = 2.f * celt_exp2(-ediff);
      if (LM == 3) r *= 1.41421356f;
      r = thresh < r ? thresh : r;
      r = r * sqrt_1;
      float* X = X_ + c * size + (kCeltEBands5ms[i] << LM);
      int renormalize = 0;
      for (int k = 0; k < 1 << LM; k++) {
        if (!(collapse_masks[i * C + c] & (1 << k))) {
          for (int j = 0; j < N0; j++) {
            seed = celt_lcg(seed);
            X[(j << LM) + k] = (seed & 0x8000) ? r : -r;
          }
          renormalize = 1;
        }
      }
      if (renormalize) renormalise_vector(X, N0 << LM, 1.f);
    } while (++c < C);
  }
}

void denormalise_bands(const float* X, float* freq, const float* band_log_e, int start, int end,
                       int C, int M) {
  int N = M * kShortMdct;
  for (int c = 0; c < C; c++) {
    float* f = freq + c * N;
    const float* x = X + c * N + M * kCeltEBands5ms[start];
    for (int i = 0; i < M * kCeltEBands5ms[start]; i++) *f++ = 0;
    for (int i = start; i < end; i++) {
      int j = M * kCeltEBands5ms[i];
      int band_end = M * kCeltEBands5ms[i + 1];
      float lg = band_log_e[i + c * kNbEBands] + kEMeansQ4[i] * (1.f / 16.f);
      float g = celt_exp2(lg);
      do {
        *f++ = *x++ * g;
      } while (++j < band_end);
    }
    for (int i = M * kCeltEBands5ms[end]; i < N; i++) *f++ = 0;
  }
}

// ---- inverse MDCT (mdct.c clt_mdct_backward structure) ----------------------
// The inner complex IFFT mirrors kiss_fft's inverse butterflies
// (celt/kiss_fft.c ki_bfly{2,3,4,5}) bit-for-bit in float, using the
// static mode's shared twiddle/bitrev tables, so the whole CELT signal
// path reproduces the reference float build exactly.

struct Cpx {
  float r, i;
};

inline Cpx cmulc(Cpx a, Cpx b) {  // C_MULC: a * conj(b)
  return {a.r * b.r + a.i * b.i, a.i * b.r - a.r * b.i};
}

inline Cpx tw(int idx) { return {kCeltFftTwiddles[2 * idx], kCeltFftTwiddles[2 * idx + 1]}; }

void ki_bfly2(Cpx* fout, size_t fstride, int m, int n, int mm) {
  for (int i = 0; i < n; i++) {
    Cpx* f = fout + static_cast<size_t>(i) * mm;
    Cpx* f2 = f + m;
    int t1 = 0;
    for (int j = 0; j < m; j++) {
      Cpx t = cmulc(*f2, tw(t1));
      t1 += static_cast<int>(fstride);
      *f2 = {f->r - t.r, f->i - t.i};
      f->r += t.r;
      f->i += t.i;
      ++f2;
      ++f;
    }
  }
}

void ki_bfly4(Cpx* fout, size_t fstride, int m, int n, int mm) {
  const int m2 = 2 * m, m3 = 3 * m;
  for (int i = 0; i < n; i++) {
    Cpx* f = fout + static_cast<size_t>(i) * mm;
    int t1 = 0, t2 = 0, t3 = 0;
    for (int j = 0; j < m; j++) {
      Cpx s0 = cmulc(f[m], tw(t1));
      Cpx s1 = cmulc(f[m2], tw(t2));
      Cpx s2 = cmulc(f[m3], tw(t3));
      Cpx s5 = {f->r - s1.r, f->i - s1.i};
      f->r += s1.r;
      f->i += s1.i;
      Cpx s3 = {s0.r + s2.r, s0.i + s2.i};
      Cpx s4 = {s0.r - s2.r, s0.i - s2.i};
      f[m2] = {f->r - s3.r, f->i - s3.i};
      t1 += static_cast<int>(fstride);
      t2 += static_cast<int>(fstride) * 2;
      t3 += static_cast<int>(fstride) * 3;
      f->r += s3.r;
      f->i += s3.i;
      f[m].r = s5.r - s4.i;
      f[m].i = s5.i + s4.r;
      f[m3].r = s5.r + s4.i;
      f[m3].i = s5.i - s4.r;
      ++f;
    }
  }
}

void ki_bfly3(Cpx* fout, size_t fstride, int m, int n, int mm) {
  const size_t m2 = 2 * static_cast<size_t>(m);
  Cpx epi3 = tw(static_cast<int>(fstride) * m);
  for (int i = 0; i < n; i++) {
    Cpx* f = fout + static_cast<size_t>(i) * mm;
    int t1 = 0, t2 = 0;
    int k = m;
    do {
      Cpx s1 = cmulc(f[m], tw(t1));
      Cpx s2 = cmulc(f[m2], tw(t2));
      Cpx s3 = {s1.r + s2.r, s1.i + s2.i};
      Cpx s0 = {s1.r - s2.r, s1.i - s2.i};
      t1 += static_cast<int>(fstride);
      t2 += static_cast<int>(fstride) * 2;
      f[m].r = f->r - .5f * s3.r;
      f[m].i = f->i - .5f * s3.i;
      s0.r *= -epi3.i;
      s0.i *= -epi3.i;
      f->r += s3.r;
      f->i += s3.i;
      f[m2].r = f[m].r + s0.i;
      f[m2].i = f[m].i - s0.r;
      f[m].r -= s0.i;
      f[m].i += s0.r;
      ++f;
    } while (--k);
  }
}

void ki_bfly5(Cpx* fout, size_t fstride, int m, int n, int mm) {
  Cpx ya = tw(static_cast<int>(fstride) * m);
  Cpx yb = tw(static_cast<int>(fstride) * 2 * m);
  for (int i = 0; i < n; i++) {
    Cpx* f = fout + static_cast<size_t>(i) * mm;
    Cpx* f0 = f;
    Cpx* f1 = f0 + m;
    Cpx* f2 = f0 + 2 * m;
    Cpx* f3 = f0 + 3 * m;
    Cpx* f4 = f0 + 4 * m;
    for (int u = 0; u < m; ++u) {
      Cpx s0 = *f0;
      Cpx s1 = cmulc(*f1, tw(u * static_cast<int>(fstride)));
      Cpx s2 = cmulc(*f2, tw(2 * u * static_cast<int>(fstride)));
      Cpx s3 = cmulc(*f3, tw(3 * u * static_cast<int>(fstride)));
      Cpx s4 = cmulc(*f4, tw(4 * u * static_cast<int>(fstride)));
      Cpx s7 = {s1.r + s4.r, s1.i + s4.i};
      Cpx s10 = {s1.r - s4.r, s1.i - s4.i};
      Cpx s8 = {s2.r + s3.r, s2.i + s3.i};
      Cpx s9 = {s2.r - s3.r, s2.i - s3.i};
      f0->r += s7.r + s8.r;
      f0->i += s7.i + s8.i;
      Cpx s5 = {s0.r + s7.r * ya.r + s8.r * yb.r, s0.i + s7.i * ya.r + s8.i * yb.r};
      Cpx s6 = {-(s10.i * ya.i) - s9.i * yb.i, s10.r * ya.i + s9.r * yb.i};
      *f1 = {s5.r - s6.r, s5.i - s6.i};
      *f4 = {s5.r + s6.r, s5.i + s6.i};
      Cpx s11 = {s0.r + s7.r * yb.r + s8.r * ya.r, s0.i + s7.i * yb.r + s8.i * ya.r};
      Cpx s12 = {s10.i * yb.i - s9.i * ya.i, -(s10.r * yb.i) + s9.r * ya.i};
      *f2 = {s11.r + s12.r, s11.i + s12.i};
      *f3 = {s11.r - s12.r, s11.i - s12.i};
      ++f0;
      ++f1;
      ++f2;
      ++f3;
      ++f4;
    }
  }
}

// opus_ifft (kiss_fft.c:533-583): bit-reverse then staged butterflies.
// The 48 kHz mode's factor plans (static_modes_float.h:427-470).
void opus_ifft(int shift_idx, const Cpx* fin, Cpx* fout) {
  static const int16_t kFactors[4][10] = {
      {4, 120, 4, 30, 2, 15, 3, 5, 5, 1},
      {4, 60, 4, 15, 3, 5, 5, 1, 0, 0},
      {4, 30, 2, 15, 3, 5, 5, 1, 0, 0},
      {4, 15, 3, 5, 5, 1, 0, 0, 0, 0},
  };
  static const int16_t* const kBitrev[4] = {kCeltFftBitrev480, kCeltFftBitrev240,
                                            kCeltFftBitrev120, kCeltFftBitrev60};
  // state .shift fields are {-1, 1, 2, 3}; negative clamps to 0
  static const int kShift[4] = {0, 1, 2, 3};
  int nfft = 480 >> shift_idx;
  const int16_t* factors = kFactors[shift_idx];
  int shift = kShift[shift_idx];
  for (int i = 0; i < nfft; i++) fout[kBitrev[shift_idx][i]] = fin[i];
  int fstride[8];
  fstride[0] = 1;
  int L = 0;
  int m;
  do {
    int p = factors[2 * L];
    m = factors[2 * L + 1];
    fstride[L + 1] = fstride[L] * p;
    L++;
  } while (m != 1);
  m = factors[2 * L - 1];
  for (int i = L - 1; i >= 0; i--) {
    int m2 = i != 0 ? factors[2 * i - 1] : 1;
    size_t stride = static_cast<size_t>(fstride[i]) << shift;
    switch (factors[2 * i]) {
      case 2:
        ki_bfly2(fout, stride, m, fstride[i], m2);
        break;
      case 4:
        ki_bfly4(fout, stride, m, fstride[i], m2);
        break;
      case 3:
        ki_bfly3(fout, stride, m, fstride[i], m2);
        break;
      case 5:
        ki_bfly5(fout, stride, m, fstride[i], m2);
        break;
    }
    m = m2;
  }
}

void imdct_backward(const float* in, float* out, int shift, int stride) {
  int N = 1920 >> shift;
  int N2 = N >> 1;
  int N4 = N >> 2;
  float sine = static_cast<float>(2 * kPi * .125f / N);
  std::vector<Cpx> f2(static_cast<size_t>(N4));
  // pre-rotate
  {
    const float* xp1 = in;
    const float* xp2 = in + stride * (N2 - 1);
    const float* t = kCeltMdctTwiddles960;
    for (int i = 0; i < N4; i++) {
      float yr = -(*xp2) * t[i << shift] + (*xp1) * t[(N4 - i) << shift];
      float yi = -(*xp2) * t[(N4 - i) << shift] - (*xp1) * t[i << shift];
      f2[static_cast<size_t>(i)] = {yr - yi * sine, yi + yr * sine};
      xp1 += 2 * stride;
      xp2 -= 2 * stride;
    }
  }
  std::vector<Cpx> buf(static_cast<size_t>(N4));
  opus_ifft(shift, f2.data(), buf.data());
  std::memcpy(out + (kOverlap >> 1), buf.data(), static_cast<size_t>(N2) * sizeof(float));
  // post-rotate, in place from both ends
  {
    float* yp0 = out + (kOverlap >> 1);
    float* yp1 = out + (kOverlap >> 1) + N2 - 2;
    const float* t = kCeltMdctTwiddles960;
    for (int i = 0; i < (N4 + 1) >> 1; i++) {
      float re = yp0[0], im = yp0[1];
      float t0 = t[i << shift], t1 = t[(N4 - i) << shift];
      float yr = re * t0 - im * t1;
      float yi = im * t0 + re * t1;
      re = yp1[0];
      im = yp1[1];
      yp0[0] = -(yr - yi * sine);
      yp1[1] = yi + yr * sine;
      t0 = t[(N4 - i - 1) << shift];
      t1 = t[(i + 1) << shift];
      yr = re * t0 - im * t1;
      yi = im * t0 + re * t1;
      yp1[0] = -(yr - yi * sine);
      yp0[1] = yi + yr * sine;
      yp0 += 2;
      yp1 -= 2;
    }
  }
  // TDAC mirror with the window
  {
    float* xp1 = out + kOverlap - 1;
    float* yp1 = out;
    const float* wp1 = kCeltWindow120;
    const float* wp2 = kCeltWindow120 + kOverlap - 1;
    for (int i = 0; i < kOverlap / 2; i++) {
      float x1 = *xp1;
      float x2 = *yp1;
      *yp1++ = *wp2 * x2 - *wp1 * x1;
      *xp1-- = *wp1 * x2 + *wp2 * x1;
      wp1++;
      wp2--;
    }
  }
}

// celt.c comb_filter (float)
const float kCombGains[3][3] = {{0.3066406250f, 0.2170410156f, 0.1296386719f},
                                {0.4638671875f, 0.2680664062f, 0.f},
                                {0.7998046875f, 0.1000976562f, 0.f}};

// x86/pitch_sse.h comb_filter_const: the as-built reference pairs the
// g11/g12 terms into a partial sum before adding (different float
// grouping than the plain-C celt.c form); mirrored for bit-exactness.
// The SSE loop covers floor(N/4)*4 outputs; every caller's span is a
// multiple of 4, and the defensive tail uses the same grouping.
void comb_filter_const(float* y, const float* x, int T, int N, float g10, float g11, float g12) {
  for (int i = 0; i < N; i++) {
    float x2 = x[i - T];
    float x1 = x[i - T + 1];
    float x3 = x[i - T - 1];
    float x0 = x[i - T + 2];
    float x4 = x[i - T - 2];
    y[i] = (x[i] + g10 * x2) + (g11 * (x3 + x1) + g12 * (x4 + x0));
  }
}

void comb_filter(float* y, float* x, int T0, int T1, int N, float g0, float g1, int tapset0,
                 int tapset1, const float* window, int overlap) {
  if (g0 == 0 && g1 == 0) {
    if (x != y) std::memmove(y, x, static_cast<size_t>(N) * sizeof(float));
    return;
  }
  float g00 = g0 * kCombGains[tapset0][0];
  float g01 = g0 * kCombGains[tapset0][1];
  float g02 = g0 * kCombGains[tapset0][2];
  float g10 = g1 * kCombGains[tapset1][0];
  float g11 = g1 * kCombGains[tapset1][1];
  float g12 = g1 * kCombGains[tapset1][2];
  float x1 = x[-T1 + 1];
  float x2 = x[-T1];
  float x3 = x[-T1 - 1];
  float x4 = x[-T1 - 2];
  int i;
  for (i = 0; i < overlap; i++) {
    float x0 = x[i - T1 + 2];
    float f = window[i] * window[i];
    y[i] = x[i] + (1 - f) * g00 * x[i - T0] + (1 - f) * g01 * (x[i - T0 + 1] + x[i - T0 - 1]) +
           (1 - f) * g02 * (x[i - T0 + 2] + x[i - T0 - 2]) + f * g10 * x2 + f * g11 * (x1 + x3) +
           f * g12 * (x0 + x4);
    x4 = x3;
    x3 = x2;
    x2 = x1;
    x1 = x0;
  }
  if (g1 == 0) {
    if (x != y) std::memmove(y + overlap, x + overlap, static_cast<size_t>(N - overlap) * sizeof(float));
    return;
  }
  comb_filter_const(y + i, x + i, T1, N - i, g10, g11, g12);
}

}  // namespace

// ---- CeltDecoder ------------------------------------------------------------

void CeltDecoder::reset() {
  int ch_keep = channels;
  int sch_keep = stream_channels;
  int start_keep = start_band;
  int end_keep = end_band;
  *this = CeltDecoder{};
  channels = ch_keep;
  stream_channels = sch_keep;
  start_band = start_keep;
  end_band = end_keep;
  // celt_decoder.c OPUS_RESET_STATE: logE histories start at -28 dB
  for (int c = 0; c < 2; c++) {
    for (int i = 0; i < kNbEBands; i++) old_log_e[c][i] = old_log_e2[c][i] = -28.f;
  }
}

int CeltDecoder::decode(RangeDec* rd_in, const uint8_t* data, int len, float* pcm, int n48) {
  const int CC = channels;
  int C = stream_channels;
  int LM;
  for (LM = 0; LM <= kMaxLM; LM++) {
    if (kShortMdct << LM == n48) break;
  }
  if (LM > kMaxLM) fail();
  int M = 1 << LM;
  int N = M * kShortMdct;
  if (len < 0 || len > 1275) fail();
  int eff_end = end_band < kNbEBands ? end_band : kNbEBands;

  if (data == nullptr || len <= 1) {
    decode_lost(pcm, N, LM);
    return n48;
  }

  RangeDec local_rd;
  RangeDec* rd = rd_in;
  if (rd == nullptr) {
    local_rd.init(data, static_cast<uint32_t>(len));
    rd = &local_rd;
  }

  float* old_band_e0 = &old_ebands[0][0];  // [2][21] flattened per channel
  if (C == 1) {
    for (int i = 0; i < kNbEBands; i++) {
      old_ebands[0][i] = old_ebands[0][i] > old_ebands[1][i] ? old_ebands[0][i] : old_ebands[1][i];
    }
  }

  int32_t total_bits = len * 8;
  int32_t tell = rd->tell();
  int silence = 0;
  if (tell >= total_bits) {
    silence = 1;
  } else if (tell == 1) {
    silence = rd->bit_logp(15);
  }
  if (silence) {
    tell = len * 8;
    rd->nbits_total += tell - rd->tell();
  }

  float pf_gain = 0;
  int pf_pitch = 0;
  int pf_tapset = 0;
  if (start_band == 0 && tell + 16 <= total_bits) {
    if (rd->bit_logp(1)) {
      int octave = static_cast<int>(rd->dec_uint(6));
      pf_pitch = (16 << octave) + static_cast<int>(rd->dec_bits(static_cast<unsigned>(4 + octave))) - 1;
      int qg = static_cast<int>(rd->dec_bits(3));
      if (rd->tell() + 2 <= total_bits) pf_tapset = rd->icdf(kCeltTapsetICDF, 2);
      pf_gain = .09375f * (qg + 1);
    }
    tell = rd->tell();
  }

  int is_transient = 0;
  if (LM > 0 && tell + 3 <= total_bits) {
    is_transient = rd->bit_logp(3);
    tell = rd->tell();
  }
  int shortBlocks = is_transient ? M : 0;
  int intra_ener = tell + 3 <= total_bits ? rd->bit_logp(3) : 0;

  // oldBandE layout: flatten [2][21] as the reference's 2*nbEBands array
  float old_e[2 * kNbEBands];
  for (int c = 0; c < 2; c++) {
    std::memcpy(&old_e[c * kNbEBands], &old_ebands[c][0], kNbEBands * sizeof(float));
  }
  unquant_coarse_energy(start_band, end_band, old_e, intra_ener, *rd, C, LM);

  int tf_res[kNbEBands];
  tf_decode(start_band, end_band, is_transient, tf_res, LM, *rd);

  tell = rd->tell();
  int spread_decision = 2;  // SPREAD_NORMAL
  if (tell + 4 <= total_bits) spread_decision = rd->icdf(kCeltSpreadICDF, 5);

  int cap[kNbEBands];
  init_caps(cap, LM, C);

  int offsets[kNbEBands] = {};
  int dynalloc_logp = 6;
  int32_t total_bits_q3 = total_bits << kBitRes;
  int32_t tell_q3 = static_cast<int32_t>(rd->tell_frac());
  for (int i = start_band; i < end_band; i++) {
    int width = C * (kCeltEBands5ms[i + 1] - kCeltEBands5ms[i]) << LM;
    int quanta = imin(width << kBitRes, imax(6 << kBitRes, width));
    int dynalloc_loop_logp = dynalloc_logp;
    int boost = 0;
    while (tell_q3 + (dynalloc_loop_logp << kBitRes) < total_bits_q3 && boost < cap[i]) {
      int flag = rd->bit_logp(static_cast<unsigned>(dynalloc_loop_logp));
      tell_q3 = static_cast<int32_t>(rd->tell_frac());
      if (!flag) break;
      boost += quanta;
      total_bits_q3 -= quanta;
      dynalloc_loop_logp = 1;
    }
    offsets[i] = boost;
    if (boost > 0) dynalloc_logp = imax(2, dynalloc_logp - 1);
  }

  int alloc_trim = tell_q3 + (6 << kBitRes) <= total_bits_q3 ? rd->icdf(kCeltTrimICDF, 7) : 5;

  int32_t bits = ((static_cast<int32_t>(len) * 8) << kBitRes) -
                 static_cast<int32_t>(rd->tell_frac()) - 1;
  int anti_collapse_rsv =
      is_transient && LM >= 2 && bits >= ((LM + 2) << kBitRes) ? (1 << kBitRes) : 0;
  bits -= anti_collapse_rsv;

  int pulses[kNbEBands], fine_quant[kNbEBands], fine_priority[kNbEBands];
  int intensity = 0, dual_stereo = 0;
  int32_t balance = 0;
  int coded_bands =
      compute_allocation(start_band, end_band, offsets, cap, alloc_trim, &intensity,
                         &dual_stereo, bits, &balance, pulses, fine_quant, fine_priority, C, LM,
                         *rd);

  unquant_fine_energy(start_band, end_band, old_e, fine_quant, *rd, C);

  std::vector<uint8_t> collapse(static_cast<size_t>(C) * kNbEBands);
  std::vector<float> X(static_cast<size_t>(C) * N);
  quant_all_bands(start_band, end_band, X.data(), C == 2 ? X.data() + N : nullptr,
                  collapse.data(), pulses, shortBlocks, spread_decision, dual_stereo, intensity,
                  tf_res, len * (8 << kBitRes) - anti_collapse_rsv, balance, *rd, LM, coded_bands,
                  &rng);

  int anti_collapse_on = 0;
  if (anti_collapse_rsv > 0) anti_collapse_on = static_cast<int>(rd->dec_bits(1));

  unquant_energy_finalise(start_band, end_band, old_e, fine_quant, fine_priority,
                          len * 8 - rd->tell(), *rd, C);

  if (anti_collapse_on) {
    anti_collapse(X.data(), collapse.data(), LM, C, N, start_band, end_band, old_e,
                  &old_log_e[0][0], &old_log_e2[0][0], pulses, rng);
  }

  std::vector<float> freq(static_cast<size_t>(imax(CC, C)) * N);
  if (silence) {
    for (int i = 0; i < 2 * kNbEBands; i++) old_e[i] = -28.f;
    std::fill(freq.begin(), freq.end(), 0.f);
  } else {
    denormalise_bands(X.data(), freq.data(), old_e, start_band, eff_end, C, M);
  }
  for (int c = 0; c < CC; c++) {
    std::memmove(&decode_mem[c][0], &decode_mem[c][N],
                 static_cast<size_t>(kDecodeBufferSize - N + (kOverlap >> 1)) * sizeof(float));
  }
  for (int c = 0; c < C; c++) {
    int bound = M * kCeltEBands5ms[eff_end];
    for (int i = bound; i < N; i++) freq[static_cast<size_t>(c) * N + i] = 0;
  }
  float* out_syn[2];
  for (int c = 0; c < CC; c++) out_syn[c] = &decode_mem[c][kDecodeBufferSize - N];
  if (CC == 2 && C == 1) {
    for (int i = 0; i < N; i++) freq[static_cast<size_t>(N) + i] = freq[static_cast<size_t>(i)];
  }
  if (CC == 1 && C == 2) {
    for (int i = 0; i < N; i++) {
      freq[static_cast<size_t>(i)] =
          .5f * (freq[static_cast<size_t>(i)] + freq[static_cast<size_t>(N) + i]);
    }
  }

  // inverse MDCTs (compute_inv_mdcts semantics)
  {
    int B = shortBlocks ? shortBlocks : 1;
    int n_per = shortBlocks ? kShortMdct : kShortMdct << LM;
    int shift = shortBlocks ? kMaxLM : kMaxLM - LM;
    for (int c = 0; c < CC; c++) {
      for (int b = 0; b < B; b++) {
        imdct_backward(&freq[static_cast<size_t>(c) * N + b], out_syn[c] + n_per * b, shift, B);
      }
    }
  }

  for (int c = 0; c < CC; c++) {
    int pf_period = imax(postfilter_period, kCombMinPeriod);
    int pf_period_old = imax(postfilter_period_old, kCombMinPeriod);
    postfilter_period = pf_period;
    postfilter_period_old = pf_period_old;
    comb_filter(out_syn[c], out_syn[c], postfilter_period_old, postfilter_period, kShortMdct,
                postfilter_gain_old, postfilter_gain, postfilter_tapset_old, postfilter_tapset,
                kCeltWindow120, kOverlap);
    if (LM != 0) {
      comb_filter(out_syn[c] + kShortMdct, out_syn[c] + kShortMdct, postfilter_period, pf_pitch,
                  N - kShortMdct, postfilter_gain, pf_gain, postfilter_tapset, pf_tapset,
                  kCeltWindow120, kOverlap);
    }
  }
  postfilter_period_old = postfilter_period;
  postfilter_gain_old = postfilter_gain;
  postfilter_tapset_old = postfilter_tapset;
  postfilter_period = pf_pitch;
  postfilter_gain = pf_gain;
  postfilter_tapset = pf_tapset;
  if (LM != 0) {
    postfilter_period_old = postfilter_period;
    postfilter_gain_old = postfilter_gain;
    postfilter_tapset_old = postfilter_tapset;
  }

  if (C == 1) std::memcpy(&old_e[kNbEBands], &old_e[0], kNbEBands * sizeof(float));

  if (!is_transient) {
    for (int i = 0; i < 2 * kNbEBands; i++) {
      old_log_e2[i / kNbEBands][i % kNbEBands] = old_log_e[i / kNbEBands][i % kNbEBands];
      old_log_e[i / kNbEBands][i % kNbEBands] = old_e[i];
      float bg = background_log_e[i / kNbEBands][i % kNbEBands] + M * 0.001f;
      background_log_e[i / kNbEBands][i % kNbEBands] = bg < old_e[i] ? bg : old_e[i];
    }
  } else {
    for (int i = 0; i < 2 * kNbEBands; i++) {
      float& ole = old_log_e[i / kNbEBands][i % kNbEBands];
      ole = ole < old_e[i] ? ole : old_e[i];
    }
  }
  for (int c = 0; c < 2; c++) {
    for (int i = 0; i < start_band; i++) {
      old_e[c * kNbEBands + i] = 0;
      old_log_e[c][i] = old_log_e2[c][i] = -28.f;
    }
    for (int i = end_band; i < kNbEBands; i++) {
      old_e[c * kNbEBands + i] = 0;
      old_log_e[c][i] = old_log_e2[c][i] = -28.f;
    }
  }
  for (int c = 0; c < 2; c++) {
    std::memcpy(&old_ebands[c][0], &old_e[c * kNbEBands], kNbEBands * sizeof(float));
  }
  (void)old_band_e0;
  rng = rd->rng;

  // de-emphasis into ±1 float PCM (deemphasis(), float shortcut)
  for (int c = 0; c < CC; c++) {
    float m = preemph_mem[c];
    const float* x = out_syn[c];
    float* y = pcm + c;
    for (int j = 0; j < N; j++) {
      float tmp = x[j] + m + 1e-30f;  // VERY_SMALL
      m = 0.85000610f * tmp;
      y[static_cast<size_t>(j) * CC] = tmp * (1.f / 32768.f);
    }
    preemph_mem[c] = m;
  }
  loss_count = 0;
  if (rd->tell() > 8 * len) fail();
  return n48;
}

// ---- CELT PLC (celt_decode_lost, celt_decoder.c:336-580) --------------------

namespace {

constexpr int kPlcPitchLagMax = 720;
constexpr int kPlcPitchLagMin = 100;
constexpr int kMaxPeriod = 1024;
constexpr int kCeltLpcOrder = 24;

// x86/pitch_sse.h xcorr_kernel: four lags at once with TWO interleaved
// accumulators (even j in one, odd j in the other), summed at the end —
// the as-built reference's float grouping, mirrored lane-for-lane.
void xcorr_kernel(const float* x, const float* y, float sum[4], int len) {
  float s1[4] = {sum[0], sum[1], sum[2], sum[3]};
  float s2[4] = {0, 0, 0, 0};
  int j = 0;
  for (; j < len - 3; j += 4) {
    for (int k = 0; k < 4; k++) s1[k] += x[j] * y[j + k];
    for (int k = 0; k < 4; k++) s2[k] += x[j + 1] * y[j + 1 + k];
    for (int k = 0; k < 4; k++) s1[k] += x[j + 2] * y[j + 2 + k];
    for (int k = 0; k < 4; k++) s2[k] += x[j + 3] * y[j + 3 + k];
  }
  if (j < len) {
    for (int k = 0; k < 4; k++) s1[k] += x[j] * y[j + k];
    if (++j < len) {
      for (int k = 0; k < 4; k++) s2[k] += x[j] * y[j + k];
      if (++j < len) {
        for (int k = 0; k < 4; k++) s1[k] += x[j] * y[j + k];
      }
    }
  }
  for (int k = 0; k < 4; k++) sum[k] = s1[k] + s2[k];
}

// pitch.c celt_pitch_xcorr_c (unrolled variant): 4-lag kernel blocks,
// plain sequential sums for the remainder lags
void pitch_xcorr(const float* x, const float* y, float* xcorr, int len, int max_pitch) {
  int i = 0;
  for (; i < max_pitch - 3; i += 4) {
    float sum[4] = {0, 0, 0, 0};
    xcorr_kernel(x, y + i, sum, len);
    xcorr[i] = sum[0];
    xcorr[i + 1] = sum[1];
    xcorr[i + 2] = sum[2];
    xcorr[i + 3] = sum[3];
  }
  for (; i < max_pitch; i++) {
    float sum = 0;
    for (int j = 0; j < len; j++) sum += x[j] * y[i + j];
    xcorr[i] = sum;
  }
}

// celt_lpc.c _celt_autocorr (float branch: no shifting)
void celt_autocorr(const float* x, float* ac, const float* window, int overlap, int lag, int n) {
  int fastN = n - lag;
  std::vector<float> xx;
  const float* xptr = x;
  if (overlap != 0) {
    xx.assign(x, x + n);
    for (int i = 0; i < overlap; i++) {
      xx[static_cast<size_t>(i)] = x[i] * window[i];
      xx[static_cast<size_t>(n - i - 1)] = x[n - i - 1] * window[i];
    }
    xptr = xx.data();
  }
  pitch_xcorr(xptr, xptr, ac, fastN, lag + 1);
  for (int k = 0; k <= lag; k++) {
    float d = 0;
    for (int i = k + fastN; i < n; i++) d += xptr[i] * xptr[i - k];
    ac[k] += d;
  }
}

// celt_lpc.c _celt_lpc (Levinson-Durbin, float)
void celt_lpc(float* lpc, const float* ac, int p) {
  float error = ac[0];
  for (int i = 0; i < p; i++) lpc[i] = 0;
  if (ac[0] != 0) {
    for (int i = 0; i < p; i++) {
      float rr = 0;
      for (int j = 0; j < i; j++) rr += lpc[j] * ac[i - j];
      rr += ac[i + 1];
      float r = -rr / error;
      lpc[i] = r;
      for (int j = 0; j < (i + 1) >> 1; j++) {
        float tmp1 = lpc[j];
        float tmp2 = lpc[i - 1 - j];
        lpc[j] = tmp1 + r * tmp2;
        lpc[i - 1 - j] = tmp2 + r * tmp1;
      }
      error = error - r * r * error;
      if (error < .001f * ac[0]) break;
    }
  }
}

// celt_lpc.c celt_fir over the SSE xcorr_kernel (4 outputs per block,
// sequential remainder) — as-built reference float grouping
void celt_fir(const float* x_in, const float* num, float* y, int N, int ord, float* mem) {
  std::vector<float> rnum(static_cast<size_t>(ord));
  std::vector<float> x(static_cast<size_t>(N + ord));
  for (int i = 0; i < ord; i++) rnum[static_cast<size_t>(i)] = num[ord - i - 1];
  for (int i = 0; i < ord; i++) x[static_cast<size_t>(i)] = mem[ord - i - 1];
  for (int i = 0; i < N; i++) x[static_cast<size_t>(i + ord)] = x_in[i];
  for (int i = 0; i < ord; i++) mem[i] = x_in[N - i - 1];
  int i = 0;
  for (; i < N - 3; i += 4) {
    float sum[4] = {0, 0, 0, 0};
    xcorr_kernel(rnum.data(), &x[static_cast<size_t>(i)], sum, ord);
    for (int k = 0; k < 4; k++) y[i + k] = x_in[i + k] + sum[k];
  }
  for (; i < N; i++) {
    float sum = 0;
    for (int j = 0; j < ord; j++) sum += rnum[static_cast<size_t>(j)] * x[static_cast<size_t>(i + j)];
    y[i] = x_in[i] + sum;
  }
}

// celt_lpc.c celt_iir (float, non-SMALL_FOOTPRINT form): the 4-output
// block accumulates over the pre-patch y (zeros beyond i+ord) and adds
// the recursive terms afterwards — the float summation ORDER is part
// of matching the reference output, so it is mirrored exactly.
void celt_iir(const float* x_in, const float* den, float* y_out, int N, int ord, float* mem) {
  std::vector<float> rden(static_cast<size_t>(ord));
  std::vector<float> y(static_cast<size_t>(N + ord), 0.f);
  for (int i = 0; i < ord; i++) rden[static_cast<size_t>(i)] = den[ord - i - 1];
  for (int i = 0; i < ord; i++) y[static_cast<size_t>(i)] = -mem[ord - i - 1];
  int i = 0;
  for (; i < N - 3; i += 4) {
    float sum[4] = {x_in[i], x_in[i + 1], x_in[i + 2], x_in[i + 3]};
    xcorr_kernel(rden.data(), &y[static_cast<size_t>(i)], sum, ord);
    y[static_cast<size_t>(i + ord)] = -sum[0];
    y_out[i] = sum[0];
    sum[1] += y[static_cast<size_t>(i + ord)] * den[0];
    y[static_cast<size_t>(i + ord + 1)] = -sum[1];
    y_out[i + 1] = sum[1];
    sum[2] += y[static_cast<size_t>(i + ord + 1)] * den[0];
    sum[2] += y[static_cast<size_t>(i + ord)] * den[1];
    y[static_cast<size_t>(i + ord + 2)] = -sum[2];
    y_out[i + 2] = sum[2];
    sum[3] += y[static_cast<size_t>(i + ord + 2)] * den[0];
    sum[3] += y[static_cast<size_t>(i + ord + 1)] * den[1];
    sum[3] += y[static_cast<size_t>(i + ord)] * den[2];
    y[static_cast<size_t>(i + ord + 3)] = -sum[3];
    y_out[i + 3] = sum[3];
  }
  for (; i < N; i++) {  // tail (unreachable for multiple-of-4 lengths)
    float sum = x_in[i];
    for (int j = 0; j < ord; j++) sum -= rden[static_cast<size_t>(j)] * y[static_cast<size_t>(i + j)];
    y[static_cast<size_t>(i + ord)] = sum;
    y_out[i] = sum;
  }
  for (int j = 0; j < ord; j++) mem[j] = y_out[N - j - 1];
}

// pitch.c celt_fir5 (float)
void celt_fir5(const float* x, const float* num, float* y, int N, float* mem) {
  float num0 = num[0], num1 = num[1], num2 = num[2], num3 = num[3], num4 = num[4];
  float mem0 = mem[0], mem1 = mem[1], mem2 = mem[2], mem3 = mem[3], mem4 = mem[4];
  for (int i = 0; i < N; i++) {
    float sum = x[i];
    sum += num0 * mem0;
    sum += num1 * mem1;
    sum += num2 * mem2;
    sum += num3 * mem3;
    sum += num4 * mem4;
    mem4 = mem3;
    mem3 = mem2;
    mem2 = mem1;
    mem1 = mem0;
    mem0 = x[i];
    y[i] = sum;
  }
  mem[0] = mem0;
  mem[1] = mem1;
  mem[2] = mem2;
  mem[3] = mem3;
  mem[4] = mem4;
}

// pitch.c pitch_downsample (float)
void pitch_downsample(float* const* x, float* x_lp, int len, int C) {
  float ac[5];
  float tmp = 1.f;
  float lpc[4], mem[5] = {0, 0, 0, 0, 0};
  float lpc2[5];
  const float c1 = .8f;
  for (int i = 1; i < len >> 1; i++) {
    x_lp[i] = .5f * (.5f * (x[0][2 * i - 1] + x[0][2 * i + 1]) + x[0][2 * i]);
  }
  x_lp[0] = .5f * (.5f * x[0][1] + x[0][0]);
  if (C == 2) {
    for (int i = 1; i < len >> 1; i++) {
      x_lp[i] += .5f * (.5f * (x[1][2 * i - 1] + x[1][2 * i + 1]) + x[1][2 * i]);
    }
    x_lp[0] += .5f * (.5f * x[1][1] + x[1][0]);
  }
  celt_autocorr(x_lp, ac, nullptr, 0, 4, len >> 1);
  ac[0] *= 1.0001f;
  for (int i = 1; i <= 4; i++) ac[i] -= ac[i] * (.008f * i) * (.008f * i);
  celt_lpc(lpc, ac, 4);
  for (int i = 0; i < 4; i++) {
    tmp = .9f * tmp;
    lpc[i] = lpc[i] * tmp;
  }
  lpc2[0] = lpc[0] + .8f;
  lpc2[1] = lpc[1] + c1 * lpc[0];
  lpc2[2] = lpc[2] + c1 * lpc[1];
  lpc2[3] = lpc[3] + c1 * lpc[2];
  lpc2[4] = c1 * lpc[3];
  celt_fir5(x_lp, lpc2, x_lp, len >> 1, mem);
}

// pitch.c find_best_pitch (float)
void find_best_pitch(const float* xcorr, const float* y, int len, int max_pitch,
                     int* best_pitch) {
  float Syy = 1;
  float best_num[2] = {-1, -1};
  float best_den[2] = {0, 0};
  best_pitch[0] = 0;
  best_pitch[1] = 1;
  for (int j = 0; j < len; j++) Syy = Syy + y[j] * y[j];
  for (int i = 0; i < max_pitch; i++) {
    if (xcorr[i] > 0) {
      float xcorr16 = xcorr[i] * 1e-12f;  // avoid overflow when squaring
      float num = xcorr16 * xcorr16;
      if (num * best_den[1] > best_num[1] * Syy) {
        if (num * best_den[0] > best_num[0] * Syy) {
          best_num[1] = best_num[0];
          best_den[1] = best_den[0];
          best_pitch[1] = best_pitch[0];
          best_num[0] = num;
          best_den[0] = Syy;
          best_pitch[0] = i;
        } else {
          best_num[1] = num;
          best_den[1] = Syy;
          best_pitch[1] = i;
        }
      }
    }
    Syy += y[i + len] * y[i + len] - y[i] * y[i];
    Syy = Syy > 1 ? Syy : 1;
  }
}

// pitch.c pitch_search (float)
void pitch_search(const float* x_lp, const float* y, int len, int max_pitch, int* pitch) {
  int best_pitch[2] = {0, 0};
  int lag = len + max_pitch;
  std::vector<float> x_lp4(static_cast<size_t>(len >> 2));
  std::vector<float> y_lp4(static_cast<size_t>(lag >> 2));
  std::vector<float> xcorr(static_cast<size_t>(max_pitch >> 1));
  for (int j = 0; j < len >> 2; j++) x_lp4[static_cast<size_t>(j)] = x_lp[2 * j];
  for (int j = 0; j < lag >> 2; j++) y_lp4[static_cast<size_t>(j)] = y[2 * j];
  pitch_xcorr(x_lp4.data(), y_lp4.data(), xcorr.data(), len >> 2, max_pitch >> 2);
  find_best_pitch(xcorr.data(), y_lp4.data(), len >> 2, max_pitch >> 2, best_pitch);
  for (int i = 0; i < max_pitch >> 1; i++) {
    xcorr[static_cast<size_t>(i)] = 0;
    if (std::abs(i - 2 * best_pitch[0]) > 2 && std::abs(i - 2 * best_pitch[1]) > 2) continue;
    float sum = 0;
    for (int j = 0; j < len >> 1; j++) sum += x_lp[j] * y[i + j];
    xcorr[static_cast<size_t>(i)] = sum > -1 ? sum : -1;
  }
  find_best_pitch(xcorr.data(), y, len >> 1, max_pitch >> 1, best_pitch);
  int offset = 0;
  if (best_pitch[0] > 0 && best_pitch[0] < (max_pitch >> 1) - 1) {
    float a = xcorr[static_cast<size_t>(best_pitch[0] - 1)];
    float b = xcorr[static_cast<size_t>(best_pitch[0])];
    float c = xcorr[static_cast<size_t>(best_pitch[0] + 1)];
    if (c - a > .7f * (b - a)) {
      offset = 1;
    } else if (a - c > .7f * (b - c)) {
      offset = -1;
    }
  }
  *pitch = 2 * best_pitch[0] - offset;
}

}  // namespace

void CeltDecoder::decode_lost(float* pcm, int N, int LM) {
  const int C = channels;
  float* dmem[2];
  float* out_syn[2];
  for (int c = 0; c < C; c++) {
    dmem[c] = &decode_mem[c][0];
    out_syn[c] = &decode_mem[c][kDecodeBufferSize - N];
  }
  int noise_based = loss_count >= 5 || start_band != 0;
  if (noise_based) {
    // Noise-based PLC/CNG: random band shapes at a decayed envelope
    int end = end_band;
    int eff_end = imax(start_band, imin(end, kNbEBands));
    float old_e[2 * kNbEBands];
    for (int c = 0; c < 2; c++) {
      std::memcpy(&old_e[c * kNbEBands], &old_ebands[c][0], kNbEBands * sizeof(float));
    }
    const float* plc_log_e;
    float bg[2 * kNbEBands];
    if (loss_count >= 5) {
      for (int c = 0; c < 2; c++) {
        std::memcpy(&bg[c * kNbEBands], &background_log_e[c][0], kNbEBands * sizeof(float));
      }
      plc_log_e = bg;
    } else {
      float decay = loss_count == 0 ? 1.5f : .5f;
      for (int c = 0; c < C; c++) {
        for (int i = start_band; i < end; i++) old_e[c * kNbEBands + i] -= decay;
      }
      plc_log_e = old_e;
    }
    uint32_t seed = rng;
    std::vector<float> X(static_cast<size_t>(C) * N);
    for (int c = 0; c < C; c++) {
      for (int i = start_band; i < eff_end; i++) {
        int boffs = N * c + (kCeltEBands5ms[i] << LM);
        int blen = (kCeltEBands5ms[i + 1] - kCeltEBands5ms[i]) << LM;
        for (int j = 0; j < blen; j++) {
          seed = celt_lcg(seed);
          X[static_cast<size_t>(boffs + j)] = static_cast<float>(static_cast<int32_t>(seed) >> 20);
        }
        renormalise_vector(&X[static_cast<size_t>(boffs)], blen, 1.f);
      }
    }
    rng = seed;
    std::vector<float> freq(static_cast<size_t>(C) * N);
    denormalise_bands(X.data(), freq.data(), plc_log_e, start_band, eff_end, C, 1 << LM);
    for (int c = 0; c < C; c++) {
      int bound = kCeltEBands5ms[eff_end] << LM;
      for (int i = bound; i < N; i++) freq[static_cast<size_t>(c) * N + i] = 0;
    }
    for (int c = 0; c < C; c++) {
      std::memmove(dmem[c], dmem[c] + N,
                   static_cast<size_t>(kDecodeBufferSize - N + (kOverlap >> 1)) * sizeof(float));
    }
    // compute_inv_mdcts with shortBlocks=0
    int shift = kMaxLM - LM;
    for (int c = 0; c < C; c++) {
      imdct_backward(&freq[static_cast<size_t>(c) * N], out_syn[c], shift, 1);
    }
    for (int c = 0; c < 2; c++) {
      std::memcpy(&old_ebands[c][0], &old_e[c * kNbEBands], kNbEBands * sizeof(float));
    }
  } else {
    // Pitch-based PLC: extrapolate in the LPC excitation domain
    float fade = 1.f;
    int pitch_index;
    if (loss_count == 0) {
      std::vector<float> lp_pitch_buf(static_cast<size_t>(kDecodeBufferSize) >> 1);
      pitch_downsample(dmem, lp_pitch_buf.data(), kDecodeBufferSize, C);
      pitch_search(lp_pitch_buf.data() + (kPlcPitchLagMax >> 1), lp_pitch_buf.data(),
                   kDecodeBufferSize - kPlcPitchLagMax, kPlcPitchLagMax - kPlcPitchLagMin,
                   &pitch_index);
      pitch_index = kPlcPitchLagMax - pitch_index;
      last_pitch_index = pitch_index;
    } else {
      pitch_index = last_pitch_index;
      fade = .8f;
    }
    float etmp[kOverlap];
    float exc[kMaxPeriod];
    for (int c = 0; c < C; c++) {
      float* buf = dmem[c];
      for (int i = 0; i < kMaxPeriod; i++) {
        exc[i] = buf[kDecodeBufferSize - kMaxPeriod + i];
      }
      if (loss_count == 0) {
        float ac[kCeltLpcOrder + 1];
        celt_autocorr(exc, ac, kCeltWindow120, kOverlap, kCeltLpcOrder, kMaxPeriod);
        ac[0] *= 1.0001f;
        for (int i = 1; i <= kCeltLpcOrder; i++) ac[i] -= ac[i] * (0.008f * 0.008f) * i * i;
        celt_lpc(&lpc_state[c][0], ac, kCeltLpcOrder);
      }
      int exc_length = imin(2 * pitch_index, kMaxPeriod);
      {
        float lpc_mem[kCeltLpcOrder];
        for (int i = 0; i < kCeltLpcOrder; i++) {
          lpc_mem[i] = buf[kDecodeBufferSize - exc_length - 1 - i];
        }
        celt_fir(exc + kMaxPeriod - exc_length, &lpc_state[c][0], exc + kMaxPeriod - exc_length,
                 exc_length, kCeltLpcOrder, lpc_mem);
      }
      float decay;
      {
        float E1 = 1, E2 = 1;
        int decay_length = exc_length >> 1;
        for (int i = 0; i < decay_length; i++) {
          float e = exc[kMaxPeriod - decay_length + i];
          E1 += e * e;
          e = exc[kMaxPeriod - 2 * decay_length + i];
          E2 += e * e;
        }
        E1 = E1 < E2 ? E1 : E2;
        decay = celt_sqrt(E1 / E2);
      }
      std::memmove(buf, buf + N, static_cast<size_t>(kDecodeBufferSize - N) * sizeof(float));
      int extrapolation_offset = kMaxPeriod - pitch_index;
      int extrapolation_len = N + kOverlap;
      float attenuation = fade * decay;
      float S1 = 0;
      for (int i = 0, j = 0; i < extrapolation_len; i++, j++) {
        if (j >= pitch_index) {
          j -= pitch_index;
          attenuation = attenuation * decay;
        }
        buf[kDecodeBufferSize - N + i] = attenuation * exc[extrapolation_offset + j];
        float tmp = buf[kDecodeBufferSize - kMaxPeriod - N + extrapolation_offset + j];
        S1 += tmp * tmp;
      }
      {
        float lpc_mem[kCeltLpcOrder];
        for (int i = 0; i < kCeltLpcOrder; i++) {
          lpc_mem[i] = buf[kDecodeBufferSize - N - 1 - i];
        }
        celt_iir(buf + kDecodeBufferSize - N, &lpc_state[c][0], buf + kDecodeBufferSize - N,
                 extrapolation_len, kCeltLpcOrder, lpc_mem);
      }
      {
        float S2 = 0;
        for (int i = 0; i < extrapolation_len; i++) {
          float tmp = buf[kDecodeBufferSize - N + i];
          S2 += tmp * tmp;
        }
        if (!(S1 > 0.2f * S2)) {
          for (int i = 0; i < extrapolation_len; i++) buf[kDecodeBufferSize - N + i] = 0;
        } else if (S1 < S2) {
          // frac_div32(SHR32(S1,1)+1, S2+1): SHR32 is a no-op in float
          float ratio = celt_sqrt((S1 + 1) / (S2 + 1));
          for (int i = 0; i < kOverlap; i++) {
            float tmp_g = 1.f - kCeltWindow120[i] * (1.f - ratio);
            buf[kDecodeBufferSize - N + i] = tmp_g * buf[kDecodeBufferSize - N + i];
          }
          for (int i = kOverlap; i < extrapolation_len; i++) {
            buf[kDecodeBufferSize - N + i] = ratio * buf[kDecodeBufferSize - N + i];
          }
        }
      }
      comb_filter(etmp, buf + kDecodeBufferSize, postfilter_period, postfilter_period, kOverlap,
                  -postfilter_gain, -postfilter_gain, postfilter_tapset, postfilter_tapset,
                  kCeltWindow120, 0);
      for (int i = 0; i < kOverlap / 2; i++) {
        buf[kDecodeBufferSize + i] = kCeltWindow120[i] * etmp[kOverlap - 1 - i] +
                                     kCeltWindow120[kOverlap - i - 1] * etmp[i];
      }
    }
  }
  // de-emphasis
  for (int c = 0; c < C; c++) {
    float m = preemph_mem[c];
    const float* x = out_syn[c];
    float* y = pcm + c;
    for (int j = 0; j < N; j++) {
      float tmp = x[j] + m + 1e-30f;
      m = 0.85000610f * tmp;
      y[static_cast<size_t>(j) * C] = tmp * (1.f / 32768.f);
    }
    preemph_mem[c] = m;
  }
  loss_count++;
}

}  // namespace zop
