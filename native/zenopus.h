// zenopus.h — shared internals for the from-scratch Opus decoder.
//
// The reference front door accepts .opus because libnyquist routes it
// through opusfile/libopus (vendor/libnyquist/src/OpusDecoder.cpp:28,
// src/Common.cpp:181); this rebuild implements RFC 6716 decode from
// scratch: range decoder (§4.1), SILK (§4.2, fixed-point exact),
// CELT (§4.3), hybrid glue and 48 kHz output.  Format semantics were
// studied from RFC 6716 and the IETF reference sources the mount
// vendors (celt/entdec.c, silk/dec_API.c + decode_*.c,
// celt/celt_decoder.c, libopus/src/opus_decoder.c); the code here is
// original, bounds-checked, and validated against a test-time-compiled
// libopus oracle (tests/test_opus.py) plus per-packet differential
// fuzzing across every mode/bandwidth/frame-size the encoder can emit.
#pragma once

#include <cstdint>
#include <cstring>
#include <vector>

namespace zop {

struct OpError {};  // malformed/unsupported stream
[[noreturn]] inline void fail() { throw OpError{}; }

// ---- fixed-point helpers (SILK Q-arithmetic, wrap-defined) ----------------
// Semantics match silk/macros.h + SigProc_FIX.h generic (non-ARM) forms;
// expressed via int64/uint32 so every op is defined behavior under UBSan.
inline int32_t wrap32(int64_t v) { return static_cast<int32_t>(static_cast<uint32_t>(v)); }
// Left shifts of possibly-negative values, expressed as multiplication
// so they are defined behavior (and wrap like the reference's builds).
inline int64_t lshift64(int64_t a, int n) { return a * (int64_t(1) << n); }
inline int32_t lshift32(int32_t a, int n) { return wrap32(lshift64(a, n)); }
inline int32_t smulbb(int32_t a, int32_t b) {
  return static_cast<int16_t>(a) * static_cast<int32_t>(static_cast<int16_t>(b));
}
inline int32_t smlabb(int32_t a, int32_t b, int32_t c) { return wrap32(int64_t(a) + smulbb(b, c)); }
inline int32_t smulwb(int32_t a, int32_t b) {
  return wrap32((int64_t(a) * static_cast<int16_t>(b)) >> 16);
}
inline int32_t smlawb(int32_t a, int32_t b, int32_t c) { return wrap32(int64_t(a) + smulwb(b, c)); }
inline int32_t smulww(int32_t a, int32_t b) { return wrap32((int64_t(a) * b) >> 16); }
inline int32_t smlaww(int32_t a, int32_t b, int32_t c) { return wrap32(int64_t(a) + smulww(b, c)); }
inline int32_t smmul(int32_t a, int32_t b) { return static_cast<int32_t>((int64_t(a) * b) >> 32); }
inline int32_t rshift_round(int32_t a, int shift) {
  // silk_RSHIFT_ROUND: shift in [1,31]; wrap-defined increment
  return shift == 1 ? (a >> 1) + (a & 1) : wrap32((int64_t(a >> (shift - 1)) + 1) >> 1);
}
inline int64_t rshift_round64(int64_t a, int shift) {
  return shift == 1 ? (a >> 1) + (a & 1) : ((a >> (shift - 1)) + 1) >> 1;
}
inline int32_t sat16(int32_t v) { return v > 32767 ? 32767 : (v < -32768 ? -32768 : v); }
inline int32_t add_lshift32(int32_t a, int32_t b, int shift) {
  return wrap32(int64_t(a) + (lshift64(int64_t(b), shift)));
}
inline int32_t lshift_sat32(int32_t a, int shift) {
  int64_t v = lshift64(int64_t(a), shift);
  if (v > INT32_MAX) return INT32_MAX;
  if (v < INT32_MIN) return INT32_MIN;
  return static_cast<int32_t>(v);
}
inline int clz32(uint32_t v) { return v ? __builtin_clz(v) : 32; }
inline int32_t silk_abs32(int32_t v) { return v < 0 ? wrap32(-int64_t(v)) : v; }
inline int32_t lcg_rand(int32_t seed) {
  return wrap32(907633515u + uint32_t(seed) * 196314165u);
}

// silk_SQRT_APPROX (silk/Inlines.h:73-98)
inline int32_t sqrt_approx(int32_t x) {
  if (x <= 0) return 0;
  int lz = clz32(static_cast<uint32_t>(x));
  // 7 bits right after the leading one (silk_CLZ_FRAC via ROR32)
  int rot = (24 - lz) & 31;
  uint32_t u = static_cast<uint32_t>(x);
  int32_t frac_q7 = static_cast<int32_t>(((u >> rot) | (u << ((32 - rot) & 31))) & 0x7f);
  int32_t y = (lz & 1) ? 32768 : 46214;
  y >>= (lz >> 1);
  return smlawb(y, y, smulbb(213, frac_q7));
}

// silk_INVERSE32_varQ (silk/Inlines.h:122-160): ~ (1<<q) / b
inline int32_t inverse32_varq(int32_t b, int q) {
  int headrm = clz32(static_cast<uint32_t>(silk_abs32(b))) - 1;
  int32_t b_nrm = wrap32(lshift64(int64_t(b), headrm));
  int32_t b_inv = (INT32_MAX >> 2) / static_cast<int16_t>(b_nrm >> 16);
  int32_t result = wrap32(lshift64(int64_t(b_inv), 16));
  int32_t err_q32 = wrap32(lshift64(int64_t(1 << 29) - smulwb(b_nrm, b_inv), 3));
  result = smlaww(result, err_q32, b_inv);
  int lshift = 61 - headrm - q;
  if (lshift <= 0) return lshift_sat32(result, -lshift);
  return lshift < 32 ? (result >> lshift) : 0;
}

// silk_DIV32_varQ (silk/Inlines.h:71-116): ~ (a<<q) / b
inline int32_t div32_varq(int32_t a, int32_t b, int q) {
  int a_head = clz32(static_cast<uint32_t>(silk_abs32(a))) - 1;
  int32_t a_nrm = wrap32(lshift64(int64_t(a), a_head));
  int b_head = clz32(static_cast<uint32_t>(silk_abs32(b))) - 1;
  int32_t b_nrm = wrap32(lshift64(int64_t(b), b_head));
  int32_t b_inv = (INT32_MAX >> 2) / static_cast<int16_t>(b_nrm >> 16);
  int32_t result = smulwb(a_nrm, b_inv);
  a_nrm = wrap32(int64_t(a_nrm) - (lshift64(int64_t(smmul(b_nrm, result)), 3)));
  result = smlawb(result, a_nrm, b_inv);
  int lshift = 29 + a_head - b_head - q;
  if (lshift < 0) return lshift_sat32(result, -lshift);
  return lshift < 32 ? (result >> lshift) : 0;
}

// silk_log2lin (silk/log2lin.c): 2^(x/128) with parabolic fraction
inline int32_t silk_log2lin(int32_t in_log_q7) {
  if (in_log_q7 < 0) return 0;
  if (in_log_q7 >= 3967) return INT32_MAX;
  int32_t out = 1 << (in_log_q7 >> 7);
  int32_t frac = in_log_q7 & 0x7F;
  int32_t corr = smlawb(frac, smulbb(frac, 128 - frac), -174);
  if (in_log_q7 < 2048) return wrap32(int64_t(out) + ((int64_t(out) * corr) >> 7));
  return wrap32(int64_t(out) + int64_t(out >> 7) * corr);
}

// ---- range decoder (RFC 6716 §4.1; celt/entdec.c semantics) ---------------
struct RangeDec {
  const uint8_t* buf = nullptr;
  uint32_t storage = 0;
  uint32_t offs = 0;       // next front byte
  uint32_t end_offs = 0;   // bytes consumed from the back (raw bits)
  uint32_t end_window = 0;
  int nend_bits = 0;
  int nbits_total = 0;
  uint32_t val = 0, rng = 0, ext = 0;
  int rem = 0;
  bool error = false;

  static constexpr uint32_t kCodeTop = 1u << 31;
  static constexpr uint32_t kCodeBot = kCodeTop >> 8;
  static constexpr int kCodeExtra = 7;  // (32-2)%8+1

  void init(const uint8_t* data, uint32_t len) {
    buf = data;
    storage = len;
    end_offs = 0;
    end_window = 0;
    nend_bits = 0;
    nbits_total = 33 - 24;  // EC_CODE_BITS+1 - ((32-7)/8)*8
    offs = 0;
    rng = 1u << kCodeExtra;
    rem = read_byte();
    val = rng - 1 - static_cast<uint32_t>(rem >> 1);
    error = false;
    normalize();
  }
  int read_byte() { return offs < storage ? buf[offs++] : 0; }
  int read_byte_back() { return end_offs < storage ? buf[storage - ++end_offs] : 0; }
  void normalize() {
    while (rng <= kCodeBot) {
      nbits_total += 8;
      rng <<= 8;
      int sym = rem;
      rem = read_byte();
      sym = ((sym << 8) | rem) >> 1;  // 8 - kCodeExtra
      val = ((val << 8) + (0xFFu & ~static_cast<uint32_t>(sym))) & (kCodeTop - 1);
    }
  }
  unsigned decode(unsigned ft) {
    ext = rng / ft;
    unsigned s = static_cast<unsigned>(val / ext);
    return ft - (s + 1 < ft ? s + 1 : ft);
  }
  unsigned decode_bin(unsigned bits) {
    ext = rng >> bits;
    unsigned s = static_cast<unsigned>(val / ext);
    unsigned ft = 1u << bits;
    return ft - (s + 1 < ft ? s + 1 : ft);
  }
  void update(unsigned fl, unsigned fh, unsigned ft) {
    uint32_t s = ext * (ft - fh);
    val -= s;
    rng = fl > 0 ? ext * (fh - fl) : rng - s;
    normalize();
  }
  int bit_logp(unsigned logp) {
    uint32_t r = rng, d = val;
    uint32_t s = r >> logp;
    int ret = d < s;
    if (!ret) val = d - s;
    rng = ret ? s : r - s;
    normalize();
    return ret;
  }
  int icdf(const uint8_t* table, unsigned ftb) {
    uint32_t s = rng, d = val, t;
    uint32_t r = s >> ftb;
    int ret = -1;
    do {
      t = s;
      s = r * table[++ret];
    } while (d < s);
    val = d - s;
    rng = t - s;
    normalize();
    return ret;
  }
  uint32_t dec_bits(unsigned bits) {  // raw bits from the back
    uint32_t window = end_window;
    int available = nend_bits;
    if (static_cast<unsigned>(available) < bits) {
      do {
        window |= static_cast<uint32_t>(read_byte_back()) << available;
        available += 8;
      } while (available <= 24);
    }
    uint32_t ret = window & ((1u << bits) - 1);
    window >>= bits;
    available -= static_cast<int>(bits);
    end_window = window;
    nend_bits = available;
    nbits_total += static_cast<int>(bits);
    return ret;
  }
  uint32_t dec_uint(uint32_t ft) {
    if (ft <= 1) fail();
    ft--;
    int ftb = 32 - clz32(ft);
    if (ftb > 8) {
      ftb -= 8;
      uint32_t ft1 = (ft >> ftb) + 1;
      unsigned s = decode(ft1);
      update(s, s + 1, ft1);
      uint32_t t = (static_cast<uint32_t>(s) << ftb) | dec_bits(static_cast<unsigned>(ftb));
      if (t <= ft) return t;
      error = true;
      return ft;
    }
    ft++;
    unsigned s = decode(ft);
    update(s, s + 1, ft);
    return s;
  }
  int tell() const { return nbits_total - (32 - clz32(rng)); }
  uint32_t tell_frac() const {
    uint32_t nbits = static_cast<uint32_t>(nbits_total) << 3;
    int l = 32 - clz32(rng);
    uint32_t r = rng >> (l - 16);
    for (int i = 0; i < 3; i++) {
      r = (r * r) >> 15;
      int b = static_cast<int>(r >> 16);
      l = (l << 1) | b;
      r >>= b;
    }
    return nbits - static_cast<uint32_t>(l);
  }
};

// ---- packet TOC (RFC 6716 §3) ---------------------------------------------
enum class Mode { kSilk, kHybrid, kCelt };
enum Bandwidth { kBwNB = 0, kBwMB, kBwWB, kBwSWB, kBwFB };

struct Toc {
  Mode mode;
  Bandwidth bw;
  int frame_samples48;  // per-frame duration at 48 kHz
  bool stereo;
  int code;
};

inline Toc parse_toc(uint8_t b) {
  Toc t{};
  int config = b >> 3;
  t.stereo = (b & 4) != 0;
  t.code = b & 3;
  if (config < 12) {
    t.mode = Mode::kSilk;
    t.bw = static_cast<Bandwidth>(config / 4);  // NB/MB/WB
    static const int kDur[4] = {480, 960, 1920, 2880};
    t.frame_samples48 = kDur[config & 3];
  } else if (config < 16) {
    t.mode = Mode::kHybrid;
    t.bw = (config < 14) ? kBwSWB : kBwFB;
    t.frame_samples48 = (config & 1) ? 960 : 480;
  } else {
    t.mode = Mode::kCelt;
    static const Bandwidth kBw[4] = {kBwNB, kBwWB, kBwSWB, kBwFB};
    t.bw = kBw[(config - 16) >> 2];
    t.frame_samples48 = 120 << (config & 3);
  }
  return t;
}

// Split a packet into frames per RFC 6716 §3.2 (codes 0-3, padding,
// VBR lengths).  Returns frame count; fills spans with (ptr,len).
int opus_packet_frames(const uint8_t* data, size_t len, Toc* toc,
                       std::vector<std::pair<const uint8_t*, int>>& frames);
// Full parse incl. Appendix-B self-delimited framing (multistream);
// packet_offset receives the total bytes consumed (incl. padding).
int opus_packet_parse(const uint8_t* data, int32_t len, bool self_delimited, Toc* toc,
                      std::vector<std::pair<const uint8_t*, int>>& frames,
                      int32_t* packet_offset);

// ---- SILK decoder ---------------------------------------------------------
struct SilkResampler {
  int fs_in_khz = 0;
  int input_delay = 0;
  int32_t inv_ratio_q16 = 0;
  int32_t iir[6] = {};
  int16_t fir[8] = {};
  int16_t delay_buf[48] = {};
  void init(int fs_khz);                                  // to 48 kHz out
  void process(int16_t* out, const int16_t* in, int n_in);  // emits 48*n/fs samples
};

struct SilkFrameIndices {
  int8_t signal_type = 0, quant_offset = 0;
  int8_t gains[4] = {};
  int8_t nlsf[17] = {};
  int8_t nlsf_interp_q2 = 4;
  int16_t lag_index = 0;
  int8_t contour_index = 0;
  int8_t per_index = 0;
  int8_t ltp_index[4] = {};
  int8_t ltp_scale_index = 0;
  int8_t seed = 0;
};

struct SilkChannel {
  // configuration (decoder_set_fs semantics)
  int fs_khz = 0;
  int nb_subfr = 0, frame_len = 0, subfr_len = 0, ltp_mem = 0, lpc_order = 0;
  const uint8_t* pitch_contour_icdf = nullptr;
  const uint8_t* lag_low_icdf = nullptr;
  bool wb = false;
  // per-packet header flags
  int frames_per_packet = 0, frames_decoded = 0;
  bool vad_flags[3] = {}, lbrr_flags[3] = {};
  bool lbrr_present = false;
  // persistent state
  int16_t out_buf[320 + 160] = {};
  int32_t slpc_q14[16] = {};
  int32_t exc_q14[320] = {};
  int16_t prev_nlsf_q15[16] = {};
  int lag_prev = 100;
  int8_t last_gain_index = 10;
  int32_t prev_gain_q16 = 65536;
  int prev_signal_type = 0;
  int ec_prev_signal_type = 0;
  int16_t ec_prev_lag_index = 0;
  bool first_frame_after_reset = true;
  int loss_cnt = 0;
  SilkResampler resampler;
  SilkFrameIndices ind;

  // PLC state (silk/PLC.c silk_PLC_struct analog)
  struct {
    int32_t pitch_l_q8 = 0;
    int16_t ltp_coef_q14[5] = {};
    int16_t prev_lpc_q12[16] = {};
    int last_frame_lost = 0;
    int32_t rand_seed = 0;
    int16_t rand_scale_q14 = 0;
    int32_t conc_energy = 0;
    int conc_energy_shift = 0;
    int16_t prev_ltp_scale_q14 = 0;
    int32_t prev_gain_q16[2] = {65536, 65536};
    int fs_khz = 0;
    int subfr_length = 20, nb_subfr = 2;
  } plc;
  // CNG state (silk/CNG.c silk_CNG_struct analog)
  struct {
    int32_t exc_buf_q14[320] = {};
    int16_t smth_nlsf_q15[16] = {};
    int32_t synth_state[16] = {};
    int32_t smth_gain_q16 = 0;
    int32_t rand_seed = 3176576;
    int fs_khz = 0;
  } cng;

  void reset();
  void set_fs(int fs_khz_new);
  void decode_header_flags(RangeDec& rd, int frames_per_pkt);
  void decode_indices(RangeDec& rd, int frame_idx, bool decode_lbrr, int cond_coding);
  void decode_pulses(RangeDec& rd, int32_t* pulses) const;
  void decode_frame(RangeDec& rd, int16_t* out, int cond_coding);
  void decode_frame_lost(int16_t* out);  // PLC concealment + CNG
  void plc_update(const int pitch_lags[], const int16_t ltp_coef[], int32_t ltp_scale_q14,
                  const int16_t pred1_q12[], const int32_t gains_q16[]);
  void plc_glue(int16_t* frame, int length);
  void cng_run(const int32_t gains_q16[], int16_t* frame, int length);
};

// Whole-SILK layer (dec_API.c analog): mono or stereo, resampled to 48 kHz.
struct SilkDecoder {
  SilkChannel ch[2];
  int n_channels_internal = 0;
  int16_t stereo_pred_prev_q13[2] = {};
  int16_t stereo_smid[2] = {}, stereo_sside[2] = {};
  int prev_decode_only_middle = 0;

  void reset();
  // Decode every SILK frame in the current packet's SILK portion.
  // channels: internal coded channels (1/2); out interleaved 48 kHz,
  // out_channels = channels.  Returns samples per channel produced.
  int decode(RangeDec& rd, int channels, int duration_ms, Bandwidth bw,
             int16_t* out, int out_channels);
  // Conceal one lost/DTX frame of duration_ms (10 or 20) at the
  // carried internal rate/channel layout; 48 kHz out as above.
  int decode_lost(int duration_ms, int16_t* out, int out_channels);
};

// ---- CELT decoder ---------------------------------------------------------
struct CeltDecoder {
  int channels = 1;       // decoder instance channels (1/2)
  int stream_channels = 1;
  int start_band = 0, end_band = 21;
  // persistent state
  float decode_mem[2][2048 + 960] = {};  // DECODE_BUFFER_SIZE + overlap history
  float lpc_state[2][24] = {};
  float old_ebands[2][21] = {};
  float old_log_e[2][21] = {};
  float old_log_e2[2][21] = {};
  float background_log_e[2][21] = {};
  float preemph_mem[2] = {};
  int postfilter_period = 0, postfilter_period_old = 0;
  float postfilter_gain = 0, postfilter_gain_old = 0;
  int postfilter_tapset = 0, postfilter_tapset_old = 0;
  uint32_t rng = 0;
  int last_pitch_index = 0;
  int loss_count = 0;

  void reset();
  // Decode one CELT frame of n48 samples (120/240/480/960) into
  // interleaved float PCM scaled to +-1.  data==nullptr → PLC.
  // Raises fail() on malformed input.
  int decode(RangeDec* rd, const uint8_t* data, int len, float* pcm, int n48);
  void decode_lost(float* pcm, int N, int LM);
};

}  // namespace zop
