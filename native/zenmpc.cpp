// zenmpc.cpp — from-scratch Musepack SV8 (.mpc) decoder.
//
// The reference front door accepts .mpc because libnyquist routes it
// through a vendored decoder; this gives the rebuild the same
// capability without vendoring anything.  Implements the SV8 ("MPCK")
// stream: chunked container with CRC-checked stream header, audio
// blocks with key frames, the canonical Huffman entropy layer
// (bands / residue / SCFI / DSCF / sample books incl. the adaptive
// two-book switching), enumerative + integer-log side codes, noise
// substitution (the format's LFSR), mid/side stereo, requantization,
// and the MPEG polyphase synthesis filterbank (shared ISO D window,
// zenmp3_tables.h).  Legacy SV7 ("MP+") streams are rejected with a
// clear error.
//
// The standard Huffman tables live in zenmpc_tables.h (generated —
// see scripts/gen_mpc_tables.py for provenance).  Decode semantics
// were studied from the public libmpcdec the reference vendors
// (mpc_decoder.c / mpc_demux.c / streaminfo.c / requant.c); the
// implementation here is original and validated against a reference
// decode of real encoder output.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <new>
#include <vector>

#include "zenmpc_tables.h"
#include "zenmp3_tables.h"  // kSynthD: the shared ISO synthesis window

namespace {

struct MpcError {};
[[noreturn]] void fail() { throw MpcError{}; }

constexpr int kFrameLen = 36 * 32;
constexpr int kSynthDelay = 481;

// ---- MSB-first bit reader --------------------------------------------------
struct Bits {
  const uint8_t* d = nullptr;
  size_t nbits = 0;
  size_t pos = 0;

  void init(const uint8_t* data, size_t bytes, size_t start_bit = 0) {
    d = data;
    nbits = bytes * 8;
    pos = start_bit;
  }
  uint32_t get(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; ++i) {
      uint32_t b = 0;
      if (pos < nbits) b = (d[pos >> 3] >> (7 - (pos & 7))) & 1;
      else fail();  // block sizes bound every read; overrun = corrupt
      ++pos;
      v = (v << 1) | b;
    }
    return v;
  }
  uint32_t get1() { return get(1); }
  uint64_t varint() {  // base-128, high bit = continuation
    uint64_t size = 0;
    for (int i = 0; i < 10; ++i) {
      uint32_t tmp = get(8);
      size = (size << 7) | (tmp & 0x7F);
      if (size > (1ull << 40)) fail();  // bound before it can wrap
      if (!(tmp & 0x80)) return size;
    }
    fail();
  }
};

// ---- canonical huffman tries ----------------------------------------------
struct Trie {
  std::vector<int32_t> nodes;
  void build(const MpcHuff* tab, int n) {
    nodes.assign(2, 0);
    for (int e = 0; e < n; ++e) {
      int node = 0;
      for (int i = tab[e].len - 1; i >= 0; --i) {
        int bit = (tab[e].code >> i) & 1;
        size_t slot = 2 * node + bit;
        if (i == 0) {
          if (nodes[slot] != 0) fail();
          nodes[slot] = -(static_cast<int32_t>(tab[e].value) + 200);
        } else {
          if (nodes[slot] < 0) fail();
          if (nodes[slot] == 0) {
            nodes[slot] = static_cast<int32_t>(nodes.size() / 2);
            nodes.resize(nodes.size() + 2, 0);
          }
          node = nodes[slot];
        }
      }
    }
  }
  int decode(Bits& b) const {
    int node = 0;
    for (int guard = 0; guard < 17; ++guard) {
      int32_t c = nodes[2 * node + b.get1()];
      if (c < 0) return -c - 200;
      if (c == 0) fail();
      node = c;
    }
    fail();
  }
};

struct Books {
  Trie scfi[2], dscf[2], bands, res[2], q1, q9up;
  Trie q2[2], q3, q4, q5[2], q6[2], q7[2], q8[2];
  Books() {
    scfi[0].build(kMpcSCFI1, kMpcSCFI1Len);
    scfi[1].build(kMpcSCFI2, kMpcSCFI2Len);
    dscf[0].build(kMpcDSCF1, kMpcDSCF1Len);
    dscf[1].build(kMpcDSCF2, kMpcDSCF2Len);
    bands.build(kMpcBands, kMpcBandsLen);
    res[0].build(kMpcRes1, kMpcRes1Len);
    res[1].build(kMpcRes2, kMpcRes2Len);
    q1.build(kMpcQ1, kMpcQ1Len);
    q2[0].build(kMpcQ2_1, kMpcQ2_1Len);
    q2[1].build(kMpcQ2_2, kMpcQ2_2Len);
    q3.build(kMpcQ3, kMpcQ3Len);
    q4.build(kMpcQ4, kMpcQ4Len);
    q5[0].build(kMpcQ5_1, kMpcQ5_1Len);
    q5[1].build(kMpcQ5_2, kMpcQ5_2Len);
    q6[0].build(kMpcQ6_1, kMpcQ6_1Len);
    q6[1].build(kMpcQ6_2, kMpcQ6_2Len);
    q7[0].build(kMpcQ7_1, kMpcQ7_1Len);
    q7[1].build(kMpcQ7_2, kMpcQ7_2Len);
    q8[0].build(kMpcQ8_1, kMpcQ8_1Len);
    q8[1].build(kMpcQ8_2, kMpcQ8_2Len);
    q9up.build(kMpcQ9up, kMpcQ9upLen);
  }
};
const Books g_books;

// "economical" binary code for a value in [0, total): read
// bit_length(total)-1 bits, extend by one bit iff the short prefix
// falls in the escape range
uint32_t econ_dec(Bits& b, uint32_t total) {
  if (total <= 1) return 0;
  int nbits = 0;
  for (uint32_t t = total; t; t >>= 1) ++nbits;
  uint32_t lost = (1u << nbits) - total;
  uint32_t v = b.get(nbits - 1);
  if (v >= lost) v = ((v << 1) | b.get1()) - lost;
  if (v >= total) fail();
  return v;
}

// integer-log code: value in [0, max] inclusive
uint32_t log_dec(Bits& b, uint32_t maxv) {
  return econ_dec(b, maxv + 1);
}

// enumerative code: rank -> k-of-n bit pattern (combinadic unranking)
uint32_t enum_dec(Bits& b, int k, int n) {
  static uint32_t C[33][33];
  static bool init = false;
  if (!init) {
    for (int i = 0; i <= 32; ++i) {
      C[i][0] = 1;
      for (int j = 1; j <= 32; ++j)
        C[i][j] = (j > i) ? 0 : C[i - 1][j - 1] + C[i - 1][j];
    }
    init = true;
  }
  if (k <= 0 || k > n || n > 32) fail();
  uint32_t idx = econ_dec(b, C[n][k]);
  uint32_t bitmap = 0;
  for (int i = n - 1; i >= 0 && k > 0; --i) {
    if (idx >= C[i][k]) {
      idx -= C[i][k];
      bitmap |= 1u << i;
      --k;
    }
  }
  return bitmap;
}

// ---- requantization constants ---------------------------------------------
// 65536/(2*D+1) style coefficients and quantizer offsets; index 0 is
// the Res==-1 (noise) entry, so lookups use [Res + 1]
const double kCc[19] = {
    111.285962475327, 65536.0, 21845.333333333332, 13107.200000000001,
    9362.285714285713, 7281.777777777777, 4369.066666666666,
    2114.064516129032, 1040.253968253968, 516.031496062992,
    257.003921568627, 128.250489236790, 64.062561094819, 32.015632633121,
    16.003907203907, 8.000976681723, 4.000244155527, 2.000061037018,
    1.000015259021};
const int kDc[19] = {2,     0,    1,    2,    3,    4,    7,    15,   31,  63,
                     127,   255,  511,  1023, 2047, 4095, 8191, 16383, 32767};

struct ScfTable {
  float g[256];
  ScfTable() {
    // ratio 1.20050805774840750476 per index step, wrapped at 8 bits
    const double r = 0.83298066476582673961;
    const double base = 1.0 / 32768.0;
    double f1 = base, f2 = base;
    g[1] = static_cast<float>(base);
    for (int n = 1; n <= 128; ++n) {
      f1 *= r;
      f2 /= r;
      g[static_cast<uint8_t>(1 + n)] = static_cast<float>(f1);
      g[static_cast<uint8_t>(1 - n)] = static_cast<float>(f2);
    }
  }
};
const ScfTable g_scf;

// parity-feedback LFSR used for noise substitution
struct NoiseGen {
  uint32_t r1 = 1, r2 = 1;
  static int parity(uint32_t v) {
    v ^= v >> 4;
    v ^= v >> 2;
    v ^= v >> 1;
    return v & 1;
  }
  uint32_t next() {
    uint32_t t3 = r1, t4 = r2;
    uint32_t t1 = static_cast<uint32_t>(parity(r1 & 0xF5)) << 31;
    uint32_t t2 = static_cast<uint32_t>(parity((r2 >> 25) & 0x63));
    r1 = (t3 >> 1) | t1;
    r2 = (t4 + t4) | t2;
    return r1 ^ r2;
  }
  int sample() {
    uint32_t t = next();
    return static_cast<int>(((t >> 24) & 0xFF) + ((t >> 16) & 0xFF) +
                            ((t >> 8) & 0xFF) + (t & 0xFF)) - 510;
  }
};

// ---- synthesis (shared MPEG polyphase) ------------------------------------
struct SynthTables {
  float N[64][32];
  SynthTables() {
    for (int i = 0; i < 64; ++i)
      for (int b = 0; b < 32; ++b)
        N[i][b] = static_cast<float>(
            std::cos((16 + i) * (2 * b + 1) * M_PI / 64.0));
  }
};
const SynthTables g_synthN;

struct SynthState {
  float hist[1024 + 64] = {0};
};

void synth_step(SynthState& st, const float* S, float* pcm) {
  std::memmove(st.hist + 64, st.hist, 1024 * sizeof(float));
  for (int i = 0; i < 64; ++i) {
    float acc = 0.0f;
    for (int b = 0; b < 32; ++b) acc += g_synthN.N[i][b] * S[b];
    st.hist[i] = acc;
  }
  static const int off[16] = {0, 96, 128, 224, 256, 352, 384, 480,
                              512, 608, 640, 736, 768, 864, 896, 992};
  for (int k = 0; k < 32; ++k) {
    float acc = 0.0f;
    for (int i = 0; i < 16; ++i)
      acc += st.hist[off[i] + k] * kSynthD[k + 32 * i];
    pcm[k] = acc;
  }
}

// ---- SV8 frame decoder -----------------------------------------------------
struct Decoder {
  int channels = 1;
  bool ms = false;
  int max_band = 0;

  int last_max_band = 0;
  int res[2][32] = {{0}, {0}};
  int ms_flag[32] = {0};
  int scfi[2][32] = {{0}, {0}};
  int scf_idx[2][32][3];
  uint8_t dscf_flag[2][32] = {{0}, {0}};
  int16_t q[2][32][36];
  NoiseGen noise;
  SynthState synth[2];

  // one frame: entropy decode + requant into y[ch][36*32] (row-major
  // time x band)
  void decode_frame(Bits& b, bool key_frame, float y[2][kFrameLen]) {
    int max_used;
    if (key_frame) {
      max_used = static_cast<int>(log_dec(b, max_band + 1));
      for (int n = 0; n < 32; ++n)
        dscf_flag[0][n] = dscf_flag[1][n] = 1;
    } else {
      max_used = last_max_band + g_books.bands.decode(b);
      if (max_used > 32) max_used -= 33;
    }
    if (max_used < 0 || max_used > 32) fail();
    last_max_band = max_used;

    if (max_used) {
      for (int c = 0; c < 2; ++c) {
        int v = g_books.res[0].decode(b);
        if (v > 15) v -= 17;
        res[c][max_used - 1] = v;
      }
      for (int n = max_used - 2; n >= 0; --n)
        for (int c = 0; c < 2; ++c) {
          int v = g_books.res[res[c][n + 1] > 2 ? 1 : 0].decode(b) +
                  res[c][n + 1];
          if (v > 15) v -= 17;
          res[c][n] = v;
        }
      if (ms) {
        int tot = 0;
        for (int n = 0; n < max_used; ++n)
          if (res[0][n] != 0 || res[1][n] != 0) ++tot;
        uint32_t cnt = log_dec(b, tot);
        uint32_t tmp = 0;
        if (cnt != 0 && static_cast<int>(cnt) != tot)
          tmp = enum_dec(b, static_cast<int>(cnt) <= tot - static_cast<int>(cnt)
                                ? static_cast<int>(cnt)
                                : tot - static_cast<int>(cnt),
                         tot);
        if (static_cast<int>(cnt) * 2 > tot) tmp = ~tmp;
        for (int n = max_used - 1; n >= 0; --n)
          if (res[0][n] != 0 || res[1][n] != 0) {
            ms_flag[n] = tmp & 1;
            tmp >>= 1;
          }
      }
    }
    for (int n = max_used; n < 32; ++n) res[0][n] = res[1][n] = 0;

    // SCFI
    for (int n = 0; n < max_used; ++n) {
      int cnt = -1;
      if (res[0][n]) ++cnt;
      if (res[1][n]) ++cnt;
      if (cnt >= 0) {
        int tmp = g_books.scfi[cnt].decode(b);
        if (res[0][n]) scfi[0][n] = tmp >> (2 * cnt);
        if (res[1][n]) scfi[1][n] = tmp & 3;
      }
    }

    // SCF / DSCF
    for (int n = 0; n < max_used; ++n)
      for (int c = 0; c < 2; ++c) {
        if (!res[c][n]) continue;
        int* SCF = scf_idx[c][n];
        if (dscf_flag[c][n] == 1) {
          SCF[0] = static_cast<int>(b.get(7)) - 6;
          dscf_flag[c][n] = 0;
        } else {
          unsigned tmp = g_books.dscf[1].decode(b);
          if (tmp == 64) tmp += b.get(6);
          SCF[0] = ((SCF[2] - 25 + static_cast<int>(tmp)) & 127) - 6;
        }
        for (int m = 0; m < 2; ++m) {
          if (((scfi[c][n] << m) & 2) == 0) {
            unsigned tmp = g_books.dscf[0].decode(b);
            if (tmp == 31) tmp = 64 + b.get(6);
            SCF[m + 1] = ((SCF[m] - 25 + static_cast<int>(tmp)) & 127) - 6;
          } else {
            SCF[m + 1] = SCF[m];
          }
        }
      }

    // samples
    static const unsigned thres[] = {0, 0, 3, 0, 0, 1, 3, 4, 8};
    static const int8_t q2var[125] = {
        6, 5, 4, 5, 6, 5, 4, 3, 4, 5, 4, 3, 2, 3, 4, 5, 4, 3, 4, 5, 6, 5, 4,
        5, 6, 5, 4, 3, 4, 5, 4, 3, 2, 3, 4, 3, 2, 1, 2, 3, 4, 3, 2, 3, 4, 5,
        4, 3, 4, 5, 4, 3, 2, 3, 4, 3, 2, 1, 2, 3, 2, 1, 0, 1, 2, 3, 2, 1, 2,
        3, 4, 3, 2, 3, 4, 5, 4, 3, 4, 5, 4, 3, 2, 3, 4, 3, 2, 1, 2, 3, 4, 3,
        2, 3, 4, 5, 4, 3, 4, 5, 6, 5, 4, 5, 6, 5, 4, 3, 4, 5, 4, 3, 2, 3, 4,
        5, 4, 3, 4, 5, 6, 5, 4, 5, 6};
    for (int n = 0; n < max_used; ++n)
      for (int c = 0; c < 2; ++c) {
        int16_t* qq = q[c][n];
        int Res = res[c][n];
        if (Res == 0) {
          std::memset(qq, 0, 36 * sizeof(int16_t));
          continue;
        }
        if (Res == 2) {
          unsigned idx = 2 * thres[2];
          for (int k = 0; k < 36; k += 3) {
            int tmp = g_books.q2[idx > thres[2] ? 1 : 0].decode(b);
            if (tmp < 0 || tmp > 124) fail();
            qq[k] = static_cast<int16_t>(tmp % 5 - 2);
            qq[k + 1] = static_cast<int16_t>((tmp / 5) % 5 - 2);
            qq[k + 2] = static_cast<int16_t>((tmp / 25) % 5 - 2);
            idx = (idx >> 1) + q2var[tmp];
          }
        } else if (Res == 1) {
          for (int k = 0; k < 36;) {
            int kmax = k + 18;
            unsigned cnt = g_books.q1.decode(b);
            uint32_t idx = 0;
            if (cnt > 0 && cnt < 18)
              idx = enum_dec(b, cnt <= 9 ? cnt : 18 - cnt, 18);
            if (cnt > 9) idx = ~idx;
            for (; k < kmax; ++k) {
              qq[k] = 0;
              if (idx & (1u << 17))
                qq[k] = static_cast<int16_t>((b.get1() << 1) - 1);
              idx <<= 1;
            }
          }
        } else if (Res == -1) {
          for (int k = 0; k < 36; ++k)
            qq[k] = static_cast<int16_t>(noise.sample());
        } else if (Res < -1) {
          fail();  // not producible by conforming encoders
        } else if (Res <= 4) {
          const Trie& t = Res == 3 ? g_books.q3 : g_books.q4;
          for (int k = 0; k < 36; k += 2) {
            int sym = t.decode(b);
            // two samples packed as signed nibbles
            int8_t s = static_cast<int8_t>(sym);
            qq[k] = static_cast<int16_t>(static_cast<int8_t>(
                        static_cast<uint8_t>(s) << 4) >> 4);
            qq[k + 1] = static_cast<int16_t>(s >> 4);
          }
        } else if (Res <= 8) {
          const Trie* two = Res == 5   ? g_books.q5
                            : Res == 6 ? g_books.q6
                            : Res == 7 ? g_books.q7
                                       : g_books.q8;
          unsigned idx = 2 * thres[Res];
          for (int k = 0; k < 36; ++k) {
            int v = two[idx > thres[Res] ? 1 : 0].decode(b);
            qq[k] = static_cast<int16_t>(v);
            idx = (idx >> 1) + (v < 0 ? -v : v);
          }
        } else {
          if (Res > 18) fail();
          for (int k = 0; k < 36; ++k) {
            int v = static_cast<uint8_t>(g_books.q9up.decode(b));
            if (Res != 9) v = (v << (Res - 9)) | b.get(Res - 9);
            qq[k] = static_cast<int16_t>(v - kDc[Res + 1]);
          }
        }
      }

    // requantization (+ mid/side)
    for (int ch = 0; ch < 2; ++ch)
      std::memset(y[ch], 0, kFrameLen * sizeof(float));
    for (int n = 0; n < 32; ++n) {
      int rl = res[0][n], rr = res[1][n];
      if (!rl && !rr && !ms_flag[n]) continue;
      for (int third = 0; third < 3; ++third) {
        float facL = rl ? static_cast<float>(
                              kCc[rl + 1] *
                              g_scf.g[scf_idx[0][n][third] & 0xFF])
                        : 0.0f;
        float facR = rr ? static_cast<float>(
                              kCc[rr + 1] *
                              g_scf.g[scf_idx[1][n][third] & 0xFF])
                        : 0.0f;
        for (int t = third * 12; t < third * 12 + 12; ++t) {
          float l = facL * q[0][n][t];
          float r = facR * q[1][n][t];
          if (ms_flag[n]) {
            y[0][t * 32 + n] = l + r;
            y[1][t * 32 + n] = l - r;
          } else {
            y[0][t * 32 + n] = l;
            y[1][t * 32 + n] = r;
          }
        }
      }
    }
  }
};

struct DecodedM {
  int fs = 0;
  int channels = 0;
  std::vector<std::vector<float>> pcm;
};

void decode_stream(const uint8_t* d, size_t len, DecodedM& out) {
  if (len < 12 || std::memcmp(d, "MPCK", 4) != 0) {
    if (len >= 3 && std::memcmp(d, "MP+", 3) == 0)
      fail();  // legacy SV7: unsupported (documented)
    fail();
  }
  size_t off = 4;
  uint64_t total_samples = 0, beg_silence = 0;
  int block_pwr = 0;
  bool have_sh = false;
  Decoder dec;
  std::vector<float> pcm[2];
  int64_t to_skip = 0;

  // zlib-style CRC32 for the SH payload check
  auto crc32 = [](const uint8_t* p, size_t n) {
    static uint32_t table[256];
    static bool init = false;
    if (!init) {
      for (uint32_t i = 0; i < 256; ++i) {
        uint32_t c = i;
        for (int k = 0; k < 8; ++k)
          c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
        table[i] = c;
      }
      init = true;
    }
    uint32_t c = 0xFFFFFFFFu;
    for (size_t i = 0; i < n; ++i) c = table[(c ^ p[i]) & 0xFF] ^ (c >> 8);
    return c ^ 0xFFFFFFFFu;
  };

  float y[2][kFrameLen];
  std::vector<float> row_pcm(32);
  uint64_t produced = 0;

  while (off + 3 <= len) {
    Bits hb;
    hb.init(d + off, len - off);
    char k0 = static_cast<char>(hb.get(8));
    char k1 = static_cast<char>(hb.get(8));
    uint64_t size = hb.varint();
    size_t hdr_bytes = hb.pos / 8;
    // subtraction form: `off + size` could wrap for a hostile varint
    if (size < hdr_bytes || size > len - off) fail();
    size_t payload = static_cast<size_t>(size) - hdr_bytes;
    const uint8_t* body = d + off + hdr_bytes;
    if (k0 == 'S' && k1 == 'H') {
      if (payload < 5) fail();
      Bits b;
      b.init(body, payload);
      uint32_t want = b.get(16) << 16 | b.get(16);
      if (want != crc32(body + 4, payload - 4)) fail();
      if (b.get(8) != 8) fail();  // stream version
      total_samples = b.varint();
      beg_silence = b.varint();
      static const int rates[8] = {44100, 48000, 37800, 32000, 0, 0, 0, 0};
      dec.channels = 0;
      int fs = rates[b.get(3)];
      if (!fs) fail();
      dec.max_band = static_cast<int>(b.get(5)) + 1;
      dec.channels = static_cast<int>(b.get(4)) + 1;
      dec.ms = b.get1() != 0;
      block_pwr = static_cast<int>(b.get(3)) * 2;
      if (dec.channels > 2) fail();  // SV8 allows 2 max anyway
      out.fs = fs;
      out.channels = dec.channels;
      have_sh = true;
      to_skip = kSynthDelay + static_cast<int64_t>(beg_silence);
    } else if (k0 == 'A' && k1 == 'P') {
      if (!have_sh) fail();
      Bits b;
      b.init(body, payload);
      int frames = 1 << block_pwr;
      for (int f = 0; f < frames; ++f) {
        if (produced >= total_samples + kSynthDelay) break;
        dec.decode_frame(b, f == 0, y);
        // synthesize
        size_t base0 = pcm[0].size();
        for (int c = 0; c < dec.channels; ++c) pcm[c].resize(base0 + kFrameLen);
        for (int t = 0; t < 36; ++t) {
          for (int c = 0; c < dec.channels; ++c) {
            synth_step(dec.synth[c], &y[c][t * 32], row_pcm.data());
            std::memcpy(pcm[c].data() + base0 + 32 * t, row_pcm.data(),
                        32 * sizeof(float));
          }
        }
        produced += kFrameLen;
      }
    } else if (k0 == 'S' && k1 == 'E') {
      break;
    } else if (!(k0 >= 'A' && k0 <= 'Z' && k1 >= 'A' && k1 <= 'Z')) {
      fail();
    }
    off += static_cast<size_t>(size);
  }
  if (!have_sh || !out.channels) fail();

  // trim the synthesis delay + encoder padding, cap to declared length
  uint64_t want = total_samples > beg_silence ? total_samples - beg_silence : 0;
  out.pcm.resize(out.channels);
  for (int c = 0; c < out.channels; ++c) {
    std::vector<float>& v = pcm[c];
    size_t start = static_cast<size_t>(
        to_skip < static_cast<int64_t>(v.size()) ? to_skip : v.size());
    size_t avail = v.size() - start;
    size_t keep = static_cast<size_t>(want < avail ? want : avail);
    out.pcm[c].assign(v.begin() + start, v.begin() + start + keep);
  }
}

}  // namespace

extern "C" {

int zen_mpc_decode_mem(const uint8_t* data, uint64_t len, float** out,
                       uint64_t* frames, int32_t* fs, int32_t* nch) {
  *out = nullptr;
  *frames = 0;
  try {
    DecodedM dec;
    decode_stream(data, static_cast<size_t>(len), dec);
    size_t n = dec.pcm.empty() ? 0 : dec.pcm[0].size();
    for (auto& c : dec.pcm)
      if (c.size() != n) return 2;
    float* buf = static_cast<float*>(malloc(n * dec.channels * sizeof(float)));
    if (!buf && n) return 3;
    for (size_t i = 0; i < n; ++i)
      for (int c = 0; c < dec.channels; ++c)
        buf[i * dec.channels + c] = dec.pcm[c][i];
    *out = buf;
    *frames = n;
    *fs = dec.fs;
    *nch = dec.channels;
    return 0;
  } catch (const MpcError&) {
    return 1;
  } catch (const std::bad_alloc&) {
    return 3;
  }
}

int zen_mpc_decode_file(const char* path, float** out, uint64_t* frames,
                        int32_t* fs, int32_t* nch) {
  *out = nullptr;
  *frames = 0;
  FILE* f = fopen(path, "rb");
  if (!f) return 10;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (sz <= 0 || sz > (1L << 31)) {
    fclose(f);
    return 11;
  }
  uint8_t* buf = static_cast<uint8_t*>(malloc(static_cast<size_t>(sz)));
  if (!buf) {
    fclose(f);
    return 12;
  }
  size_t got = fread(buf, 1, static_cast<size_t>(sz), f);
  fclose(f);
  if (got != static_cast<size_t>(sz)) {
    free(buf);
    return 13;
  }
  int rc = zen_mpc_decode_mem(buf, got, out, frames, fs, nch);
  free(buf);
  return rc;
}

void zen_mpc_free(float* p) { free(p); }

}  // extern "C"
