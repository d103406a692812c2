// zenflac_enc — native FLAC encoder for the mono-stem product path.
//
// The pure-Python encoder (zen_tpu/io/flac.py) is the full-featured
// reference (stereo modes, every subframe type, arbitrary knobs); at
// ~1.9 Msamples/s it caps `zen corpus --stem-format flac` throughput
// on the writer thread, so the hot product shape — mono float stems,
// 16-bit, auto subframe selection — gets this native path.
//
// It mirrors the Python encoder's DECISIONS exactly (same
// quantization rounding, wasted-bit rule, fixed-order/verbatim cost
// model, Rice parameter search, RICE2 promotion, frame layout), so
// its output is BYTE-IDENTICAL to write_flac(audio, bits=16,
// block_size=..., partition_order=0) — pinned by
// tests/test_flac.py::test_native_encoder_byte_identical. Anything
// outside this shape returns an error code; the Python caller
// (io/audio.py write_audio_pcm16) treats ANY failure here as "fall
// back to the Python encoder", which re-raises properly-typed errors.
//
// MD5 (STREAMINFO integrity) is implemented from RFC 1321 with the
// sin-derived constant table computed at startup — no vendored code.
#include <cfenv>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
enum {
    ZEN_FLACE_OK = 0,
    ZEN_FLACE_EIO = -1,
    ZEN_FLACE_EBAD = -2,
    ZEN_FLACE_EUNSUP = -3,
    ZEN_FLACE_ENOMEM = -4,
};
}

namespace {

// ------------------------------------------------------------- CRC
// (zenflac.cpp has its own copies inside an anonymous namespace; the
// two translation units can't share them without a header — keep the
// 20 lines duplicated rather than reshuffle the decoder.)
struct EncCrc {
    uint8_t crc8[256];
    uint16_t crc16[256];
    EncCrc() {
        for (int b = 0; b < 256; b++) {
            uint32_t c8 = static_cast<uint32_t>(b);
            for (int i = 0; i < 8; i++)
                c8 = (c8 & 0x80u) ? ((c8 << 1) ^ 0x07u) : (c8 << 1);
            crc8[b] = static_cast<uint8_t>(c8 & 0xFFu);
            uint32_t c16 = static_cast<uint32_t>(b) << 8;
            for (int i = 0; i < 8; i++)
                c16 = (c16 & 0x8000u) ? ((c16 << 1) ^ 0x8005u)
                                      : (c16 << 1);
            crc16[b] = static_cast<uint16_t>(c16 & 0xFFFFu);
        }
    }
};
const EncCrc kEncCrc;

// ------------------------------------------------------------- MD5

struct Md5 {
    uint32_t a = 0x67452301, b = 0xefcdab89, c = 0x98badcfe,
             d = 0x10325476;
    uint64_t total = 0;
    uint8_t buf[64];
    uint32_t buflen = 0;
    uint32_t K[64];
    static constexpr int S[64] = {
        7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
        5, 9,  14, 20, 5, 9,  14, 20, 5, 9,  14, 20, 5, 9,  14, 20,
        4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
        6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21};

    Md5() {
        for (int i = 0; i < 64; i++)
            K[i] = static_cast<uint32_t>(
                std::floor(std::fabs(std::sin(i + 1.0)) * 4294967296.0));
    }

    static uint32_t rotl(uint32_t x, int s) {
        return (x << s) | (x >> (32 - s));
    }

    void block(const uint8_t* p) {
        uint32_t M[16];
        for (int i = 0; i < 16; i++)
            M[i] = uint32_t(p[4 * i]) | (uint32_t(p[4 * i + 1]) << 8) |
                   (uint32_t(p[4 * i + 2]) << 16) |
                   (uint32_t(p[4 * i + 3]) << 24);
        uint32_t A = a, B = b, C = c, D = d;
        for (int i = 0; i < 64; i++) {
            uint32_t F;
            int g;
            if (i < 16) {
                F = (B & C) | (~B & D);
                g = i;
            } else if (i < 32) {
                F = (D & B) | (~D & C);
                g = (5 * i + 1) & 15;
            } else if (i < 48) {
                F = B ^ C ^ D;
                g = (3 * i + 5) & 15;
            } else {
                F = C ^ (B | ~D);
                g = (7 * i) & 15;
            }
            uint32_t tmp = D;
            D = C;
            C = B;
            B = B + rotl(A + F + K[i] + M[g], S[i]);
            A = tmp;
        }
        a += A;
        b += B;
        c += C;
        d += D;
    }

    void update(const uint8_t* p, uint64_t n) {
        total += n;
        if (buflen) {
            while (n && buflen < 64) {
                buf[buflen++] = *p++;
                n--;
            }
            if (buflen == 64) {
                block(buf);
                buflen = 0;
            }
        }
        while (n >= 64) {
            block(p);
            p += 64;
            n -= 64;
        }
        while (n) {
            buf[buflen++] = *p++;
            n--;
        }
    }

    void final(uint8_t out[16]) {
        uint64_t bits = total * 8;
        uint8_t pad = 0x80;
        update(&pad, 1);
        uint8_t z = 0;
        while (buflen != 56) update(&z, 1);
        uint8_t len[8];
        for (int i = 0; i < 8; i++)
            len[i] = static_cast<uint8_t>(bits >> (8 * i));
        update(len, 8);
        uint32_t vals[4] = {a, b, c, d};
        for (int i = 0; i < 4; i++)
            for (int j = 0; j < 4; j++)
                out[4 * i + j] = static_cast<uint8_t>(vals[i] >> (8 * j));
    }
};
constexpr int Md5::S[64];

// -------------------------------------------------------- bit writer

struct Bw {
    std::vector<uint8_t> buf;
    uint64_t acc = 0;
    uint32_t n = 0;

    void write(uint64_t v, uint32_t bits) {
        // mirror of the Python _BitWriter: MSB-first accumulator
        while (bits > 32) {
            write((v >> (bits - 32)) & 0xFFFFFFFFu, 32);
            bits -= 32;
        }
        if (!bits) return;
        acc = (acc << bits) | (v & ((bits == 64 ? 0 : (uint64_t(1) << bits)) - 1));
        n += bits;
        while (n >= 8) {
            n -= 8;
            buf.push_back(static_cast<uint8_t>((acc >> n) & 0xFF));
        }
        acc &= (uint64_t(1) << n) - 1;
    }

    void write_signed(int64_t v, uint32_t bits) {
        write(static_cast<uint64_t>(v), bits);
    }

    void write_unary(uint32_t q) {
        while (q >= 32) {
            write(0, 32);
            q -= 32;
        }
        write(1, q + 1);
    }

    void align() {
        if (n) write(0, 8 - n);
    }
};

// ------------------------------------------------ encoder decisions

// best Rice parameter: cost(p) = sum(z >> p) + n*(1+p), scanned to
// min(pmax, bitlength(max)+1) — the exact Python _best_rice
void best_rice(const std::vector<uint64_t>& z, int pmax, int* best_p,
               uint64_t* best_c) {
    uint64_t m = 0;
    for (uint64_t v : z)
        if (v > m) m = v;
    int bl = 0;
    while (m >> bl) bl++;
    if (pmax > bl + 1) pmax = bl + 1;
    *best_p = 0;
    *best_c = ~uint64_t(0);
    for (int p = 0; p < pmax; p++) {
        uint64_t c = 0;
        for (uint64_t v : z) c += v >> p;
        c += z.size() * (1 + p);
        if (c < *best_c) {
            *best_p = p;
            *best_c = c;
        }
    }
}

uint64_t zigzag(int64_t v) {
    return v >= 0 ? (static_cast<uint64_t>(v) << 1)
                  : ((static_cast<uint64_t>(-v) << 1) - 1);
}

int blocksize_code(uint32_t bs) {
    switch (bs) {
        case 192: return 1;
        case 576: return 2;
        case 1152: return 3;
        case 2304: return 4;
        case 4608: return 5;
        case 256: return 8;
        case 512: return 9;
        case 1024: return 10;
        case 2048: return 11;
        case 4096: return 12;
        case 8192: return 13;
        case 16384: return 14;
        case 32768: return 15;
        default: return bs <= 256 ? 6 : 7;
    }
}

void utf8_number(Bw& w, uint64_t nval) {
    if (nval < 0x80) {
        w.write(nval, 8);
        return;
    }
    for (int total = 2; total <= 7; total++) {
        int cap = total < 7 ? (7 - total) + 6 * (total - 1) : 36;
        if (nval < (uint64_t(1) << cap)) {
            uint64_t lead = total < 7
                                ? ((0xFFu << (8 - total)) & 0xFF) |
                                      (nval >> (6 * (total - 1)))
                                : 0xFE;
            w.write(lead, 8);
            for (int k = total - 2; k >= 0; k--)
                w.write(0x80 | ((nval >> (6 * k)) & 0x3F), 8);
            return;
        }
    }
}

// Auto-selected subframe (constant / fixed 0-4 / verbatim), exactly
// the Python _encode_subframe's default decisions; int64 samples so
// the stereo side channel (bps = bits + 1, up to 25) fits.
void encode_subframe(Bw& w, const int64_t* blk, uint32_t bs,
                     uint32_t bps) {
    int64_t ors = 0;
    bool any = false;
    for (uint32_t i = 0; i < bs; i++) {
        ors |= blk[i];
        if (blk[i]) any = true;
    }
    uint32_t wasted = 0;
    if (any) {
        while (wasted < bps - 1 && !((ors >> wasted) & 1)) wasted++;
    }
    uint32_t eff = bps - wasted;

    auto header = [&](uint32_t type_code) {
        w.write(0, 1);
        w.write(type_code, 6);
        if (wasted) {
            w.write(1, 1);
            w.write_unary(wasted - 1);
        } else {
            w.write(0, 1);
        }
    };
    auto sample = [&](uint32_t i) -> int64_t { return blk[i] >> wasted; };

    bool constant = true;
    for (uint32_t i = 1; i < bs; i++)
        if (blk[i] != blk[0]) {
            constant = false;
            break;
        }

    if (constant) {
        header(0);
        w.write_signed(sample(0), eff);
        return;
    }
    // fixed-order search: costs[o] = o*eff + best_rice(z, 15)
    int best_o = -1;
    uint64_t best_cost = ~uint64_t(0);
    std::vector<int64_t> cur(bs), best_resid;
    std::vector<uint64_t> z;
    for (uint32_t i = 0; i < bs; i++) cur[i] = sample(i);
    for (int o = 0; o <= 4; o++) {
        if (bs <= static_cast<uint32_t>(o)) break;
        if (o) {  // np.diff
            for (uint32_t i = 0; i + o < bs; i++)
                cur[i] = cur[i + 1] - cur[i];
            cur.resize(bs - o);
        }
        z.resize(cur.size());
        for (size_t i = 0; i < cur.size(); i++) z[i] = zigzag(cur[i]);
        int p;
        uint64_t c;
        best_rice(z, 15, &p, &c);
        uint64_t cost = uint64_t(o) * eff + c;
        if (cost < best_cost) {
            best_cost = cost;
            best_o = o;
            best_resid = cur;
        }
    }
    if (best_cost >= uint64_t(bs) * eff) {
        header(1);  // verbatim
        for (uint32_t i = 0; i < bs; i++) w.write_signed(sample(i), eff);
    } else {
        header(0x08 | best_o);
        for (int i = 0; i < best_o; i++) w.write_signed(sample(i), eff);
        // residual coding, partition_order 0 (Python default)
        z.resize(best_resid.size());
        for (size_t i = 0; i < best_resid.size(); i++)
            z[i] = zigzag(best_resid[i]);
        int p;
        uint64_t c;
        best_rice(z, 30, &p, &c);
        uint32_t method_bits = p > 14 ? 5 : 4;
        w.write(method_bits == 4 ? 0 : 1, 2);
        w.write(0, 4);  // partition order
        w.write(p, method_bits);
        for (uint64_t u : z) {
            w.write_unary(static_cast<uint32_t>(u >> p));
            w.write(u & ((p ? (uint64_t(1) << p) : 1) - 1), p);
        }
    }
}

int sample_size_code(uint32_t bits) {
    switch (bits) {
        case 8: return 1;
        case 12: return 2;
        case 16: return 4;
        case 20: return 5;
        case 24: return 6;
    }
    return -1;
}

}  // namespace

extern "C" {

// Encode float [-1, 1] audio (interleaved when stereo) as a FLAC file
// — byte-identical to zen_tpu.io.flac.write_flac(path, fs, audio,
// bits=bits, block_size=block_size) on the same input (default
// stereo_mode='auto' = mid/side for full blocks, pinned by
// tests/test_flac.py).  bits in {8, 12, 16, 20, 24}; channels 1 or 2.
int zen_flac_encode(const char* path, uint32_t fs, const float* audio,
                    uint64_t n, uint32_t channels, uint32_t bits,
                    uint32_t block_size) {
    if (!audio || n == 0) return ZEN_FLACE_EBAD;
    if (fs == 0 || fs >= (1u << 20)) return ZEN_FLACE_EBAD;
    if (block_size < 16 || block_size > 65535) return ZEN_FLACE_EBAD;
    if (n >= (uint64_t(1) << 36)) return ZEN_FLACE_EUNSUP;
    if (channels != 1 && channels != 2) return ZEN_FLACE_EUNSUP;
    if (sample_size_code(bits) < 0) return ZEN_FLACE_EUNSUP;

    // quantize like the Python _quantize: clip to [-1,1], scale by
    // 2^(bits-1), round-half-even (np.round == nearbyint under
    // FE_TONEAREST), clip to range; NaN encodes as silence (both
    // encoders — casting NaN to int is UB here and platform-defined
    // in numpy)
    const double scale = static_cast<double>(uint64_t(1) << (bits - 1));
    std::vector<int64_t> s(n * channels);
    const int prev_round = std::fegetround();
    std::fesetround(FE_TONEAREST);
    for (uint64_t i = 0; i < n * channels; i++) {
        double v = audio[i];
        if (v != v) {
            s[i] = 0;
            continue;
        }
        if (v > 1.0) v = 1.0;
        if (v < -1.0) v = -1.0;
        double r = std::nearbyint(v * scale);
        if (r > scale - 1) r = scale - 1;
        if (r < -scale) r = -scale;
        s[i] = static_cast<int64_t>(r);
    }
    std::fesetround(prev_round);

    Md5 md5;
    {
        const uint32_t bytes_per = (bits + 7) / 8;
        std::vector<uint8_t> raw(n * channels * bytes_per);
        for (uint64_t i = 0; i < n * channels; i++) {
            uint64_t u = static_cast<uint64_t>(s[i]) &
                         ((uint64_t(1) << (8 * bytes_per)) - 1);
            for (uint32_t b = 0; b < bytes_per; b++)
                raw[bytes_per * i + b] =
                    static_cast<uint8_t>((u >> (8 * b)) & 0xFF);
        }
        md5.update(raw.data(), raw.size());
    }
    uint8_t digest[16];
    md5.final(digest);

    std::vector<uint8_t> out;
    out.insert(out.end(), {'f', 'L', 'a', 'C'});
    Bw si;
    si.write(block_size, 16);
    si.write(block_size, 16);
    si.write(0, 24);
    si.write(0, 24);
    si.write(fs, 20);
    si.write(channels - 1, 3);
    si.write(bits - 1, 5);
    si.write(n, 36);
    out.push_back(0x80);     // last metadata block, STREAMINFO
    uint32_t silen = 34;
    out.push_back((silen >> 16) & 0xFF);
    out.push_back((silen >> 8) & 0xFF);
    out.push_back(silen & 0xFF);
    out.insert(out.end(), si.buf.begin(), si.buf.end());
    out.insert(out.end(), digest, digest + 16);

    std::vector<int64_t> sub0, sub1;
    uint64_t frame_idx = 0;
    for (uint64_t start = 0; start < n; start += block_size) {
        uint32_t bs = static_cast<uint32_t>(
            std::min<uint64_t>(block_size, n - start));
        const int64_t* blk = s.data() + start * channels;
        // Python stereo_mode='auto': mid/side unless the (final) block
        // is a single sample
        bool mid_side = channels == 2 && bs > 1;

        Bw w;
        w.write(0x3FFE, 14);
        w.write(0, 1);
        w.write(0, 1);  // fixed blocking
        int bsc = blocksize_code(bs);
        w.write(bsc, 4);
        w.write(0, 4);  // sample rate from STREAMINFO
        w.write(mid_side ? 0b1010 : (channels - 1), 4);
        w.write(sample_size_code(bits), 3);
        w.write(0, 1);
        utf8_number(w, frame_idx);
        if (bsc == 6) w.write(bs - 1, 8);
        else if (bsc == 7) w.write(bs - 1, 16);
        w.align();
        {
            uint8_t c8 = 0;
            for (uint8_t byte : w.buf) c8 = kEncCrc.crc8[c8 ^ byte];
            w.write(c8, 8);
        }

        if (channels == 1) {
            encode_subframe(w, blk, bs, bits);
        } else if (mid_side) {
            sub0.resize(bs);
            sub1.resize(bs);
            for (uint32_t i = 0; i < bs; i++) {
                int64_t l = blk[2 * i], r = blk[2 * i + 1];
                sub0[i] = (l + r) >> 1;
                sub1[i] = l - r;
            }
            encode_subframe(w, sub0.data(), bs, bits);
            encode_subframe(w, sub1.data(), bs, bits + 1);
        } else {  // independent (1-sample final stereo block)
            sub0.resize(bs);
            for (uint32_t c = 0; c < channels; c++) {
                for (uint32_t i = 0; i < bs; i++)
                    sub0[i] = blk[2 * i + c];
                encode_subframe(w, sub0.data(), bs, bits);
            }
        }
        w.align();
        uint16_t c16 = 0;
        for (uint8_t byte : w.buf)
            c16 = static_cast<uint16_t>((c16 << 8) ^
                                        kEncCrc.crc16[(c16 >> 8) ^ byte]);
        out.insert(out.end(), w.buf.begin(), w.buf.end());
        out.push_back(static_cast<uint8_t>(c16 >> 8));
        out.push_back(static_cast<uint8_t>(c16 & 0xFF));
        frame_idx++;
    }

    FILE* f = fopen(path, "wb");
    if (!f) return ZEN_FLACE_EIO;
    size_t wrote = fwrite(out.data(), 1, out.size(), f);
    if (fclose(f) != 0 || wrote != out.size()) return ZEN_FLACE_EIO;
    return ZEN_FLACE_OK;
}

// Historical mono-16 entry point (the original product-path shape);
// byte-identity with the Python encoder is pinned by
// tests/test_flac.py::test_native_encoder_byte_identical.
int zen_flac_encode_mono16(const char* path, uint32_t fs,
                           const float* audio, uint64_t n,
                           uint32_t block_size) {
    return zen_flac_encode(path, fs, audio, n, 1, 16, block_size);
}

}  // extern "C"
