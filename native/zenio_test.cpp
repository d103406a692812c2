// Sanitizer test driver for zenio.cpp (reference analog: the
// cuda-memcheck CTest label + ASAN/UBSAN build options,
// libzen/CMakeLists.txt:56-89,111-133).
//
// Built and run by `make -C native sanitize-check` in three flavors:
//   * -fsanitize=address,undefined (heap/UB on the codec + ring)
//   * -fsanitize=thread            (the SPSC ring's atomics contract)
//   * plain -O2                    (functional fallback)
//
// Covers:
//   1. wav codec roundtrip (PCM16 write -> info/read_mono)
//   2. a deterministic header fuzzer: truncations at every byte
//      boundary, hostile field values (0 channels, absurd sizes,
//      lying data_size, odd-sized chunks, unknown formats) — the
//      parser must return an error code, never crash or overread
//   3. SPSC ring: a real producer thread vs consumer thread moving
//      1M samples with randomized burst sizes; every sample arrives
//      exactly once in order (TSAN validates the memory ordering)
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {
struct ZenRing;
ZenRing* zen_ring_create(uint64_t);
void zen_ring_destroy(ZenRing*);
uint64_t zen_ring_write(ZenRing*, const float*, uint64_t);
uint64_t zen_ring_read(ZenRing*, float*, uint64_t);
uint64_t zen_ring_available(ZenRing*);
uint64_t zen_ring_overruns(ZenRing*);
struct WavInfo {
    uint32_t sample_rate;
    uint32_t n_frames;
    uint16_t n_channels;
    uint16_t format;
};
int zen_wav_info(const char*, WavInfo*);
int zen_wav_read_mono(const char*, float*, uint32_t);
int zen_wav_write_pcm16(const char*, uint32_t, const float*, uint32_t);
}

#define CHECK(cond)                                                      \
    do {                                                                 \
        if (!(cond)) {                                                   \
            fprintf(stderr, "CHECK failed %s:%d: %s\n", __FILE__,        \
                    __LINE__, #cond);                                    \
            exit(1);                                                     \
        }                                                                \
    } while (0)

static std::string tmpdir;

static std::string write_blob(const char* name, const void* data, size_t n) {
    std::string p = tmpdir + "/" + name;
    FILE* f = fopen(p.c_str(), "wb");
    CHECK(f);
    CHECK(fwrite(data, 1, n, f) == n || n == 0);
    fclose(f);
    return p;
}

static void test_roundtrip() {
    const uint32_t n = 12345;
    std::vector<float> src(n);
    for (uint32_t i = 0; i < n; ++i)
        src[i] = 0.9f * ((i % 200) / 100.0f - 1.0f);
    std::string p = tmpdir + "/rt.wav";
    CHECK(zen_wav_write_pcm16(p.c_str(), 44100, src.data(), n) == 0);
    WavInfo info;
    CHECK(zen_wav_info(p.c_str(), &info) == 0);
    CHECK(info.sample_rate == 44100 && info.n_frames == n &&
          info.n_channels == 1 && info.format == 1);
    std::vector<float> back(n);
    CHECK(zen_wav_read_mono(p.c_str(), back.data(), n) == 0);
    for (uint32_t i = 0; i < n; ++i)
        CHECK(back[i] > src[i] - 1e-4f && back[i] < src[i] + 1e-4f);
    printf("roundtrip ok\n");
}

static void test_fuzz_headers() {
    // a valid little file to mutate
    const uint32_t n = 64;
    std::vector<float> src(n, 0.25f);
    std::string base = tmpdir + "/base.wav";
    CHECK(zen_wav_write_pcm16(base.c_str(), 8000, src.data(), n) == 0);
    FILE* f = fopen(base.c_str(), "rb");
    CHECK(f);
    std::vector<uint8_t> blob(1 << 16);
    size_t blen = fread(blob.data(), 1, blob.size(), f);
    fclose(f);
    blob.resize(blen);

    WavInfo info;
    std::vector<float> out(4 * n, 0.f);

    // 1) truncation at EVERY length — parser must never crash; a cut
    // inside the 44-byte header must be rejected, and a cut inside
    // the payload must make the full-length read fail (the header
    // itself is legitimately complete there)
    for (size_t cut = 0; cut < blen; ++cut) {
        std::string p = write_blob("cut.wav", blob.data(), cut);
        int rc = zen_wav_info(p.c_str(), &info);
        if (cut < 44) CHECK(rc != 0);
        int rrc = zen_wav_read_mono(p.c_str(), out.data(), n);
        CHECK(rrc != 0);  // payload is short at every cut < blen
    }

    // 2) single-byte corruptions across the 44-byte header
    for (size_t pos = 0; pos < 44 && pos < blen; ++pos) {
        for (uint8_t v : {0x00, 0x01, 0x7f, 0x80, 0xff}) {
            std::vector<uint8_t> mut = blob;
            mut[pos] ^= v;
            std::string p = write_blob("mut.wav", mut.data(), mut.size());
            zen_wav_info(p.c_str(), &info);          // any rc; no crash
            zen_wav_read_mono(p.c_str(), out.data(), n);
        }
    }

    // 3) targeted hostile fields
    struct Patch { size_t off; uint32_t val; size_t len; };
    const Patch patches[] = {
        {22, 0, 2},           // channels = 0
        {22, 0xffff, 2},      // channels = 65535
        {24, 0, 4},           // rate = 0
        {34, 0, 2},           // bits = 0
        {34, 24, 2},          // bits = 24 (unsupported)
        {20, 0xfffe, 2},      // format = extensible
        {40, 0xffffffffu, 4}, // data_size lies: 4 GB
        {4, 8, 4},            // riff size tiny
        {16, 0xffffff00u, 4}, // fmt chunk size huge
    };
    for (const Patch& pt : patches) {
        std::vector<uint8_t> mut = blob;
        memcpy(mut.data() + pt.off, &pt.val, pt.len);
        std::string p = write_blob("patch.wav", mut.data(), mut.size());
        zen_wav_info(p.c_str(), &info);
        zen_wav_read_mono(p.c_str(), out.data(), n);
    }

    // 4) pathological chunk walks: odd-size unknown chunk, then data
    {
        std::vector<uint8_t> v;
        auto put = [&](const void* d, size_t m) {
            const uint8_t* b = (const uint8_t*)d;
            v.insert(v.end(), b, b + m);
        };
        uint32_t u; uint16_t h;
        put("RIFF", 4); u = 1000; put(&u, 4); put("WAVE", 4);
        put("junk", 4); u = 3; put(&u, 4);
        put("abc", 3); put("\0", 1);  // odd-size chunk + RIFF pad byte
        put("fmt ", 4); u = 18; put(&u, 4);
        h = 1; put(&h, 2); h = 1; put(&h, 2); u = 8000; put(&u, 4);
        u = 16000; put(&u, 4); h = 2; put(&h, 2); h = 16; put(&h, 2);
        h = 0; put(&h, 2);  // cbSize of the 18-byte fmt
        put("data", 4); u = 8; put(&u, 4);
        int16_t s[4] = {1000, -1000, 2000, -2000}; put(s, 8);
        std::string p = write_blob("odd.wav", v.data(), v.size());
        CHECK(zen_wav_info(p.c_str(), &info) == 0);
        CHECK(info.n_frames == 4 && info.sample_rate == 8000);
        CHECK(zen_wav_read_mono(p.c_str(), out.data(), 4) == 0);
    }
    printf("header fuzz ok\n");
}

static void test_ring_threads() {
    const uint64_t N = 1u << 20;
    ZenRing* r = zen_ring_create(1 << 12);
    CHECK(r);
    std::atomic<bool> fail{false};

    std::thread producer([&] {
        std::vector<float> buf(257);
        uint64_t sent = 0, x = 12345;
        while (sent < N) {
            x = x * 6364136223846793005ull + 1442695040888963407ull;
            uint64_t burst = 1 + (x >> 33) % buf.size();
            if (burst > N - sent) burst = N - sent;
            for (uint64_t i = 0; i < burst; ++i)
                buf[i] = (float)(sent + i);
            // spin until it all fits (test wants lossless transfer;
            // the real-time drop path is exercised separately)
            uint64_t done = 0;
            while (done < burst) {
                done += zen_ring_write(r, buf.data() + done, burst - done);
            }
            sent += burst;
        }
    });
    std::thread consumer([&] {
        std::vector<float> buf(193);
        uint64_t got = 0, x = 999;
        while (got < N) {
            x = x * 2862933555777941757ull + 3037000493ull;
            uint64_t want = 1 + (x >> 33) % buf.size();
            if (want > N - got) want = N - got;
            if (zen_ring_read(r, buf.data(), want) == want) {
                for (uint64_t i = 0; i < want; ++i)
                    if (buf[i] != (float)(got + i)) { fail = true; return; }
                got += want;
            }
        }
    });
    producer.join();
    consumer.join();
    CHECK(!fail.load());
    CHECK(zen_ring_available(r) == 0);
    zen_ring_destroy(r);

    // overrun path: writes beyond capacity drop and count
    r = zen_ring_create(8);
    std::vector<float> big(32, 1.f);
    CHECK(zen_ring_write(r, big.data(), 32) == 8);
    CHECK(zen_ring_overruns(r) == 1);
    zen_ring_destroy(r);
    printf("ring threads ok\n");
}

int main(int argc, char** argv) {
    tmpdir = argc > 1 ? argv[1] : "/tmp";
    test_roundtrip();
    test_fuzz_headers();
    test_ring_threads();
    printf("zenio_test: all ok\n");
    return 0;
}
