// Sanitizer test driver for zenwv.cpp (same role as zenflac_test.cpp:
// the reference's cuda-memcheck/ASAN CTest analog pointed at the
// WavPack parser).
//
// Built and run by `make -C native sanitize-check` under
// -fsanitize=address,undefined and plain -O2.
//
// Known-good decode seeds come from real foreign-encoded files when
// a corpus directory is passed as argv[1] (the reference's read-only
// libnyquist test data); the encoder leg round-trips its own output.
// Coverage:
//   1. every corpus file must decode cleanly (CRC-gated)
//   2. truncation of a seed at many lengths — error or clean prefix,
//      never a crash or overread
//   3. single-byte corruption sweep over a seed (xor 0xFF / 0x01) —
//      any return code is fine, crashing is not
//   4. 20k pseudo-random buffers (deterministic LCG), half prefixed
//      with "wvpk", sizes 0..4096 — pure hostile input
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <dirent.h>
#include <vector>

extern "C" {
int zen_wv_decode_mem(const uint8_t*, uint64_t, float**, uint64_t*, int32_t*,
                      int32_t*);
int zen_wv_decode_file(const char*, float**, uint64_t*, int32_t*, int32_t*);
int zen_wv_encode_mono(const char*, int32_t, const float*, uint64_t, int32_t,
                       int32_t);
void zen_wv_free(float*);
}

static int failures = 0;

#define CHECK(cond, msg)                                           \
  do {                                                             \
    if (!(cond)) {                                                 \
      std::fprintf(stderr, "FAIL: %s (line %d)\n", msg, __LINE__); \
      ++failures;                                                  \
    }                                                              \
  } while (0)

static int try_decode(const std::vector<uint8_t>& buf) {
  float* out = nullptr;
  uint64_t frames = 0;
  int32_t fs = 0, ch = 0;
  int rc = zen_wv_decode_mem(buf.data(), buf.size(), &out, &frames, &fs, &ch);
  if (rc == 0) {
    // returned audio must be addressable end to end
    volatile float acc = 0.0f;
    for (uint64_t i = 0; i < frames * static_cast<uint64_t>(ch); ++i)
      acc += out[i];
    (void)acc;
  }
  zen_wv_free(out);
  return rc;
}

static std::vector<uint8_t> read_file(const char* path) {
  std::vector<uint8_t> buf;
  FILE* f = std::fopen(path, "rb");
  if (!f) return buf;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (sz > 0) {
    buf.resize(static_cast<size_t>(sz));
    if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) buf.clear();
  }
  std::fclose(f);
  return buf;
}

int main(int argc, char** argv) {
  std::vector<std::vector<uint8_t>> seeds;
  if (argc > 1) {
    DIR* dir = opendir(argv[1]);
    if (dir) {
      while (dirent* e = readdir(dir)) {
        const char* dot = std::strrchr(e->d_name, '.');
        if (!dot || std::strcmp(dot, ".wv") != 0) continue;
        char path[4096];
        std::snprintf(path, sizeof(path), "%s/%s", argv[1], e->d_name);
        std::vector<uint8_t> buf = read_file(path);
        if (!buf.empty()) {
          CHECK(try_decode(buf) == 0, "corpus file must decode cleanly");
          seeds.push_back(std::move(buf));
        }
      }
      closedir(dir);
    }
    CHECK(!seeds.empty(), "corpus dir given but no .wv seeds loaded");
  }

  // 2. truncations of the smallest seed (dense near the front where
  // all the metadata framing lives, strided beyond)
  if (!seeds.empty()) {
    const std::vector<uint8_t>* small = &seeds[0];
    for (const auto& s : seeds)
      if (s.size() < small->size()) small = &s;
    for (size_t cut = 0; cut < small->size();
         cut += (cut < 4096 ? 7 : 997)) {
      std::vector<uint8_t> t(small->begin(), small->begin() + cut);
      try_decode(t);  // any rc; must not crash
    }

    // 3. single-byte corruption sweep (strided for time)
    for (size_t off = 0; off < small->size(); off += 211) {
      std::vector<uint8_t> t = *small;
      t[off] ^= 0xFF;
      try_decode(t);
      t[off] ^= 0xFF ^ 0x01;
      try_decode(t);
    }
  }

  // 4. encoder round trips under the sanitizers: random signal shapes at
  // every depth must decode back exactly (CRC-gated by the decoder)
  {
    uint64_t elcg = 0xC0FFEE123456789ull;
    auto ernd = [&]() {
      elcg = elcg * 6364136223846793005ull + 1442695040888963407ull;
      return static_cast<uint32_t>(elcg >> 33);
    };
    const char* tmp = "/tmp/zenwv_fuzz_enc.wv";
    for (int it = 0; it < 24; ++it) {
      size_t n = ernd() % 50000;
      int bits = (it % 3 == 0) ? 8 : (it % 3 == 1) ? 16 : 24;
      std::vector<float> x(n);
      for (size_t i = 0; i < n; ++i) {
        switch (it % 4) {
          case 0: x[i] = (static_cast<int32_t>(ernd()) % 20000) / 32768.0f; break;
          case 1: x[i] = 0.0f; break;
          case 2: x[i] = (i % 997) ? 0.0f : 0.9f; break;
          default: x[i] = ((ernd() & 1) ? 1.5f : -1.5f); break;  // clipped
        }
      }
      CHECK(zen_wv_encode_mono(tmp, 44100, x.data(), n, bits, 7000) == 0,
            "encode must succeed");
      float* out = nullptr;
      uint64_t frames = 0;
      int32_t fs = 0, ch = 0;
      CHECK(zen_wv_decode_file(tmp, &out, &frames, &fs, &ch) == 0,
            "own encode must decode (CRC-gated)");
      CHECK(frames == n && ch == 1 && fs == 44100, "encode shape");
      double full = static_cast<double>(1u << (bits - 1));
      for (uint64_t i = 0; i < frames; ++i) {
        float v = x[i];
        if (v > 1.0f) v = 1.0f;
        if (v < -1.0f) v = -1.0f;
        float q = static_cast<float>(
            std::nearbyintf(v * static_cast<float>(full - 1)) / full);
        if (out[i] != q) {
          CHECK(false, "roundtrip sample mismatch");
          break;
        }
      }
      zen_wv_free(out);
    }
    std::remove(tmp);
  }

  // 5. hostile random buffers
  uint64_t lcg = 0x2545F4914F6CDD1Dull;
  auto rnd = [&]() {
    lcg = lcg * 6364136223846793005ull + 1442695040888963407ull;
    return static_cast<uint32_t>(lcg >> 33);
  };
  for (int it = 0; it < 20000; ++it) {
    size_t n = rnd() % 4097;
    std::vector<uint8_t> buf(n);
    for (auto& b : buf) b = static_cast<uint8_t>(rnd());
    if ((it & 1) && n >= 4) std::memcpy(buf.data(), "wvpk", 4);
    try_decode(buf);
  }

  if (failures) {
    std::fprintf(stderr, "zenwv_test: %d failure(s)\n", failures);
    return 1;
  }
  std::printf("zenwv_test: all clean (%zu corpus seeds)\n", seeds.size());
  return 0;
}
