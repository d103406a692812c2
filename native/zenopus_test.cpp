// Sanitizer test driver for zenopus*.cpp (same fuzz model as the
// other codec fuzzers, pointed at the Ogg Opus parser and the packet
// decoder).  Run under -fsanitize=address,undefined and plain -O2 via
// `make -C native sanitize-check` / `make check`.
//
// Seeds are real foreign-encoded .opus files from the corpus dir in
// argv[1] (the reference's read-only libnyquist test data); without
// seeds only the hostile-random legs run.
//   1. every corpus .opus file must decode cleanly with plausible audio
//   2. truncation sweep of the smallest seed — error or clean partial
//   3. single-byte corruption sweep (page CRCs catch most; any return
//      code is acceptable, crashing/overreading is not)
//   4. 20k pseudo-random buffers, half prefixed with "OggS"
//   5. packet-level fuzz: random TOC + payload bytes through the
//      persistent packet decoder (SILK/CELT/hybrid + PLC paths)
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <dirent.h>
#include <string>
#include <vector>

extern "C" {
int zen_opus_decode_mem(const uint8_t*, uint64_t, float**, uint64_t*, uint32_t*, uint32_t*);
void zen_opus_free(float*);
void* zen_opus_pkt_create(int);
int zen_opus_pkt_decode(void*, const uint8_t*, uint32_t, float*, uint32_t);
void zen_opus_pkt_destroy(void*);
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
  uint32_t fs = 0, ch = 0;
  int rc = zen_opus_decode_mem(buf.data(), buf.size(), &out, &frames, &fs, &ch);
  if (rc == 0) {
    volatile float acc = 0.0f;
    for (uint64_t i = 0; i < frames * ch; ++i) acc += out[i];
    (void)acc;
    zen_opus_free(out);
  }
  return rc;
}

static std::vector<uint8_t> slurp(const std::string& path) {
  std::vector<uint8_t> buf;
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return buf;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  buf.resize(static_cast<size_t>(n));
  if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) buf.clear();
  std::fclose(f);
  return buf;
}

static uint32_t rng_state = 0x5eed0b05u;
static uint32_t prng() {
  rng_state = rng_state * 1664525u + 1013904223u;
  return rng_state;
}

int main(int argc, char** argv) {
  std::vector<std::vector<uint8_t>> seeds;
  if (argc > 1) {
    DIR* d = opendir(argv[1]);
    if (d) {
      dirent* e;
      while ((e = readdir(d)) != nullptr) {
        std::string name = e->d_name;
        if (name.size() > 5 && name.substr(name.size() - 5) == ".opus") {
          auto buf = slurp(std::string(argv[1]) + "/" + name);
          if (!buf.empty()) seeds.push_back(std::move(buf));
        }
      }
      closedir(d);
    }
  }

  // 1. corpus decodes
  for (const auto& s : seeds) {
    float* out = nullptr;
    uint64_t frames = 0;
    uint32_t fs = 0, ch = 0;
    int rc = zen_opus_decode_mem(s.data(), s.size(), &out, &frames, &fs, &ch);
    CHECK(rc == 0, "corpus file must decode");
    if (rc == 0) {
      CHECK(fs == 48000, "opus decodes at 48 kHz");
      CHECK(frames > 1000, "plausible duration");
      double rms = 0;
      for (uint64_t i = 0; i < frames * ch; ++i) rms += double(out[i]) * out[i];
      rms = frames ? rms / (double(frames) * ch) : 0;
      CHECK(rms > 1e-6 && rms < 1.0, "plausible signal level");
      zen_opus_free(out);
    }
  }

  if (!seeds.empty()) {
    // smallest seed drives the deterministic sweeps
    size_t smallest = 0;
    for (size_t i = 1; i < seeds.size(); ++i) {
      if (seeds[i].size() < seeds[smallest].size()) smallest = i;
    }
    const auto& seed = seeds[smallest];

    // 2. truncation sweep (step scales with seed size so the ASAN run
    // stays bounded for large multistream seeds)
    size_t tstep = seed.size() / 128 + 1;
    for (size_t cut = 0; cut < seed.size(); cut += tstep) {
      std::vector<uint8_t> t(seed.begin(), seed.begin() + static_cast<long>(cut));
      try_decode(t);
    }
    // 3. single-byte corruption sweep
    std::vector<uint8_t> mut = seed;
    size_t cstep = seed.size() / 256 + 1;
    for (size_t i = 0; i < mut.size(); i += cstep) {
      uint8_t keep = mut[i];
      mut[i] ^= static_cast<uint8_t>(1 + (prng() & 0xFE));
      try_decode(mut);
      mut[i] = keep;
    }
  }

  // 4. hostile random buffers
  for (int it = 0; it < 20000; ++it) {
    size_t n = prng() % 512;
    std::vector<uint8_t> buf(n);
    for (auto& b : buf) b = static_cast<uint8_t>(prng());
    if ((it & 1) && n >= 4) std::memcpy(buf.data(), "OggS", 4);
    try_decode(buf);
  }

  // 5. packet-level fuzz through one persistent decoder per channel
  //    count (state carries across packets: transitions + PLC paths)
  for (int ch = 1; ch <= 2; ++ch) {
    void* dec = zen_opus_pkt_create(ch);
    CHECK(dec != nullptr, "packet decoder create");
    std::vector<float> pcm(static_cast<size_t>(5760) * 2);
    for (int it = 0; it < 20000; ++it) {
      size_t n = 1 + prng() % 96;
      std::vector<uint8_t> pkt(n);
      for (auto& b : pkt) b = static_cast<uint8_t>(prng());
      int r = zen_opus_pkt_decode(dec, pkt.data(), static_cast<uint32_t>(n), pcm.data(), 5760);
      if (r > 0) {
        volatile float acc = 0;
        for (int i = 0; i < r * ch; ++i) acc += pcm[static_cast<size_t>(i)];
        (void)acc;
      }
    }
    zen_opus_pkt_destroy(dec);
  }

  if (failures) {
    std::fprintf(stderr, "%d failures\n", failures);
    return 1;
  }
  std::printf("zenopus_test: all checks passed (%zu corpus seeds)\n", seeds.size());
  return 0;
}
