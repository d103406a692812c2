// zenio — native host runtime for zen-tpu.
//
// The TPU-native analog of the reference's host-side native pieces:
//   * zen::io::IOGPU pinned zero-copy transport (libzen/libzen/io.h):
//     on TPU there is no user-visible pinned device mapping; the
//     host-side equivalent is a lock-free SPSC ring buffer decoupling
//     a real-time audio producer (e.g. a mic callback) from the
//     device-feeder thread that batches hops into device dispatches.
//   * the vendored libnyquist wav codec (zen/offline.h:88-117,
//     193-253): a minimal RIFF PCM16/PCM32F reader/writer with
//     stereo-to-mono averaging.
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (zen_tpu/runtime/native.py). Build: make -C native
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <new>

extern "C" {

// ---------------- lock-free SPSC float ring buffer ----------------

struct ZenRing {
    float* data;
    uint64_t capacity;  // power of two
    std::atomic<uint64_t> head;  // write index (producer)
    std::atomic<uint64_t> tail;  // read index (consumer)
    std::atomic<uint64_t> overruns;
};

ZenRing* zen_ring_create(uint64_t capacity_pow2) {
    if (capacity_pow2 == 0 || (capacity_pow2 & (capacity_pow2 - 1)) != 0)
        return nullptr;
    ZenRing* r = new (std::nothrow) ZenRing();
    if (!r) return nullptr;
    r->data = static_cast<float*>(calloc(capacity_pow2, sizeof(float)));
    if (!r->data) {
        delete r;
        return nullptr;
    }
    r->capacity = capacity_pow2;
    r->head.store(0);
    r->tail.store(0);
    r->overruns.store(0);
    return r;
}

void zen_ring_destroy(ZenRing* r) {
    if (!r) return;
    free(r->data);
    delete r;
}

// producer: append n samples; returns samples written (drops the
// remainder and counts an overrun when full — real-time semantics:
// never block the audio thread)
uint64_t zen_ring_write(ZenRing* r, const float* src, uint64_t n) {
    const uint64_t cap = r->capacity;
    uint64_t head = r->head.load(std::memory_order_relaxed);
    const uint64_t tail = r->tail.load(std::memory_order_acquire);
    uint64_t free_space = cap - (head - tail);
    uint64_t to_write = n < free_space ? n : free_space;
    for (uint64_t i = 0; i < to_write; ++i)
        r->data[(head + i) & (cap - 1)] = src[i];
    r->head.store(head + to_write, std::memory_order_release);
    if (to_write < n) r->overruns.fetch_add(1, std::memory_order_relaxed);
    return to_write;
}

// consumer: pop exactly n samples if available, else nothing.
// returns n or 0 (all-or-nothing keeps hop framing intact).
uint64_t zen_ring_read(ZenRing* r, float* dst, uint64_t n) {
    const uint64_t cap = r->capacity;
    const uint64_t head = r->head.load(std::memory_order_acquire);
    uint64_t tail = r->tail.load(std::memory_order_relaxed);
    if (head - tail < n) return 0;
    for (uint64_t i = 0; i < n; ++i)
        dst[i] = r->data[(tail + i) & (cap - 1)];
    r->tail.store(tail + n, std::memory_order_release);
    return n;
}

uint64_t zen_ring_available(ZenRing* r) {
    return r->head.load(std::memory_order_acquire)
           - r->tail.load(std::memory_order_acquire);
}

uint64_t zen_ring_overruns(ZenRing* r) { return r->overruns.load(); }

// ---------------- minimal RIFF wav codec ----------------
// Supports PCM16 and IEEE float32, mono or stereo (averaged to mono).

struct WavInfo {
    uint32_t sample_rate;
    uint32_t n_frames;   // per-channel samples
    uint16_t n_channels;
    uint16_t format;     // 1 = PCM16, 3 = float32
};

static int read_exact(FILE* f, void* dst, size_t n) {
    return fread(dst, 1, n, f) == n ? 0 : -1;
}

// Parse header; returns 0 on success and fills info.
int zen_wav_info(const char* path, WavInfo* info) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    char tag[4];
    uint32_t sz;
    if (read_exact(f, tag, 4) || memcmp(tag, "RIFF", 4) ||
        read_exact(f, &sz, 4) || read_exact(f, tag, 4) ||
        memcmp(tag, "WAVE", 4)) {
        fclose(f);
        return -2;
    }
    uint16_t fmt = 0, channels = 0, bits = 0;
    uint32_t rate = 0, data_size = 0;
    while (!read_exact(f, tag, 4) && !read_exact(f, &sz, 4)) {
        if (!memcmp(tag, "fmt ", 4)) {
            uint8_t buf[16];
            if (sz < 16 || read_exact(f, buf, 16)) break;
            memcpy(&fmt, buf, 2);
            memcpy(&channels, buf + 2, 2);
            memcpy(&rate, buf + 4, 4);
            memcpy(&bits, buf + 14, 2);
            // skip the fmt remainder including the RIFF odd-size
            // pad byte (chunks are word-aligned)
            if (sz > 16 || (sz & 1)) fseek(f, (sz - 16) + (sz & 1), SEEK_CUR);
        } else if (!memcmp(tag, "data", 4)) {
            data_size = sz;
            break;
        } else {
            fseek(f, sz + (sz & 1), SEEK_CUR);
        }
    }
    fclose(f);
    if (!rate || !channels || !data_size) return -3;
    if (!((fmt == 1 && bits == 16) || (fmt == 3 && bits == 32))) return -4;
    info->sample_rate = rate;
    info->n_channels = channels;
    info->format = fmt;
    info->n_frames = data_size / (channels * (bits / 8));
    return 0;
}

// Decode to mono float32 (stereo averaged). dst must hold n_frames.
int zen_wav_read_mono(const char* path, float* dst, uint32_t n_frames) {
    WavInfo info;
    int rc = zen_wav_info(path, &info);
    if (rc) return rc;
    if (info.n_frames < n_frames) return -5;
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    // re-walk to the data chunk
    char tag[4];
    uint32_t sz;
    fseek(f, 12, SEEK_SET);
    while (!read_exact(f, tag, 4) && !read_exact(f, &sz, 4)) {
        if (!memcmp(tag, "data", 4)) break;
        fseek(f, sz + (sz & 1), SEEK_CUR);
    }
    const uint32_t ch = info.n_channels;
    const uint32_t chunk = 4096;
    if (info.format == 1) {
        int16_t* buf = static_cast<int16_t*>(malloc(chunk * ch * 2));
        if (!buf) { fclose(f); return -7; }
        uint32_t done = 0;
        while (done < n_frames) {
            uint32_t todo = n_frames - done < chunk ? n_frames - done : chunk;
            if (read_exact(f, buf, (size_t)todo * ch * 2)) break;
            for (uint32_t i = 0; i < todo; ++i) {
                float acc = 0.f;
                for (uint32_t c = 0; c < ch; ++c)
                    acc += buf[i * ch + c] / 32768.0f;
                dst[done + i] = acc / ch;
            }
            done += todo;
        }
        free(buf);
        fclose(f);
        return done == n_frames ? 0 : -6;
    }
    float* buf = static_cast<float*>(malloc((size_t)chunk * ch * 4));
    if (!buf) { fclose(f); return -7; }
    uint32_t done = 0;
    while (done < n_frames) {
        uint32_t todo = n_frames - done < chunk ? n_frames - done : chunk;
        if (read_exact(f, buf, (size_t)todo * ch * 4)) break;
        for (uint32_t i = 0; i < todo; ++i) {
            float acc = 0.f;
            for (uint32_t c = 0; c < ch; ++c) acc += buf[i * ch + c];
            dst[done + i] = acc / ch;
        }
        done += todo;
    }
    free(buf);
    fclose(f);
    return done == n_frames ? 0 : -6;
}

// Encode mono float32 [-1,1] to PCM16 (round-to-nearest, clipped).
int zen_wav_write_pcm16(const char* path, uint32_t sample_rate,
                        const float* src, uint32_t n_frames) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    uint32_t data_size = n_frames * 2;
    uint32_t riff_size = 36 + data_size;
    uint16_t fmt = 1, channels = 1, bits = 16;
    uint32_t byte_rate = sample_rate * 2;
    uint16_t block_align = 2;
    uint32_t fmt_size = 16;
    bool ok = true;
    ok &= fwrite("RIFF", 1, 4, f) == 4;
    ok &= fwrite(&riff_size, 4, 1, f) == 1;
    ok &= fwrite("WAVE", 1, 4, f) == 4;
    ok &= fwrite("fmt ", 1, 4, f) == 4;
    ok &= fwrite(&fmt_size, 4, 1, f) == 1;
    ok &= fwrite(&fmt, 2, 1, f) == 1;
    ok &= fwrite(&channels, 2, 1, f) == 1;
    ok &= fwrite(&sample_rate, 4, 1, f) == 1;
    ok &= fwrite(&byte_rate, 4, 1, f) == 1;
    ok &= fwrite(&block_align, 2, 1, f) == 1;
    ok &= fwrite(&bits, 2, 1, f) == 1;
    ok &= fwrite("data", 1, 4, f) == 4;
    ok &= fwrite(&data_size, 4, 1, f) == 1;
    const uint32_t chunk = 4096;
    int16_t buf[4096];
    uint32_t done = 0;
    while (done < n_frames) {
        uint32_t todo = n_frames - done < chunk ? n_frames - done : chunk;
        for (uint32_t i = 0; i < todo; ++i) {
            float v = src[done + i];
            if (v > 1.f) v = 1.f;
            if (v < -1.f) v = -1.f;
            float scaled = v * 32767.0f;
            buf[i] = (int16_t)(scaled >= 0 ? scaled + 0.5f : scaled - 0.5f);
        }
        ok &= fwrite(buf, 2, todo, f) == todo;
        done += todo;
    }
    // a truncated/partial file must not report success (disk full,
    // I/O error): check every write and the final flush
    if (fclose(f) != 0) ok = false;
    return ok ? 0 : -8;
}

}  // extern "C"
