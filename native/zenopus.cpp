// zenopus.cpp — Opus packet/stream glue: TOC + frame packing (RFC 6716
// §3), the SILK/CELT/hybrid per-frame decode orchestration
// (libopus/src/opus_decoder.c semantics), the Ogg Opus container layer
// (RFC 7845: OpusHead, pre-skip, granule end-trim, output gain), and
// the C API the Python front door calls (zen_tpu/runtime/native.py).
//
// See zenopus.h for the provenance statement; zenopus_silk.cpp and
// zenopus_celt.cpp hold the two codec layers.

#include "zenopus.h"

#include <cmath>
#include <cstdio>
#include <cstdlib>

namespace zop {

// ---- packet framing (RFC 6716 §3.2) ---------------------------------------

namespace {
// 1-2 byte frame length; returns length or -1 at end of data
int read_frame_len(const uint8_t*& p, const uint8_t* end) {
  if (p >= end) fail();
  int v = *p++;
  if (v >= 252) {
    if (p >= end) fail();
    v += 4 * *p++;
  }
  return v;
}
}  // namespace

int opus_packet_frames(const uint8_t* data, size_t len, Toc* toc,
                       std::vector<std::pair<const uint8_t*, int>>& frames) {
  int32_t off;
  return opus_packet_parse(data, static_cast<int32_t>(len), false, toc, frames, &off);
}

// opus_packet_parse_impl semantics (libopus/src/opus.c:88-240),
// including Appendix-B self-delimited framing for multistream packets.
int opus_packet_parse(const uint8_t* data, int32_t len, bool self_delimited, Toc* toc,
                      std::vector<std::pair<const uint8_t*, int>>& frames,
                      int32_t* packet_offset) {
  frames.clear();
  if (len < 1) fail();
  const uint8_t* data0 = data;
  *toc = parse_toc(data[0]);
  int framesize = toc->frame_samples48;
  int count;
  bool cbr = false;
  int32_t pad = 0;
  int sizes[48];
  data++;
  len--;
  int32_t last_size = len;
  switch (toc->code) {
    case 0:
      count = 1;
      break;
    case 1:
      count = 2;
      cbr = true;
      if (!self_delimited) {
        if (len & 1) fail();
        last_size = len / 2;
        sizes[0] = static_cast<int>(last_size);
      }
      break;
    case 2: {
      count = 2;
      const uint8_t* p = data;
      const uint8_t* end = data + len;
      sizes[0] = read_frame_len(p, end);
      int bytes = static_cast<int>(p - data);
      len -= bytes;
      if (sizes[0] > len) fail();
      data = p;
      last_size = len - sizes[0];
      break;
    }
    default: {  // code 3
      if (len < 1) fail();
      int ch = *data++;
      count = ch & 0x3F;
      if (count <= 0 || framesize * count > 5760) fail();
      len--;
      if (ch & 0x40) {  // padding
        int p;
        do {
          if (len <= 0) fail();
          p = *data++;
          len--;
          int tmp = p == 255 ? 254 : p;
          len -= tmp;
          pad += tmp;
        } while (p == 255);
      }
      if (len < 0) fail();
      cbr = !(ch & 0x80);
      if (!cbr) {
        last_size = len;
        for (int i = 0; i < count - 1; i++) {
          const uint8_t* p = data;
          const uint8_t* end = data + len;
          sizes[i] = read_frame_len(p, end);
          int bytes = static_cast<int>(p - data);
          len -= bytes;
          if (sizes[i] > len) fail();
          data = p;
          last_size -= bytes + sizes[i];
        }
        if (last_size < 0) fail();
      } else if (!self_delimited) {
        last_size = len / count;
        if (last_size * count != len) fail();
        for (int i = 0; i < count - 1; i++) sizes[i] = static_cast<int>(last_size);
      }
      break;
    }
  }
  if (self_delimited) {
    const uint8_t* p = data;
    const uint8_t* end = data + len;
    sizes[count - 1] = read_frame_len(p, end);
    int bytes = static_cast<int>(p - data);
    len -= bytes;
    if (sizes[count - 1] > len) fail();
    data = p;
    if (cbr) {
      if (sizes[count - 1] * count > len) fail();
      for (int i = 0; i < count - 1; i++) sizes[i] = sizes[count - 1];
    } else if (bytes + sizes[count - 1] > last_size) {
      fail();
    }
  } else {
    if (last_size > 1275) fail();
    sizes[count - 1] = static_cast<int>(last_size);
  }
  for (int i = 0; i < count; i++) {
    if (sizes[i] < 0) fail();
    frames.emplace_back(data, sizes[i]);
    data += sizes[i];
  }
  if (packet_offset) *packet_offset = pad + static_cast<int32_t>(data - data0);
  return count;
}

// ---- per-frame decode (opus_decoder.c:204-583 semantics) ------------------

struct OpusDec {
  int channels;  // API channels (1 or 2)
  SilkDecoder silk;
  CeltDecoder celt;
  int stream_channels;
  int prev_mode = -1;  // -1: none yet
  bool prev_redundancy = false;
  int frame_size = 0;  // last TOC frame size (samples at 48 kHz)

  explicit OpusDec(int ch) : channels(ch), stream_channels(ch) {
    silk.reset();
    celt.reset();
    celt.channels = ch;
  }

  // Decode one elementary Opus frame (data != nullptr) of n48 samples
  // into interleaved float PCM (±1).  Returns samples per channel.
  int decode_frame(const uint8_t* data, int len, const Toc& toc, float* pcm);
  // PLC/DTX: conceal audiosize samples using the previous mode.
  int conceal_frame(int audiosize, float* pcm);
  // Decode a pre-parsed frame list (multistream path parses packets
  // with self-delimited framing first).
  int decode_frames(const Toc& toc, const std::vector<std::pair<const uint8_t*, int>>& frames,
                    float* pcm);
  // Decode a whole packet; pcm must hold 5760*channels floats.
  int decode_packet(const uint8_t* data, size_t len, float* pcm);
};

namespace {
// opus_decoder.c:172-187 — 2.5 ms power-complementary crossfade
void smooth_fade(const float* in1, const float* in2, float* out, int overlap, int channels,
                 const float* window120) {
  for (int c = 0; c < channels; c++) {
    for (int i = 0; i < overlap; i++) {
      float w = window120[i] * window120[i];
      out[i * channels + c] = w * in2[i * channels + c] + (1 - w) * in1[i * channels + c];
    }
  }
}
}  // namespace

int OpusDec::conceal_frame(int audiosize, float* pcm) {
  constexpr int kF5 = 240, kF10 = 480, kF20 = 960;
  if (prev_mode < 0) {
    for (int i = 0; i < audiosize * channels; i++) pcm[i] = 0;
    return audiosize;
  }
  Mode mode = static_cast<Mode>(prev_mode);
  if (audiosize > kF20) {  // conceal in 20 ms chunks
    int done = 0;
    while (done < audiosize) {
      int n = audiosize - done < kF20 ? audiosize - done : kF20;
      conceal_frame(n, pcm + static_cast<size_t>(done) * channels);
      done += n;
    }
    return audiosize;
  }
  if (audiosize < kF20) {
    if (audiosize > kF10) {
      audiosize = kF10;
    } else if (mode != Mode::kSilk && audiosize > kF5 && audiosize < kF10) {
      audiosize = kF5;
    }
  }
  for (int i = 0; i < audiosize * channels; i++) pcm[i] = 0;
  std::vector<int16_t> pcm_silk;
  if (mode != Mode::kCelt) {
    pcm_silk.assign(static_cast<size_t>(audiosize < kF10 ? kF10 : audiosize) * channels, 0);
    int duration_ms = audiosize / 48 < 10 ? 10 : audiosize / 48;
    int done = 0;
    while (done < audiosize) {
      int got = silk.decode_lost(duration_ms > 20 ? 20 : duration_ms,
                                 pcm_silk.data() + static_cast<size_t>(done) * channels,
                                 channels);
      done += got;
    }
  }
  if (mode != Mode::kSilk) {
    // CELT PLC runs for both CELT and hybrid concealment
    celt.stream_channels = stream_channels;
    celt.decode(nullptr, nullptr, 0, pcm, audiosize);
  }
  if (mode != Mode::kCelt) {
    for (int i = 0; i < audiosize * channels; i++) {
      pcm[i] += (1.0f / 32768.0f) * pcm_silk[i];
    }
  }
  prev_redundancy = false;
  return audiosize;
}

int OpusDec::decode_frame(const uint8_t* data, int len, const Toc& toc, float* pcm) {
  constexpr int kF2_5 = 120, kF5 = 240, kF20 = 960;
  int audiosize = toc.frame_samples48;
  Mode mode = toc.mode;
  RangeDec rd;
  if (len > 1) {
    rd.init(data, static_cast<uint32_t>(len));
  } else {
    // 0/1-byte frames are DTX/loss: conceal with the PREVIOUS mode's
    // PLC (opus_decoder.c:258-291 semantics)
    return conceal_frame(audiosize, pcm);
  }

  bool transition = false;
  if (prev_mode >= 0 &&
      ((mode == Mode::kCelt && prev_mode != static_cast<int>(Mode::kCelt) && !prev_redundancy) ||
       (mode != Mode::kCelt && prev_mode == static_cast<int>(Mode::kCelt)))) {
    transition = true;
  }
  // Transition PCM comes from PLC (opus_decoder.c:306 + 448): when
  // switching TO CELT it extrapolates the old SILK state (generated
  // here, before SILK state is reset); when switching FROM CELT the
  // CELT PLC runs after the redundancy parse below.
  std::vector<float> pcm_transition;
  if (transition) {
    pcm_transition.assign(static_cast<size_t>(kF5) * channels, 0.0f);
    if (mode == Mode::kCelt) {
      conceal_frame(kF5 < audiosize ? kF5 : audiosize, pcm_transition.data());
    }
  }

  std::vector<int16_t> pcm_silk;
  if (mode != Mode::kCelt) {
    pcm_silk.assign(static_cast<size_t>(audiosize < kF20 ? kF20 : audiosize) * channels, 0);
    if (prev_mode == static_cast<int>(Mode::kCelt)) silk.reset();
    int duration_ms = audiosize / 48;
    Bandwidth silk_bw = mode == Mode::kHybrid ? kBwWB : toc.bw;
    int got = silk.decode(rd, stream_channels, duration_ms, silk_bw, pcm_silk.data(),
                          channels);
    if (got != audiosize) fail();
  }

  int start_band = 0;
  bool redundancy = false;
  bool celt_to_silk = false;
  int redundancy_bytes = 0;
  if (mode != Mode::kCelt && data != nullptr &&
      rd.tell() + 17 + 20 * (mode == Mode::kHybrid ? 1 : 0) <= 8 * len) {
    if (mode == Mode::kHybrid) {
      redundancy = rd.bit_logp(12) != 0;
    } else {
      redundancy = true;
    }
    if (redundancy) {
      celt_to_silk = rd.bit_logp(1) != 0;
      redundancy_bytes = mode == Mode::kHybrid
                             ? static_cast<int>(rd.dec_uint(256)) + 2
                             : len - ((rd.tell() + 7) >> 3);
      len -= redundancy_bytes;
      if (len * 8 < rd.tell()) {
        len = 0;
        redundancy_bytes = 0;
        redundancy = false;
      }
      rd.storage -= static_cast<uint32_t>(redundancy_bytes);
    }
  }
  if (mode != Mode::kCelt) start_band = 17;

  int endband = 21;
  switch (toc.bw) {
    case kBwNB:
      endband = 13;
      break;
    case kBwMB:
    case kBwWB:
      endband = 17;
      break;
    case kBwSWB:
      endband = 19;
      break;
    case kBwFB:
      endband = 21;
      break;
  }
  celt.end_band = endband;
  celt.stream_channels = stream_channels;

  if (redundancy) transition = false;

  // CELT→SILK/hybrid switch: fade source is the old CELT state's PLC
  if (transition && mode != Mode::kCelt) {
    conceal_frame(kF5 < audiosize ? kF5 : audiosize, pcm_transition.data());
  }

  std::vector<float> redundant_audio;
  if (redundancy) redundant_audio.assign(static_cast<size_t>(kF5) * channels, 0.0f);

  // 5 ms redundant CELT frame for CELT->SILK transitions
  if (redundancy && celt_to_silk) {
    celt.start_band = 0;
    celt.decode(nullptr, data + len, redundancy_bytes, redundant_audio.data(), kF5);
  }
  celt.start_band = start_band;

  if (mode != Mode::kSilk) {
    int celt_frame_size = audiosize < kF20 ? audiosize : kF20;
    if (prev_mode >= 0 && prev_mode != static_cast<int>(mode) && !prev_redundancy) {
      celt.reset();
    }
    RangeDec* shared = &rd;
    celt.decode(shared, data, len, pcm, celt_frame_size);
  } else {
    for (int i = 0; i < audiosize * channels; i++) pcm[i] = 0;
    if (prev_mode == static_cast<int>(Mode::kHybrid) &&
        !(redundancy && celt_to_silk && prev_redundancy)) {
      // let the CELT MDCT fade out by decoding a silence frame
      static const uint8_t kSilence[2] = {0xFF, 0xFF};
      celt.start_band = 0;
      celt.decode(nullptr, kSilence, 2, pcm, kF2_5);
    }
  }

  if (mode != Mode::kCelt) {
    for (int i = 0; i < audiosize * channels; i++) {
      pcm[i] += (1.0f / 32768.0f) * pcm_silk[i];
    }
  }

  extern const float* celt_mode_window();  // kCeltWindow120 accessor
  const float* window = celt_mode_window();

  // 5 ms redundant CELT frame for SILK->CELT transitions
  if (redundancy && !celt_to_silk) {
    celt.reset();
    celt.start_band = 0;
    celt.decode(nullptr, data + len, redundancy_bytes, redundant_audio.data(), kF5);
    smooth_fade(pcm + channels * (audiosize - kF2_5), redundant_audio.data() + channels * kF2_5,
                pcm + channels * (audiosize - kF2_5), kF2_5, channels, window);
  }
  if (redundancy && celt_to_silk) {
    for (int c = 0; c < channels; c++) {
      for (int i = 0; i < kF2_5; i++) {
        pcm[channels * i + c] = redundant_audio[channels * i + c];
      }
    }
    smooth_fade(redundant_audio.data() + channels * kF2_5, pcm + channels * kF2_5,
                pcm + channels * kF2_5, kF2_5, channels, window);
  }
  if (transition) {
    if (audiosize >= kF5) {
      for (int i = 0; i < channels * kF2_5; i++) pcm[i] = pcm_transition[i];
      smooth_fade(pcm_transition.data() + channels * kF2_5, pcm + channels * kF2_5,
                  pcm + channels * kF2_5, kF2_5, channels, window);
    } else {
      smooth_fade(pcm_transition.data(), pcm, pcm, kF2_5, channels, window);
    }
  }

  prev_mode = static_cast<int>(mode);
  prev_redundancy = redundancy && !celt_to_silk;
  return audiosize;
}

int OpusDec::decode_frames(const Toc& toc,
                           const std::vector<std::pair<const uint8_t*, int>>& frames,
                           float* pcm) {
  if (static_cast<int>(frames.size()) * toc.frame_samples48 > 5760) fail();
  stream_channels = toc.stereo ? 2 : 1;
  frame_size = toc.frame_samples48;
  int total = 0;
  for (auto& f : frames) {
    total += decode_frame(f.first, f.second, toc, pcm + static_cast<size_t>(total) * channels);
  }
  return total;
}

int OpusDec::decode_packet(const uint8_t* data, size_t len, float* pcm) {
  Toc toc;
  std::vector<std::pair<const uint8_t*, int>> frames;
  opus_packet_frames(data, len, &toc, frames);
  return decode_frames(toc, frames, pcm);
}

// ---- Ogg Opus container (RFC 7845) ----------------------------------------

namespace {

struct Crc32 {
  uint32_t t[256];
  Crc32() {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t r = i << 24;
      for (int j = 0; j < 8; ++j) r = (r & 0x80000000u) ? (r << 1) ^ 0x04C11DB7u : (r << 1);
      t[i] = r;
    }
  }
  uint32_t run(const uint8_t* d, size_t n, uint32_t crc = 0) const {
    for (size_t i = 0; i < n; ++i) crc = (crc << 8) ^ t[((crc >> 24) ^ d[i]) & 0xFF];
    return crc;
  }
};

struct OggPacket {
  std::vector<uint8_t> data;
  int64_t granule = -1;  // granulepos of the page this packet ENDS on
  bool eos = false;
};

// Walk the Ogg physical stream, yielding packets of the first logical
// stream (same packetization rules as the zenvorbis Ogg layer, RFC 3533).
void ogg_packets(const uint8_t* d, size_t len, std::vector<OggPacket>& out) {
  static const Crc32 crc;
  size_t off = 0;
  bool have_serial = false;
  uint32_t serial = 0;
  std::vector<uint8_t> pending;
  while (off + 27 <= len) {
    if (std::memcmp(d + off, "OggS", 4) != 0) {
      const void* p = std::memchr(d + off + 1, 'O', len - off - 1);
      if (!p) break;
      off = static_cast<size_t>(static_cast<const uint8_t*>(p) - d);
      continue;
    }
    if (d[off + 4] != 0) fail();
    uint8_t htype = d[off + 5];
    int64_t granule;
    std::memcpy(&granule, d + off + 6, 8);
    uint32_t ser;
    std::memcpy(&ser, d + off + 14, 4);
    uint8_t nseg = d[off + 26];
    size_t hdr = 27 + nseg;
    if (off + hdr > len) break;
    size_t body = 0;
    for (int i = 0; i < nseg; ++i) body += d[off + 27 + i];
    if (off + hdr + body > len) break;
    {
      uint8_t tmp[27 + 255];
      std::memcpy(tmp, d + off, hdr);
      std::memset(tmp + 22, 0, 4);
      uint32_t want;
      std::memcpy(&want, d + off + 22, 4);
      uint32_t got = crc.run(tmp, hdr);
      got = crc.run(d + off + hdr, body, got);
      if (got != want) {
        off += 1;
        continue;
      }
    }
    if (!have_serial) {
      if (htype & 0x2) {
        serial = ser;
        have_serial = true;
      } else {
        off += hdr + body;
        continue;
      }
    }
    if (ser != serial) {
      off += hdr + body;
      continue;
    }
    bool cont_flag = (htype & 0x1) != 0;
    bool eos = (htype & 0x4) != 0;
    if (!cont_flag && !pending.empty()) pending.clear();
    bool drop_first = cont_flag && pending.empty();
    size_t p = off + hdr;
    size_t start = p;
    std::vector<std::pair<size_t, size_t>> spans;
    bool ends_partial = nseg > 0 && d[off + 27 + nseg - 1] == 255;
    for (int i = 0; i < nseg; ++i) {
      size_t l = d[off + 27 + i];
      p += l;
      if (l < 255) {
        spans.emplace_back(start, p);
        start = p;
      }
    }
    for (size_t si = 0; si < spans.size(); ++si) {
      if (si == 0 && drop_first) continue;
      OggPacket pkt;
      if (si == 0 && cont_flag) {
        pkt.data = std::move(pending);
        pending.clear();
      }
      pkt.data.insert(pkt.data.end(), d + spans[si].first, d + spans[si].second);
      pkt.granule = granule;
      pkt.eos = eos;
      out.push_back(std::move(pkt));
    }
    if (ends_partial) {
      if (!(spans.empty() && drop_first)) {
        pending.insert(pending.end(), d + start, d + off + hdr + body);
      }
    } else {
      pending.clear();
    }
    off += hdr + body;
  }
}

uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0] | (p[1] << 8));
}

}  // namespace

// Decode a whole Ogg Opus stream to interleaved float PCM at 48 kHz.
// Supports channel mapping family 0 (mono/stereo single stream).
void decode_ogg_opus(const uint8_t* data, size_t len, std::vector<float>& out, uint32_t* fs,
                     uint32_t* nch) {
  std::vector<OggPacket> pkts;
  ogg_packets(data, len, pkts);
  if (pkts.size() < 2) fail();
  const auto& head = pkts[0].data;
  if (head.size() < 19 || std::memcmp(head.data(), "OpusHead", 8) != 0) fail();
  int version = head[8];
  if ((version >> 4) != 0) fail();  // accept 0.x and 1.x per RFC 7845
  int channels = head[9];
  int preskip = rd_u16(&head[10]);
  int16_t gain_q8 = static_cast<int16_t>(rd_u16(&head[16]));
  int family = head[18];
  if (channels < 1) fail();
  // channel layout (RFC 7845 §5.1.1): family 0 is one mono/stereo
  // stream; families 1/255 carry stream_count self-delimited Opus
  // packets per Ogg packet, mapped to output channels
  int stream_count = 1, coupled_count = 0;
  std::vector<uint8_t> mapping;
  if (family == 0) {
    if (channels > 2) fail();
    stream_count = 1;
    coupled_count = channels == 2 ? 1 : 0;
    for (int c = 0; c < channels; c++) mapping.push_back(static_cast<uint8_t>(c));
  } else {
    if (head.size() < static_cast<size_t>(21 + channels)) fail();
    stream_count = head[19];
    coupled_count = head[20];
    if (stream_count < 1 || coupled_count > stream_count ||
        stream_count + coupled_count > 255) {
      fail();
    }
    for (int c = 0; c < channels; c++) {
      uint8_t m = head[21 + c];
      if (m != 255 && m >= coupled_count + stream_count) fail();
      mapping.push_back(m);
    }
  }
  // pkts[1] must be OpusTags (skipped); audio starts at pkts[2]
  if (pkts[1].data.size() < 8 || std::memcmp(pkts[1].data.data(), "OpusTags", 8) != 0) fail();

  std::vector<OpusDec> decs;
  decs.reserve(static_cast<size_t>(stream_count));
  for (int s = 0; s < stream_count; s++) decs.emplace_back(s < coupled_count ? 2 : 1);
  out.clear();
  int64_t last_granule = -1;
  std::vector<std::vector<float>> stream_pcm(static_cast<size_t>(stream_count),
                                             std::vector<float>(5760 * 2));
  for (size_t i = 2; i < pkts.size(); i++) {
    if (pkts[i].data.empty()) continue;
    // decode every elementary stream of this Ogg packet
    const uint8_t* p = pkts[i].data.data();
    int32_t remaining = static_cast<int32_t>(pkts[i].data.size());
    int got = -1;
    for (int s = 0; s < stream_count; s++) {
      bool self_delim = s < stream_count - 1;
      Toc toc;
      std::vector<std::pair<const uint8_t*, int>> frames;
      int32_t consumed = remaining;
      opus_packet_parse(p, remaining, self_delim, &toc, frames, &consumed);
      // re-assemble the elementary packet span for decode_packet:
      // frames are contiguous, so decode from the packet start with
      // a per-stream decoder via the frame list directly
      int32_t elem_len = self_delim ? consumed : remaining;
      int g = decs[static_cast<size_t>(s)].decode_frames(toc, frames,
                                                         stream_pcm[static_cast<size_t>(s)].data());
      if (got < 0) got = g;
      if (g != got) fail();  // streams must stay in lockstep
      p += elem_len;
      remaining -= elem_len;
    }
    // map stream channels to output channels
    size_t base = out.size();
    out.resize(base + static_cast<size_t>(got) * channels);
    for (int c = 0; c < channels; c++) {
      uint8_t m = mapping[static_cast<size_t>(c)];
      if (m == 255) {
        for (int j = 0; j < got; j++) out[base + static_cast<size_t>(j) * channels + c] = 0;
        continue;
      }
      int s, sub, sch;
      if (m < 2 * coupled_count) {
        s = m / 2;
        sub = m & 1;
        sch = 2;
      } else {
        s = coupled_count + (m - 2 * coupled_count);
        sub = 0;
        sch = 1;
      }
      const float* src = stream_pcm[static_cast<size_t>(s)].data();
      for (int j = 0; j < got; j++) {
        out[base + static_cast<size_t>(j) * channels + c] = src[j * sch + sub];
      }
    }
    if (pkts[i].granule >= 0) last_granule = pkts[i].granule;
  }
  // RFC 7845 §4.4/§4.5: drop pre-skip, then trim to granule length
  size_t total = out.size() / channels;
  size_t start = preskip < 0 ? 0 : static_cast<size_t>(preskip);
  if (start > total) start = total;
  size_t end_frames = total;
  if (last_granule >= 0) {
    uint64_t g = static_cast<uint64_t>(last_granule);
    if (g < static_cast<uint64_t>(total)) end_frames = static_cast<size_t>(g);
  }
  if (end_frames < start) end_frames = start;
  out.erase(out.begin() + static_cast<long>(end_frames) * channels, out.end());
  out.erase(out.begin(), out.begin() + static_cast<long>(start) * channels);
  if (gain_q8 != 0) {
    float g = std::pow(10.0f, gain_q8 / (20.0f * 256.0f));
    for (auto& v : out) v *= g;
  }
  *fs = 48000;
  *nch = static_cast<uint32_t>(channels);
}

}  // namespace zop

// ---- C API ----------------------------------------------------------------

extern "C" {

int zen_opus_decode_mem(const uint8_t* data, uint64_t len, float** out, uint64_t* frames,
                        uint32_t* fs, uint32_t* nch) {
  try {
    std::vector<float> pcm;
    zop::decode_ogg_opus(data, static_cast<size_t>(len), pcm, fs, nch);
    *frames = pcm.size() / *nch;
    *out = static_cast<float*>(malloc(pcm.size() * sizeof(float) + 1));
    if (!*out) return -2;
    if (!pcm.empty()) std::memcpy(*out, pcm.data(), pcm.size() * sizeof(float));
    return 0;
  } catch (const zop::OpError&) {
    return -1;
  } catch (const std::bad_alloc&) {
    return -2;
  }
}

int zen_opus_decode_file(const char* path, float** out, uint64_t* frames, uint32_t* fs,
                         uint32_t* nch) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -3;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n < 0) {
    std::fclose(f);
    return -3;
  }
  uint8_t* buf = static_cast<uint8_t*>(malloc(static_cast<size_t>(n) + 1));
  if (!buf) {
    std::fclose(f);
    return -2;
  }
  size_t got = std::fread(buf, 1, static_cast<size_t>(n), f);
  std::fclose(f);
  if (got != static_cast<size_t>(n)) {
    free(buf);
    return -3;
  }
  int rc = zen_opus_decode_mem(buf, got, out, frames, fs, nch);
  free(buf);
  return rc;
}

void zen_opus_free(float* p) { free(p); }

// Packet-level API for differential testing against libopus: decode a
// [u32 len][bytes]... sequence with one persistent decoder.
void* zen_opus_pkt_create(int channels) {
  if (channels < 1 || channels > 2) return nullptr;
  try {
    return new zop::OpusDec(channels);
  } catch (...) {
    return nullptr;
  }
}

int zen_opus_pkt_decode(void* handle, const uint8_t* pkt, uint32_t len, float* pcm_out,
                        uint32_t max_frames) {
  auto* dec = static_cast<zop::OpusDec*>(handle);
  try {
    std::vector<float> tmp(static_cast<size_t>(5760) * dec->channels);
    int got = dec->decode_packet(pkt, len, tmp.data());
    if (static_cast<uint32_t>(got) > max_frames) return -2;
    std::memcpy(pcm_out, tmp.data(), static_cast<size_t>(got) * dec->channels * sizeof(float));
    return got;
  } catch (const zop::OpError&) {
    return -1;
  } catch (const std::bad_alloc&) {
    return -2;
  }
}

void zen_opus_pkt_destroy(void* handle) { delete static_cast<zop::OpusDec*>(handle); }

}  // extern "C"
