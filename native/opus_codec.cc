// Ogg-Opus decode (and encode, for tests/tooling) on top of the system
// libopus — no ffmpeg binary, no torchaudio (TPU-native replacement for the
// reference's host-side decode, ref: src/utils/MLS.py:58-61).
//
// The Ogg container is demuxed/muxed by hand (the format is ~100 lines:
// "OggS" capture, lacing tables, CRC) so the only external dependency is
// libopus.so.0, loaded with dlopen at first use — the runtime library ships
// in this image but its headers do not, so the handful of stable ABI entry
// points are declared locally.
//
// Decode semantics: mono mix, decoded natively at the preferred rate when
// Opus supports it ({8,12,16,24,48} kHz — MLS runs at 24 kHz so no resample
// pass is needed), pre-skip honored, stream trimmed to the final granule
// position per RFC 7845.

#include <dlfcn.h>
#include <stdint.h>
#include <string.h>

#include <algorithm>
#include <string>
#include <vector>

// ---------------------------------------------------------------------------
// libopus ABI (subset; stable since libopus 1.0)
// ---------------------------------------------------------------------------

typedef struct OpusDecoder OpusDecoder;
typedef struct OpusEncoder OpusEncoder;

struct OpusApi {
  OpusDecoder* (*decoder_create)(int32_t fs, int ch, int* err);
  int (*decode_float)(OpusDecoder*, const unsigned char*, int32_t, float*,
                      int, int);
  void (*decoder_destroy)(OpusDecoder*);
  OpusEncoder* (*encoder_create)(int32_t fs, int ch, int app, int* err);
  int32_t (*encode_float)(OpusEncoder*, const float*, int, unsigned char*,
                          int32_t);
  void (*encoder_destroy)(OpusEncoder*);
  bool ok = false;
};

static OpusApi* opus_api() {
  static OpusApi api;
  static bool tried = false;
  if (!tried) {
    tried = true;
    void* h = dlopen("libopus.so.0", RTLD_NOW | RTLD_GLOBAL);
    if (!h) h = dlopen("libopus.so", RTLD_NOW | RTLD_GLOBAL);
    if (h) {
      api.decoder_create = (OpusDecoder * (*)(int32_t, int, int*))
          dlsym(h, "opus_decoder_create");
      api.decode_float =
          (int (*)(OpusDecoder*, const unsigned char*, int32_t, float*, int,
                   int))dlsym(h, "opus_decode_float");
      api.decoder_destroy =
          (void (*)(OpusDecoder*))dlsym(h, "opus_decoder_destroy");
      api.encoder_create = (OpusEncoder * (*)(int32_t, int, int, int*))
          dlsym(h, "opus_encoder_create");
      api.encode_float = (int32_t(*)(OpusEncoder*, const float*, int,
                                     unsigned char*, int32_t))
          dlsym(h, "opus_encode_float");
      api.encoder_destroy =
          (void (*)(OpusEncoder*))dlsym(h, "opus_encoder_destroy");
      api.ok = api.decoder_create && api.decode_float &&
               api.decoder_destroy && api.encoder_create &&
               api.encode_float && api.encoder_destroy;
    }
  }
  return &api;
}

// ---------------------------------------------------------------------------
// Ogg demux
// ---------------------------------------------------------------------------

struct OggPacket {
  std::vector<uint8_t> data;
  int64_t granulepos = -1;  // of the page the packet COMPLETES on
  bool eos = false;
};

// Parse all packets of the FIRST logical stream whose initial packet starts
// with "OpusHead". CRC is not verified (we only read whole in-memory files).
static bool ogg_demux_opus(const uint8_t* p, size_t n,
                           std::vector<OggPacket>* out) {
  size_t pos = 0;
  bool have_serial = false;
  uint32_t serial = 0;
  std::vector<uint8_t> partial;
  bool partial_open = false;

  while (pos + 27 <= n) {
    if (memcmp(p + pos, "OggS", 4) != 0) {
      ++pos;  // resync
      continue;
    }
    const uint8_t* h = p + pos;
    uint8_t htype = h[5];
    int64_t granule;
    memcpy(&granule, h + 6, 8);
    uint32_t ser;
    memcpy(&ser, h + 14, 4);
    uint8_t nsegs = h[26];
    if (pos + 27 + nsegs > n) break;
    const uint8_t* lacing = h + 27;
    size_t body = pos + 27 + nsegs;
    size_t body_len = 0;
    for (int i = 0; i < nsegs; ++i) body_len += lacing[i];
    if (body + body_len > n) break;

    bool bos = htype & 0x02, eos = htype & 0x04;
    bool ours = have_serial ? ser == serial : bos;
    if (ours) {
      size_t off = body;
      for (int i = 0; i < nsegs; ++i) {
        partial.insert(partial.end(), p + off, p + off + lacing[i]);
        off += lacing[i];
        partial_open = lacing[i] == 255;
        if (!partial_open) {
          if (!have_serial) {
            // first complete packet: claim the stream iff it's OpusHead
            if (partial.size() >= 8 &&
                memcmp(partial.data(), "OpusHead", 8) == 0) {
              have_serial = true;
              serial = ser;
            } else {
              partial.clear();
              break;  // not an Opus stream; keep looking at other BOS pages
            }
          }
          OggPacket pkt;
          pkt.data = std::move(partial);
          partial.clear();
          // granulepos applies to the LAST packet completed on the page
          pkt.granulepos = (i == nsegs - 1) ? granule : -1;
          pkt.eos = eos && i == nsegs - 1;
          out->push_back(std::move(pkt));
        }
      }
      // fix granulepos: it belongs to the last COMPLETED packet on the page
      if (!out->empty() && !partial_open) out->back().granulepos = granule;
    }
    pos = body + body_len;
  }
  return have_serial && out->size() >= 2;
}

// ---------------------------------------------------------------------------
// decode
// ---------------------------------------------------------------------------

static bool opus_rate_ok(int fs) {
  return fs == 8000 || fs == 12000 || fs == 16000 || fs == 24000 ||
         fs == 48000;
}

// Decode an in-memory Ogg-Opus file to mono float. Picks preferred_rate when
// Opus supports it natively, else 48000 (caller resamples). Returns false on
// malformed input or missing libopus.
bool decode_opus(const uint8_t* data, size_t n, int preferred_rate,
                 std::vector<float>* mono, int* rate_out) {
  OpusApi* api = opus_api();
  if (!api->ok) return false;
  std::vector<OggPacket> pkts;
  if (!ogg_demux_opus(data, n, &pkts)) return false;

  const std::vector<uint8_t>& head = pkts[0].data;
  if (head.size() < 19 || head[8] != 1) return false;  // version 1
  int channels = head[9];
  if (channels < 1 || channels > 2 || head[18] != 0) return false;
  uint16_t preskip48 = head[10] | (head[11] << 8);

  int fs = opus_rate_ok(preferred_rate) ? preferred_rate : 48000;
  *rate_out = fs;
  int err = 0;
  OpusDecoder* dec = api->decoder_create(fs, channels, &err);
  if (!dec || err != 0) return false;

  const int max_frame = fs * 120 / 1000;  // 120 ms
  std::vector<float> frame(size_t(max_frame) * channels);
  std::vector<float> pcm;
  int64_t final_granule = -1;
  // pkts[1] is OpusTags; audio starts at index 2
  for (size_t i = 2; i < pkts.size(); ++i) {
    int got = api->decode_float(dec, pkts[i].data.data(),
                                int32_t(pkts[i].data.size()), frame.data(),
                                max_frame, 0);
    if (got < 0) {
      api->decoder_destroy(dec);
      return false;
    }
    if (channels == 1) {
      pcm.insert(pcm.end(), frame.begin(), frame.begin() + got);
    } else {
      for (int s = 0; s < got; ++s)
        pcm.push_back(0.5f * (frame[2 * s] + frame[2 * s + 1]));
    }
    if (pkts[i].granulepos >= 0) final_granule = pkts[i].granulepos;
  }
  api->decoder_destroy(dec);

  size_t skip = size_t(int64_t(preskip48) * fs / 48000);
  size_t total = pcm.size() > skip ? pcm.size() - skip : 0;
  if (final_granule > preskip48) {
    size_t want = size_t((final_granule - preskip48) * int64_t(fs) / 48000);
    if (want < total) total = want;
  }
  mono->assign(pcm.begin() + skip, pcm.begin() + skip + total);
  return true;
}

// ---------------------------------------------------------------------------
// Ogg mux + encode (tooling/tests: lets this environment fabricate valid
// .opus fixtures and transcode without ffmpeg)
// ---------------------------------------------------------------------------

static uint32_t ogg_crc(const uint8_t* p, size_t n) {
  static uint32_t table[256];
  static bool init = false;
  if (!init) {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t r = i << 24;
      for (int j = 0; j < 8; ++j)
        r = (r << 1) ^ ((r & 0x80000000u) ? 0x04c11db7u : 0u);
      table[i] = r;
    }
    init = true;
  }
  uint32_t crc = 0;
  for (size_t i = 0; i < n; ++i)
    crc = (crc << 8) ^ table[((crc >> 24) & 0xff) ^ p[i]];
  return crc;
}

static void ogg_write_page(std::vector<uint8_t>* out,
                           const std::vector<std::vector<uint8_t>>& packets,
                           uint8_t htype, int64_t granule, uint32_t serial,
                           uint32_t pageno) {
  std::vector<uint8_t> lacing;
  std::vector<uint8_t> body;
  for (const auto& pkt : packets) {
    size_t rem = pkt.size();
    for (;;) {
      uint8_t seg = rem >= 255 ? 255 : uint8_t(rem);
      lacing.push_back(seg);
      rem -= seg;
      if (seg < 255) break;
    }
    body.insert(body.end(), pkt.begin(), pkt.end());
  }
  size_t start = out->size();
  out->insert(out->end(), {'O', 'g', 'g', 'S', 0, htype});
  for (int i = 0; i < 8; ++i)
    out->push_back(uint8_t((uint64_t(granule) >> (8 * i)) & 0xff));
  for (int i = 0; i < 4; ++i) out->push_back((serial >> (8 * i)) & 0xff);
  for (int i = 0; i < 4; ++i) out->push_back((pageno >> (8 * i)) & 0xff);
  for (int i = 0; i < 4; ++i) out->push_back(0);  // crc placeholder
  out->push_back(uint8_t(lacing.size()));
  out->insert(out->end(), lacing.begin(), lacing.end());
  out->insert(out->end(), body.begin(), body.end());
  uint32_t crc = ogg_crc(out->data() + start, out->size() - start);
  for (int i = 0; i < 4; ++i)
    (*out)[start + 22 + i] = (crc >> (8 * i)) & 0xff;
}

// Encode mono float pcm at sample_rate into an in-memory Ogg-Opus file.
bool encode_opus(const float* pcm, size_t n, int sample_rate,
                 std::vector<uint8_t>* out) {
  OpusApi* api = opus_api();
  if (!api->ok || !opus_rate_ok(sample_rate)) return false;
  int err = 0;
  OpusEncoder* enc =
      api->encoder_create(sample_rate, 1, 2049 /*OPUS_APPLICATION_AUDIO*/,
                          &err);
  if (!enc || err != 0) return false;

  uint32_t serial = 0x64697474;  // arbitrary
  uint32_t pageno = 0;
  std::vector<uint8_t> head = {'O', 'p', 'u', 's', 'H', 'e', 'a', 'd',
                               1,   1,   0,   0};  // ver, ch, preskip 0
  for (int i = 0; i < 4; ++i)
    head.push_back((uint32_t(sample_rate) >> (8 * i)) & 0xff);
  head.insert(head.end(), {0, 0, 0});  // gain, mapping family 0
  ogg_write_page(out, {head}, 0x02, 0, serial, pageno++);
  std::vector<uint8_t> tags = {'O', 'p', 'u', 's', 'T', 'a', 'g', 's',
                               0,   0,   0,   0,   0,   0,   0,   0};
  ogg_write_page(out, {tags}, 0x00, 0, serial, pageno++);

  const int frame = sample_rate / 50;  // 20 ms
  std::vector<float> buf(frame, 0.0f);
  std::vector<uint8_t> packet(4000);
  std::vector<std::vector<uint8_t>> page_pkts;
  int64_t granule = 0;
  size_t done = 0;
  while (done < n) {
    size_t take = std::min(size_t(frame), n - done);
    std::fill(buf.begin(), buf.end(), 0.0f);
    memcpy(buf.data(), pcm + done, take * sizeof(float));
    done += take;
    int32_t got = api->encode_float(enc, buf.data(), frame, packet.data(),
                                    int32_t(packet.size()));
    if (got < 0) {
      api->encoder_destroy(enc);
      return false;
    }
    page_pkts.emplace_back(packet.begin(), packet.begin() + got);
    granule += int64_t(frame) * 48000 / sample_rate;
    bool last = done >= n;
    if (page_pkts.size() >= 50 || last) {
      // final granule trims the zero padding of the last frame (RFC 7845)
      int64_t g = last ? int64_t(n) * 48000 / sample_rate : granule;
      ogg_write_page(out, page_pkts, last ? 0x04 : 0x00, g, serial,
                     pageno++);
      page_pkts.clear();
    }
  }
  api->encoder_destroy(enc);
  return true;
}

bool opus_runtime_available() { return opus_api()->ok; }
