// Native data loader: threaded WAV decode + polyphase resample + batch
// assembly with a bounded prefetch queue.
//
// TPU-native equivalent of the reference's host data path (ref:
// src/utils/MLS.py:47-85 — torchaudio decode + resample per item, and the
// DataLoader worker pool it never enables). The Python side owns manifests
// and tokenization; this library owns the byte-crunching: RIFF/WAVE parse
// (PCM16/24/32, float32, mono-mix), kaiser-windowed-sinc rational
// resampling to the target rate, bucket selection, padding, and validity
// masks — produced batch-at-a-time by a worker pool so device steps never
// wait on the host.
//
// C ABI (ctypes-friendly), see ditto_tts_tpu/data/native_loader.py:
//   loader_create(paths, n, sample_rate, batch, buckets, n_buckets,
//                 workers, queue_depth, seed, shuffle, drop_remainder)
//   loader_next(handle, audio_out, mask_out, index_out) -> bucket len | 0
//   loader_reset(handle, seed)
//   loader_destroy(handle)
//   decode_wav_file(path, target_rate, out, max_out) -> n_samples | -errcode
//   resample_f32(in, n_in, rate_in, rate_out, out, max_out) -> n_out

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

// Ogg-Opus support (native/opus_codec.cc, dlopen'd system libopus)
bool decode_opus(const uint8_t* data, size_t n, int preferred_rate,
                 std::vector<float>* mono, int* rate_out);
bool encode_opus(const float* pcm, size_t n, int sample_rate,
                 std::vector<uint8_t>* out);
bool opus_runtime_available();

namespace {

constexpr double kPi = 3.14159265358979323846;

// ---------------------------------------------------------------------------
// WAV parsing
// ---------------------------------------------------------------------------

struct WavData {
  std::vector<float> samples;  // mono
  int rate = 0;
};

uint32_t rd_u32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}
uint16_t rd_u16(const uint8_t* p) { return p[0] | (p[1] << 8); }

bool parse_wav(const uint8_t* buf, size_t n, WavData* out) {
  if (n < 44 || memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0)
    return false;
  size_t pos = 12;
  int channels = 0, bits = 0, fmt = 0;
  const uint8_t* data = nullptr;
  size_t data_len = 0;
  while (pos + 8 <= n) {
    const uint8_t* hdr = buf + pos;
    uint32_t len = rd_u32(hdr + 4);
    const uint8_t* body = hdr + 8;
    if (pos + 8 + len > n) len = n - pos - 8;
    if (memcmp(hdr, "fmt ", 4) == 0 && len >= 16) {
      fmt = rd_u16(body);
      channels = rd_u16(body + 2);
      out->rate = rd_u32(body + 4);
      bits = rd_u16(body + 14);
    } else if (memcmp(hdr, "data", 4) == 0) {
      data = body;
      data_len = len;
    }
    pos += 8 + len + (len & 1);
  }
  if (!data || channels <= 0 || out->rate <= 0) return false;
  size_t bytes_per = bits / 8;
  if (bytes_per == 0) return false;
  size_t frames = data_len / (bytes_per * channels);
  out->samples.resize(frames);
  for (size_t i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* s = data + (i * channels + c) * bytes_per;
      double v = 0.0;
      if (fmt == 3 && bits == 32) {  // IEEE float
        float f;
        memcpy(&f, s, 4);
        v = f;
      } else if (bits == 16) {
        v = int16_t(rd_u16(s)) / 32768.0;
      } else if (bits == 24) {
        int32_t x = s[0] | (s[1] << 8) | (s[2] << 16);
        if (x & 0x800000) x |= ~0xFFFFFF;
        v = x / 8388608.0;
      } else if (bits == 32 && fmt == 1) {
        v = int32_t(rd_u32(s)) / 2147483648.0;
      } else {
        return false;
      }
      acc += v;
    }
    out->samples[i] = float(acc / channels);
  }
  return true;
}

// Decode any supported container by magic bytes (RIFF/WAVE or Ogg-Opus)
// into mono float at native rate.
bool decode_audio(const uint8_t* buf, size_t n, int preferred_rate,
                  std::vector<float>* mono, int* rate) {
  if (n >= 4 && memcmp(buf, "OggS", 4) == 0)
    return decode_opus(buf, n, preferred_rate, mono, rate);
  WavData w;
  if (!parse_wav(buf, n, &w)) return false;
  *mono = std::move(w.samples);
  *rate = w.rate;
  return true;
}

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (len <= 0) {
    fclose(f);
    return false;
  }
  out->resize(size_t(len));
  size_t got = fread(out->data(), 1, size_t(len), f);
  fclose(f);
  return got == size_t(len);
}

// ---------------------------------------------------------------------------
// polyphase rational resampler (kaiser-windowed sinc)
// ---------------------------------------------------------------------------

double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 32; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-12 * sum) break;
  }
  return sum;
}

int gcd(int a, int b) { return b == 0 ? a : gcd(b, a % b); }

// Resample n_in samples from rate_in to rate_out. Returns output length.
size_t resample(const float* in, size_t n_in, int rate_in, int rate_out,
                std::vector<float>* out) {
  if (rate_in == rate_out) {
    out->assign(in, in + n_in);
    return n_in;
  }
  int g = gcd(rate_in, rate_out);
  int up = rate_out / g, down = rate_in / g;
  // anti-alias at min(nyquist_in, nyquist_out); 16 taps per input sample
  double cutoff = 0.5 / std::max(1, down) * std::min(1.0, double(down) / up);
  cutoff = 0.5 * std::min(1.0 / up, 1.0 / down);  // in units of up-rate
  int half = 16 * std::max(up, down);
  double beta = 8.6;  // kaiser
  double i0b = bessel_i0(beta);
  size_t n_out = (n_in * size_t(up)) / down;
  out->assign(n_out, 0.0f);
  // y[j] = sum_k x[k] * h(j*down/up - k), h = up * cutoff-sinc * kaiser
  for (size_t j = 0; j < n_out; ++j) {
    double center = double(j) * down / up;
    long k0 = long(std::ceil(center - double(half) / up));
    long k1 = long(std::floor(center + double(half) / up));
    k0 = std::max(0L, k0);
    k1 = std::min(long(n_in) - 1, k1);
    double acc = 0.0;
    for (long k = k0; k <= k1; ++k) {
      double t = (center - double(k)) * up;  // in up-rate samples
      double x = t / half;
      if (x < -1.0 || x > 1.0) continue;
      double win = bessel_i0(beta * std::sqrt(1.0 - x * x)) / i0b;
      double c = 2.0 * cutoff * up;
      double arg = 2.0 * cutoff * t;
      double sinc = (std::abs(arg) < 1e-12) ? 1.0
                                            : std::sin(kPi * arg) / (kPi * arg);
      acc += in[k] * c * sinc * win;
    }
    (*out)[j] = float(acc);
  }
  return n_out;
}

// ---------------------------------------------------------------------------
// loader
// ---------------------------------------------------------------------------

struct Batch {
  int bucket = 0;
  std::vector<float> audio;   // [batch * bucket]
  std::vector<int32_t> mask;  // [batch * bucket]
  std::vector<int32_t> indices;
};

struct Loader {
  std::vector<std::string> paths;
  int sample_rate;
  int batch;
  std::vector<int> buckets;
  int queue_depth;
  bool shuffle;
  bool drop_remainder;

  std::vector<int> order;
  std::atomic<size_t> cursor{0};

  std::deque<Batch> queue;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::atomic<int> active_workers{0};
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;

  ~Loader() { shutdown(); }

  void shutdown() {
    stop = true;
    cv_push.notify_all();
    cv_pop.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
    workers.clear();
  }

  int bucket_for(size_t len) const {
    for (int b : buckets)
      if (len <= size_t(b)) return b;
    return buckets.back();
  }

  bool load_item(int idx, std::vector<float>* mono) {
    std::vector<uint8_t> raw;
    if (!read_file(paths[idx].c_str(), &raw)) return false;
    std::vector<float> pcm;
    int rate = 0;
    if (!decode_audio(raw.data(), raw.size(), sample_rate, &pcm, &rate))
      return false;
    if (rate != sample_rate) {
      std::vector<float> res;
      resample(pcm.data(), pcm.size(), rate, sample_rate, &res);
      *mono = std::move(res);
    } else {
      *mono = std::move(pcm);
    }
    return true;
  }

  void worker() {
    while (!stop) {
      size_t start = cursor.fetch_add(size_t(batch));
      if (start >= order.size()) break;
      size_t end = std::min(start + size_t(batch), order.size());
      if (drop_remainder && end - start < size_t(batch)) break;

      std::vector<std::vector<float>> items;
      std::vector<int32_t> idxs;
      for (size_t i = start; i < end; ++i) {
        std::vector<float> mono;
        if (load_item(order[i], &mono)) {
          items.push_back(std::move(mono));
          idxs.push_back(order[i]);
        }
      }
      if (items.empty()) continue;

      size_t max_len = 0;
      for (auto& it : items) max_len = std::max(max_len, it.size());
      int bucket = bucket_for(max_len);

      Batch b;
      b.bucket = bucket;
      b.indices = idxs;
      b.audio.assign(items.size() * size_t(bucket), 0.0f);
      b.mask.assign(items.size() * size_t(bucket), 0);
      for (size_t i = 0; i < items.size(); ++i) {
        size_t n = std::min(items[i].size(), size_t(bucket));
        memcpy(&b.audio[i * bucket], items[i].data(), n * sizeof(float));
        std::fill_n(&b.mask[i * bucket], n, 1);
      }

      std::unique_lock<std::mutex> lk(mu);
      cv_push.wait(lk, [&] {
        return stop || queue.size() < size_t(queue_depth);
      });
      if (stop) break;
      queue.push_back(std::move(b));
      cv_pop.notify_one();
    }
    if (--active_workers == 0) cv_pop.notify_all();
  }

  void start(int n_workers, unsigned seed) {
    order.resize(paths.size());
    for (size_t i = 0; i < order.size(); ++i) order[i] = int(i);
    if (shuffle) {
      std::mt19937 rng(seed);
      std::shuffle(order.begin(), order.end(), rng);
    }
    cursor = 0;
    stop = false;
    active_workers = n_workers;
    for (int i = 0; i < n_workers; ++i)
      workers.emplace_back([this] { worker(); });
  }
};

}  // namespace

extern "C" {

void* loader_create(const char** paths, int n, int sample_rate, int batch,
                    const int* buckets, int n_buckets, int workers,
                    int queue_depth, unsigned seed, int shuffle,
                    int drop_remainder) {
  auto* l = new Loader();
  l->paths.assign(paths, paths + n);
  l->sample_rate = sample_rate;
  l->batch = batch;
  l->buckets.assign(buckets, buckets + n_buckets);
  std::sort(l->buckets.begin(), l->buckets.end());
  l->queue_depth = std::max(1, queue_depth);
  l->shuffle = shuffle != 0;
  l->drop_remainder = drop_remainder != 0;
  l->start(std::max(1, workers), seed);
  return l;
}

// Returns bucket length (>0) and fills audio/mask/[indices]; 0 = epoch end.
// audio_out/mask_out must hold batch * max(buckets) elements;
// index_out must hold batch ints (unused slots = -1).
int loader_next(void* h, float* audio_out, int32_t* mask_out,
                int32_t* index_out) {
  auto* l = static_cast<Loader*>(h);
  Batch b;
  {
    std::unique_lock<std::mutex> lk(l->mu);
    l->cv_pop.wait(lk, [&] {
      return !l->queue.empty() || l->active_workers == 0 || l->stop;
    });
    if (l->queue.empty()) return 0;
    b = std::move(l->queue.front());
    l->queue.pop_front();
  }
  l->cv_push.notify_one();
  size_t rows = b.indices.size();
  memcpy(audio_out, b.audio.data(), rows * b.bucket * sizeof(float));
  memcpy(mask_out, b.mask.data(), rows * b.bucket * sizeof(int32_t));
  for (int i = 0; i < l->batch; ++i)
    index_out[i] = (size_t(i) < rows) ? b.indices[i] : -1;
  return b.bucket;
}

void loader_reset(void* h, unsigned seed) {
  auto* l = static_cast<Loader*>(h);
  int n_workers = int(l->workers.size());
  l->shutdown();
  {
    std::lock_guard<std::mutex> lk(l->mu);
    l->queue.clear();
  }
  l->start(std::max(1, n_workers), seed);
}

void loader_destroy(void* h) { delete static_cast<Loader*>(h); }

int decode_audio_file(const char* path, int target_rate, float* out,
                      int max_out);

int decode_wav_file(const char* path, int target_rate, float* out,
                    int max_out) {
  return decode_audio_file(path, target_rate, out, max_out);
}

// Decode WAV or Ogg-Opus (by magic bytes) to mono float at target_rate.
int decode_audio_file(const char* path, int target_rate, float* out,
                      int max_out) {
  std::vector<uint8_t> raw;
  if (!read_file(path, &raw)) return -1;
  std::vector<float> pcm;
  int rate = 0;
  if (!decode_audio(raw.data(), raw.size(), target_rate, &pcm, &rate))
    return -2;
  std::vector<float>* samples = &pcm;
  std::vector<float> res;
  if (rate != target_rate) {
    resample(pcm.data(), pcm.size(), rate, target_rate, &res);
    samples = &res;
  }
  int n = int(std::min(size_t(max_out), samples->size()));
  memcpy(out, samples->data(), size_t(n) * sizeof(float));
  return n;
}

// Encode mono float pcm to an Ogg-Opus file (fixture/transcode tooling).
int encode_opus_file(const char* path, const float* pcm, long n,
                     int sample_rate) {
  std::vector<uint8_t> bytes;
  if (!encode_opus(pcm, size_t(n), sample_rate, &bytes)) return -2;
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  size_t wrote = fwrite(bytes.data(), 1, bytes.size(), f);
  fclose(f);
  return wrote == bytes.size() ? 0 : -3;
}

int opus_available() { return opus_runtime_available() ? 1 : 0; }

int resample_f32(const float* in, int n_in, int rate_in, int rate_out,
                 float* out, int max_out) {
  std::vector<float> res;
  resample(in, size_t(n_in), rate_in, rate_out, &res);
  int n = int(std::min(size_t(max_out), res.size()));
  memcpy(out, res.data(), size_t(n) * sizeof(float));
  return n;
}

}  // extern "C"
