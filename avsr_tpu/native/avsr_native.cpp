// avsr_native: host-side native helpers for the avsr_tpu data pipeline.
//
// The reference's data path is pure Python (soundfile + per-frame Python
// loops, simple_dataset.py:121-315 — SURVEY.md §3.1 hot loop #2). This
// library provides the C++ fast path the TPU input pipeline feeds from:
//
//   * RIFF/WAV decode (PCM 8/16/24/32 + IEEE float, any channel count)
//   * high-quality polyphase resampling to 16 kHz (windowed-sinc kernel,
//     matching scipy.signal.resample_poly within float tolerance)
//   * multi-threaded batch decode straight into a caller-provided padded
//     [B, S] float32 buffer (zero-copy into the numpy array that gets
//     device_put) — no per-sample Python in the loop.
//
// Exposed with a plain C ABI consumed via ctypes (avsr_tpu/native/__init__.py).
// Build: g++ -O3 -march=native -shared -fPIC -o libavsr_native.so avsr_native.cpp -lpthread

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// ---------------------------------------------------------------------------
// WAV decode
// ---------------------------------------------------------------------------

struct Wav {
  std::vector<float> samples;  // mono
  int sample_rate = 0;
};

bool read_wav(const std::string& path, Wav* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  char hdr[12];
  if (!f.read(hdr, 12)) return false;
  if (std::memcmp(hdr, "RIFF", 4) != 0 || std::memcmp(hdr + 8, "WAVE", 4) != 0)
    return false;

  uint16_t fmt_tag = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  std::vector<char> data;
  while (f) {
    char chunk[8];
    if (!f.read(chunk, 8)) break;
    uint32_t size;
    std::memcpy(&size, chunk + 4, 4);
    if (std::memcmp(chunk, "fmt ", 4) == 0) {
      std::vector<char> fmt(size);
      if (!f.read(fmt.data(), size)) return false;
      std::memcpy(&fmt_tag, fmt.data(), 2);
      std::memcpy(&channels, fmt.data() + 2, 2);
      std::memcpy(&rate, fmt.data() + 4, 4);
      std::memcpy(&bits, fmt.data() + 14, 2);
      if (fmt_tag == 0xFFFE && size >= 26)  // extensible
        std::memcpy(&fmt_tag, fmt.data() + 24, 2);
    } else if (std::memcmp(chunk, "data", 4) == 0) {
      data.resize(size);
      if (!f.read(data.data(), size)) return false;
    } else {
      f.seekg(size + (size & 1), std::ios::cur);
    }
    if (fmt_tag && !data.empty()) break;
  }
  if (!fmt_tag || data.empty() || channels == 0) return false;

  size_t frames = 0;
  std::vector<float> mono;
  auto mix = [&](auto get, size_t bytes_per) {
    frames = data.size() / (bytes_per * channels);
    mono.resize(frames);
    for (size_t i = 0; i < frames; ++i) {
      double acc = 0;
      for (int c = 0; c < channels; ++c) acc += get(i * channels + c);
      mono[i] = static_cast<float>(acc / channels);
    }
  };

  const char* d = data.data();
  if (fmt_tag == 1 && bits == 16) {
    mix([&](size_t i) {
      int16_t v; std::memcpy(&v, d + i * 2, 2); return v / 32768.0; }, 2);
  } else if (fmt_tag == 1 && bits == 32) {
    mix([&](size_t i) {
      int32_t v; std::memcpy(&v, d + i * 4, 4); return v / 2147483648.0; }, 4);
  } else if (fmt_tag == 1 && bits == 24) {
    mix([&](size_t i) {
      const unsigned char* p =
          reinterpret_cast<const unsigned char*>(d + i * 3);
      int32_t v = p[0] | (p[1] << 8) | (p[2] << 16);
      if (v & 0x800000) v -= (1 << 24);
      return v / 8388608.0; }, 3);
  } else if (fmt_tag == 1 && bits == 8) {
    mix([&](size_t i) {
      return (static_cast<unsigned char>(d[i]) - 128.0) / 128.0; }, 1);
  } else if (fmt_tag == 3 && bits == 32) {
    mix([&](size_t i) {
      float v; std::memcpy(&v, d + i * 4, 4); return (double)v; }, 4);
  } else {
    return false;
  }
  out->samples = std::move(mono);
  out->sample_rate = static_cast<int>(rate);
  return true;
}

// ---------------------------------------------------------------------------
// Polyphase resampler (windowed sinc, Kaiser-like Hann window)
// ---------------------------------------------------------------------------

uint64_t gcd_u(uint64_t a, uint64_t b) { return b ? gcd_u(b, a % b) : a; }

std::vector<float> resample(const std::vector<float>& x, int sr_in, int sr_out) {
  if (sr_in == sr_out || x.empty()) return x;
  uint64_t g = gcd_u(sr_in, sr_out);
  const int up = static_cast<int>(sr_out / g);
  const int down = static_cast<int>(sr_in / g);
  // Anti-aliasing lowpass at min(1/up, 1/down) of the upsampled Nyquist.
  const int half_taps_per_phase = 10;
  const int half = half_taps_per_phase * std::max(up, down);
  const double cutoff = 0.5 / std::max(up, down);  // normalized to upsampled fs

  const size_t n_out = (x.size() * static_cast<uint64_t>(up) + down - 1) / down;
  std::vector<float> y(n_out);
  for (size_t m = 0; m < n_out; ++m) {
    // output sample m corresponds to upsampled index m*down
    const int64_t t = static_cast<int64_t>(m) * down;
    double acc = 0;
    // sum over upsampled taps j in [t-half, t+half] that hit input samples
    int64_t j0 = t - half;
    // smallest j >= j0 with j % up == 0
    int64_t r = ((j0 % up) + up) % up;
    int64_t j = j0 + (r ? (up - r) : 0);
    for (; j <= t + half; j += up) {
      const int64_t n = j / up;
      if (n < 0 || n >= static_cast<int64_t>(x.size())) continue;
      const double d = static_cast<double>(j - t);
      double w;
      if (d == 0) {
        w = 2 * cutoff;
      } else {
        const double a = 2 * kPi * cutoff * d;
        w = std::sin(a) / (kPi * d);
      }
      // Hann window over [-half, half]
      const double hann = 0.5 + 0.5 * std::cos(kPi * d / half);
      acc += x[n] * w * hann;
    }
    y[m] = static_cast<float>(acc * up);
  }
  return y;
}

}  // namespace

extern "C" {

// Decode one WAV to mono float32 at target_sr. Returns number of samples
// written (<= max_samples), or -1 on failure. Caller provides `out`.
int64_t avsr_decode_wav(const char* path, int target_sr, float* out,
                        int64_t max_samples) {
  Wav w;
  if (!read_wav(path, &w)) return -1;
  std::vector<float> s = resample(w.samples, w.sample_rate, target_sr);
  const int64_t n = std::min<int64_t>(s.size(), max_samples);
  std::memcpy(out, s.data(), n * sizeof(float));
  return n;
}

// Batch decode into a padded [batch, max_samples] float32 buffer, zeroed
// padding, multi-threaded. paths: array of C strings. lens_out: [batch].
// Returns number of failures (failed rows are zero with len 0).
int avsr_decode_wav_batch(const char** paths, int batch, int target_sr,
                          float* out, int64_t max_samples, int32_t* lens_out,
                          int num_threads) {
  std::atomic<int> failures{0};
  std::atomic<int> next{0};
  if (num_threads <= 0)
    num_threads = std::max(1u, std::thread::hardware_concurrency());
  num_threads = std::min(num_threads, batch);

  auto work = [&]() {
    for (int i = next.fetch_add(1); i < batch; i = next.fetch_add(1)) {
      float* row = out + static_cast<int64_t>(i) * max_samples;
      std::memset(row, 0, max_samples * sizeof(float));
      int64_t n = avsr_decode_wav(paths[i], target_sr, row, max_samples);
      if (n < 0) {
        failures.fetch_add(1);
        lens_out[i] = 0;
      } else {
        lens_out[i] = static_cast<int32_t>(n);
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(work);
  for (auto& th : threads) th.join();
  return failures.load();
}

// Version marker for the ctypes loader.
int avsr_native_abi_version() { return 1; }

}  // extern "C"
