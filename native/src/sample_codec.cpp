// Sample-format decoders: packed front-end formats -> f32 iq planes.
//
// Native (C++) equivalent of the reference's front-end decode paths:
//   * GN3S 2-bit sign/mag with LUT {-3,-1,+1,+3}
//     (REALTIME .../objects/gps_source.cpp:692 Read_GN3S LUT),
//   * MAX2769 4-bit samples packed 4-per-16-bit word by the CPLD
//     (FRONT_END_PROJECT/FRONT_END_SOURCE/CPLD/data_packer.vhd:25-57),
//   * plain interleaved int8/int16 I/Q.
// Output layout is the framework's iq32 convention: float32 [n][2].
//
// Multithreaded over sample ranges for multi-MB buffers (the decode is
// memory-bound; threads saturate host memory bandwidth while the TPU
// computes the previous chunk).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr float kLut2Bit[4] = {-3.0f, -1.0f, 1.0f, 3.0f};

// 4-bit sign/magnitude: bit3 = sign, bits2..0 = magnitude -> +-(2m+1).
inline float sign_mag4(uint32_t nib) {
  float m = 2.0f * static_cast<float>(nib & 7u) + 1.0f;
  return (nib & 8u) ? -m : m;
}

template <typename Fn>
void parallel_for(int64_t n, int threads, Fn fn) {
  if (threads <= 1 || n < (1 << 16)) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> pool;
  int64_t step = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t lo = t * step;
    int64_t hi = lo + step < n ? lo + step : n;
    if (lo >= hi) break;
    pool.emplace_back([=] { fn(lo, hi); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Interleaved signed 8-bit I,Q pairs -> [n][2] f32.
void decode_i8_iq(const int8_t* in, float* out, int64_t n, int threads) {
  parallel_for(n, threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      out[2 * i] = static_cast<float>(in[2 * i]);
      out[2 * i + 1] = static_cast<float>(in[2 * i + 1]);
    }
  });
}

// Interleaved signed 16-bit I,Q pairs -> [n][2] f32.
void decode_i16_iq(const int16_t* in, float* out, int64_t n, int threads) {
  parallel_for(n, threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      out[2 * i] = static_cast<float>(in[2 * i]);
      out[2 * i + 1] = static_cast<float>(in[2 * i + 1]);
    }
  });
}

// GN3S-style 2-bit sign/mag: byte b holds I in bits 1:0, Q in bits 3:2,
// LUT {-3,-1,+1,+3} (gps_source.cpp:692). One complex sample per byte.
void decode_gn3s_2bit(const uint8_t* in, float* out, int64_t n,
                      int threads) {
  parallel_for(n, threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      uint8_t b = in[i];
      out[2 * i] = kLut2Bit[b & 3u];
      out[2 * i + 1] = kLut2Bit[(b >> 2) & 3u];
    }
  });
}

// CPLD-packed real samples: little-endian 16-bit words, 4 consecutive
// 4-bit sign/mag samples per word, sample k of a word in bits
// [4k+3 : 4k] (data_packer.vhd 8-state FSM packs 4-bit MAX2769 samples
// into 16-bit FX2 FIFO words). Real samples -> I plane, Q = 0.
void decode_packed_4bit(const uint16_t* in, float* out, int64_t n_words,
                        int threads) {
  parallel_for(n_words, threads, [&](int64_t lo, int64_t hi) {
    for (int64_t w = lo; w < hi; ++w) {
      uint32_t v = in[w];
      for (int k = 0; k < 4; ++k) {
        int64_t i = 4 * w + k;
        out[2 * i] = sign_mag4((v >> (4 * k)) & 0xFu);
        out[2 * i + 1] = 0.0f;
      }
    }
  });
}

}  // extern "C"
