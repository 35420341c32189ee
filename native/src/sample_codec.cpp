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

#include <cmath>
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

// ---------------------------------------------------------------------------
// Wire-format packers: float iq32 -> 1-4 bit host->device wire bytes
// (gnsstpu.ops.unpack formats). A live producer packs at the radio rate
// while the TPU tracks the previous superepoch, so this is on the
// real-time path; quantization must match the NumPy reference
// bit-for-bit (nearbyint = round-half-to-even, like np.round).
// ---------------------------------------------------------------------------

extern "C" {

// Interleaved int8 I,Q ('iq8'): clip(round(x*scale), -127, 127).
void pack_iq8(const float* iq, uint8_t* out, int64_t n, float scale,
              int threads) {
  parallel_for(n, threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      for (int k = 0; k < 2; ++k) {
        float v = std::nearbyint(iq[2 * i + k] * scale);
        v = v < -127.0f ? -127.0f : (v > 127.0f ? 127.0f : v);
        out[2 * i + k] = static_cast<uint8_t>(static_cast<int8_t>(v));
      }
    }
  });
}

// Two's-complement nibbles ('iq4'): I low nibble, Q high; 1 byte/pair.
void pack_iq4(const float* iq, uint8_t* out, int64_t n, float scale,
              int threads) {
  parallel_for(n, threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int qi[2];
      for (int k = 0; k < 2; ++k) {
        float v = std::nearbyint(iq[2 * i + k] * scale);
        v = v < -8.0f ? -8.0f : (v > 7.0f ? 7.0f : v);
        qi[k] = static_cast<int>(v);
      }
      out[i] = static_cast<uint8_t>((qi[0] & 0xF) | ((qi[1] & 0xF) << 4));
    }
  });
}

// GN3S-compatible sign/mag 2-bit ('sm2'): 2 sample pairs per byte;
// per component: sign bit, mag bit (|x*scale| >= 2 -> +-3 else +-1).
void pack_sm2(const float* iq, uint8_t* out, int64_t n_pairs, float scale,
              int threads) {
  int64_t n_bytes = n_pairs / 2;
  parallel_for(n_bytes, threads, [&](int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      uint8_t byte = 0;
      for (int half = 0; half < 2; ++half) {
        int64_t s = 2 * b + half;
        uint8_t nib = 0;
        for (int k = 0; k < 2; ++k) {
          float v = iq[2 * s + k] * scale;
          uint8_t sign = v < 0.0f ? 1u : 0u;
          uint8_t mag = (v < 0.0f ? -v : v) >= 1.0f ? 1u : 0u;
          nib |= static_cast<uint8_t>((sign | (mag << 1)) << (2 * k));
        }
        byte |= static_cast<uint8_t>(nib << (4 * half));
      }
      out[b] = byte;
    }
  });
}

// Sign-only 1-bit I/Q ('iq1'): 4 sample pairs per byte.
void pack_iq1(const float* iq, uint8_t* out, int64_t n_pairs, float scale,
              int threads) {
  int64_t n_bytes = n_pairs / 4;
  parallel_for(n_bytes, threads, [&](int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      uint8_t byte = 0;
      for (int q = 0; q < 4; ++q) {
        int64_t s = 4 * b + q;
        uint8_t two = 0;
        for (int k = 0; k < 2; ++k) {
          if (iq[2 * s + k] * scale < 0.0f) two |= 1u << k;
        }
        byte |= static_cast<uint8_t>(two << (2 * q));
      }
      out[b] = byte;
    }
  });
}

}  // extern "C"
