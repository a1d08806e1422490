// Host golden model of the SmaQ FPGA accelerator semantics.
//
// The reference ships two Vitis-HLS kernels (/root/reference/hw/smaq.cpp,
// hw/smaq-with-bn.cpp) whose math differs from the Python quantizer: scale is
// 2^(bits-1)/3 with no outlier shift, and the quantized word carries an
// is-within-1-sigma flag in its LSB (smaq.cpp:38-61).  On TPU the accelerator
// role is played by the Pallas kernels; this C++ model preserves the HLS
// semantics for conformance tests, including the stats variants of the BN
// kernel: one-pass sum/sum-of-squares (smaq.cpp:21-36), range std
// ((max-min)/sqrt(2 ln N), smaq-with-bn.cpp:64-85), 16-sample stats
// (smaq-with-bn.cpp:21-28), and the BN shift/scale fold
// (smaq-with-bn.cpp:112-134).

#include <cmath>
#include <cstddef>
#include <cstdint>

namespace {

constexpr int kMainBits = 6;
constexpr int kElseBits = 8;

inline float scale_of(int bits) { return float(1 << (bits - 1)) / 3.0f; }

inline int quantize_one(float z) {
  const bool is_1std = z <= 1.0f && z >= -1.0f;
  const float scale = is_1std ? scale_of(kMainBits) : scale_of(kElseBits);
  return (int(z * scale) << 1) | (is_1std ? 0b1 : 0b0);
}

inline float dequantize_one(int q) {
  const bool is_1std = q & 0b1;
  const float inv = 1.0f / (is_1std ? scale_of(kMainBits) : scale_of(kElseBits));
  return float(q >> 1) * inv;
}

}  // namespace

extern "C" {

// stats_mode: 0 = full one-pass sum/sumsq, 1 = range std, 2 = 16-sample.
void smaq_golden_stats(const float* data, size_t n, int stats_mode,
                       float* mean_out, float* std_out) {
  if (stats_mode == 1) {
    float mn = data[0], mx = data[0];
    float sum = 0.f;
    for (size_t i = 0; i < n; ++i) {
      mn = data[i] < mn ? data[i] : mn;
      mx = data[i] > mx ? data[i] : mx;
      sum += data[i];
    }
    *mean_out = sum / float(n);
    *std_out = (mx - mn) / std::sqrt(2.0f * std::log(float(n)));
    return;
  }
  if (stats_mode == 2) {
    // the HLS kernel samples a fixed stride-spread subset of 16
    const size_t k = n < 16 ? n : 16;
    const size_t stride = n / k;
    float sum = 0.f, sumsq = 0.f;
    for (size_t i = 0; i < k; ++i) {
      const float v = data[i * stride];
      sum += v;
      sumsq += v * v;
    }
    const float m1 = sum / float(k);
    const float m2 = sumsq / float(k);
    *mean_out = m1;
    *std_out = std::sqrt(m2 - m1 * m1);
    return;
  }
  float sum = 0.f, sumsq = 0.f;
  for (size_t i = 0; i < n; ++i) {
    sum += data[i];
    sumsq += data[i] * data[i];
  }
  const float m1 = sum / float(n);
  const float m2 = sumsq / float(n);
  *mean_out = m1;
  *std_out = std::sqrt(m2 - m1 * m1);
}

// compress_accel: z-score against (mean, std), quantize with flag-bit LSB
// packing (hw/smaq.cpp:91-118).
void smaq_golden_compress(const float* data, size_t n, float mean,
                          float std_dev, int32_t* out) {
  for (size_t i = 0; i < n; ++i) {
    out[i] = quantize_one((data[i] - mean) / std_dev);
  }
}

// decompress_accel (hw/smaq.cpp:120-147).
void smaq_golden_decompress(const int32_t* data, size_t n, float mean,
                            float std_dev, float* out) {
  for (size_t i = 0; i < n; ++i) {
    out[i] = dequantize_one(data[i]) * std_dev + mean;
  }
}

// BN-folded variant (hw/smaq-with-bn.cpp:112-134): quantize
// (z * scalar) + shift, invert on decompress.
void smaq_golden_compress_bn(const float* data, size_t n, float mean,
                             float std_dev, float bn_scalar, float bn_shift,
                             int32_t* out) {
  const float rstd = 1.0f / std_dev;
  for (size_t i = 0; i < n; ++i) {
    const float z = (data[i] - mean) * rstd;
    out[i] = quantize_one(z * bn_scalar + bn_shift);
  }
}

void smaq_golden_decompress_bn(const int32_t* data, size_t n, float mean,
                               float std_dev, float bn_scalar, float bn_shift,
                               float* out) {
  const float inv_scalar = 1.0f / bn_scalar;
  for (size_t i = 0; i < n; ++i) {
    const float z = (dequantize_one(data[i]) - bn_shift) * inv_scalar;
    out[i] = z * std_dev + mean;
  }
}

}  // extern "C"
