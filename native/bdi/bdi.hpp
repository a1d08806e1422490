// NNW-BDI (base-delta-immediate) compression for neural-network weights.
//
// C++17 re-design of the reference's Rust core
// (/root/reference/libbdi/src/lib.rs, 459 LoC, rayon-parallel).  Same
// algorithmic contract, own implementation:
//  - the input buffer is partitioned into cache lines of `batch_size` words;
//  - every compression config (num_bases / base_size / delta_size) is tried
//    per line and the smallest encoding wins (lib.rs:266-292);
//  - per-config pipeline: optional zero-mask compression (lib.rs:170-184),
//    immediate bases (default {0}, lib.rs:214-221), randomized-reservoir or
//    first-fit base selection (lib.rs:138-168), base+delta encoding with
//    scale-factor right shifts and stochastic rounding of the dropped bits
//    (lib.rs:80-136);
//  - size accounting: zero-mask bits + bases*base_size + per-element
//    delta_size/word-size (lib.rs:197-250);
//  - decompression: value = ((base << sf_base) + (delta << sf_delta))
//    << sf_init, then affine dequant with (scale, zero_point)
//    (lib.rs:340-349).
// Parallelism: std::thread pool over cache lines (the Rust uses rayon).

#pragma once

#include <cstdint>
#include <optional>
#include <random>
#include <string>
#include <vector>

namespace bdi {

using Integer = uint32_t;
constexpr std::size_t kIntBits = 32;

struct Config {
  std::size_t num_bases = 1;
  std::size_t base_size = 32;
  std::size_t delta_size = 8;
  std::string name = "b32d8";
};

struct Options {
  std::size_t batch_size = 64;
  std::vector<Integer> immediates = {0};
  std::size_t scale_factor_init = 0;
  std::size_t scale_factor_base = 0;
  std::size_t scale_factor_delta = 0;
  bool use_stochastic_rounding = true;
  bool use_zero_compression = true;
  bool use_randomized_base_selection = true;
};

enum class Kind : uint8_t { Uncompressed = 0, Compressed = 1, Zero = 2 };

struct Element {
  Kind kind = Kind::Uncompressed;
  Integer value = 0;  // raw (shifted) word while uncompressed
  Integer base = 0;
  Integer delta = 0;
};

struct LineResult {
  std::vector<Integer> bases;
  std::vector<Element> elements;
  std::string name;
  std::size_t size_bits = 0;
  uint64_t zero_mask = 0;
  bool has_zero_mask = false;
  uint64_t compression_ns = 0;
  uint64_t decompression_ns = 0;
};

// Canonical config sweep (num_bases x base_size x delta_size grid).
std::vector<Config> default_configs();

class Compressor {
 public:
  Compressor(Options opt, std::vector<Config> configs)
      : opt_(std::move(opt)), configs_(std::move(configs)) {}

  // Compress one cache line with one config; nullopt when the config cannot
  // cover every element.
  std::optional<LineResult> compress_line(const std::vector<Integer>& line,
                                          const Config& cfg,
                                          std::mt19937& rng) const;

  // Try all configs, keep the smallest encoding.  Throws std::runtime_error
  // if no config covers the line (mirrors the Rust panic, lib.rs:288-290).
  LineResult compress_best(const std::vector<Integer>& line,
                           std::mt19937& rng) const;

  // Partition into cache lines and compress each in parallel.
  std::vector<LineResult> compress_block(const Integer* data, std::size_t n,
                                         int num_threads = 0,
                                         uint64_t seed = 0) const;

  // Reconstruct one element's float value (quantized-int workflow).
  float decompress_value(const Element& e, float scale,
                         std::size_t zero_point) const;

  // Full round trip: compress, then decompress every element into `out`
  // (must hold n floats).  Returns total compressed bits; fills per-line
  // results and timing in ns.
  std::size_t stats(const Integer* data, std::size_t n, float scale,
                    std::size_t zero_point, float* out,
                    std::vector<LineResult>* results, uint64_t* comp_ns,
                    uint64_t* decomp_ns, int num_threads = 0,
                    uint64_t seed = 0) const;

  const Options& options() const { return opt_; }

 private:
  std::size_t run_base_delta(std::vector<Element>& elements, Integer base,
                             std::size_t delta_size, std::mt19937& rng) const;
  std::optional<Integer> pick_base(const std::vector<Element>& elements,
                                   std::size_t base_size, std::size_t num_left,
                                   std::mt19937& rng) const;
  uint64_t zero_mask(std::vector<Element>& elements) const;

  Options opt_;
  std::vector<Config> configs_;
};

}  // namespace bdi
