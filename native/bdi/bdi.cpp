#include "bdi.hpp"

#include <algorithm>
#include <atomic>
#include <chrono>
#include <limits>
#include <stdexcept>
#include <thread>

namespace bdi {

namespace {

inline uint64_t now_ns() {
  return std::chrono::duration_cast<std::chrono::nanoseconds>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

// Max representable value for an unsigned field of `size` bits (min is 0).
inline Integer size_limit(std::size_t size) {
  if (size >= kIntBits) return std::numeric_limits<Integer>::max();
  if (size == 0) return 0;
  return std::numeric_limits<Integer>::max() >> (kIntBits - size);
}

}  // namespace

std::vector<Config> default_configs() {
  // num_bases x delta_size sweep over full-width bases — the classic BDI
  // grid the reference CLI exercises.
  std::vector<Config> out;
  for (std::size_t nb : {1, 2, 4}) {
    for (std::size_t ds : {4, 8, 16}) {
      out.push_back(Config{nb, 32, ds,
                           "b" + std::to_string(nb) + "x32d" +
                               std::to_string(ds)});
    }
  }
  return out;
}

std::size_t Compressor::run_base_delta(std::vector<Element>& elements,
                                       Integer base, std::size_t delta_size,
                                       std::mt19937& rng) const {
  const Integer max = size_limit(delta_size);
  const std::size_t sf = opt_.scale_factor_delta;
  const Integer base_value = static_cast<Integer>(base)
                             << opt_.scale_factor_base;
  std::size_t covered = 0;
  for (auto& e : elements) {
    if (e.kind != Kind::Uncompressed) {
      ++covered;
      continue;
    }
    const Integer v = e.value;
    if (base_value > v) continue;  // unsigned deltas only
    const Integer delta = v - base_value;
    Integer d = delta >> sf;
    if (opt_.use_stochastic_rounding && sf > 0 && d < max) {
      // stochastically round the dropped low bits: P(up) = remainder / 2^sf.
      // (The reference's guard is inverted, lib.rs:100-103, which disables
      // rounding in practice; we implement the intended behavior.)
      const Integer remainder = delta - (d << sf);
      const double p = static_cast<double>(remainder) /
                       static_cast<double>(Integer{1} << sf);
      std::uniform_real_distribution<double> u(0.0, 1.0);
      if (u(rng) <= p && remainder != 0) ++d;
    }
    if (d <= max) {
      e.kind = Kind::Compressed;
      e.base = base;
      e.delta = d;
      ++covered;
    }
  }
  return covered;
}

std::optional<Integer> Compressor::pick_base(
    const std::vector<Element>& elements, std::size_t base_size,
    std::size_t num_left, std::mt19937& rng) const {
  const Integer max = size_limit(base_size);
  std::size_t i = 0;
  for (const auto& e : elements) {
    if (e.kind != Kind::Uncompressed) continue;
    const Integer candidate = e.value >> opt_.scale_factor_base;
    if (candidate > max) continue;
    if (!opt_.use_randomized_base_selection) return candidate;
    // reservoir-style acceptance with growing probability (lib.rs:157-164)
    std::uniform_int_distribution<std::size_t> u(0, num_left ? num_left - 1 : 0);
    if (u(rng) <= i) return candidate;
    ++i;
  }
  return std::nullopt;
}

uint64_t Compressor::zero_mask(std::vector<Element>& elements) const {
  uint64_t mask = 0;
  for (std::size_t i = 0; i < elements.size(); ++i) {
    auto& e = elements[i];
    if (e.kind == Kind::Uncompressed &&
        (e.value == 0 || (e.value >> opt_.scale_factor_delta) == 0)) {
      e.kind = Kind::Zero;
    } else {
      mask |= (uint64_t{1} << (i % 64));
    }
  }
  return mask;
}

std::optional<LineResult> Compressor::compress_line(
    const std::vector<Integer>& line, const Config& cfg,
    std::mt19937& rng) const {
  const uint64_t t0 = now_ns();
  const std::size_t n = line.size();

  std::vector<Element> elements(n);
  for (std::size_t i = 0; i < n; ++i) elements[i].value = line[i];

  std::size_t size = cfg.num_bases * cfg.base_size;
  LineResult result;
  if (opt_.use_zero_compression) {
    size += n;  // one mask bit per element (lib.rs:197-204)
    result.zero_mask = zero_mask(elements);
    result.has_zero_mask = true;
  }

  auto covered = [&elements] {
    std::size_t c = 0;
    for (const auto& e : elements)
      if (e.kind != Kind::Uncompressed) ++c;
    return c;
  };

  // immediate bases (not stored, not counted; lib.rs:214-221)
  std::size_t num_left = n;
  for (const Integer imm : opt_.immediates) {
    run_base_delta(elements, imm, cfg.delta_size, rng);
    num_left = n - covered();
    if (num_left == 0) break;
  }

  if (num_left != 0) {
    for (std::size_t b = 0; b < cfg.num_bases; ++b) {
      auto base = pick_base(elements, cfg.base_size, num_left, rng);
      if (!base) break;
      result.bases.push_back(*base);
      run_base_delta(elements, *base, cfg.delta_size, rng);
      num_left = n - covered();
      if (num_left == 0) break;
    }
  }

  if (num_left != 0) return std::nullopt;  // config can't cover the line

  for (const auto& e : elements)
    if (e.kind == Kind::Compressed) size += cfg.delta_size;

  result.elements = std::move(elements);
  result.name = cfg.name;
  result.size_bits = size;
  result.compression_ns = now_ns() - t0;
  return result;
}

LineResult Compressor::compress_best(const std::vector<Integer>& line,
                                     std::mt19937& rng) const {
  std::optional<LineResult> best;
  for (const auto& cfg : configs_) {
    auto r = compress_line(line, cfg, rng);
    if (r && (!best || r->size_bits < best->size_bits)) best = std::move(r);
  }
  if (!best) throw std::runtime_error("could not compress cache line");
  return std::move(*best);
}

std::vector<LineResult> Compressor::compress_block(const Integer* data,
                                                   std::size_t n,
                                                   int num_threads,
                                                   uint64_t seed) const {
  const std::size_t bs = opt_.batch_size;
  const std::size_t num_lines = (n + bs - 1) / bs;
  std::vector<LineResult> results(num_lines);

  if (num_threads <= 0)
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
  num_threads =
      std::max(1, std::min<int>(num_threads, static_cast<int>(num_lines)));

  std::atomic<std::size_t> next{0};
  std::atomic<bool> failed{false};
  auto worker = [&](int tid) {
    std::mt19937 rng(seed + 0x9E3779B9u * (tid + 1));
    std::size_t li;
    while ((li = next.fetch_add(1)) < num_lines) {
      const std::size_t start = li * bs;
      const std::size_t len = std::min(bs, n - start);
      std::vector<Integer> line(len);
      for (std::size_t i = 0; i < len; ++i)
        line[i] = data[start + i] >> opt_.scale_factor_init;
      try {
        results[li] = compress_best(line, rng);
      } catch (...) {
        failed.store(true);  // exceptions must not escape worker threads
        return;
      }
    }
  };

  if (num_threads == 1) {
    worker(0);
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker, t);
    for (auto& th : threads) th.join();
  }
  if (failed.load())
    throw std::runtime_error("could not compress cache line");
  return results;
}

float Compressor::decompress_value(const Element& e, float scale,
                                   std::size_t zero_point) const {
  if (e.kind == Kind::Zero)
    return static_cast<float>(zero_point) * scale;
  // lib.rs:340-349: ((base << sf_base) + (delta << sf_delta)) << sf_init,
  // reinterpreted signed, affine dequant.
  const Integer v = (((e.base << opt_.scale_factor_base) +
                      (e.delta << opt_.scale_factor_delta))
                     << opt_.scale_factor_init);
  const int64_t with_zp =
      static_cast<int64_t>(static_cast<int32_t>(v)) +
      static_cast<int64_t>(zero_point);
  return static_cast<float>(with_zp) * scale;
}

std::size_t Compressor::stats(const Integer* data, std::size_t n, float scale,
                              std::size_t zero_point, float* out,
                              std::vector<LineResult>* results,
                              uint64_t* comp_ns, uint64_t* decomp_ns,
                              int num_threads, uint64_t seed) const {
  const uint64_t t0 = now_ns();
  auto lines = compress_block(data, n, num_threads, seed);
  const uint64_t t1 = now_ns();

  std::size_t total_bits = 0;
  std::size_t idx = 0;
  for (auto& line : lines) {
    total_bits += line.size_bits;
    const uint64_t d0 = now_ns();
    for (const auto& e : line.elements) out[idx++] = decompress_value(e, scale, zero_point);
    line.decompression_ns = now_ns() - d0;
  }
  const uint64_t t2 = now_ns();
  if (comp_ns) *comp_ns = t1 - t0;
  if (decomp_ns) *decomp_ns = t2 - t1;
  if (results) *results = std::move(lines);
  return total_bits;
}

}  // namespace bdi
