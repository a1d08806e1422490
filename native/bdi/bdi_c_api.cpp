// C ABI for the Python ctypes binding (the pyo3 extension's role,
// /root/reference/libbdi/bdi-python/src/lib.rs:98-190).

#include <cstring>
#include <new>
#include <string>
#include <vector>

#include "bdi.hpp"

extern "C" {

struct BdiConfigC {
  size_t num_bases;
  size_t base_size;
  size_t delta_size;
};

struct BdiOptionsC {
  size_t batch_size;
  size_t scale_factor_init;
  size_t scale_factor_base;
  size_t scale_factor_delta;
  int use_stochastic_rounding;
  int use_zero_compression;
  int use_randomized_base_selection;
  uint64_t seed;
  int num_threads;
};

// Runs compress + decompress ("replace with compressed representation"):
// writes n dequantized floats into out_floats, returns total compressed bits
// (or 0 on failure).  scheme_ids_out (optional, len = ceil(n / batch_size))
// receives the index of the winning config per cache line.
size_t bdi_replace_with_compressed_repr(
    const BdiOptionsC* opt_c, const BdiConfigC* configs, size_t num_configs,
    const uint32_t* buffer, size_t n, float* out_floats, float scale,
    size_t zero_point, int32_t* scheme_ids_out, uint64_t* comp_ns,
    uint64_t* decomp_ns) {
  try {
    bdi::Options opt;
    opt.batch_size = opt_c->batch_size ? opt_c->batch_size : 64;
    opt.scale_factor_init = opt_c->scale_factor_init;
    opt.scale_factor_base = opt_c->scale_factor_base;
    opt.scale_factor_delta = opt_c->scale_factor_delta;
    opt.use_stochastic_rounding = opt_c->use_stochastic_rounding != 0;
    opt.use_zero_compression = opt_c->use_zero_compression != 0;
    opt.use_randomized_base_selection =
        opt_c->use_randomized_base_selection != 0;

    std::vector<bdi::Config> cfgs;
    for (size_t i = 0; i < num_configs; ++i) {
      cfgs.push_back(bdi::Config{configs[i].num_bases, configs[i].base_size,
                                 configs[i].delta_size,
                                 "cfg" + std::to_string(i)});
    }
    if (cfgs.empty()) cfgs = bdi::default_configs();

    bdi::Compressor comp(opt, cfgs);
    std::vector<bdi::LineResult> results;
    const size_t bits =
        comp.stats(buffer, n, scale, zero_point, out_floats, &results, comp_ns,
                   decomp_ns, opt_c->num_threads, opt_c->seed);
    if (scheme_ids_out) {
      for (size_t li = 0; li < results.size(); ++li) {
        int32_t id = -1;
        for (size_t ci = 0; ci < cfgs.size(); ++ci)
          if (cfgs[ci].name == results[li].name) id = static_cast<int32_t>(ci);
        scheme_ids_out[li] = id;
      }
    }
    return bits;
  } catch (...) {
    return 0;
  }
}

// Deterministic single-line compression exposing the exact encoding
// (bases then per-element deltas) — mirrors the Rust unit-test helper
// (lib.rs:406-427) so conformance tests can assert exact values.
// Returns number of values written to out (bases + deltas), 0 on failure.
size_t bdi_compress_line_exact(const BdiOptionsC* opt_c,
                               const BdiConfigC* configs, size_t num_configs,
                               const uint32_t* line, size_t n,
                               uint32_t* out, size_t out_cap) {
  try {
    bdi::Options opt;
    opt.batch_size = n;
    opt.scale_factor_init = opt_c->scale_factor_init;
    opt.scale_factor_base = opt_c->scale_factor_base;
    opt.scale_factor_delta = opt_c->scale_factor_delta;
    opt.use_stochastic_rounding = false;
    opt.use_zero_compression = opt_c->use_zero_compression != 0;
    opt.use_randomized_base_selection = false;

    std::vector<bdi::Config> cfgs;
    for (size_t i = 0; i < num_configs; ++i)
      cfgs.push_back(bdi::Config{configs[i].num_bases, configs[i].base_size,
                                 configs[i].delta_size,
                                 "cfg" + std::to_string(i)});
    if (cfgs.empty()) cfgs = bdi::default_configs();

    bdi::Compressor comp(opt, cfgs);
    std::mt19937 rng(0);
    std::vector<uint32_t> vec(line, line + n);
    auto best = comp.compress_best(vec, rng);

    size_t written = 0;
    for (auto b : best.bases) {
      if (written >= out_cap) return 0;
      out[written++] = b;
    }
    for (const auto& e : best.elements) {
      if (written >= out_cap) return 0;
      out[written++] = (e.kind == bdi::Kind::Zero) ? 0 : e.delta;
    }
    return written;
  } catch (...) {
    return 0;
  }
}

}  // extern "C"
