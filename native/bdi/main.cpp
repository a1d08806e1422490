// bdi CLI: read unsigned integers (one per line) from a text file, compress,
// print the winning scheme per cache line — the reference CLI's contract
// (/root/reference/libbdi/src/main.rs:28-48, default scale factors 24).

#include <fstream>
#include <iostream>
#include <string>

#include "bdi.hpp"

int main(int argc, char** argv) {
  if (argc < 2) {
    std::cerr << "usage: bdi <file-with-integers> [scale_factor=24]\n";
    return 2;
  }
  const std::size_t sf = argc > 2 ? std::stoul(argv[2]) : 24;

  std::ifstream in(argv[1]);
  if (!in) {
    std::cerr << "cannot open " << argv[1] << "\n";
    return 1;
  }
  std::vector<bdi::Integer> values;
  std::string line;
  while (std::getline(in, line)) {
    try {
      values.push_back(static_cast<bdi::Integer>(std::stoul(line)));
    } catch (...) {
    }
  }

  bdi::Options opt;
  opt.scale_factor_base = sf;
  opt.scale_factor_delta = sf;
  bdi::Compressor comp(opt, bdi::default_configs());
  auto results = comp.compress_block(values.data(), values.size());

  std::size_t total_bits = 0;
  for (const auto& r : results) {
    std::cout << r.name << "\n";
    total_bits += r.size_bits;
  }
  std::cout << "total: " << values.size() * 32 << " -> " << total_bits
            << " bits (ratio "
            << (total_bits ? double(values.size() * 32) / total_bits : 0)
            << ")\n";
  return 0;
}
