#!/usr/bin/env python
"""NNW-BDI C++ port throughput (VERDICT r4 missing #4).

The reference carries a real ``#[bench] bench_compression``
(/root/reference/libbdi/src/lib.rs:377-404: a 256-integer sample at scale
factors 24, default configs, compress_block) but records no numbers in the
repo.  This experiment measures the C++17 std::thread port on the same
shapes so the "rayon -> std::thread with equal parallel behavior" claim has
a committed number behind it:

  * the reference bench shape — 256 uint32 values (4 cache lines at the
    default batch_size 64), single call latency;
  * a sustained few-MB buffer (1M values) — lines/s and MB/s, 1 thread vs
    hardware_concurrency, compression and decompression timed separately
    (the C API returns both).

  python experiments/bdi_throughput.py \
      --out experiments/results/bdi_throughput.json
"""

import argparse
import json
import os
import platform
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_quantization_tpu.bdi import (  # noqa: E402
    CompressionBaseConfig,
    CompressionConfig,
    replace_with_compressed_repr,
)


def default_base_configs():
    """The CLI's default config grid (native/bdi/bdi.cpp::default_configs —
    num_bases {1,2,4} x delta_size {4,8,16} over full-width bases)."""
    return [
        CompressionBaseConfig(nb, 32, ds, f"b{nb}x32d{ds}")
        for nb in (1, 2, 4)
        for ds in (4, 8, 16)
    ]


def make_config(num_threads: int, scale_factor: int = 24):
    return CompressionConfig(
        base_configs=default_base_configs(),
        batch_size=64,
        scale_factor_init=0,
        scale_factor_base=scale_factor,
        scale_factor_delta=scale_factor,
        use_randomized_base_selection=True,
        use_stochastic_rounding=True,
        use_zero_compression=True,
        seed=0,
        num_threads=num_threads,
    )


def sample_buffer(n: int, kind: str) -> np.ndarray:
    rng = np.random.RandomState(0)
    if kind == "quantized":
        # what the NNW-BDI use case feeds: affine-quantized weights —
        # values clustered around a zero point with small deltas
        base = np.uint32(1 << 27)
        return (base + rng.randint(-4096, 4096, n).astype(np.int64)).astype(
            np.uint32
        )
    # adversarial: uniform random 32-bit values
    return rng.randint(0, 2**31, n, dtype=np.int64).astype(np.uint32)


def time_call(config, buf, reps: int):
    dest = np.zeros(buf.size, np.float32)
    comp_ns, decomp_ns, wall_ns = [], [], []
    for _ in range(reps):
        t0 = time.perf_counter_ns()
        _, _, (c_ns, d_ns) = replace_with_compressed_repr(
            config, buf, dest, 1.0 / (1 << 27), 1 << 27
        )
        wall_ns.append(time.perf_counter_ns() - t0)
        comp_ns.append(c_ns)
        decomp_ns.append(d_ns)
    return (
        statistics.median(comp_ns),
        statistics.median(decomp_ns),
        statistics.median(wall_ns),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="experiments/results/bdi_throughput.json")
    ap.add_argument("--big_n", type=int, default=1 << 20)
    args = ap.parse_args()

    hw = os.cpu_count() or 1
    results = {
        "_meta": {
            "machine": platform.machine(),
            "hardware_concurrency": hw,
            "note": "median over reps; comp/decomp ns from the C API's own "
                    "timers, wall includes the ctypes round-trip",
        }
    }

    # reference bench shape: 256 values, one call (lib.rs:377-404)
    for kind in ("quantized", "uniform"):
        buf = sample_buffer(256, kind)
        c, d, w = time_call(make_config(1), buf, reps=200)
        results[f"ref_shape_256_{kind}"] = {
            "threads": 1,
            "compress_us": round(c / 1e3, 2),
            "decompress_us": round(d / 1e3, 2),
            "wall_us": round(w / 1e3, 2),
            "lines": 4,
            "lines_per_s": round(4 / (c / 1e9)),
        }

    # sustained throughput: 1M values (4 MiB), 1 vs N threads
    for kind in ("quantized", "uniform"):
        buf = sample_buffer(args.big_n, kind)
        n_lines = -(-buf.size // 64)
        for threads in sorted({1, hw}):
            c, d, w = time_call(make_config(threads), buf, reps=5)
            results[f"big_{kind}_t{threads}"] = {
                "threads": threads,
                "elements": buf.size,
                "mb": round(buf.size * 4 / 2**20, 1),
                "compress_ms": round(c / 1e6, 2),
                "decompress_ms": round(d / 1e6, 2),
                "lines_per_s": round(n_lines / (c / 1e9)),
                "compress_mb_per_s": round(
                    buf.size * 4 / 2**20 / (c / 1e9), 1
                ),
            }
    t1 = results.get("big_quantized_t1")
    tn = results.get(f"big_quantized_t{hw}")
    if t1 and tn and hw > 1:
        results["_meta"]["thread_scaling_quantized"] = round(
            t1["compress_ms"] / tn["compress_ms"], 2
        )

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
