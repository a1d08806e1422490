#!/usr/bin/env python
"""Headline benchmark: fused SmaQ quantize->dequantize HBM bandwidth vs the
chip's roofline.

The reference's hot loop is the z-score quantizer applied to every layer
output (SURVEY.md 3.2); its speed-of-light on TPU is one HBM read + one HBM
write per element.  This measures the fused Pallas kernel (sampled stats, so
the stats pass is O(1)) on a 256 MB tensor and reports achieved GB/s;
``vs_baseline`` is achieved_fraction_of_roofline / 0.80 (BASELINE.json
targets >=80% of roofline, so vs_baseline >= 1.0 beats the target).

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

# HBM bandwidth per chip, GB/s (TPU v5e: 819 GB/s; v4: 1228; v5p: 2765)
ROOFLINE_GBS = {
    "v5e": 819.0,
    "v5litepod": 819.0,
    "v4": 1228.0,
    "v5p": 2765.0,
    "v6e": 1640.0,
}


def detect_roofline() -> float:
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower().replace(" ", "")
    for k, v in ROOFLINE_GBS.items():
        if k in kind:
            return v
    if "v5" in kind and "lite" in kind:
        return 819.0
    return 819.0  # conservative default


def main():
    from smart_quantization_tpu.ops.pallas.smaq_kernel import smaq_fused
    from smart_quantization_tpu.ops.smaq import SmaQParams

    on_tpu = jax.default_backend() == "tpu"
    n = 1 << 26 if on_tpu else 1 << 20  # 64M floats on TPU (256 MB)
    params = SmaQParams(
        num_bits_main=6, num_bits_outlier=8,
        stochastic_rounding=True, use_sample_stats=True,
    )
    x = jax.random.normal(jax.random.key(0), (n,), jnp.float32)

    # Slope timing: K chained kernel applications inside one jit, synced by a
    # tiny device->host read.  Immune to dispatch/RPC latency (which
    # dominates single-call timing through the TPU relay).
    def make_chain(k_iters):
        @jax.jit
        def g(x, key):
            def body(i, carry):
                y, kk = carry
                k1, k2 = jax.random.split(kk)
                y2, _ = smaq_fused(y, k1, params)
                return (y2, k2)

            y, _ = jax.lax.fori_loop(0, k_iters, body, (x, key))
            return jnp.sum(y[:8])

        return g

    lo_iters, hi_iters = 1, (17 if on_tpu else 3)
    g_lo, g_hi = make_chain(lo_iters), make_chain(hi_iters)
    float(g_lo(x, jax.random.key(1)))
    float(g_hi(x, jax.random.key(1)))

    def median_time(g, reps=5):
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            float(g(x, jax.random.key(i + 2)))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    dt = (median_time(g_hi) - median_time(g_lo)) / (hi_iters - lo_iters)

    bytes_moved = n * 4 * 2  # fp32 read + fp32 write
    gbs = bytes_moved / dt / 1e9
    roofline = detect_roofline() if on_tpu else float("nan")
    frac = gbs / roofline if on_tpu else 0.0
    vs_baseline = frac / 0.80 if on_tpu else 0.0

    print(
        json.dumps(
            {
                "metric": "smaq_fused_quant_dequant_bandwidth",
                "value": round(gbs, 2),
                "unit": "GB/s",
                "vs_baseline": round(vs_baseline, 4),
                "detail": {
                    "elements": n,
                    "median_ms": round(dt * 1e3, 3),
                    "roofline_gbs": roofline,
                    "fraction_of_roofline": round(frac, 4),
                    "backend": jax.default_backend(),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
