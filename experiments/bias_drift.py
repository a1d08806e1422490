#!/usr/bin/env python
"""Repeated-application bias/drift experiment.

Re-creation of the reference's only Python "test"
(/root/reference/test.py:1-58): apply a compressor to the same tensor many
times in place and measure the accumulated per-element drift — the property
that matters because the framework re-quantizes the same weights every
optimizer step.  Prints a histogram of the final error and the mean drift.

Usage:
  python experiments/bias_drift.py --compress smart --repeats 1000 --trials 20
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--compress", default="smart")
    ap.add_argument("--repeats", type=int, default=1000)
    ap.add_argument("--trials", type=int, default=20)
    ap.add_argument("--size", type=int, default=1000)
    ap.add_argument("--use_sample_stats", action="store_true")
    ap.add_argument("--num_bits_main", type=int, default=6)
    ap.add_argument("--num_bits_outlier", type=int, default=8)
    args = ap.parse_args()

    from smart_quantization_tpu.compress import build_compressor

    opts = {}
    if args.compress == "smart":
        opts = dict(
            num_bits_main=args.num_bits_main,
            num_bits_outlier=args.num_bits_outlier,
            use_sample_stats=args.use_sample_stats,
            use_pallas=False,
        )
    comp = build_compressor(args.compress, **opts)

    @jax.jit
    def apply_n(x, key):
        def body(i, carry):
            x, k = carry
            k1, k2 = jax.random.split(k)
            y, _ = comp(x, k1)
            return (y, k2)

        y, _ = jax.lax.fori_loop(0, args.repeats, body, (x, key))
        return y

    diffs = []
    for trial in range(args.trials):
        key = jax.random.key(trial)
        k_data, k_apply = jax.random.split(key)
        x = jax.random.normal(k_data, (args.size,))
        y = apply_n(x, k_apply)
        d = np.asarray(y - x)
        diffs.append(d)
        print(f"trial {trial:3d}: mean drift {d.mean():+.6f}  "
              f"|drift| {np.abs(d).mean():.6f}  max {np.abs(d).max():.4f}")

    all_d = np.concatenate(diffs)
    hist, edges = np.histogram(all_d, bins=21)
    print("\nfinal-drift histogram:")
    for h, lo, hi in zip(hist, edges[:-1], edges[1:]):
        bar = "#" * int(60 * h / max(hist.max(), 1))
        print(f"  [{lo:+.3f},{hi:+.3f}) {h:7d} {bar}")
    print(f"\nOVERALL mean drift after {args.repeats} applications: "
          f"{all_d.mean():+.6f} (|.|={np.abs(all_d).mean():.6f})")


if __name__ == "__main__":
    main()
