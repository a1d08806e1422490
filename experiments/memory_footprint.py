#!/usr/bin/env python
"""Measure the REAL training-state memory reduction from packed storage.

The reference claims up to 6.7x training-memory reduction (README.md:25) but
only ever *simulates* compression (quantize->dequantize in fp32) — its
processes never allocate less memory.  This experiment builds the same
ResNet TrainState twice — fp32 vs --packed_weights --packed_momentum — and
reports the actually-allocated persistent bytes (params + optimizer state),
plus the on-disk orbax checkpoint sizes, which shrink by the same factor.

Run (CPU or TPU):
    python experiments/memory_footprint.py [--model resnet18] [--opt adam]

Persistent-state accounting: batch stats and step counter are tiny and
identical in both configurations; activations/grads are transient (freed
after each step) in both, exactly as in the reference's accounting.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from smart_quantization_tpu.compress import build_compressor
from smart_quantization_tpu.models import resnet18, resnet34
from smart_quantization_tpu.optim.compressed import (
    OptimizerCompression,
    build_optimizer,
    encode_params,
    init_opt_state,
)


def tree_bytes(tree) -> int:
    return sum(l.nbytes for l in jax.tree.leaves(tree))


def ckpt_dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet18", choices=["resnet18", "resnet34"])
    ap.add_argument("--opt", default="adam", choices=["sgd", "adam", "adamw"])
    ap.add_argument("--checkpoints", action="store_true",
                    help="also write orbax checkpoints and compare disk size")
    ap.add_argument("--fsdp", type=int, default=1,
                    help="also report PER-SHARD bytes under an N-way FSDP "
                         "layout: sharding divides state by ~N, packing by "
                         "another ~4x — the two compose")
    args = ap.parse_args()

    model = {"resnet18": resnet18, "resnet34": resnet34}[args.model](
        num_classes=10, tap=None
    )
    sample = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "compress": jax.random.key(1)},
        sample, train=True,
    )
    params = variables["params"]
    spec = build_optimizer(args.opt, 0.1)

    smaq = build_compressor("smart")
    fp32_comp = OptimizerCompression(compressor=smaq)
    packed_comp = OptimizerCompression(
        compressor=smaq, packed_momentum=True, packed_weights=True
    )

    # fp32 (fake-quant) persistent state — what the reference allocates
    opt_fp32 = spec.tx.init(params)
    bytes_fp32 = tree_bytes(params) + tree_bytes(opt_fp32)

    # packed persistent state
    opt_packed = init_opt_state(spec, params, packed_comp)
    params_packed = encode_params(params, packed_comp, jax.random.key(2))
    bytes_packed = tree_bytes(params_packed) + tree_bytes(opt_packed)

    out = {
        "experiment": "real_training_state_memory",
        "model": args.model,
        "optimizer": args.opt,
        "param_count": int(sum(l.size for l in jax.tree.leaves(params))),
        "fp32_state_bytes": int(bytes_fp32),
        "packed_state_bytes": int(bytes_packed),
        "reduction_x": round(bytes_fp32 / bytes_packed, 3),
        "backend": jax.default_backend(),
    }

    if args.fsdp > 1:
        from smart_quantization_tpu.parallel.mesh import fsdp_shard_axis

        def shard_bytes(tree, n):
            total = 0
            for l in jax.tree.leaves(tree):
                ax = fsdp_shard_axis(l.shape, n)
                total += l.nbytes // n if ax >= 0 else l.nbytes
            return total

        n = args.fsdp
        opt_packed_f = init_opt_state(spec, params, packed_comp, fsdp_size=n)
        params_packed_f = encode_params(
            params, packed_comp, jax.random.key(2), fsdp_size=n
        )
        fp32_shard = shard_bytes(params, n) + shard_bytes(opt_fp32, n)
        packed_shard = shard_bytes(params_packed_f, n) + shard_bytes(
            opt_packed_f, n
        )
        out["fsdp"] = n
        out["fsdp_fp32_state_bytes_per_shard"] = int(fp32_shard)
        out["fsdp_packed_state_bytes_per_shard"] = int(packed_shard)
        out["fsdp_packed_reduction_x"] = round(fp32_shard / packed_shard, 3)
        out["fsdp_total_reduction_vs_single_fp32_x"] = round(
            bytes_fp32 / packed_shard, 3
        )

    if args.checkpoints:
        import shutil
        import tempfile

        import orbax.checkpoint as ocp

        for name, tree in [
            ("fp32", {"params": params, "opt": opt_fp32}),
            ("packed", {"params": params_packed, "opt": opt_packed}),
        ]:
            d = tempfile.mkdtemp(prefix=f"smaq_ckpt_{name}_")
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(os.path.join(d, "state"), jax.device_get(tree), force=True)
            ckptr.wait_until_finished()
            out[f"ckpt_{name}_bytes"] = ckpt_dir_bytes(d)
            shutil.rmtree(d, ignore_errors=True)
        out["ckpt_reduction_x"] = round(
            out["ckpt_fp32_bytes"] / out["ckpt_packed_bytes"], 3
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
