"""Compressed checkpointing: params + optimizer state stored as real
bit-packed SmaQ buffers.

The reference only simulates compression and relies on Lightning's fp32
checkpoints; the claimed memory reduction (up to 6.7x, README.md:25) assumes
a real packed representation.  Here large float leaves are packed with
``ops.pack`` (b_main-bit codes + flag bits + capped outlier stream + 2 fp32
stats) before orbax serialization, and unpacked on restore — on-disk
footprint shrinks ~3-5x depending on outlier capacity, with the same
round-trip error as the in-training fake quantization.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from smart_quantization_tpu.ops.pack import PackSpec, smaq_pack, smaq_unpack

_MIN_PACK_ELEMS = 256  # small leaves stay raw


def _is_packable(leaf) -> bool:
    return (
        hasattr(leaf, "dtype")
        and jnp.issubdtype(leaf.dtype, jnp.floating)
        and leaf.size >= _MIN_PACK_ELEMS
    )


def pack_tree(tree: Any, key: jax.Array, spec: PackSpec) -> Any:
    """Pack every large float leaf; returns a pytree of dicts."""
    leaves, treedef = jax.tree.flatten(tree)
    keys = jax.random.split(key, max(len(leaves), 1))
    packed = []
    for leaf, k in zip(leaves, keys):
        if _is_packable(leaf):
            p = smaq_pack(jnp.asarray(leaf), k, spec)
            packed.append(
                {
                    "__packed__": np.asarray([1], np.int32),
                    "main": p.main,
                    "flags": p.flags,
                    "outliers": p.outliers,
                    "mean": p.mean,
                    "std": p.std,
                    "shape": np.asarray(leaf.shape, np.int64),
                    "dtype": np.frombuffer(
                        str(leaf.dtype).ljust(16).encode(), np.uint8
                    ).copy(),
                }
            )
        else:
            packed.append({"__raw__": jnp.asarray(leaf)})
    return jax.tree.unflatten(treedef, packed)


def unpack_tree(packed_tree: Any, spec: PackSpec) -> Any:
    def is_entry(d):
        return isinstance(d, dict) and ("__packed__" in d or "__raw__" in d)

    def one(d):
        if "__raw__" in d:
            return d["__raw__"]
        from smart_quantization_tpu.ops.pack import PackedSmaQ

        shape = tuple(int(s) for s in np.asarray(d["shape"]))
        dtype = bytes(np.asarray(d["dtype"])).decode().strip()
        n = int(np.prod(shape)) if shape else 1
        p = PackedSmaQ(
            main=jnp.asarray(d["main"]),
            flags=jnp.asarray(d["flags"]),
            outliers=jnp.asarray(d["outliers"]),
            mean=jnp.asarray(d["mean"]),
            std=jnp.asarray(d["std"]),
            n_outliers=jnp.float32(0),
        )
        return smaq_unpack(p, n, spec).reshape(shape).astype(dtype)

    return jax.tree.map(one, packed_tree, is_leaf=is_entry)


def save_compressed(path: str, state: Any, key: jax.Array,
                    spec: PackSpec = PackSpec()) -> None:
    import orbax.checkpoint as ocp

    packed = jax.device_get(pack_tree(state, key, spec))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), packed)


def restore_compressed(path: str, spec: PackSpec = PackSpec()) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    packed = ckptr.restore(os.path.abspath(path))
    return unpack_tree(packed, spec)


def tree_nbytes(tree: Any) -> int:
    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree.leaves(tree)
        if hasattr(leaf, "size")
    )
