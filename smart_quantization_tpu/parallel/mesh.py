"""Device-mesh construction for DP/FSDP scaling.

The reference scales with PyTorch-Lightning DDP over NCCL
(SURVEY.md section 2 row 28); the TPU-native equivalent is a
``jax.sharding.Mesh`` with data-parallel ('data') and optional
FSDP ('fsdp') axes, shardings annotated with NamedSharding, and XLA
collectives riding ICI.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, fsdp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // fsdp
    if dp * fsdp != n:
        raise ValueError(f"dp({dp}) * fsdp({fsdp}) != device count ({n})")
    arr = np.asarray(devices).reshape(dp, fsdp)
    return Mesh(arr, axis_names=("data", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_shard_axis(shape: tuple[int, ...], fsdp_size: int) -> int:
    """Index of the largest fsdp-divisible axis of ``shape``, or -1 to
    replicate.  Single source of truth for the leaf-sharding rule (used by
    both the NamedSharding helper below and the shard_map FSDP path)."""
    if fsdp_size == 1:
        return -1
    candidates = [
        (dim, i) for i, dim in enumerate(shape) if dim and dim % fsdp_size == 0
    ]
    if not candidates:
        return -1
    return max(candidates)[1]


def fsdp_spec(shape: tuple[int, ...], fsdp_size: int) -> P:
    axis = fsdp_shard_axis(shape, fsdp_size)
    if axis < 0:
        return P()
    spec = [None] * len(shape)
    spec[axis] = "fsdp"
    return P(*spec)


def fsdp_sharding(mesh: Mesh, leaf: jax.ShapeDtypeStruct) -> NamedSharding:
    """Shard the largest divisible axis over the fsdp mesh axis, else replicate."""
    return NamedSharding(mesh, fsdp_spec(leaf.shape, mesh.shape["fsdp"]))
