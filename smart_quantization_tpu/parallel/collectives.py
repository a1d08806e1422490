"""Quantized-gradient collectives.

The reference all-reduces fp32 gradients with NCCL and then fake-quantizes
the reduced result per process (SURVEY.md section 3.4).  The TPU-native
north-star upgrade implemented here: each shard quantizes its local gradient
to an int8 payload + per-chunk fp32 scales, the *quantized* payload is
exchanged over ICI (all_gather), and dequantize+sum runs in the collective
epilogue fused by XLA — 4x less gradient traffic at 8 bits.

Semantics: unbiased (stochastic rounding on the int grid), and exact for
zero gradients.  ``compressed_allreduce_mean(tree, axis)`` is a drop-in for
``jax.lax.pmean`` inside shard_map/pmap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from smart_quantization_tpu.utils.prng import tree_split

_CHUNK = 1024  # elements per quantization group (per-chunk scales)


def _quantize_leaf(x: jax.Array, key: jax.Array | None, bits: int):
    flat = x.reshape(-1).astype(jnp.float32)
    n = flat.size
    pad = (-n) % _CHUNK
    if pad:
        flat = jnp.pad(flat, (0, pad))
    groups = flat.reshape(-1, _CHUNK)
    qmax = float(2 ** (bits - 1) - 1)
    scale = jnp.max(jnp.abs(groups), axis=1, keepdims=True) / qmax
    safe = jnp.where(scale == 0.0, 1.0, scale)
    t = groups / safe
    if key is not None:
        floored = jnp.floor(t)
        probs = jax.random.uniform(key, t.shape, jnp.float32)
        q = floored + ((t - floored) > probs).astype(jnp.float32)
    else:
        q = jnp.round(t)
    q = jnp.clip(q, -qmax - 1, qmax).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def compressed_allreduce_mean(
    tree,
    axis_name: str,
    key: jax.Array | None = None,
    *,
    bits: int = 8,
):
    """All-reduce-mean over ``axis_name`` on int8-quantized payloads.

    Must be called inside shard_map/pmap over ``axis_name``.  Each device
    contributes (int8 q, fp32 scales); payloads are all_gathered and the sum
    is reconstructed in fp32 in the epilogue.
    """
    keys = tree_split(key, tree) if key is not None else jax.tree.map(
        lambda _: None, tree
    )
    n_dev = jax.lax.axis_size(axis_name)

    def reduce_leaf(x, k):
        q, scale = _quantize_leaf(x, k, bits)
        q_all = jax.lax.all_gather(q, axis_name)  # [n_dev, groups, CHUNK] int8
        s_all = jax.lax.all_gather(scale, axis_name)
        total = jnp.sum(q_all.astype(jnp.float32) * s_all, axis=0) / n_dev
        return total.reshape(-1)[: x.size].reshape(x.shape).astype(x.dtype)

    return jax.tree.map(reduce_leaf, tree, keys)


def compressed_psum_mean(
    tree,
    axis_name: str,
    key: jax.Array | None = None,
    *,
    bits: int = 8,
):
    """All-reduce-mean with an int8 ``psum`` payload and a shared scale.

    Headroom trick: every shard quantizes into ``[-qmax/n, qmax/n]`` against
    a globally-agreed scale (one scalar psum), so the int8 sum across n
    shards can never overflow — XLA ring-reduces 1-byte payloads (~2N bytes
    per device vs ~8N for fp32) and the dequant is one multiply in the
    epilogue.  Effective precision is ``bits - log2(n)`` per shard plus
    unbiased stochastic rounding; prefer :func:`compressed_allreduce_mean`
    (full per-shard precision, more traffic) for small meshes.
    """
    keys = tree_split(key, tree) if key is not None else jax.tree.map(
        lambda _: None, tree
    )
    n_dev = jax.lax.axis_size(axis_name)
    qmax = float(2 ** (bits - 1) - 1)
    per_shard_max = qmax / n_dev

    def reduce_leaf(x, k):
        flat = x.reshape(-1).astype(jnp.float32)
        local_max = jnp.max(jnp.abs(flat))
        global_max = jax.lax.pmax(local_max, axis_name)
        scale = jnp.where(global_max == 0.0, 1.0, global_max) / per_shard_max
        t = flat / scale
        if k is not None:
            floored = jnp.floor(t)
            probs = jax.random.uniform(k, t.shape, jnp.float32)
            q = floored + ((t - floored) > probs).astype(jnp.float32)
        else:
            q = jnp.round(t)
        q = jnp.clip(q, -per_shard_max - 1, per_shard_max).astype(jnp.int8)
        total = jax.lax.psum(q, axis_name)  # int8 payload, no overflow
        out = total.astype(jnp.float32) * (scale / n_dev)
        return out.reshape(x.shape).astype(x.dtype)

    return jax.tree.map(reduce_leaf, tree, keys)
