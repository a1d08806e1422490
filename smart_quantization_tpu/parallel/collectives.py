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


def _axis_prod(axis_names) -> jax.Array | int:
    """Total device count across one axis name or a tuple of them."""
    if isinstance(axis_names, (tuple, list)):
        n = 1
        for a in axis_names:
            n *= jax.lax.axis_size(a)
        return n
    return jax.lax.axis_size(axis_names)


def _stochastic_round(t: jax.Array, key: jax.Array | None) -> jax.Array:
    if key is None:
        return jnp.round(t)
    floored = jnp.floor(t)
    probs = jax.random.uniform(key, t.shape, jnp.float32)
    return floored + ((t - floored) > probs).astype(jnp.float32)


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

    Headroom trick: every shard quantizes onto the integer grid
    ``[-floor(qmax/n), floor(qmax/n)]`` against a globally-agreed scale (one
    scalar pmax), so the int8 sum across n shards can never overflow for ANY
    n (the grid bound times n is <= qmax by construction) — XLA ring-reduces
    1-byte payloads (~2N bytes per device vs ~8N for fp32) and the dequant is
    one multiply in the epilogue.  Effective precision is ~``bits - log2(n)``
    per shard plus unbiased stochastic rounding; prefer
    :func:`compressed_allreduce_mean` (full per-shard precision, more
    traffic) for small meshes.

    ``axis_name`` may be a single mesh axis or a tuple of axes (reduces over
    their product).
    """
    keys = tree_split(key, tree) if key is not None else jax.tree.map(
        lambda _: None, tree
    )
    n_dev = _axis_prod(axis_name)
    qmax = 2 ** (bits - 1) - 1
    per_shard_int = max(qmax // n_dev, 1)

    def reduce_leaf(x, k):
        flat = x.reshape(-1).astype(jnp.float32)
        local_max = jnp.max(jnp.abs(flat))
        global_max = jax.lax.pmax(local_max, axis_name)
        scale = jnp.where(global_max == 0.0, 1.0, global_max) / per_shard_int
        # |t| <= per_shard_int (up to fp rounding); clip before AND after the
        # stochastic round so q stays on the overflow-safe grid exactly
        t = jnp.clip(flat / scale, -per_shard_int, per_shard_int)
        q = jnp.clip(_stochastic_round(t, k), -per_shard_int, per_shard_int)
        q = q.astype(jnp.int8)
        total = jax.lax.psum(q, axis_name)  # int8 payload, no overflow
        out = total.astype(jnp.float32) * (scale / n_dev)
        return out.reshape(x.shape).astype(x.dtype)

    return jax.tree.map(reduce_leaf, tree, keys)


def compressed_psum_mean_chunked(
    tree,
    axis_name,
    key: jax.Array | None = None,
    *,
    bits: int = 8,
):
    """Tree-level all-reduce-mean on int8 ``psum`` payloads with per-chunk
    (1024-element) globally-agreed scales.

    The scalable DP gradient exchange: a ring ``psum`` of a 1-byte payload
    moves ~2(n-1)/n B/elem per device REGARDLESS of mesh size (vs
    ~(n-1) B/elem for the gather variant and ~8(n-1)/n B/elem for fp32 —
    see the traffic table in train_dp.py).  Scales are agreed by an
    elementwise ``pmax`` over the (chunks,) maxima — finer precision than
    :func:`compressed_psum_mean`'s single per-tensor scale at no payload
    cost.  Per-shard precision is the headroom grid ``floor(qmax/n)``
    (~``bits - log2(n)`` bits) plus unbiased stochastic rounding; below 8
    devices prefer :func:`compressed_allreduce_mean` (full per-shard int8
    precision and still less traffic than fp32).
    """
    keys = tree_split(key, tree) if key is not None else jax.tree.map(
        lambda _: None, tree
    )

    def reduce_leaf(x, k):
        out = compressed_psum_mean_flat(
            x.reshape(-1).astype(jnp.float32), axis_name, k, bits=bits
        )
        return out.reshape(x.shape).astype(x.dtype)

    return jax.tree.map(reduce_leaf, tree, keys)


def compressed_reduce_scatter_mean(
    x: jax.Array,
    scatter_axis_name: str,
    key: jax.Array | None = None,
    *,
    bits: int = 8,
    scatter_dimension: int = 0,
    sum_axis_name: str | None = None,
):
    """Reduce-scatter-mean of one array on an int8 payload (FSDP gradients).

    The FSDP gradient exchange: every device holds a full-shape gradient;
    the mean over all devices is needed, scattered over ``scatter_axis_name``
    along ``scatter_dimension`` (each device keeps only its parameter
    shard's slice).  Payload path: shared-scale int8 quantize (same
    headroom-grid trick as :func:`compressed_psum_mean`, sized for the TOTAL
    device count) -> int8 ``psum`` over the pure-DP axis (if any) -> int8
    ``psum_scatter`` over the FSDP axis -> one dequant multiply on the local
    shard.  Gradient traffic is 4x smaller than fp32 at 8 bits on both hops.

    ``x.shape[scatter_dimension]`` must divide evenly by the scatter-axis
    size (guaranteed for leaves sharded by ``mesh.fsdp_shard_axis``).
    """
    axes = (
        (sum_axis_name, scatter_axis_name)
        if sum_axis_name is not None
        else scatter_axis_name
    )
    n_total = _axis_prod(axes)
    qmax = 2 ** (bits - 1) - 1
    per_shard_int = max(qmax // n_total, 1)

    xf = x.astype(jnp.float32)
    global_max = jax.lax.pmax(jnp.max(jnp.abs(xf)), axes)
    scale = jnp.where(global_max == 0.0, 1.0, global_max) / per_shard_int
    t = jnp.clip(xf / scale, -per_shard_int, per_shard_int)
    q = jnp.clip(_stochastic_round(t, key), -per_shard_int, per_shard_int)
    q = q.astype(jnp.int8)
    if sum_axis_name is not None:
        q = jax.lax.psum(q, sum_axis_name)  # |q| <= per_shard_int * n_sum
    part = jax.lax.psum_scatter(
        q, scatter_axis_name, scatter_dimension=scatter_dimension, tiled=True
    )
    return (part.astype(jnp.float32) * (scale / n_total)).astype(x.dtype)


def compressed_all_gather_flat(
    flat: jax.Array,
    axis_name: str,
    key: jax.Array | None = None,
    *,
    bits: int = 8,
) -> jax.Array:
    """All-gather a flat (1-D) local buffer on an int8 payload; returns the
    ``(n, L)`` stack of every device's dequantized buffer.  The bucketed
    building block: callers concatenate many parameter shards into one
    buffer so ONE collective moves everything (compile- and ICI-friendly),
    then split the rows back into leaves."""
    n = jax.lax.axis_size(axis_name)
    q, scale = _quantize_leaf(flat, key, bits)
    q_all = jax.lax.all_gather(q, axis_name)  # [n, groups, CHUNK] int8
    s_all = jax.lax.all_gather(scale, axis_name)
    return (q_all.astype(jnp.float32) * s_all).reshape(n, -1)[:, : flat.size]


def compressed_reduce_scatter_rows(
    buf: jax.Array,
    scatter_axis_name: str,
    key: jax.Array | None = None,
    *,
    bits: int = 8,
    sum_axis_name: str | None = None,
) -> jax.Array:
    """Reduce-scatter-mean of a ``(n, L)`` buffer: row i goes to the device
    with index i along ``scatter_axis_name``; returns this device's (L,) row.

    The bucketed gradient exchange: callers pack every sharded leaf's
    gradient into the rows (block i of each leaf into row i), so ONE int8
    ``psum`` (over the DP axis) + ONE int8 ``psum_scatter`` (over the FSDP
    axis) move the whole gradient.  Scales are per 1024-element chunk and
    globally agreed via an elementwise ``pmax`` — finer than one scale per
    bucket (small-magnitude layers keep precision), still payload-free.
    """
    axes = (
        (sum_axis_name, scatter_axis_name)
        if sum_axis_name is not None
        else scatter_axis_name
    )
    n_rows, length = buf.shape
    n_total = _axis_prod(axes)
    qmax = 2 ** (bits - 1) - 1
    per_int = max(qmax // n_total, 1)

    pad = (-length) % _CHUNK
    g = jnp.pad(buf.astype(jnp.float32), ((0, 0), (0, pad)))
    chunks = g.shape[1] // _CHUNK
    g = g.reshape(n_rows, chunks, _CHUNK)
    local_max = jnp.max(jnp.abs(g), axis=2, keepdims=True)
    global_max = jax.lax.pmax(local_max, axes)  # (n_rows, chunks, 1), agreed
    scale = jnp.where(global_max == 0.0, 1.0, global_max) / per_int
    t = jnp.clip(g / scale, -per_int, per_int)
    q = jnp.clip(_stochastic_round(t, key), -per_int, per_int)
    q = q.astype(jnp.int8).reshape(n_rows, chunks * _CHUNK)
    if sum_axis_name is not None:
        q = jax.lax.psum(q, sum_axis_name)  # |q| <= per_int * n_sum
    part = jax.lax.psum_scatter(
        q, scatter_axis_name, scatter_dimension=0, tiled=True
    )  # (1, chunks*_CHUNK) int8 sums
    i = jax.lax.axis_index(scatter_axis_name)
    my_scale = jax.lax.dynamic_index_in_dim(scale, i, axis=0)  # (1, chunks, 1)
    out = part.astype(jnp.float32).reshape(1, chunks, _CHUNK) * (
        my_scale / n_total
    )
    return out.reshape(-1)[:length]


def compressed_psum_mean_flat(
    flat: jax.Array,
    axis_name,
    key: jax.Array | None = None,
    *,
    bits: int = 8,
) -> jax.Array:
    """All-reduce-mean of one flat buffer on an int8 payload with per-chunk
    globally-agreed scales (elementwise ``pmax``).  The bucketed counterpart
    of :func:`compressed_psum_mean` for many small leaves concatenated."""
    n = _axis_prod(axis_name)
    qmax = 2 ** (bits - 1) - 1
    per_int = max(qmax // n, 1)
    size = flat.size
    pad = (-size) % _CHUNK
    g = jnp.pad(flat.astype(jnp.float32), (0, pad)).reshape(-1, _CHUNK)
    local_max = jnp.max(jnp.abs(g), axis=1, keepdims=True)
    global_max = jax.lax.pmax(local_max, axis_name)
    scale = jnp.where(global_max == 0.0, 1.0, global_max) / per_int
    t = jnp.clip(g / scale, -per_int, per_int)
    q = jnp.clip(_stochastic_round(t, key), -per_int, per_int).astype(jnp.int8)
    total = jax.lax.psum(q, axis_name)
    out = total.astype(jnp.float32) * (scale / n)
    return out.reshape(-1)[:size]


def compressed_all_gather(
    x: jax.Array,
    axis_name: str,
    key: jax.Array | None = None,
    *,
    bits: int = 8,
    gather_axis: int = 0,
):
    """All-gather of one array on an int8 payload (FSDP parameter gather).

    Each device quantizes its local shard (per-chunk fp32 scales, stochastic
    rounding), the int8 payload + scales are all_gathered, and every device
    dequantizes in the epilogue — 4x less parameter-gather traffic at 8
    bits.  All devices see bit-identical gathered values (dequant of the
    same payloads), so replicas stay consistent as long as each source
    shard's ``key`` does not vary across replicas.
    """
    n = jax.lax.axis_size(axis_name)
    q, scale = _quantize_leaf(x, key, bits)
    q_all = jax.lax.all_gather(q, axis_name)  # [n, groups, CHUNK] int8
    s_all = jax.lax.all_gather(scale, axis_name)  # [n, groups, 1] fp32
    deq = (q_all.astype(jnp.float32) * s_all).reshape(n, -1)[:, : x.size]
    deq = deq.reshape((n,) + x.shape)
    full = jnp.moveaxis(deq, 0, gather_axis)
    out_shape = list(x.shape)
    out_shape[gather_axis] *= n
    return full.reshape(out_shape).astype(x.dtype)
