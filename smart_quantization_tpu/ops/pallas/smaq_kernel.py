"""Fused SmaQ quantize->dequantize Pallas TPU kernel.

The reference's hot loop applies the z-score quantizer to every eligible
layer output (SURVEY.md section 3.2); its FPGA accelerators
(/root/reference/hw/smaq.cpp, hw/smaq-with-bn.cpp) play the role this kernel
plays on TPU: one streaming pass that quantizes and immediately dequantizes a
tensor against per-tensor (mean, std) statistics.

Design notes (measured on a v5e chip):
- the per-element path is division-free (VPU divides cost ~8x a multiply);
  all scalar prep (std guard/clamp, reciprocals) happens as SMEM scalar math
  inside the kernel — host-side jnp scalar ops cost one dispatch each, which
  dominates on dispatch-latency-bound deployments;
- sampled stats (``use_sample_stats``) are computed *inside* the kernel from
  ``num_samples`` positions strided across the first block (mirroring the
  HLS SAMPLE_STATS variant's deterministic stride, smaq-with-bn.cpp:21-28);
  random-index host-side gathers measured ~1000x slower than in-VMEM reads;
- full stats use one fused sum/sum-of-squares reduction — a single extra
  read pass (3 HBM passes total; quantizing against whole-tensor stats
  cannot go below 2 reads + 1 write, since every element's quantum depends
  on a global reduction);
- the data-dependent outlier count accumulates across the sequential grid in
  SMEM; zero-padding's contribution is corrected on the way out;
- stochastic rounding uses the per-core PRNG seeded from the raw key bits
  (calling threefry for one scalar costs a dispatch); uniform probs take the
  top 24 bits so the float32 conversion is exact.

Traffic: exactly one HBM read + one HBM write per element (sampled-stats
mode) — the speed-of-light for fake quantization.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smart_quantization_tpu.ops.smaq import (
    SmaQParams,
    compute_stats,
    smaq_quantize_dequantize,
)

_LANES = 1024
# 512x1024xf32 = 2 MB blocks.  Interleaved same-session measurements
# (experiments/kernel_tune.py, round 4 — earlier per-block numbers were
# invalidated by a jit-cache bug that re-ran the first-traced kernel) show
# 256-row and 512-row blocks indistinguishable within the chip's run-to-run
# bandwidth drift (ceiling swung 777-851 GB/s across passes); 1024-row
# (4 MB) blocks fail to fit double-buffered input+output in VMEM.
_MAX_BLOCK_ROWS = 512
# below this, kernel launch overhead beats the fused win; use the jnp path
_MIN_PALLAS_ELEMS = 8192

_INV_2_24 = float(2.0**-24)


def _kernel(
    seed_ref,
    stats_ref,
    x_ref,
    y_ref,
    count_ref,
    scratch_ref,
    *,
    t: float,
    range_main: float,
    range_outlier: float,
    stochastic: bool,
    all_positive: bool,
    std_clamp_lo: float,
    std_clamp_hi: float,
    sample_in_kernel: bool,
    num_samples: int,
    block_rows: int,
    pad: int,
    n_elems: int,
    num_bits_main: int,
    num_bits_outlier: int,
    compute_size: bool,
):
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        if compute_size:
            count_ref[0, 0] = jnp.float32(0.0)
        else:
            # size accounting off: skip the per-block outlier reduction (a
            # measurable VPU cost on a bandwidth-bound kernel) and emit the
            # static all-main-bucket floor as a placeholder
            count_ref[0, 0] = jnp.float32(n_elems * num_bits_main)
        if sample_in_kernel:
            # stratified sample: num_samples positions strided across block 0
            # via a vectorized mask (scalar VMEM loads compile poorly);
            # restricted to the real extent so zero padding can't bias stats
            xb = x_ref[:]
            ridx = jax.lax.broadcasted_iota(jnp.int32, xb.shape, 0)
            cidx = jax.lax.broadcasted_iota(jnp.int32, xb.shape, 1)
            lin = ridx * _LANES + cidx
            n_block = min(n_elems, block_rows * _LANES)
            stride = max(n_block // num_samples, 1)
            m = ((lin % stride) == 0) & (lin < n_block)
            k = jnp.float32(len(range(0, n_block, stride)))
            s = jnp.sum(jnp.where(m, xb, 0.0))
            ssq = jnp.sum(jnp.where(m, xb * xb, 0.0))
            m1 = s / k
            var = ssq / k - m1 * m1
            scratch_ref[0] = m1
            scratch_ref[1] = jnp.sqrt(jnp.maximum(var, 0.0))
        else:
            scratch_ref[0] = stats_ref[0, 0]
            scratch_ref[1] = stats_ref[0, 1]

        # derive all per-tensor scalars ONCE; later blocks only read scratch
        # (scalar-unit work on every block stalls the DMA pipeline)
        mean0 = scratch_ref[0]
        std0 = scratch_ref[1]
        std0 = jnp.where(std0 == 0.0, jnp.float32(1.0), std0)
        std0 = jnp.clip(std0, jnp.float32(std_clamp_lo), jnp.float32(std_clamp_hi))
        scratch_ref[2] = jnp.float32(1.0) / std0  # a
        scratch_ref[3] = -mean0 * scratch_ref[2]  # b
        scratch_ref[4] = std0 * jnp.float32(1.0 / range_outlier)
        scratch_ref[5] = std0 * jnp.float32(1.0 / range_main)
        scratch_ref[6] = jnp.float32(t) * std0
        scratch_ref[7] = mean0

    a = scratch_ref[2]
    b = scratch_ref[3]
    inv_out_std = scratch_ref[4]
    inv_main_std = scratch_ref[5]
    t_std = scratch_ref[6]
    mean = scratch_ref[7]

    x = x_ref[:]
    z = x * a + b
    hi = z > t
    lo = z < -t
    outlier = hi | lo
    shift = jnp.where(hi, jnp.float32(-t), jnp.where(lo, jnp.float32(t), 0.0))
    scale = jnp.where(outlier, jnp.float32(range_outlier), jnp.float32(range_main))

    q = (z + shift) * scale
    if stochastic:
        pltpu.prng_seed(seed_ref[0, 0] + pid)
        rbits = pltpu.bitcast(pltpu.prng_random_bits(q.shape), jnp.uint32)
        # mosaic can't cast uint32->f32; route through int32 (top 24 bits)
        probs = pltpu.bitcast(rbits >> 8, jnp.int32).astype(jnp.float32) * jnp.float32(
            _INV_2_24
        )
        # stochastic round as floor(q + u): P(up) = frac(q), identical in
        # distribution to the floored+(frac>u) form but 3 fewer VPU ops on a
        # kernel that is VPU-bound at the bandwidth ceiling.  Caveat: the
        # equivalence needs q + u exact in f32; for |q| >= ~2^23 (unclamped
        # outliers thousands of sigma beyond t_out) the add can round across
        # an integer boundary — including nudging exact grid points — which
        # the exact-frac compare never did.  Unreachable for sane std/bit
        # configs (|q| < 2^23 needs |z| < ~6e4 sigma at 6/8 bits).
        q = jnp.floor(q + probs)
    else:
        q = jnp.trunc(q)

    # y = (q / scale - shift) * std + mean, with reciprocals folded in
    inv_scale_std = jnp.where(outlier, inv_out_std, inv_main_std)
    shift_term = jnp.where(hi, t_std, jnp.where(lo, -t_std, 0.0))
    y = q * inv_scale_std + shift_term + mean
    if all_positive:
        y = jnp.maximum(y, 0.0)
    y_ref[:] = y
    if compute_size:
        count_ref[0, 0] += jnp.sum(outlier.astype(jnp.float32))

        # final grid step: correct the zero-padding contribution and turn the
        # outlier count into the data-dependent size in bits — the kernel's
        # scalar output IS new_size, so the caller does no host-side math
        @pl.when(pid == pl.num_programs(0) - 1)
        def _finalize():
            cnt = count_ref[0, 0]
            if pad:
                pad_z = jnp.abs(b)  # |(0 - mean)/std|
                is_out = (pad_z > t).astype(jnp.float32)
                cnt = cnt - jnp.float32(pad) * is_out
            count_ref[0, 0] = (
                jnp.float32(n_elems * num_bits_main)
                + cnt * jnp.float32(num_bits_outlier - num_bits_main)
            )


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _bucket_rows(rows: int) -> int:
    """Round the row count up to a power of two so every tensor size maps to
    one of ~16 kernel shapes — a model with dozens of distinct layer sizes
    would otherwise pay one (slow, remote) mosaic compile per size.  Padding
    waste is bounded by 2x and is zero for power-of-two sizes."""
    p = 8
    while p < rows:
        p *= 2
    return p


@functools.partial(
    jax.jit,
    static_argnames=("params", "all_positive", "interpret", "compute_size"),
)
def smaq_fused(
    x: jax.Array,
    key: jax.Array | None,
    params: SmaQParams = SmaQParams(),
    *,
    all_positive: bool = False,
    interpret: bool = False,
    mean: jax.Array | None = None,
    std: jax.Array | None = None,
    seed: jax.Array | None = None,
    compute_size: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Fused-kernel SmaQ; same contract as ``smaq_quantize_dequantize``.
    Precomputed ``mean``/``std`` skip the stats pass.  A raw int32 ``seed``
    bypasses key plumbing entirely (zero host-side RNG ops).

    ``compute_size=False`` skips the in-kernel outlier count (the reference
    only tracks sizes under --measure_compression_ratio, which is OFF by
    default, compress/base.py:79); the returned size is then the static
    all-main-bucket floor, not the data-dependent value."""
    orig_dtype = x.dtype
    n = x.size
    if n < params.min_size:
        return x, jnp.float32(n * 32)

    xf = x.astype(jnp.float32)
    sample_in_kernel = (
        params.use_sample_stats and mean is None and n > params.num_samples
    )
    if sample_in_kernel:
        stats2 = jnp.zeros((1, 2), jnp.float32)  # computed in-kernel
        mean = std = None
    else:
        if mean is None or std is None:
            # full stats in ONE fused read: sum and sum-of-squares reduce
            # together (jnp.mean-then-std costs two passes over HBM), so
            # full-stats mode moves 3 passes total (stats read + kernel
            # read + write) instead of 4.  The sums are SHIFTED by the
            # first element (West's shifted-data variance): raw
            # E[x^2]-E[x]^2 cancels catastrophically in f32 when
            # |mean| >> std (ADVICE r3 — mean 1e3 / std 1e-2 zeroed the
            # variance entirely); with the pivot inside the data range the
            # subtraction is conditioned on the spread, not the magnitude.
            # XLA fuses the broadcast subtract into the same read pass.
            # Ulp-level differences vs the two-pass reference formulation
            # can still flip bucket-boundary elements (the conformance
            # tests bound that); the jnp reference path (ops/smaq.py)
            # keeps the torch-matching two-pass math.
            # Pivot = mean of a small head slice rather than element 0
            # alone: one extreme outlier in position 0 would make the
            # shifted sums s2 ~ n*(x0-mean)^2 and reintroduce the very
            # cancellation the shift avoids (ADVICE r4).  Averaging 256
            # elements damps a single outlier's pull by 256x; the residual
            # failure mode (the ENTIRE head slice being outliers, pushing
            # the pivot out of the bulk's range) is accepted and documented
            # here, like the zero-clamp guard below.
            flat0 = xf.reshape(-1)
            pivot = jnp.mean(flat0[: min(n, 256)])
            d = flat0 - pivot
            s1 = jnp.sum(d)
            s2 = jnp.sum(d * d)
            nn = jnp.float32(n)
            mean = pivot + s1 / nn
            var = jnp.maximum(
                (s2 - s1 * (s1 / nn)) / jnp.maximum(nn - 1.0, 1.0), 0.0
            )
            std = jnp.sqrt(var)
        stats2 = jnp.concatenate(
            [jnp.reshape(mean, (1, 1)), jnp.reshape(std, (1, 1))], axis=1
        ).astype(jnp.float32)

    if seed is not None:
        seed = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    elif params.stochastic_rounding and key is not None:
        # seed the in-kernel PRNG from the raw key bits — calling threefry
        # (jax.random.bits) for one scalar costs a dispatch per tensor
        seed = jax.lax.bitcast_convert_type(
            jax.random.key_data(key).reshape(-1)[-1:], jnp.int32
        ).reshape(1, 1)
    else:
        seed = jnp.zeros((1, 1), jnp.int32)

    flat = xf.reshape(-1)
    padded_n = _round_up(n, _LANES)
    rows = padded_n // _LANES
    padded_rows = _bucket_rows(rows)
    block_rows = min(_MAX_BLOCK_ROWS, padded_rows)
    pad = padded_rows * _LANES - n
    if pad:
        flat = jnp.pad(flat, (0, pad))
    x2d = flat.reshape(padded_rows, _LANES)

    grid = (padded_rows // block_rows,)
    kernel = functools.partial(
        _kernel,
        t=params.main_std_dev_threshold,
        range_main=params.range_main,
        range_outlier=params.range_outlier,
        stochastic=params.stochastic_rounding,
        all_positive=all_positive,
        std_clamp_lo=params.std_clamp_lo,
        std_clamp_hi=params.std_clamp_hi,
        sample_in_kernel=sample_in_kernel,
        num_samples=params.num_samples,
        block_rows=block_rows,
        pad=pad,
        n_elems=n,
        num_bits_main=params.num_bits_main,
        num_bits_outlier=params.num_bits_outlier,
        compute_size=compute_size,
    )
    scalar_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    scalars2_spec = pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)
    y2d, count = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            scalar_spec,
            scalars2_spec,
            pl.BlockSpec(
                (block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            scalar_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded_rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((8,), jnp.float32)],
        interpret=interpret,
    )(seed, stats2, x2d)

    y = y2d.reshape(-1)[:n].reshape(x.shape)
    new_size = count[0, 0]  # finalized in-kernel (pad-corrected, in bits)
    return y.astype(orig_dtype), new_size


def _use_pallas() -> bool:
    if os.environ.get("SMAQ_DISABLE_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


def smaq_fused_or_reference(
    x: jax.Array,
    key: jax.Array | None,
    params: SmaQParams = SmaQParams(),
    *,
    all_positive: bool = False,
    compute_size: bool = True,
    mean: jax.Array | None = None,
    std: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Dispatch to the fused TPU kernel when profitable, else the jnp path.

    Both paths implement identical math; they differ only in the PRNG stream
    driving stochastic rounding (and the sampled-stats positions: the kernel
    samples stratified positions, the jnp path samples a random stratum).
    Precomputed ``mean``/``std`` skip the stats pass on either path (used by
    the masked-stats log-domain nu codec, optim/compressed.py::_log_domain).
    """
    if _use_pallas() and x.size >= _MIN_PALLAS_ELEMS:
        return smaq_fused(
            x, key, params, all_positive=all_positive,
            compute_size=compute_size, mean=mean, std=std,
        )
    # the jnp path always computes the true size; XLA dead-code-eliminates
    # it when the caller ignores the output
    return smaq_quantize_dequantize(
        x, key, params, all_positive=all_positive, mean=mean, std=std
    )


# --------------------------------------------------------------------------
# BN-folded variant: channels-last layout, per-channel (gamma, beta) folded
# into the normalize/denormalize, mirroring the HLS smaq-with-bn kernel
# (/root/reference/hw/smaq-with-bn.cpp:112-134) and the reference Python BN
# path (smart.py:144-149,174-179) including its stats-before-unfold quirk.
# --------------------------------------------------------------------------


def _kernel_bn(
    seed_ref,
    stats_ref,
    gamma_ref,
    beta_ref,
    x_ref,
    y_ref,
    count_ref,
    scratch_ref,
    *,
    t: float,
    range_main: float,
    range_outlier: float,
    stochastic: bool,
    std_clamp_lo: float,
    std_clamp_hi: float,
    pad_rows: int,
    n_rows: int,
    num_bits_main: int,
    num_bits_outlier: int,
    c_real: int,
    c_pad: int,
):
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        count_ref[0, 0] = jnp.float32(0.0)
        std0 = stats_ref[0, 1]
        std0 = jnp.where(std0 == 0.0, jnp.float32(1.0), std0)
        std0 = jnp.clip(std0, jnp.float32(std_clamp_lo), jnp.float32(std_clamp_hi))
        scratch_ref[0] = stats_ref[0, 0]  # mean
        scratch_ref[1] = std0

    mean = scratch_ref[0]
    std = scratch_ref[1]

    # per-lane fold vectors (vector math each block; no scalar-unit stalls)
    gamma = gamma_ref[:]
    beta = beta_ref[:]
    safe_gamma = jnp.where(gamma == 0.0, jnp.float32(1.0), gamma)
    inv_gs = jnp.float32(1.0) / (safe_gamma * std)
    a_vec = inv_gs                                   # z = x*A + B
    b_vec = -(beta * inv_gs) - mean / std
    g_vec = std * safe_gamma                         # y = zhat*G + H
    h_vec = mean * safe_gamma + beta

    x = x_ref[:]
    z = x * a_vec + b_vec
    hi = z > t
    lo = z < -t
    outlier = hi | lo
    shift = jnp.where(hi, jnp.float32(-t), jnp.where(lo, jnp.float32(t), 0.0))
    scale = jnp.where(outlier, jnp.float32(range_outlier), jnp.float32(range_main))
    q = (z + shift) * scale
    if stochastic:
        pltpu.prng_seed(seed_ref[0, 0] + pid)
        rbits = pltpu.bitcast(pltpu.prng_random_bits(q.shape), jnp.uint32)
        probs = pltpu.bitcast(rbits >> 8, jnp.int32).astype(jnp.float32) * jnp.float32(
            _INV_2_24
        )
        # floor(q + u): same distribution as floored+(frac>u), fewer VPU ops
        q = jnp.floor(q + probs)
    else:
        q = jnp.trunc(q)
    inv_scale = jnp.where(
        outlier, jnp.float32(1.0 / range_outlier), jnp.float32(1.0 / range_main)
    )
    zhat = q * inv_scale - shift
    y_ref[:] = zhat * g_vec + h_vec

    # count only real elements (mask out row/channel padding)
    ridx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    block_rows = x.shape[0]
    real = ((pid * block_rows + ridx) < n_rows) & (cidx < c_real)
    count_ref[0, 0] += jnp.sum((outlier & real).astype(jnp.float32))

    @pl.when(pid == pl.num_programs(0) - 1)
    def _finalize():
        n_real = jnp.float32(n_rows * c_real)
        count_ref[0, 0] = (
            n_real * num_bits_main
            + count_ref[0, 0] * jnp.float32(num_bits_outlier - num_bits_main)
        )


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def smaq_fused_bn(
    x: jax.Array,
    key: jax.Array | None,
    gamma: jax.Array,
    beta: jax.Array,
    params: SmaQParams = SmaQParams(),
    *,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """BN-folded fused SmaQ for channels-last tensors.

    ``gamma``/``beta`` are per-channel vectors over the LAST axis.  Stats are
    the full-tensor mean/std computed BEFORE the BN unfold (the reference
    quirk, smart.py:130-149); zero gammas are guarded to 1 to avoid NaN (a
    hazard the reference leaves in place)."""
    orig_dtype = x.dtype
    n = x.size
    if n < params.min_size:
        return x, jnp.float32(n * 32)

    c = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(-1, c)
    n_rows = xf.shape[0]

    # stats on the raw tensor (pre-unfold), full or sampled via jnp
    mean, std = compute_stats(xf, params, key)
    stats2 = jnp.concatenate(
        [jnp.reshape(mean, (1, 1)), jnp.reshape(std, (1, 1))], axis=1
    ).astype(jnp.float32)

    if params.stochastic_rounding and key is not None:
        seed = jax.lax.bitcast_convert_type(
            jax.random.key_data(key).reshape(-1)[-1:], jnp.int32
        ).reshape(1, 1)
    else:
        seed = jnp.zeros((1, 1), jnp.int32)

    c_pad = _round_up(c, 128)
    padded_rows = _bucket_rows(n_rows)
    block_rows = min(_MAX_BLOCK_ROWS, padded_rows)
    if c_pad != c or padded_rows != n_rows:
        xf = jnp.pad(xf, ((0, padded_rows - n_rows), (0, c_pad - c)))
    gamma2 = jnp.pad(
        gamma.astype(jnp.float32).reshape(1, c), ((0, 0), (0, c_pad - c)),
        constant_values=1.0,
    )
    beta2 = jnp.pad(
        beta.astype(jnp.float32).reshape(1, c), ((0, 0), (0, c_pad - c))
    )

    kernel = functools.partial(
        _kernel_bn,
        t=params.main_std_dev_threshold,
        range_main=params.range_main,
        range_outlier=params.range_outlier,
        stochastic=params.stochastic_rounding,
        std_clamp_lo=params.std_clamp_lo,
        std_clamp_hi=params.std_clamp_hi,
        pad_rows=padded_rows - n_rows,
        n_rows=n_rows,
        num_bits_main=params.num_bits_main,
        num_bits_outlier=params.num_bits_outlier,
        c_real=c,
        c_pad=c_pad,
    )
    scalar_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    scalars2_spec = pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)
    chan_spec = pl.BlockSpec((1, c_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    y2d, count = pl.pallas_call(
        kernel,
        grid=(padded_rows // block_rows,),
        in_specs=[
            scalar_spec,
            scalars2_spec,
            chan_spec,
            chan_spec,
            pl.BlockSpec(
                (block_rows, c_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (block_rows, c_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            scalar_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded_rows, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        interpret=interpret,
    )(seed, stats2, gamma2, beta2, xf)

    y = y2d[:n_rows, :c].reshape(x.shape)
    return y.astype(orig_dtype), count[0, 0]
