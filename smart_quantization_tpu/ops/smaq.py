"""SmaQ z-score quantize->dequantize, pure JAX reference implementation.

Re-derivation of the reference quantizer
(/root/reference/smart_compress/compress/smart.py:72-190) as a pure function
with explicit PRNG.  The math, bit-for-bit:

1. tensors with fewer than ``min_size`` elements pass through untouched;
2. per-tensor mean/std — full (torch-style unbiased std), sampled
   (``num_samples`` random elements, biased std), or range-based
   (``(max - min) / sqrt(2 ln N)``, the Range-BN estimator);
3. optional BN unfold ``(x - beta) / gamma`` broadcast over the channel axis
   (the reference permutes NCHW to put channels last,
   smart.py:144-149 — our tensors are NHWC so the broadcast is natural);
4. ``z = (x - mean) / clamp(std)``; elements with ``|z| > t_main`` are
   outliers.  Outliers are shifted toward zero by ``t_main`` and scaled by
   ``range_outlier = (2^(b_out - 2) - 1) / (t_out - t_main)``; main values are
   scaled by ``range_main = (2^(b_main - 2) - 1) / t_main``;
5. stochastic rounding (or truncation) to the integer grid;
6. exact inversion back through scale, shift, std, mean, BN refold;
7. optional ``all_positive`` clamp at zero (used for Adam's second moment);
8. data-dependent size accounting: ``outliers * b_out + rest * b_main`` bits.

Note the reference does NOT clamp outliers at ``t_out`` despite the flag's
name — values beyond the outlier threshold simply quantize to larger integers
and invert exactly.  We preserve that.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from smart_quantization_tpu.ops.rounding import round_to_grid


@dataclasses.dataclass(frozen=True)
class SmaQParams:
    """Static configuration of the SmaQ quantizer (hashable; jit-static)."""

    num_bits_main: int = 6
    num_bits_outlier: int = 8
    main_std_dev_threshold: float = 1.0
    outlier_std_dev_threshold: float = 2.5
    min_size: int = 8
    num_samples: int = 16
    use_sample_stats: bool = False
    use_range_std_dev: bool = False
    stochastic_rounding: bool = True
    # std clamp range: fp16 runs clamp to (1e-4, 1e4), fp32 to (1e-38, 1e38)
    # (smart.py:82-84)
    std_clamp_lo: float = 1e-38
    std_clamp_hi: float = 1e38

    @property
    def range_main(self) -> float:
        return ((2 ** (self.num_bits_main - 2)) - 1) / self.main_std_dev_threshold

    @property
    def range_outlier(self) -> float:
        return ((2 ** (self.num_bits_outlier - 2)) - 1) / (
            self.outlier_std_dev_threshold - self.main_std_dev_threshold
        )


def _range_std(flat: jax.Array) -> jax.Array:
    """Range-BN std estimator: (max - min) / sqrt(2 ln N)  (smart.py:100-106)."""
    rng = jnp.max(flat) - jnp.min(flat)
    n = jnp.float32(flat.size)
    return rng / jnp.sqrt(2.0 * jnp.log(n))


def compute_stats(
    x: jax.Array, params: SmaQParams, key: jax.Array | None
) -> tuple[jax.Array, jax.Array]:
    """Per-tensor (mean, std) under the configured estimator.

    Full stats use the unbiased (ddof=1) std like ``torch.Tensor.std()``;
    sampled stats use the biased std like the reference's
    ``_get_std(sample, unbiased=False)`` (smart.py:86-91).  Sampling draws
    ``num_samples`` indices with replacement (the reference uses ``randperm``,
    i.e. without replacement; for num_samples << numel the estimators agree —
    a full permutation is hostile to XLA for large tensors).
    """
    flat = x.reshape(-1).astype(jnp.float32)
    n = flat.size
    if params.use_sample_stats and n > params.num_samples:
        if key is None:
            raise ValueError("sampled stats require a PRNG key")
        # Stratified sampling: one element per equal-sized stratum at a
        # shared random offset — a single strided dynamic-slice instead of a
        # random gather (TPU gathers of arbitrary indices are ~1000x more
        # expensive than one sliced DMA).  The reference permutes the whole
        # tensor (smart.py:86-91); stratified sampling is unbiased for the
        # mean and has no worse variance for stationary data.
        k = params.num_samples
        m = n // k
        grid = flat[: k * m].reshape(k, m)
        j = jax.random.randint(key, (), 0, m)
        sample = jax.lax.dynamic_slice(grid, (0, j), (k, 1)).reshape(k)
        mean = jnp.mean(sample)
        if params.use_range_std_dev:
            std = _range_std(sample)
        else:
            std = jnp.std(sample)  # biased, ddof=0
    else:
        mean = jnp.mean(flat)
        if params.use_range_std_dev:
            std = _range_std(flat)
        else:
            ddof = 1 if n > 1 else 0
            std = jnp.std(flat, ddof=ddof)
    return mean, std


def smaq_quantize_dequantize(
    x: jax.Array,
    key: jax.Array | None,
    params: SmaQParams = SmaQParams(),
    *,
    gamma: jax.Array | None = None,
    beta: jax.Array | None = None,
    all_positive: bool = False,
    mean: jax.Array | None = None,
    std: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fake-quantize ``x`` with SmaQ; returns ``(x_hat, new_size_bits)``.

    ``new_size_bits`` is the traced data-dependent compressed size in bits
    (original size is the static ``x.size * 32``).  ``gamma``/``beta`` enable
    the BN-folded variant (channel-last broadcast).  Precomputed ``mean``/
    ``std`` skip the stats pass (used by the fused Pallas path).
    """
    orig_dtype = x.dtype
    n = x.size
    if n < params.min_size:
        return x, jnp.float32(n * 32)

    xf = x.astype(jnp.float32)

    if key is not None:
        key_stats, key_round = jax.random.split(key)
    else:
        key_stats = key_round = None

    # Stats are computed on the tensor BEFORE the BN unfold — a reference
    # quirk we preserve (smart.py:130-134 precede the unfold at 144-149).
    if mean is None or std is None:
        mean, std = compute_stats(xf, params, key_stats)

    use_bn = gamma is not None and beta is not None
    if use_bn:
        xf = (xf - beta.astype(jnp.float32)) / gamma.astype(jnp.float32)

    std = jnp.where(std == 0.0, jnp.float32(1.0), std)
    std = jnp.clip(std, params.std_clamp_lo, params.std_clamp_hi)

    t = params.main_std_dev_threshold
    z = (xf - mean) / std
    is_outlier_hi = z > t
    is_outlier_lo = z < -t
    is_outlier = is_outlier_hi | is_outlier_lo

    # shift outliers toward zero by the main threshold (smart.py:159-164)
    shift = jnp.where(is_outlier_hi, -t, 0.0) + jnp.where(is_outlier_lo, t, 0.0)
    scale = jnp.where(is_outlier, params.range_outlier, params.range_main).astype(
        jnp.float32
    )

    q = (z + shift) * scale
    q = round_to_grid(q, key_round, params.stochastic_rounding)

    z_hat = q / scale - shift
    x_hat = z_hat * std + mean

    if use_bn:
        x_hat = x_hat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)

    if all_positive:
        x_hat = jnp.maximum(x_hat, 0.0)

    n_outliers = jnp.sum(is_outlier).astype(jnp.float32)
    new_size = (
        n_outliers * params.num_bits_outlier
        + (jnp.float32(n) - n_outliers) * params.num_bits_main
    )
    return x_hat.astype(orig_dtype), new_size
