"""S2FP8 — shifted-squeezed FP8 (arXiv 2001.05674), pure JAX.

Re-derivation of /root/reference/smart_compress/compress/s2fp8.py:27-48:
compute per-tensor statistics of ``log2 |X|`` (zeros excluded from the log but
included in the mean as 0), squeeze the magnitude distribution so it fits the
FP8 e5m2 dynamic range via ``|X|^alpha * 2^beta`` with
``alpha = 15 / (max - mean)`` and ``beta = -alpha * mean``, quantize as FP8
with stochastic rounding, then invert the squeeze and restore signs.

Overhead: two fp32 scalars (alpha, beta) = 64 bits per tensor
(s2fp8.py:29 counts this in the compression ratio).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from smart_quantization_tpu.ops.float_format import FP8_FORMAT, float_quantize


def s2fp8_quantize_dequantize(
    x: jax.Array,
    key: jax.Array | None,
    *,
    stochastic: bool = True,
    check_inf: bool = True,
) -> jax.Array:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    signs = jnp.sign(xf)

    x_abs = jnp.abs(xf)
    x_abs_log2 = jnp.where(x_abs == 0.0, x_abs, jnp.log2(x_abs))

    mu = jnp.mean(x_abs_log2)
    m = jnp.max(x_abs_log2)

    # The reference divides by (m - mu) unguarded (s2fp8.py:40); a constant
    # tensor would produce inf/nan there.  We guard the degenerate case with
    # alpha = 1 (identity squeeze), which leaves constant tensors representable.
    denom = m - mu
    safe_denom = jnp.where(denom == 0.0, jnp.float32(15.0), denom)
    alpha = 15.0 / safe_denom
    beta = -alpha * mu
    beta_pow2 = jnp.exp2(beta)

    squeezed = jnp.power(x_abs, alpha) * beta_pow2
    truncated = float_quantize(
        squeezed, FP8_FORMAT, key, stochastic=stochastic, check_inf=check_inf
    )
    out = jnp.power(truncated / beta_pow2, 1.0 / alpha) * signs
    return out.astype(orig_dtype)
