"""Parametric low-precision float quantization (exp/man), pure JAX.

This replaces the reference's dependency on qtorch's CUDA ``float_quantize``
(/root/reference/smart_compress/util/pytorch/quantization.py:3,187-204) with
an exact bit-twiddling implementation that runs under jit on TPU:

- stochastic rounding = add uniform random bits below the kept mantissa and
  truncate (carries propagate into the exponent, which is the correct
  round-up-to-next-binade behavior);
- nearest = round-to-nearest-even on the kept mantissa;
- target-format subnormals are quantized on the fixed grid ``2^(emin - man)``;
- overflow saturates to the format's max value (qtorch semantics, no inf/nan
  code points are reserved in the target format);
- ``check_inf`` replicates the reference's inf-restoration quirk
  (/root/reference/smart_compress/util/pytorch/quantization.py:195-199):
  values that land exactly on ``+max_value`` are restored to ``+inf``
  (the reference compares the *signed* result against the positive max, so
  ``-max_value`` stays finite — we preserve that behavior bit-for-bit).

Standard formats: FP8 = e5m2, FP16 = e5m10, BF16 = e8m7, FP32 = e8m23
(/root/reference/smart_compress/compress/{fp8,fp16,bf16}.py:27-31).
"""

from __future__ import annotations

import dataclasses
import functools
import struct

import jax
import jax.numpy as jnp


def _f32_bits(v: float) -> int:
    return struct.unpack("<I", struct.pack("<f", v))[0]


@dataclasses.dataclass(frozen=True)
class FloatFormat:
    """A binary float format with ``exp`` exponent and ``man`` mantissa bits."""

    exp: int
    man: int

    def __post_init__(self):
        if not (1 <= self.exp <= 8):
            raise ValueError(f"exp must be in [1, 8], got {self.exp}")
        if not (0 <= self.man <= 23):
            raise ValueError(f"man must be in [0, 23], got {self.man}")

    @property
    def bias(self) -> int:
        return 2 ** (self.exp - 1) - 1

    @property
    def emax(self) -> int:
        # No inf/nan reservation: the full exponent range encodes finite values.
        return self.bias

    @property
    def emin(self) -> int:
        return 1 - self.bias

    @property
    def max_value(self) -> float:
        return float((2.0 - 2.0 ** (-self.man)) * 2.0**self.emax)

    @property
    def total_bits(self) -> int:
        return 1 + self.exp + self.man


FP8_FORMAT = FloatFormat(exp=5, man=2)
FP16_FORMAT = FloatFormat(exp=5, man=10)
BF16_FORMAT = FloatFormat(exp=8, man=7)
FP32_FORMAT = FloatFormat(exp=8, man=23)


@functools.partial(jax.jit, static_argnames=("fmt", "stochastic", "check_inf"))
def float_quantize(
    x: jax.Array,
    fmt: FloatFormat,
    key: jax.Array | None = None,
    *,
    stochastic: bool = True,
    check_inf: bool = True,
) -> jax.Array:
    """Quantize ``x`` (any float dtype) onto ``fmt``'s grid; returns float32."""
    if stochastic and key is None:
        raise ValueError("stochastic float_quantize requires a PRNG key")
    xf = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(xf, jnp.uint32)
    sign = bits & jnp.uint32(0x80000000)
    mag = bits & jnp.uint32(0x7FFFFFFF)

    # Per-element count of fp32 lattice bits below the target grid.  On the
    # normal range that is a constant 23 - man; below fmt.emin the target
    # grid is the uniform subnormal quantum 2^(emin - man), so the count
    # grows by (emin - e).  fp32's own subnormals share the e == -126
    # lattice (their exponent field is 0), hence the clamp.  Working purely
    # on the integer representation sidesteps flush-to-zero of denormals in
    # float arithmetic, and carries from the rounding addition propagate
    # into the exponent field, which is exactly round-up-across-binades.
    drop = 23 - fmt.man
    e_x = (mag >> 23).astype(jnp.int32) - 127
    eff_e = jnp.maximum(e_x, -126)
    p_raw = drop + jnp.maximum(fmt.emin - eff_e, 0)
    # The mask trick is valid while grid points within a binade are uniform
    # in bit space, i.e. p <= 23 (equivalently |x| >= quantum).
    p = jnp.clip(p_raw, 0, 23)
    if stochastic:
        rand = jax.random.bits(key, xf.shape, jnp.uint32)
    mask = (jnp.left_shift(jnp.uint32(1), p.astype(jnp.uint32))) - jnp.uint32(1)
    if stochastic:
        r = rand & mask
    else:
        # round-to-nearest-even: add (half - 1 + kept-lsb) then truncate
        half = jnp.where(p > 0, jnp.left_shift(jnp.uint32(1), (p - 1).astype(jnp.uint32)), jnp.uint32(0))
        lsb = jnp.right_shift(mag, p.astype(jnp.uint32)) & jnp.uint32(1)
        r = jnp.where(p > 0, half - jnp.uint32(1) + lsb, jnp.uint32(0))
    rounded_mag = (mag + r) & ~mask

    # Below-quantum range (|x| < quantum = 2^(emin - man)): round to 0 or the
    # quantum.  t = |x| / quantum is computed with two exact power-of-two
    # multiplies; fp32-subnormal inputs on flush-to-zero backends collapse to
    # 0 here, which only affects values the hardware flushes everywhere else.
    shift_total = fmt.man - fmt.emin
    c1 = jnp.float32(2.0 ** min(shift_total, 100))
    c2 = jnp.float32(2.0 ** max(shift_total - 100, 0))
    t = jnp.abs(xf) * c1 * c2
    if stochastic:
        # reuse the same random draw as a uniform in [0, 1)
        u = (rand >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(2.0**-24)
        up = t > u
    else:
        up = t > 0.5  # tie (t == 0.5) rounds to even, i.e. 0
    quantum_bits = jnp.uint32(_f32_bits(2.0 ** (fmt.emin - fmt.man)))
    below_bits = jnp.where(up, quantum_bits, jnp.uint32(0))
    out_bits = jnp.where(p_raw > 23, below_bits, rounded_mag)

    # Saturate and zero-mask in the integer domain: several XLA backends
    # flush fp32 subnormals in float min/select arithmetic, which would
    # destroy identity round-trips of subnormal values.
    maxv_bits = jnp.uint32(_f32_bits(fmt.max_value))
    out_bits = jnp.where(out_bits > maxv_bits, maxv_bits, out_bits)
    out_bits = jnp.where(mag == 0, jnp.uint32(0), out_bits)
    if check_inf:
        # reference restores +max (and only +max) to +inf
        # (quantization.py:195-199)
        is_pos_max = (out_bits == maxv_bits) & (sign == 0)
        out_bits = jnp.where(is_pos_max, jnp.uint32(0x7F800000), out_bits)
    out_bits = out_bits | sign
    # propagate non-finite inputs untouched
    out_bits = jnp.where(jnp.isfinite(xf), out_bits, bits)
    return jax.lax.bitcast_convert_type(out_bits, jnp.float32)
