"""The six encoders: SmaQ, FP8, S2FP8, FP16, BF16, FP32-passthrough.

Parity targets (reference files):
  SmaQ  -> /root/reference/smart_compress/compress/smart.py:72-190
  FP8   -> /root/reference/smart_compress/compress/fp8.py:27-31   (e5m2)
  S2FP8 -> /root/reference/smart_compress/compress/s2fp8.py:27-48
  FP16  -> /root/reference/smart_compress/compress/fp16.py:27-31  (e5m10)
  BF16  -> /root/reference/smart_compress/compress/bf16.py:27-31  (e8m7)
  FP32  -> /root/reference/smart_compress/compress/fp32.py:19-23  (identity)
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp

from smart_quantization_tpu.compress.base import CompressorBase, SizeStats
from smart_quantization_tpu.ops.float_format import (
    BF16_FORMAT,
    FP8_FORMAT,
    FP16_FORMAT,
    FloatFormat,
    float_quantize,
)
from smart_quantization_tpu.ops.s2fp8 import s2fp8_quantize_dequantize
from smart_quantization_tpu.ops.smaq import SmaQParams, smaq_quantize_dequantize


@dataclasses.dataclass(frozen=True)
class SmaQ(CompressorBase):
    params: SmaQParams = SmaQParams()
    use_batch_norm: bool = False
    bn_scalar_params: bool = False
    use_pallas: bool = True  # fused TPU kernel on the hot path when available
    # False skips the fused kernel's in-kernel outlier count — the reference
    # only accounts sizes under --measure_compression_ratio (off by default,
    # compress/base.py:79), and the count is pure VPU overhead on a
    # bandwidth-bound kernel.  SizeStats are then the all-main-bucket floor.
    measure_sizes: bool = True

    name = "smart"

    def __call__(self, x, key, *, all_positive=False, gamma=None, beta=None,
                 mean=None, std=None):
        if not self.use_batch_norm:
            gamma = beta = None
        elif gamma is not None and self.bn_scalar_params:
            gamma = jnp.mean(gamma)
            beta = jnp.mean(beta)
        if self.use_pallas and gamma is None:
            # The fused kernel path falls back to the jnp reference off-TPU.
            from smart_quantization_tpu.ops.pallas.smaq_kernel import (
                smaq_fused_or_reference,
            )

            x_hat, new_bits = smaq_fused_or_reference(
                x, key, self.params, all_positive=all_positive,
                compute_size=self.measure_sizes, mean=mean, std=std,
            )
        elif (
            self.use_pallas
            and mean is None
            and std is None
            and gamma is not None
            and getattr(gamma, "ndim", 0) == 1
            and x.ndim >= 2
            and x.shape[-1] == gamma.shape[0]
            and x.size >= 8192
            and not all_positive
            and jax.default_backend() == "tpu"
            and not os.environ.get("SMAQ_DISABLE_PALLAS")
        ):
            from smart_quantization_tpu.ops.pallas.smaq_kernel import smaq_fused_bn

            x_hat, new_bits = smaq_fused_bn(x, key, gamma, beta, self.params)
        else:
            x_hat, new_bits = smaq_quantize_dequantize(
                x,
                key,
                self.params,
                gamma=gamma,
                beta=beta,
                all_positive=all_positive,
                mean=mean,
                std=std,
            )
        return x_hat, SizeStats(jnp.float32(x.size * 32), new_bits)


@dataclasses.dataclass(frozen=True)
class FloatEncoder(CompressorBase):
    """Shared fixed-float-format fake quantizer (FP8/FP16/BF16)."""

    fmt: FloatFormat = FP8_FORMAT
    check_inf: bool = True
    stochastic: bool = True

    name = "float"

    def _maybe_half(self, y: jax.Array) -> jax.Array:
        # precision=16 mode round-trips through the fp16 grid
        # (quantization.py:190-202).
        if self.precision == 16:
            y = float_quantize(y, FP16_FORMAT, None, stochastic=False, check_inf=False)
        return y

    def __call__(self, x, key, *, all_positive=False, gamma=None, beta=None,
                 mean=None, std=None):
        from smart_quantization_tpu.ops.pallas.float_kernel import (
            float_quantize_fused_or_reference,
        )

        y = float_quantize_fused_or_reference(
            x, self.fmt, key, stochastic=self.stochastic, check_inf=self.check_inf
        )
        y = self._maybe_half(y).astype(x.dtype)
        stats = SizeStats.of(x.size, 32, self.fmt.total_bits)
        return y, stats


@dataclasses.dataclass(frozen=True)
class FP8(FloatEncoder):
    fmt: FloatFormat = FP8_FORMAT
    name = "fp8"


@dataclasses.dataclass(frozen=True)
class FP16(FloatEncoder):
    fmt: FloatFormat = FP16_FORMAT
    name = "fp16"


@dataclasses.dataclass(frozen=True)
class BF16(FloatEncoder):
    fmt: FloatFormat = BF16_FORMAT
    name = "bf16"


@dataclasses.dataclass(frozen=True)
class S2FP8(CompressorBase):
    check_inf: bool = True
    stochastic: bool = True

    name = "s2fp8"

    def __call__(self, x, key, *, all_positive=False, gamma=None, beta=None,
                 mean=None, std=None):
        from smart_quantization_tpu.ops.pallas.s2fp8_kernel import (
            s2fp8_fused_or_reference,
        )

        y = s2fp8_fused_or_reference(
            x, key, stochastic=self.stochastic, check_inf=self.check_inf
        )
        # 64-bit per-tensor overhead: the two squeeze stats (s2fp8.py:29).
        stats = SizeStats.of(x.size, 32, 8, overhead=64.0)
        return y, stats


@dataclasses.dataclass(frozen=True)
class FP32(CompressorBase):
    name = "fp32"

    def __call__(self, x, key, *, all_positive=False, gamma=None, beta=None,
                 mean=None, std=None):
        return x, SizeStats.of(x.size, 32, 32)
