from smart_quantization_tpu.ops.rounding import stochastic_round, round_trunc  # noqa: F401
from smart_quantization_tpu.ops.float_format import (  # noqa: F401
    FloatFormat,
    float_quantize,
)
from smart_quantization_tpu.ops.smaq import SmaQParams, smaq_quantize_dequantize  # noqa: F401
from smart_quantization_tpu.ops.s2fp8 import s2fp8_quantize_dequantize  # noqa: F401
