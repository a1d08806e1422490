from smart_quantization_tpu.inject.policy import LayerKind, TapPolicy  # noqa: F401
from smart_quantization_tpu.inject.tap import TapConfig, compression_tap, module_tap  # noqa: F401
