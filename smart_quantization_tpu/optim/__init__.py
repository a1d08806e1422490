from smart_quantization_tpu.optim.compressed import (  # noqa: F401
    OptimizerCompression,
    build_optimizer,
    compressed_optimizer_step,
    norm_param_mask,
)
