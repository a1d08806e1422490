"""smart_quantization_tpu — a TPU-native lossy-compression-in-training framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``nimashoghi/smart-quantization`` (SmaQ): simulate lossy compression of every
major training data structure (weights, gradients, activations/feature-maps,
gradient-maps, optimizer state, optionally the loss) with one of six encoders
(SmaQ z-score quantizer, FP8, S2FP8, FP16, BF16, FP32 passthrough), measure
the accuracy impact and achieved compression ratio, and scale over a TPU
device mesh with quantized-gradient collectives.

Everything on the compute path is a pure, jittable function with explicitly
threaded PRNG keys; the hot quantize->dequantize ops have fused Pallas TPU
kernels; the runtime around it (NNW-BDI compression, golden models) is C++.
"""

__version__ = "0.1.0"

from smart_quantization_tpu.compress import build_compressor  # noqa: F401
