from smart_quantization_tpu.parallel.mesh import make_mesh  # noqa: F401
from smart_quantization_tpu.parallel.collectives import compressed_allreduce_mean  # noqa: F401
