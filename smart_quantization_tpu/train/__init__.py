from smart_quantization_tpu.train.loop import Trainer, TrainConfig  # noqa: F401
from smart_quantization_tpu.train.state import TrainState  # noqa: F401
