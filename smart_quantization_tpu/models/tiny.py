"""Tiny CNN for fast harness tests (CIFAR-shaped in/out, fully tapped)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from smart_quantization_tpu.inject.policy import LayerKind
from smart_quantization_tpu.inject.tap import TapConfig, module_tap
from smart_quantization_tpu.models.resnet import TappedBatchNorm, _conv_init


class TinyCNN(nn.Module):
    num_classes: int = 10
    tap: TapConfig | None = None
    dtype: Any = jnp.float32  # MXU compute dtype (see models/resnet.py)

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        x = nn.Conv(16, (3, 3), (2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, kernel_init=_conv_init, name="conv1")(x)
        x = module_tap(self, x, LayerKind.CONV, self.tap)
        x = TappedBatchNorm(self.tap, not train, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = module_tap(self, x, LayerKind.ACTIVATION, self.tap)
        x = nn.Conv(32, (3, 3), (2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, kernel_init=_conv_init, name="conv2")(x)
        x = module_tap(self, x, LayerKind.CONV, self.tap)
        x = jnp.mean(x, axis=(1, 2))
        x = module_tap(self, x, LayerKind.POOL, self.tap)
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        x = module_tap(self, x, LayerKind.LINEAR, self.tap)
        return x.astype(jnp.float32)
