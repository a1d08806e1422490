"""CIFAR-adapted ResNet-18/34/50 in flax (NHWC, TPU-native).

Re-design of the vendored torchvision-style network
(/root/reference/smart_compress/models/pytorch/resnet.py): CIFAR stem is a
single 3x3 stride-1 conv (resnet.py:164-167, no maxpool), BasicBlock /
Bottleneck residual blocks (resnet.py:32-130), kaiming-normal conv init with
optional zero-init of the last BN in each residual branch (resnet.py:186-201).

Compression taps are placed where the reference's monkey-patching would have
compressed layer outputs (autograd.py:50-77 + the layer-type registry):
after every conv, batch-norm (with optional BN-folded stats), activation,
pool, linear, residual-block output, and the model output.  BatchNorm taps
pass (scale, bias) as the BN-folding stats when ``use_batch_norm`` is set
(autograd.py:63-72).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

from smart_quantization_tpu.inject.policy import LayerKind
from smart_quantization_tpu.inject.tap import TapConfig, module_tap

ModuleDef = Any

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class TappedBatchNorm(nn.Module):
    """BatchNorm + compression tap (BN-folded when configured)."""

    tap: TapConfig | None
    use_running_average: bool
    zero_init: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale_init = nn.initializers.zeros if self.zero_init else nn.initializers.ones
        bn = nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            scale_init=scale_init,
            name="bn",
        )
        y = bn(x)
        gamma = bn.variables["params"]["scale"] if "params" in bn.variables else None
        beta = bn.variables["params"]["bias"] if "params" in bn.variables else None
        return module_tap(self, y, LayerKind.NORM, self.tap, gamma=gamma, beta=beta)


class BasicBlock(nn.Module):
    filters: int
    strides: int
    tap: TapConfig | None
    train: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(
            self.filters, (3, 3), (self.strides, self.strides), padding=1,
            use_bias=False, dtype=self.dtype, kernel_init=_conv_init, name="conv1",
        )(x)
        y = module_tap(self, y, LayerKind.CONV, self.tap)
        y = TappedBatchNorm(self.tap, not self.train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = module_tap(self, y, LayerKind.ACTIVATION, self.tap)
        y = nn.Conv(
            self.filters, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, kernel_init=_conv_init, name="conv2",
        )(y)
        y = module_tap(self, y, LayerKind.CONV, self.tap)
        y = TappedBatchNorm(self.tap, not self.train, dtype=self.dtype, zero_init=True, name="bn2")(y)

        if residual.shape != y.shape:
            residual = nn.Conv(
                self.filters, (1, 1), (self.strides, self.strides),
                use_bias=False, dtype=self.dtype, kernel_init=_conv_init, name="downsample_conv",
            )(residual)
            residual = module_tap(self, residual, LayerKind.CONV, self.tap)
            residual = TappedBatchNorm(self.tap, not self.train, dtype=self.dtype, name="downsample_bn")(
                residual
            )

        y = nn.relu(y + residual)
        y = module_tap(self, y, LayerKind.ACTIVATION, self.tap)
        return module_tap(self, y, LayerKind.BLOCK, self.tap)


class Bottleneck(nn.Module):
    filters: int
    strides: int
    tap: TapConfig | None
    train: bool
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(
            self.filters, (1, 1), use_bias=False, dtype=self.dtype, kernel_init=_conv_init, name="conv1"
        )(x)
        y = module_tap(self, y, LayerKind.CONV, self.tap)
        y = TappedBatchNorm(self.tap, not self.train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = module_tap(self, y, LayerKind.ACTIVATION, self.tap)
        y = nn.Conv(
            self.filters, (3, 3), (self.strides, self.strides), padding=1,
            use_bias=False, dtype=self.dtype, kernel_init=_conv_init, name="conv2",
        )(y)
        y = module_tap(self, y, LayerKind.CONV, self.tap)
        y = TappedBatchNorm(self.tap, not self.train, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = module_tap(self, y, LayerKind.ACTIVATION, self.tap)
        y = nn.Conv(
            self.filters * self.expansion, (1, 1), use_bias=False,
            dtype=self.dtype, kernel_init=_conv_init, name="conv3",
        )(y)
        y = module_tap(self, y, LayerKind.CONV, self.tap)
        y = TappedBatchNorm(self.tap, not self.train, dtype=self.dtype, zero_init=True, name="bn3")(y)

        if residual.shape != y.shape:
            residual = nn.Conv(
                self.filters * self.expansion, (1, 1),
                (self.strides, self.strides), use_bias=False,
                dtype=self.dtype, kernel_init=_conv_init,
                name="downsample_conv",
            )(residual)
            residual = module_tap(self, residual, LayerKind.CONV, self.tap)
            residual = TappedBatchNorm(self.tap, not self.train, dtype=self.dtype, name="downsample_bn")(
                residual
            )

        y = nn.relu(y + residual)
        y = module_tap(self, y, LayerKind.ACTIVATION, self.tap)
        return module_tap(self, y, LayerKind.BLOCK, self.tap)


class ResNet(nn.Module):
    """CIFAR ResNet; ``num_classes`` logits from 32x32x3 NHWC input."""

    stage_sizes: Sequence[int]
    block_cls: Callable
    num_classes: int = 10
    tap: TapConfig | None = None
    # MXU compute dtype (params/BN stats stay fp32; logits returned fp32).
    # bfloat16 doubles matmul/conv throughput on TPU — a deliberate
    # TPU-native extension over the reference's fp32-only compute.
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        # CIFAR stem: 3x3 stride-1 conv, no maxpool (reference resnet.py:164-167)
        x = nn.Conv(
            64, (3, 3), padding=1, use_bias=False, dtype=self.dtype, kernel_init=_conv_init, name="conv1"
        )(x)
        x = module_tap(self, x, LayerKind.CONV, self.tap)
        x = TappedBatchNorm(self.tap, not train, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = module_tap(self, x, LayerKind.ACTIVATION, self.tap)

        for i, num_blocks in enumerate(self.stage_sizes):
            filters = 64 * 2**i
            for j in range(num_blocks):
                strides = 2 if i > 0 and j == 0 else 1
                x = self.block_cls(
                    filters, strides, self.tap, train, dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )(x)

        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = module_tap(self, x, LayerKind.POOL, self.tap)
        x = nn.Dense(
            self.num_classes,
            dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            name="fc",
        )(x)
        x = module_tap(self, x, LayerKind.LINEAR, self.tap)
        x = module_tap(self, x, LayerKind.BLOCK, self.tap)
        return x.astype(jnp.float32)  # loss/metrics in full precision


resnet18 = partial(ResNet, stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock)
resnet34 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=BasicBlock)
resnet50 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck)
