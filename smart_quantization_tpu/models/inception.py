"""CIFAR-adapted Inception-v3 in flax (NHWC, TPU-native).

Re-design of the vendored network
(/root/reference/smart_compress/models/pytorch/inception.py): CIFAR stem is a
single 3x3 stride-1 pad-1 conv to 192 channels (inception.py:42-66, the
deeper 299x299 stem is elided), aux logits off, InceptionA-E blocks
(inception.py:143-324) and BasicConv2d = conv+BN+ReLU (inception.py:327-336).
Compression taps at every conv/BN/activation/pool/linear/block output.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from smart_quantization_tpu.inject.policy import LayerKind
from smart_quantization_tpu.inject.tap import TapConfig, module_tap
from smart_quantization_tpu.models.resnet import TappedBatchNorm, _conv_init


class BasicConv2d(nn.Module):
    features: int
    kernel: Sequence[int] = (1, 1)
    strides: int = 1
    padding: str | Sequence = "VALID"
    tap: TapConfig | None = None
    train: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            tuple(self.kernel),
            (self.strides, self.strides),
            padding=self.padding,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=_conv_init,
            name="conv",
        )(x)
        x = module_tap(self, x, LayerKind.CONV, self.tap)
        x = TappedBatchNorm(self.tap, not self.train, dtype=self.dtype, name="bn")(x)
        x = nn.relu(x)
        return module_tap(self, x, LayerKind.ACTIVATION, self.tap)


def _avg_pool_3x3_same(x):
    return nn.avg_pool(x, (3, 3), (1, 1), padding=((1, 1), (1, 1)))


def _max_pool_3x3_s2(x):
    return nn.max_pool(x, (3, 3), (2, 2), padding="VALID")


class InceptionA(nn.Module):
    pool_features: int
    tap: TapConfig | None
    train: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, p="VALID", name=None: BasicConv2d(
            f, k, padding=p, tap=self.tap, train=self.train,
            dtype=self.dtype, name=name
        )
        b1 = conv(64, (1, 1), name="branch1x1")(x)
        b5 = conv(48, (1, 1), name="branch5x5_1")(x)
        b5 = conv(64, (5, 5), ((2, 2), (2, 2)), name="branch5x5_2")(b5)
        b3 = conv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = conv(96, (3, 3), ((1, 1), (1, 1)), name="branch3x3dbl_2")(b3)
        b3 = conv(96, (3, 3), ((1, 1), (1, 1)), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_same(x)
        bp = module_tap(self, bp, LayerKind.POOL, self.tap)
        bp = conv(self.pool_features, (1, 1), name="branch_pool")(bp)
        y = jnp.concatenate([b1, b5, b3, bp], axis=-1)
        return module_tap(self, y, LayerKind.BLOCK, self.tap)


class InceptionB(nn.Module):
    tap: TapConfig | None
    train: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, s=1, p="VALID", name=None: BasicConv2d(
            f, k, s, p, tap=self.tap, train=self.train,
            dtype=self.dtype, name=name
        )
        b3 = conv(384, (3, 3), 2, name="branch3x3")(x)
        bd = conv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = conv(96, (3, 3), 1, ((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bd = conv(96, (3, 3), 2, name="branch3x3dbl_3")(bd)
        bp = _max_pool_3x3_s2(x)
        bp = module_tap(self, bp, LayerKind.POOL, self.tap)
        y = jnp.concatenate([b3, bd, bp], axis=-1)
        return module_tap(self, y, LayerKind.BLOCK, self.tap)


class InceptionC(nn.Module):
    channels_7x7: int
    tap: TapConfig | None
    train: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, p="VALID", name=None: BasicConv2d(
            f, k, padding=p, tap=self.tap, train=self.train,
            dtype=self.dtype, name=name
        )
        c7 = self.channels_7x7
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b1 = conv(192, (1, 1), name="branch1x1")(x)
        b7 = conv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = conv(c7, (1, 7), p17, name="branch7x7_2")(b7)
        b7 = conv(192, (7, 1), p71, name="branch7x7_3")(b7)
        bd = conv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = conv(c7, (7, 1), p71, name="branch7x7dbl_2")(bd)
        bd = conv(c7, (1, 7), p17, name="branch7x7dbl_3")(bd)
        bd = conv(c7, (7, 1), p71, name="branch7x7dbl_4")(bd)
        bd = conv(192, (1, 7), p17, name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_same(x)
        bp = module_tap(self, bp, LayerKind.POOL, self.tap)
        bp = conv(192, (1, 1), name="branch_pool")(bp)
        y = jnp.concatenate([b1, b7, bd, bp], axis=-1)
        return module_tap(self, y, LayerKind.BLOCK, self.tap)


class InceptionD(nn.Module):
    tap: TapConfig | None
    train: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, s=1, p="VALID", name=None: BasicConv2d(
            f, k, s, p, tap=self.tap, train=self.train,
            dtype=self.dtype, name=name
        )
        b3 = conv(192, (1, 1), name="branch3x3_1")(x)
        b3 = conv(320, (3, 3), 2, name="branch3x3_2")(b3)
        b7 = conv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = conv(192, (1, 7), 1, ((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = conv(192, (7, 1), 1, ((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = conv(192, (3, 3), 2, name="branch7x7x3_4")(b7)
        bp = _max_pool_3x3_s2(x)
        bp = module_tap(self, bp, LayerKind.POOL, self.tap)
        y = jnp.concatenate([b3, b7, bp], axis=-1)
        return module_tap(self, y, LayerKind.BLOCK, self.tap)


class InceptionE(nn.Module):
    tap: TapConfig | None
    train: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, p="VALID", name=None: BasicConv2d(
            f, k, padding=p, tap=self.tap, train=self.train,
            dtype=self.dtype, name=name
        )
        b1 = conv(320, (1, 1), name="branch1x1")(x)
        b3 = conv(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                conv(384, (1, 3), ((0, 0), (1, 1)), name="branch3x3_2a")(b3),
                conv(384, (3, 1), ((1, 1), (0, 0)), name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = conv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = conv(384, (3, 3), ((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                conv(384, (1, 3), ((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd),
                conv(384, (3, 1), ((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        bp = _avg_pool_3x3_same(x)
        bp = module_tap(self, bp, LayerKind.POOL, self.tap)
        bp = conv(192, (1, 1), name="branch_pool")(bp)
        y = jnp.concatenate([b1, b3, bd, bp], axis=-1)
        return module_tap(self, y, LayerKind.BLOCK, self.tap)


class Inception3(nn.Module):
    """CIFAR Inception-v3: 32x32x3 -> num_classes logits."""

    num_classes: int = 10
    tap: TapConfig | None = None
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32  # MXU compute dtype (see models/resnet.py)

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        # CIFAR stem (inception.py:48): 3x3 s1 p1 conv to 192 channels
        x = BasicConv2d(
            192, (3, 3), 1, ((1, 1), (1, 1)), tap=self.tap, train=train,
            dtype=self.dtype, name="Conv2d_1a_3x3",
        )(x)
        x = InceptionA(32, self.tap, train, dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, self.tap, train, dtype=self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, self.tap, train, dtype=self.dtype, name="Mixed_5d")(x)
        x = InceptionB(self.tap, train, dtype=self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, self.tap, train, dtype=self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, self.tap, train, dtype=self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, self.tap, train, dtype=self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, self.tap, train, dtype=self.dtype, name="Mixed_6e")(x)
        x = InceptionD(self.tap, train, dtype=self.dtype, name="Mixed_7a")(x)
        x = InceptionE(self.tap, train, dtype=self.dtype, name="Mixed_7b")(x)
        x = InceptionE(self.tap, train, dtype=self.dtype, name="Mixed_7c")(x)
        x = jnp.mean(x, axis=(1, 2))
        x = module_tap(self, x, LayerKind.POOL, self.tap)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(
            x, rng=self.make_rng("dropout") if train else None
        )
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        x = module_tap(self, x, LayerKind.LINEAR, self.tap)
        x = module_tap(self, x, LayerKind.BLOCK, self.tap)
        return x.astype(jnp.float32)


def inception_v3(
    num_classes: int = 10,
    tap: TapConfig | None = None,
    dtype: Any = jnp.float32,
) -> Inception3:
    return Inception3(num_classes=num_classes, tap=tap, dtype=dtype)
