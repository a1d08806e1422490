"""CIFAR-10/100 data pipeline, TPU-native.

Re-design of the reference datamodules
(/root/reference/smart_compress/data/cifar_base.py:10-82, cifar10.py:7-26,
cifar100.py:7-26): same normalization constants and augmentation policy
(random-crop-32-pad-4 + horizontal flip on train; normalize only on eval;
``val_batch_size`` defaults to ``batch_size // 4``), but the augmentation is
a jittable per-batch function executed on device (pad + vmapped
dynamic_slice + flip), not a host-side torchvision transform — CPU workers
feed raw uint8; the TPU does the rest.

Raw data: parses the standard ``cifar-10-batches-py`` / ``cifar-100-python``
pickle archives if present under ``$SMAQ_DATA_DIR`` (no network access is
assumed); otherwise generates a deterministic synthetic dataset with the same
shapes/dtypes so every pipeline stage stays exercisable offline.
"""

from __future__ import annotations

import os
import pickle
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

CIFAR_MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32)
CIFAR_STD = np.array([0.247, 0.243, 0.261], np.float32)


def _data_dir() -> str:
    return os.environ.get("SMAQ_DATA_DIR", os.path.expanduser("~/datasets"))


def _load_cifar10(root: str):
    d = os.path.join(root, "cifar-10-batches-py")
    if not os.path.isdir(d):
        return None
    xs, ys = [], []
    for name in [f"data_batch_{i}" for i in range(1, 6)]:
        with open(os.path.join(d, name), "rb") as f:
            batch = pickle.load(f, encoding="latin1")
        xs.append(batch["data"])
        ys.extend(batch["labels"])
    train_x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    train_y = np.array(ys, np.int32)
    with open(os.path.join(d, "test_batch"), "rb") as f:
        batch = pickle.load(f, encoding="latin1")
    test_x = batch["data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    test_y = np.array(batch["labels"], np.int32)
    return (train_x, train_y), (test_x, test_y)


def _load_cifar100(root: str):
    d = os.path.join(root, "cifar-100-python")
    if not os.path.isdir(d):
        return None
    out = []
    for name in ("train", "test"):
        with open(os.path.join(d, name), "rb") as f:
            batch = pickle.load(f, encoding="latin1")
        x = batch["data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        y = np.array(batch["fine_labels"], np.int32)
        out.append((x, y))
    return tuple(out)


def _synthetic(num_classes: int, n_train: int = 2048, n_test: int = 512):
    """Deterministic class-separable synthetic CIFAR stand-in (offline dev).

    Env knobs (experiments only; defaults keep tests byte-stable):
    ``SMAQ_SYNTH_TRAIN_N`` / ``SMAQ_SYNTH_TEST_N`` resize the splits;
    ``SMAQ_SYNTH_SHIFT`` sets the per-class mean shift in pixel units
    (default ``128 // (num_classes-1)``) — smaller shifts make the task
    harder, which the encoder-sweep experiment uses so that encoders can
    actually separate (a trivially easy task saturates under any encoder).
    """
    n_train = int(os.environ.get("SMAQ_SYNTH_TRAIN_N", n_train))
    n_test = int(os.environ.get("SMAQ_SYNTH_TEST_N", n_test))
    shift_step = int(
        os.environ.get(
            "SMAQ_SYNTH_SHIFT", 128 // max(num_classes - 1, 1)
        )
    )
    rng = np.random.RandomState(0)

    def make(n):
        y = rng.randint(0, num_classes, size=n).astype(np.int32)
        x = rng.randint(0, 256, size=(n, 32, 32, 3)).astype(np.uint8)
        # plant a class-dependent mean shift so accuracy can actually improve
        shift = (y[:, None, None, None] * shift_step).astype(np.uint8)
        x = ((x.astype(np.int32) + shift) // 2).astype(np.uint8)
        return x, y

    return make(n_train), make(n_test)


def normalize(batch_u8: jax.Array) -> jax.Array:
    x = batch_u8.astype(jnp.float32) / 255.0
    return (x - CIFAR_MEAN) / CIFAR_STD


def augment(batch_u8: jax.Array, key: jax.Array) -> jax.Array:
    """Random crop (pad 4) + horizontal flip, vectorized on device."""
    n = batch_u8.shape[0]
    k_crop, k_flip = jax.random.split(key)
    padded = jnp.pad(
        batch_u8, ((0, 0), (4, 4), (4, 4), (0, 0)), mode="constant"
    )
    offsets = jax.random.randint(k_crop, (n, 2), 0, 9)
    flips = jax.random.bernoulli(k_flip, 0.5, (n,))

    def one(img, off, flip):
        img = jax.lax.dynamic_slice(img, (off[0], off[1], 0), (32, 32, 3))
        return jnp.where(flip, img[:, ::-1, :], img)

    return jax.vmap(one)(padded, offsets, flips)


class CIFARData:
    """Shuffled-epoch batcher over in-memory arrays (labels int32, NHWC u8)."""

    num_classes: int = 10

    def __init__(self, batch_size: int = 8, val_batch_size: int | None = None):
        self.batch_size = batch_size
        # val bs defaults to bs // 4 like the reference (cifar_base.py:36-37)
        self.val_batch_size = val_batch_size or max(batch_size // 4, 1)
        loaded = self._load(_data_dir())
        self.synthetic = loaded is None
        if loaded is None:
            loaded = _synthetic(self.num_classes)
        (self.train_x, self.train_y), (self.test_x, self.test_y) = loaded

    def _load(self, root):
        raise NotImplementedError

    def train_batches(self, epoch_seed: int) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        rng = np.random.RandomState(epoch_seed)
        order = rng.permutation(len(self.train_x))
        bs = self.batch_size
        for i in range(0, len(order) - bs + 1, bs):
            idx = order[i : i + bs]
            yield self.train_x[idx], self.train_y[idx]

    def val_batches(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        bs = self.val_batch_size
        for i in range(0, len(self.test_x) - bs + 1, bs):
            yield self.test_x[i : i + bs], self.test_y[i : i + bs]

    @property
    def steps_per_epoch(self) -> int:
        return len(self.train_x) // self.batch_size

    @property
    def val_steps_per_epoch(self) -> int:
        return len(self.test_x) // self.val_batch_size


class CIFAR10Data(CIFARData):
    num_classes = 10

    def _load(self, root):
        return _load_cifar10(root)


class CIFAR100Data(CIFARData):
    num_classes = 100

    def _load(self, root):
        return _load_cifar100(root)
