"""Task adapters: the model/data-specific pieces of the training loop.

The reference gets this polymorphism from PyTorch Lightning — one Trainer
serves every LightningModule because the module owns its own training_step
(/root/reference/smart_compress/util/train.py:169-195, models/base.py:108-135).
Here the Trainer owns the jitted, compression-wired step (single-chip, DP and
FSDP variants) and a ``Task`` supplies exactly what varies per model family:

- the model.init sample + rng collections,
- device-side batch preparation (augmentation / normalization),
- the model call signature,
- the loss (cross-entropy vs STSB regression, models/bert.py:53-59),
- train metrics and the eval reduction/summary (top-1 accuracy,
  models/resnet.py:37-44, vs GLUE metrics, models/bert.py:61-70).

Everything here is either host-side or traced inside the Trainer's jitted
step; tasks hold no state and are safe to close over.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


@dataclasses.dataclass(frozen=True)
class ImageClassificationTask:
    """ResNet/Inception on CIFAR (reference models/resnet.py, inception.py).

    Batches are ``(images_u8_nhwc, labels_i32)``; train prep is the on-device
    random-crop+flip augmentation + normalization (data/cifar.py)."""

    image_shape: tuple[int, int, int] = (32, 32, 3)

    def init_sample(self) -> Any:
        return jnp.zeros((2,) + self.image_shape, jnp.float32)

    def init_rngs(self, k_param: jax.Array, k_comp: jax.Array) -> dict:
        # 'dropout' rides a fold of the compress key: ResNet ignores it,
        # Inception-v3 draws it for its pre-fc dropout
        # (models/inception.py:223-224; reference pytorch/inception.py uses
        # F.dropout in training mode)
        return {
            "params": k_param,
            "compress": k_comp,
            "dropout": jax.random.fold_in(k_comp, 7),
        }

    def split_batch(self, batch) -> tuple[Any, Any]:
        images, labels = batch
        return images, labels

    def prepare_train(self, inputs, key: jax.Array):
        from smart_quantization_tpu.data import cifar

        return cifar.normalize(cifar.augment(inputs, key))

    def prepare_eval(self, inputs):
        from smart_quantization_tpu.data import cifar

        return cifar.normalize(inputs)

    def model_args(self, inputs) -> tuple:
        return (inputs,)

    def train_rngs(self, k_fwd: jax.Array, k_extra: jax.Array) -> dict:
        return {"compress": k_fwd, "dropout": k_extra}

    def eval_rngs(self) -> dict:
        # DELIBERATE deviation (documented, PARITY.md): the reference draws
        # fresh torch global RNG for eval-time compression every call; we use
        # a constant key, so eval stochastic-rounding noise is identical
        # across batches/epochs.  The noise is zero-mean either way — a fixed
        # realization cannot bias val metrics, and pairing it across epochs
        # removes rounding jitter from epoch-to-epoch comparisons.
        return {"compress": jax.random.key(0)}

    def loss(self, logits: jax.Array, labels: jax.Array) -> jax.Array:
        return cross_entropy(logits, labels)

    def train_metrics(self, logits: jax.Array, labels: jax.Array) -> dict:
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return {"train_accuracy": acc}

    def eval_outputs(self, logits: jax.Array, labels: jax.Array) -> dict:
        correct = jnp.sum((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return {"loss": self.loss(logits, labels), "correct": correct}

    def eval_summary(self, outs: dict, labels: np.ndarray, count: int) -> dict:
        return {
            "val_loss": float(np.mean(outs["loss"])),
            "val_accuracy": float(np.sum(outs["correct"])) / count,
        }


@dataclasses.dataclass(frozen=True)
class SequenceClassificationTask:
    """BERT fine-tuning on GLUE/IMDB (reference models/bert.py:10-73).

    Batches are dicts with ``input_ids`` / ``attention_mask`` /
    ``token_type_ids`` / ``labels``; STSB uses the regression head
    (MSE on logits[:, 0], bert.py:53-70), everything else cross-entropy.
    The ``dropout`` rng collection rides the per-step data key."""

    task_name: str = "stsb"
    is_regression: bool = True
    max_input_length: int = 512

    _INPUT_KEYS = ("input_ids", "attention_mask", "token_type_ids")

    def init_sample(self) -> Any:
        L = self.max_input_length
        return {
            "input_ids": jnp.zeros((2, L), jnp.int32),
            "attention_mask": jnp.ones((2, L), jnp.int32),
            "token_type_ids": jnp.zeros((2, L), jnp.int32),
        }

    def init_rngs(self, k_param: jax.Array, k_comp: jax.Array) -> dict:
        return {
            "params": k_param,
            "compress": k_comp,
            "dropout": jax.random.fold_in(k_comp, 7),
        }

    def split_batch(self, batch) -> tuple[Any, Any]:
        inputs = {k: batch[k] for k in self._INPUT_KEYS}
        return inputs, batch["labels"]

    def prepare_train(self, inputs, key: jax.Array):
        return inputs

    def prepare_eval(self, inputs):
        return inputs

    def model_args(self, inputs) -> tuple:
        return tuple(inputs[k] for k in self._INPUT_KEYS)

    def train_rngs(self, k_fwd: jax.Array, k_extra: jax.Array) -> dict:
        return {"compress": k_fwd, "dropout": k_extra}

    def eval_rngs(self) -> dict:
        # constant eval key — deliberate, documented deviation; see
        # ImageClassificationTask.eval_rngs
        return {"compress": jax.random.key(0)}

    def loss(self, logits: jax.Array, labels: jax.Array) -> jax.Array:
        if self.is_regression:
            return jnp.mean((logits[:, 0] - labels) ** 2)
        return cross_entropy(logits, labels)

    def train_metrics(self, logits: jax.Array, labels: jax.Array) -> dict:
        return {}

    def eval_outputs(self, logits: jax.Array, labels: jax.Array) -> dict:
        preds = logits[:, 0] if self.is_regression else jnp.argmax(logits, -1)
        return {"pred": preds, "loss": self.loss(logits, labels)}

    def eval_summary(self, outs: dict, labels: np.ndarray, count: int) -> dict:
        from smart_quantization_tpu.train.glue_metrics import glue_metrics

        preds = np.asarray(outs["pred"]).reshape(-1)
        out = {"val_loss": float(np.mean(outs["loss"]))}
        out.update(
            {
                f"val_{k}": v
                for k, v in glue_metrics(self.task_name, preds, labels).items()
            }
        )
        return out
