"""Auto-tuning: LR range finder and batch-size scaler.

The reference delegates to Lightning's ``trainer.tune`` (train.py:6-9,
``--auto_lr_find`` / ``--auto_scale_batch_size``).  TPU-native equivalents:

- :func:`auto_lr_find` — the LR range test: one jitted run with an
  exponentially increasing LR schedule baked in (single compile), losses
  recorded per step, suggestion = the LR at the steepest smoothed descent
  (Lightning's heuristic);
- :func:`auto_scale_batch_size` — double the batch size until the step fails
  to compile/execute (RESOURCE_EXHAUSTED), back off one notch.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from smart_quantization_tpu.optim.compressed import build_optimizer
from smart_quantization_tpu.train.state import TrainState


def lr_range_schedule(min_lr: float, max_lr: float, num_steps: int):
    ratio = max_lr / min_lr

    def sched(step):
        frac = jnp.minimum(step / max(num_steps - 1, 1), 1.0)
        return min_lr * ratio**frac

    return sched


def suggest_from_losses(lrs: np.ndarray, losses: np.ndarray) -> float:
    """Steepest-descent point of the smoothed loss curve (skip edges)."""
    losses = np.asarray(losses, np.float64)
    finite = np.isfinite(losses)
    if finite.sum() < 5:
        return float(lrs[0])
    # exponential smoothing
    smoothed = []
    acc, beta = 0.0, 0.8
    for i, v in enumerate(np.where(finite, losses, np.nanmax(losses[finite]))):
        acc = beta * acc + (1 - beta) * v
        smoothed.append(acc / (1 - beta ** (i + 1)))
    smoothed = np.array(smoothed)
    grads = np.gradient(smoothed)
    lo, hi = max(1, len(grads) // 10), len(grads) - max(1, len(grads) // 10)
    idx = lo + int(np.argmin(grads[lo:hi]))
    return float(lrs[idx])


def auto_lr_find(
    trainer,
    *,
    min_lr: float = 1e-6,
    max_lr: float = 1.0,
    num_steps: int = 50,
) -> float:
    """Run the LR range test with the trainer's model/data/compression and
    return the suggested learning rate."""
    sched = lr_range_schedule(min_lr, max_lr, num_steps)
    probe_spec = build_optimizer(trainer.spec.kind, sched)
    saved_spec, saved_step = trainer.spec, trainer._train_step
    trainer.spec = probe_spec
    try:
        key = jax.random.key(trainer.cfg.seed + 999)
        key, k_init = jax.random.split(key)
        state = trainer.init_state(k_init)
        trainer._train_step = trainer.build_train_step(state)
        if trainer._fsdp_active():
            from smart_quantization_tpu.parallel.train_fsdp_q import place_state

            state = place_state(trainer.mesh, state)
        losses, lrs = [], []
        step = 0
        for epoch in range(1 + num_steps // max(trainer.data.steps_per_epoch, 1)):
            for batch in trainer.data.train_batches(epoch):
                if step >= num_steps:
                    break
                inputs, labels = trainer.task.split_batch(batch)
                key, k = jax.random.split(key)
                state, metrics = trainer._train_step(
                    state,
                    jax.tree.map(jnp.asarray, inputs),
                    jnp.asarray(labels),
                    k,
                )
                losses.append(float(metrics["train_loss"]))
                lrs.append(float(sched(step)))
                step += 1
            if step >= num_steps:
                break
        return suggest_from_losses(np.array(lrs), np.array(losses))
    finally:
        trainer.spec, trainer._train_step = saved_spec, saved_step


def auto_scale_batch_size(
    try_batch: Callable[[int], None],
    *,
    init_size: int = 8,
    max_trials: int = 8,
) -> int:
    """Double the batch size until ``try_batch`` raises an out-of-memory
    error; return the largest size that worked."""
    best = None
    size = init_size
    for _ in range(max_trials):
        try:
            try_batch(size)
            best = size
            size *= 2
        except Exception as e:  # RESOURCE_EXHAUSTED / XlaRuntimeError
            if "RESOURCE_EXHAUSTED" in str(e) or "out of memory" in str(e).lower():
                break
            raise
    if best is None:
        raise RuntimeError(f"even batch size {init_size} does not fit")
    return best
