"""Per-quantizer-call profiling scopes (the reference wraps the hot path in
Globals.profiler.profile("smaq"), compress/smart.py:119): every compression
site is wrapped in jax.named_scope, so profiler traces and HLO debug
locations attribute quantizer time per tag."""

import jax
import jax.numpy as jnp

from smart_quantization_tpu.compress import build_compressor
from smart_quantization_tpu.data.cifar import CIFAR10Data
from smart_quantization_tpu.inject.tap import TapConfig
from smart_quantization_tpu.models.tiny import TinyCNN
from smart_quantization_tpu.optim.compressed import (
    OptimizerCompression,
    build_optimizer,
)
from smart_quantization_tpu.train.loop import TrainConfig, Trainer
from smart_quantization_tpu.train.metrics import MetricLogger

SCOPES = (
    "compress/forward",
    "compress/backward",
    "compress/optimizer_grad",
    "compress/optimizer_weight",
    "compress/optimizer_momentum",
    "compress/loss",
)


def test_train_step_hlo_carries_quantizer_scopes():
    comp = build_compressor("smart", use_pallas=False)
    tap = TapConfig(compressor=comp)
    trainer = Trainer(
        TinyCNN(num_classes=10, tap=tap),
        CIFAR10Data(batch_size=8),
        build_optimizer("adam", 1e-3),
        tap_cfg=tap,
        optim_comp=OptimizerCompression(compressor=comp),
        loss_compressor=comp,
        config=TrainConfig(compress_loss=True),
        logger=MetricLogger(None),
    )
    state = trainer.init_state(jax.random.key(0))
    step = trainer.build_train_step(state)
    txt = step.lower(
        state,
        jnp.zeros((8, 32, 32, 3), jnp.uint8),
        jnp.zeros((8,), jnp.int32),
        jax.random.key(1),
    ).as_text(debug_info=True)
    missing = [s for s in SCOPES if s not in txt]
    assert not missing, f"named scopes absent from lowered HLO: {missing}"
