"""Auto-tuning (trainer.tune equivalents) tests."""

import numpy as np
import pytest

from smart_quantization_tpu.train.tune import (
    auto_scale_batch_size,
    lr_range_schedule,
    suggest_from_losses,
)


class TestLrFinder:
    def test_schedule_endpoints(self):
        s = lr_range_schedule(1e-6, 1.0, 50)
        assert float(s(0)) == pytest.approx(1e-6, rel=1e-4)
        assert float(s(49)) == pytest.approx(1.0, rel=1e-4)

    def test_suggestion_picks_steepest_descent(self):
        lrs = np.logspace(-6, 0, 100)
        # classic range-test curve: flat, drop, blow-up
        losses = np.concatenate([
            np.full(40, 2.3),
            2.3 - np.linspace(0, 1.5, 30),
            0.8 + np.linspace(0, 8.0, 30) ** 2,
        ])
        lr = suggest_from_losses(lrs, losses)
        assert lrs[40] <= lr <= lrs[75]

    def test_suggestion_handles_nan(self):
        lrs = np.logspace(-6, 0, 20)
        losses = np.array([2.0] * 10 + [np.nan] * 10)
        lr = suggest_from_losses(lrs, losses)
        assert np.isfinite(lr)


class TestBatchScaler:
    def test_doubles_until_failure(self):
        calls = []

        def try_batch(bs):
            calls.append(bs)
            if bs > 64:
                raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")

        best = auto_scale_batch_size(try_batch, init_size=8)
        assert best == 64
        assert calls == [8, 16, 32, 64, 128]

    def test_non_oom_errors_propagate(self):
        def try_batch(bs):
            raise ValueError("bug")

        import pytest

        with pytest.raises(ValueError):
            auto_scale_batch_size(try_batch)
