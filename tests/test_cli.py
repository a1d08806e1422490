"""CLI / config-system tests (the two-phase argparse hub)."""

import pytest

from smart_quantization_tpu.utils.config import build_components, parse_args


class TestParse:
    def test_defaults(self):
        args = parse_args([])
        assert args.model == "resnet" and args.dataset == "cifar10"
        assert args.compress == "fp32" and args.compress_enabled
        assert args.compress_forward and args.compress_backward
        assert args.compress_weights and args.compress_gradients
        assert args.compress_momentum_vectors and not args.compress_loss
        assert args.terminate_on_nan

    def test_smart_args(self):
        args = parse_args(
            "--compress smart --num_bits_main 3 --num_bits_outlier 5 "
            "--use_sample_stats --no_stochastic_rounding"
        )
        assert args.num_bits_main == 3 and args.num_bits_outlier == 5
        assert args.use_sample_stats and not args.stochastic_rounding

    def test_compat_assert(self):
        with pytest.raises(SystemExit):
            parse_args("--model resnet --dataset glue")

    def test_auto_name_encodes_structures(self):
        args = parse_args("--compress smart --no_compress_weights")
        assert args.name.startswith("smart-resnet-cifar10-")
        assert "forward,backward,gradients,momentum_vectors" in args.name
        assert "weights" not in args.name

    def test_explicit_name_with_tags(self):
        args = parse_args("--name foo --tags bar")
        assert args.name == "foo-bar"

    def test_structure_toggles(self):
        args = parse_args(
            "--no_compress_forward --no_compress_backward --compress_loss"
        )
        assert not args.compress_forward and not args.compress_backward
        assert args.compress_loss


class TestBuild:
    def test_fp32_default(self):
        comps = build_components(parse_args([]))
        assert comps["compressor"].name == "fp32"
        assert comps["optimizer_spec"].kind == "sgd"

    def test_no_compress(self):
        comps = build_components(parse_args("--no_compress"))
        assert comps["compressor"] is None
        assert comps["tap_cfg"] is None
        assert not comps["optim_comp"].active

    def test_smart_full(self):
        comps = build_components(
            parse_args(
                "--compress smart --num_bits_main 6 --num_bits_outlier 8 "
                "--optimizer_type adamw --learning_rate 2e-5 --beta1 0.9 "
                "--beta2 0.98"
            )
        )
        assert comps["compressor"].params.num_bits_main == 6
        assert comps["optimizer_spec"].kind == "adamw"
        assert comps["optim_comp"].compress_momentum
        # stable momentum codecs are OPT-IN (reference semantics default)
        assert not comps["optim_comp"].momentum_rowwise
        assert not comps["optim_comp"].momentum_log_nu

    def test_stable_momentum_flags(self):
        comps = build_components(
            parse_args(
                "--compress smart --optimizer_type adamw "
                "--momentum_rowwise --momentum_log_nu"
            )
        )
        assert comps["optim_comp"].momentum_rowwise
        assert comps["optim_comp"].momentum_log_nu
        assert not comps["optim_comp"].momentum_log_nu_rowwise

    def test_log_nu_rowwise_implies_log_nu(self):
        comps = build_components(
            parse_args(
                "--compress smart --optimizer_type adamw "
                "--momentum_log_nu_rowwise"
            )
        )
        assert comps["optim_comp"].momentum_log_nu
        assert comps["optim_comp"].momentum_log_nu_rowwise

    def test_global_hook_mode(self):
        comps = build_components(
            parse_args("--compress smart --compression_hook_fn global_hook")
        )
        tap = comps["tap_cfg"]
        assert tap.tag == "forward_hook"
        assert not tap.compress_backward

    def test_scheduler_milestones_epochs_to_steps(self):
        comps = build_components(
            parse_args(
                "--compress fp32 --scheduler_type multi_step "
                "--scheduler_milestones 2 4 --learning_rate 1.0 "
                "--scheduler_gamma 0.1"
            ),
            steps_per_epoch=10,
        )
        lr = comps["optimizer_spec"]
        # schedule embedded in the optimizer; evaluate via the schedule fn
        import optax

        sched = optax.piecewise_constant_schedule(1.0, {20: 0.1, 40: 0.1})
        assert sched(0) == 1.0 and float(sched(25)) == pytest.approx(0.1)

    def test_fp16_precision_flag(self):
        comps = build_components(parse_args("--compress smart --precision 16"))
        assert comps["compressor"].params.std_clamp_hi == 1e4


def test_git_run_tag(tmp_path, monkeypatch):
    """--git tags the repo with run/<name> and returns the commit hash (the
    reference's TestTubeLogger create_git_tag, util/train.py:167,193)."""
    import subprocess

    from smart_quantization_tpu.utils.config import git_run_tag

    subprocess.run(["git", "init", "-q"], cwd=tmp_path, check=True)
    subprocess.run(
        ["git", "-c", "user.email=t@t", "-c", "user.name=t", "commit",
         "--allow-empty", "-m", "x", "-q"],
        cwd=tmp_path, check=True,
    )
    monkeypatch.chdir(tmp_path)
    commit = git_run_tag("myrun")
    assert commit and len(commit) == 40
    tags = subprocess.run(
        ["git", "tag"], cwd=tmp_path, capture_output=True, text=True
    ).stdout
    assert "run/myrun" in tags
    assert parse_args("--git").git


def test_max_time_and_fractional_limits():
    """--max_time DD:HH:MM:SS (Lightning format, scripts/train.ps1:1) and
    fractional --limit_train_batches (.vscode/launch.json:13) parse like the
    reference's Trainer flags."""
    from smart_quantization_tpu.utils.config import parse_max_time

    assert parse_max_time("00:00:00:10") == 10.0
    assert parse_max_time("01:02:03:04") == ((24 + 2) * 60 + 3) * 60 + 4
    assert parse_max_time("90") == 90.0
    args = parse_args("--max_time 00:00:01:00 --limit_train_batches 0.5")
    assert args.max_time == 60.0
    assert args.limit_train_batches == 0.5


def test_fractional_limit_resolution_and_max_time_stop():
    """The Trainer resolves fractions against the epoch length and stops at
    max_time_s without finishing the epoch."""
    import jax
    import numpy as np

    from smart_quantization_tpu.data.cifar import CIFAR10Data
    from smart_quantization_tpu.models.tiny import TinyCNN
    from smart_quantization_tpu.train.loop import TrainConfig, Trainer
    from smart_quantization_tpu.train.metrics import MetricLogger
    from smart_quantization_tpu.optim.compressed import build_optimizer

    data = CIFAR10Data(batch_size=64)  # synthetic: 2048 rows -> 32 steps
    assert Trainer._resolve_limit(0.25, data.steps_per_epoch) == 8
    assert Trainer._resolve_limit(3, 32) == 3
    assert Trainer._resolve_limit(None, 32) is None
    # Lightning semantics: float 1.0 = 100% of the epoch (no limit),
    # int 1 = exactly one batch (ADVICE r3)
    assert Trainer._resolve_limit(1.0, 32) is None
    assert Trainer._resolve_limit(1, 32) == 1
    assert Trainer._resolve_limit(5.0, 32) == 5
    assert data.val_steps_per_epoch > 0

    model = TinyCNN(num_classes=10, tap=None)
    trainer = Trainer(
        model, data, build_optimizer("sgd", 0.05),
        config=TrainConfig(epochs=50, log_every=1, max_time_s=0.0,
                           limit_val_batches=1),
        logger=MetricLogger(None),
    )
    state = trainer.fit()
    # max_time_s=0 stops at the first drain: exactly one step committed
    assert int(state.step) == 1
    assert np.isfinite(
        float(jax.tree.leaves(state.params)[0].sum())
    )
