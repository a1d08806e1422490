"""Two-phase CLI composition + experiment wiring.

Re-design of the reference's argparse hub
(/root/reference/smart_compress/util/train.py:74-219): phase 1 parses the
class selectors (--model / --dataset / --compress / --compression_hook_fn and
the per-structure compress toggles); phase 2 re-parses with the selected
components' own flags attached; the run name is auto-derived from
compressor + model + dataset + enabled-structure tags + timestamp
(util/train.py:15-49).
"""

from __future__ import annotations

import argparse
import time
from typing import Any

DATA_STRUCTURES = (
    "forward",
    "backward",
    "weights",
    "gradients",
    "momentum_vectors",
    "loss",
)


# --------------------------------------------------------------- arg groups
def add_compression_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--measure_compression_ratio", action="store_true")


def add_smart_args(parser: argparse.ArgumentParser) -> None:
    # mirrors SmartFP.add_argparse_args (compress/smart.py:11-70)
    add_compression_args(parser)
    parser.add_argument("--num_samples", type=int, default=16)
    parser.add_argument("--use_sample_stats", action="store_true")
    parser.add_argument(
        "--no_stochastic_rounding", action="store_false", dest="stochastic_rounding"
    )
    parser.add_argument("--num_bits_main", type=int, default=6)
    parser.add_argument("--num_bits_outlier", type=int, default=8)
    parser.add_argument("--main_std_dev_threshold", type=float, default=1.0)
    parser.add_argument("--outlier_std_dev_threshold", type=float, default=2.5)
    parser.add_argument("--min_size", type=int, default=8)
    parser.add_argument("--use_range_std_dev", action="store_true")
    parser.add_argument("--use_batch_norm", action="store_true")
    parser.add_argument("--bn_scalar_params", action="store_true")
    parser.add_argument("--no_pallas", action="store_false", dest="use_pallas")


def add_float_args(parser: argparse.ArgumentParser) -> None:
    # mirrors add_float_quantize_args (util/pytorch/quantization.py:153-160)
    add_compression_args(parser)
    parser.add_argument(
        "--no_float_quantize_check_inf",
        action="store_false",
        dest="float_quantize_check_inf",
    )


def add_model_base_args(parser: argparse.ArgumentParser) -> None:
    # mirrors BaseModule.add_argparse_args (models/base.py:43-71)
    parser.add_argument("--optimizer_type", choices=("sgd", "adam", "adamw"),
                        default="sgd")
    parser.add_argument("--scheduler_type", choices=("multi_step", "none"),
                        default="none")
    parser.add_argument("--scheduler_gamma", type=float, default=0.1)
    parser.add_argument("--scheduler_milestones", type=int, nargs="+",
                        default=[100, 150, 200])
    parser.add_argument("--learning_rate", type=float, default=0.1)
    parser.add_argument("--weight_decay", type=float, default=0.0)
    parser.add_argument("--momentum", type=float, default=0.9)
    parser.add_argument("--beta1", type=float)
    parser.add_argument("--beta2", type=float)
    parser.add_argument("--epsilon", type=float)
    parser.add_argument("--measure_average_grad_norm", action="store_true")


def add_resnet_args(parser: argparse.ArgumentParser) -> None:
    add_model_base_args(parser)
    parser.add_argument(
        "--resnet_model",
        choices=("resnet18", "resnet34", "resnet50"),
        default="resnet34",
    )


def add_inception_args(parser: argparse.ArgumentParser) -> None:
    add_model_base_args(parser)


def add_bert_args(parser: argparse.ArgumentParser) -> None:
    add_model_base_args(parser)
    parser.add_argument("--bert_model", type=str, default="bert-base-uncased")
    parser.add_argument("--no_pretrained", action="store_false", dest="pretrained")
    parser.add_argument("--freeze_bert_encoder", action="store_true")
    parser.add_argument(
        "--bert_size", choices=("base", "tiny"), default="base",
        help="tiny = 2-layer debug config for smokes",
    )


def add_cifar_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--val_batch_size", type=int)


def add_glue_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--val_batch_size", type=int)
    parser.add_argument("--glue_task", type=str, default="stsb")
    parser.add_argument("--max_input_length", type=int, default=512)


def add_imdb_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--val_batch_size", type=int)
    parser.add_argument("--max_input_length", type=int, default=512)


def add_trainer_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--max_epochs", type=int, default=1)
    parser.add_argument(
        "--max_time", type=parse_max_time, default=None,
        help="wall-clock training budget as DD:HH:MM:SS or plain seconds "
             "(the Lightning Trainer flag the reference's perf smoke uses, "
             "scripts/train.ps1:1 --max_time 00:00:00:10); fit() stops "
             "gracefully at the next drain point",
    )
    parser.add_argument("--auto_lr_find", action="store_true")
    parser.add_argument("--auto_scale_batch_size", action="store_true")
    parser.add_argument(
        "--limit_train_batches", type=float,
        help="cap train batches per epoch: an int count, or a 0<f<1 "
             "fraction of the epoch (Lightning semantics, the reference's "
             "debug config uses 0.5, .vscode/launch.json:13)",
    )
    parser.add_argument("--limit_val_batches", type=float)
    parser.add_argument("--log_every", type=int, default=50)
    parser.add_argument(
        "--no_terminate_on_nan", action="store_false", dest="terminate_on_nan"
    )
    parser.add_argument("--precision", type=int, default=32, choices=(16, 32))
    parser.add_argument(
        "--compute_dtype", type=str, default="float32",
        choices=("float32", "bfloat16"),
        help="model matmul/conv compute dtype (params, BN/LN stats, loss and "
             "quantizer math stay fp32).  bfloat16 doubles MXU throughput on "
             "TPU — a TPU-native extension over the reference",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--steps_per_call", type=int, default=1,
        help="train K steps per host dispatch (lax.scan over K batches); "
             "amortizes per-call RPC latency on relayed TPU backends "
             "(single-chip only)",
    )
    parser.add_argument(
        "--profile_dir", type=str,
        help="capture a jax.profiler trace of the first --profile_steps "
             "training steps into this directory (the reference's "
             "--profiler advanced role, util/train.py:191); quantizer time "
             "is attributed via jax.named_scope regions",
    )
    parser.add_argument("--profile_steps", type=int, default=10)
    parser.add_argument("--checkpoint_dir", type=str)
    parser.add_argument(
        "--resume_from", type=str,
        help="restore params/optimizer state from an orbax checkpoint "
             "directory (as written under --checkpoint_dir) before training",
    )
    parser.add_argument("--dp", type=int, help="data-parallel mesh size (devices)")
    parser.add_argument(
        "--fsdp", type=int, default=1,
        help="FSDP mesh size: shard params/optimizer state over this many "
             "devices (fused with the quantized collectives)",
    )
    parser.add_argument(
        "--param_gather_bits", type=int, default=None,
        help="quantize FSDP parameter all-gather payloads to N bits",
    )
    parser.add_argument(
        "--use_weight_accumulator", action="store_true",
        help="keep fp32 master weights; expose the quantized view (acc_quant)",
    )
    parser.add_argument(
        "--packed_momentum", action="store_true",
        help="persist SGD trace / Adam mu+nu as REAL uint8 SmaQ codebook "
             "codes (4x on-device + checkpoint reduction; requires "
             "--compress smart); the reference only simulates compression",
    )
    parser.add_argument(
        "--packed_weights", action="store_true",
        help="persist non-norm params as REAL uint8 SmaQ codebook codes, "
             "decoded at step entry (single-chip; requires --compress smart)",
    )
    parser.add_argument(
        "--momentum_log_nu", action="store_true",
        help="quantize Adam's second moment in log2 domain (uniform "
             "relative error, zeros preserved) — removes the exact-zero-nu "
             "denominator hazard (BASELINE.md round-4 root cause)",
    )
    parser.add_argument(
        "--momentum_rowwise", action="store_true",
        help="quantize optimizer momentum with per-row (leading-axis) stats "
             "instead of per-tensor — bounds the Adam noise amplification "
             "that destroys full-coverage fine-tunes (BASELINE.md round-4 "
             "root cause); 64 bits/row overhead, counted",
    )
    parser.add_argument(
        "--momentum_log_nu_rowwise", action="store_true",
        help="per-ROW masked log2 stats for Adam's second moment (tightens "
             "--momentum_log_nu; implies it); 64 bits/row overhead, counted",
    )
    parser.add_argument(
        "--grad_allreduce_bits", type=int, default=None,
        help="quantize gradient all-reduce payloads to N bits (DP mode)",
    )
    parser.add_argument(
        "--grad_allreduce_mode", default="auto",
        choices=["auto", "gather", "psum"],
        help="DP quantized all-reduce variant: gather = full per-shard "
             "precision, (n-1) B/elem; psum = headroom-grid int8 ring, "
             "~2 B/elem at any mesh size; auto = gather below 8 devices, "
             "psum at 8+ (traffic table in parallel/train_dp.py)",
    )


COMPRESSOR_ARGS = {
    "smart": add_smart_args,
    "fp8": add_float_args,
    "s2fp8": add_float_args,
    "fp16": add_float_args,
    "bf16": add_float_args,
    "fp32": add_compression_args,
}
MODEL_ARGS = {"resnet": add_resnet_args, "inception": add_inception_args,
              "bert": add_bert_args}
DATASET_ARGS = {"cifar10": add_cifar_args, "cifar100": add_cifar_args,
                "glue": add_glue_args, "imdb": add_imdb_args}

MODEL_DATASET_COMPAT = {
    "bert": ("glue", "imdb"),
    "resnet": ("cifar10", "cifar100"),
    "inception": ("cifar10", "cifar100"),
}


def default_name(args: argparse.Namespace) -> str:
    # util/train.py:15-49
    tags = ",".join(
        ds for ds in DATA_STRUCTURES
        if args.compress_enabled and getattr(args, f"compress_{ds}", False)
    )
    return "-".join(
        (
            args.compress,
            args.model,
            args.dataset,
            tags,
            args.tags or "",
            time.strftime("%Y%m%d_%H%M%S"),
        )
    ).lower()


def parse_args(argv: list[str] | str | None = None) -> argparse.Namespace:
    if isinstance(argv, str):
        argv = argv.split(" ")

    phase1 = argparse.ArgumentParser(add_help=False)
    phase1.add_argument("--model", choices=sorted(MODEL_ARGS), default="resnet")
    phase1.add_argument("--dataset", choices=sorted(DATASET_ARGS), default="cifar10")
    phase1.add_argument("--no_compress", action="store_false", dest="compress_enabled")
    phase1.add_argument(
        "--compress", choices=sorted(COMPRESSOR_ARGS), default="fp32"
    )
    phase1.add_argument(
        "--compression_hook_fn", choices=("autograd", "global_hook"),
        default="autograd",
    )
    phase1.add_argument(
        "--no_compress_forward", action="store_false", dest="compress_forward"
    )
    phase1.add_argument(
        "--no_compress_backward", action="store_false", dest="compress_backward"
    )
    phase1.add_argument(
        "--no_compress_weights", action="store_false", dest="compress_weights"
    )
    phase1.add_argument(
        "--no_compress_gradients", action="store_false", dest="compress_gradients"
    )
    phase1.add_argument(
        "--no_compress_momentum_vectors",
        action="store_false",
        dest="compress_momentum_vectors",
    )
    phase1.add_argument("--compress_loss", action="store_true")
    phase1.add_argument(
        "--git", action="store_true",
        help="tag the repository with run/<name> and record the commit hash "
             "in the run's metrics header (the reference's TestTubeLogger "
             "create_git_tag, util/train.py:167,193)",
    )
    phase1.add_argument("--no_add_tags", action="store_false", dest="add_tags")
    phase1.add_argument("--name", type=str)
    phase1.add_argument("--logdir", type=str, default="lightning_logs")
    phase1.add_argument("--tags", type=str)
    args1, _ = phase1.parse_known_args(argv)

    # model/dataset compatibility asserts (util/train.py:173-178)
    if args1.dataset not in MODEL_DATASET_COMPAT[args1.model]:
        raise SystemExit(
            f"--model {args1.model} is incompatible with --dataset {args1.dataset}"
        )

    phase2 = argparse.ArgumentParser(parents=[phase1])
    COMPRESSOR_ARGS[args1.compress](phase2)
    MODEL_ARGS[args1.model](phase2)
    DATASET_ARGS[args1.dataset](phase2)
    add_trainer_args(phase2)
    args = phase2.parse_args(argv)

    if not args.name:
        args.name = default_name(args)
    elif args.tags:
        args.name += f"-{args.tags}"
    return args


def parse_max_time(s: str) -> float:
    """``DD:HH:MM:SS`` (the Lightning format) or plain seconds -> seconds."""
    parts = s.split(":")
    if len(parts) == 1:
        return float(s)
    if len(parts) != 4:
        raise argparse.ArgumentTypeError(
            f"--max_time wants DD:HH:MM:SS or seconds, got {s!r}"
        )
    d, h, m, sec = (int(p) for p in parts)
    return float(((d * 24 + h) * 60 + m) * 60 + sec)


def git_run_tag(name: str, create_tag: bool = True) -> str | None:
    """Record the current commit for a run and (optionally) tag the repo as
    ``run/<name>`` — the reference's TestTubeLogger ``create_git_tag=--git``
    (util/train.py:167,193).  Returns the commit hash, or None outside a git
    checkout."""
    import subprocess

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True, check=True, timeout=10,
        ).stdout.strip()
    except Exception:
        return None
    if create_tag:
        subprocess.run(
            ["git", "tag", "-f", f"run/{name}"],
            capture_output=True, timeout=10,
        )
    return commit or None


def build_components(
    args: argparse.Namespace, steps_per_epoch: int | None = None
) -> dict[str, Any]:
    """Instantiate compressor / model / data / optimizer from parsed args.

    ``steps_per_epoch`` converts the reference's epoch-indexed MultiStepLR
    milestones (models/base.py:34-39) into step boundaries."""
    from smart_quantization_tpu.compress import build_compressor
    from smart_quantization_tpu.inject.tap import TapConfig
    from smart_quantization_tpu.optim.compressed import (
        OptimizerCompression,
        build_optimizer,
    )

    compressor = None
    if args.compress_enabled:
        opts: dict[str, Any] = {"precision": args.precision}
        if args.compress == "smart":
            opts.update(
                num_samples=args.num_samples,
                use_sample_stats=args.use_sample_stats,
                stochastic_rounding=args.stochastic_rounding,
                num_bits_main=args.num_bits_main,
                num_bits_outlier=args.num_bits_outlier,
                main_std_dev_threshold=args.main_std_dev_threshold,
                outlier_std_dev_threshold=args.outlier_std_dev_threshold,
                min_size=args.min_size,
                use_range_std_dev=args.use_range_std_dev,
                use_batch_norm=args.use_batch_norm,
                bn_scalar_params=args.bn_scalar_params,
                use_pallas=args.use_pallas,
                # skip the fused kernel's in-kernel size accounting when the
                # ratio telemetry is off (the reference's default)
                measure_sizes=getattr(args, "measure_compression_ratio", True),
            )
        elif args.compress in ("fp8", "s2fp8", "fp16", "bf16"):
            opts.update(check_inf=args.float_quantize_check_inf)
        compressor = build_compressor(args.compress, **opts)

    tap_cfg = TapConfig(
        compressor=compressor,
        compress_forward=args.compress_forward,
        compress_backward=args.compress_backward,
        use_batch_norm=getattr(args, "use_batch_norm", False),
    ) if compressor is not None else None
    if tap_cfg is not None and args.compression_hook_fn == "global_hook":
        tap_cfg = tap_cfg.as_global_hook()

    optim_comp = OptimizerCompression(
        compressor=compressor,
        compress_weights=args.compress_weights,
        compress_gradients=args.compress_gradients,
        compress_momentum=args.compress_momentum_vectors,
        use_weight_accumulator=getattr(args, "use_weight_accumulator", False),
        packed_momentum=getattr(args, "packed_momentum", False),
        packed_weights=getattr(args, "packed_weights", False),
        momentum_rowwise=getattr(args, "momentum_rowwise", False),
        momentum_log_nu=(
            getattr(args, "momentum_log_nu", False)
            or getattr(args, "momentum_log_nu_rowwise", False)
        ),
        momentum_log_nu_rowwise=getattr(
            args, "momentum_log_nu_rowwise", False
        ),
    ) if compressor is not None else OptimizerCompression()
    if optim_comp.packed_momentum or optim_comp.packed_weights:
        from smart_quantization_tpu.optim.compressed import packed_smaq_params

        packed_smaq_params(optim_comp)  # fail fast on incompatible configs
        if optim_comp.packed_momentum and (
            optim_comp.momentum_rowwise or optim_comp.momentum_log_nu
        ):
            raise ValueError(
                "--packed_momentum stores per-tensor linear uint8 codebooks "
                "and cannot honor --momentum_rowwise/--momentum_log_nu; "
                "pick one momentum representation"
            )
        if optim_comp.packed_momentum and not optim_comp.compress_momentum:
            raise ValueError(
                "--packed_momentum requires momentum compression; drop "
                "--no_compress_momentum_vectors"
            )
        if optim_comp.packed_weights and not optim_comp.compress_weights:
            raise ValueError(
                "--packed_weights requires weight compression; drop "
                "--no_compress_weights"
            )

    lr = args.learning_rate
    if args.scheduler_type == "multi_step":
        import optax

        spe = steps_per_epoch or 1
        steps = {m * spe: args.scheduler_gamma for m in args.scheduler_milestones}
        lr = optax.piecewise_constant_schedule(args.learning_rate, steps)
    spec = build_optimizer(
        args.optimizer_type,
        lr,
        momentum=args.momentum,
        weight_decay=args.weight_decay,
        beta1=args.beta1,
        beta2=args.beta2,
        epsilon=args.epsilon,
    )

    return dict(
        compressor=compressor,
        tap_cfg=tap_cfg,
        optim_comp=optim_comp,
        optimizer_spec=spec,
        scheduler_is_epochwise=args.scheduler_type == "multi_step",
    )
