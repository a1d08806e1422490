#!/usr/bin/env python
"""Train entry point (the reference's train.py:1-9 equivalent).

Examples:
  python train.py --model resnet --dataset cifar10 --compress smart \
      --num_bits_main 6 --num_bits_outlier 8 --measure_compression_ratio \
      --max_epochs 5 --batch_size 128
  python train.py --compress fp32 --max_epochs 1 --limit_train_batches 10
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    from smart_quantization_tpu.utils.cache import enable_compilation_cache
    from smart_quantization_tpu.utils.config import build_components, parse_args

    enable_compilation_cache()

    args = parse_args(argv)
    print(f"run name: {args.name}")
    if args.git:
        from smart_quantization_tpu.utils.config import git_run_tag

        args._git_commit = git_run_tag(args.name)
        if args._git_commit:
            print(f"git: tagged run/{args.name} at {args._git_commit[:12]}")

    import jax

    from smart_quantization_tpu.data.cifar import CIFAR10Data, CIFAR100Data
    from smart_quantization_tpu.models.inception import inception_v3
    from smart_quantization_tpu.models.resnet import resnet18, resnet34, resnet50
    from smart_quantization_tpu.train.loop import TrainConfig, Trainer
    from smart_quantization_tpu.train.metrics import MetricLogger

    if args.model == "bert":
        from smart_quantization_tpu.train.bert_loop import run_bert

        return run_bert(args)

    data_cls = {"cifar10": CIFAR10Data, "cifar100": CIFAR100Data}[args.dataset]
    data = data_cls(batch_size=args.batch_size, val_batch_size=args.val_batch_size)
    comps = build_components(args, steps_per_epoch=data.steps_per_epoch)
    if data.synthetic:
        print("NOTE: CIFAR archives not found under $SMAQ_DATA_DIR; "
              "using the synthetic stand-in dataset.")

    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    if args.model == "resnet":
        model_fn = {"resnet18": resnet18, "resnet34": resnet34,
                    "resnet50": resnet50}[args.resnet_model]
    else:
        model_fn = inception_v3
    model = model_fn(num_classes=data.num_classes, tap=comps["tap_cfg"],
                     dtype=dtype)

    cfg = TrainConfig(
        epochs=args.max_epochs,
        log_every=args.log_every,
        terminate_on_nan=args.terminate_on_nan,
        compress_loss=args.compress_loss,
        measure_compression_ratio=args.measure_compression_ratio,
        checkpoint_dir=args.checkpoint_dir,
        limit_train_batches=args.limit_train_batches,
        limit_val_batches=args.limit_val_batches,
        max_time_s=args.max_time,
        seed=args.seed,
        measure_average_grad_norm=args.measure_average_grad_norm,
        steps_per_call=args.steps_per_call,
        profile_dir=args.profile_dir,
        profile_steps=args.profile_steps,
    )
    logger = MetricLogger(args.logdir, args.name)
    if getattr(args, "_git_commit", None):
        logger.header({"git_commit": args._git_commit, "name": args.name})
    mesh = None
    fsdp = getattr(args, "fsdp", 1) or 1
    if (args.dp and args.dp > 1) or fsdp > 1:
        from smart_quantization_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=args.dp, fsdp=fsdp)
        print(f"mesh: dp={mesh.shape['data']} x fsdp={mesh.shape['fsdp']}; "
              f"grad bits: {args.grad_allreduce_bits or 'fp32'}; "
              f"param-gather bits: {args.param_gather_bits or 'fp32'}")
    trainer = Trainer(
        model,
        data,
        comps["optimizer_spec"],
        tap_cfg=comps["tap_cfg"],
        optim_comp=comps["optim_comp"],
        loss_compressor=comps["compressor"],
        config=cfg,
        logger=logger,
        mesh=mesh,
        grad_allreduce_bits=args.grad_allreduce_bits,
        grad_allreduce_mode=args.grad_allreduce_mode,
        param_gather_bits=args.param_gather_bits,
    )
    if args.auto_scale_batch_size:
        import jax.numpy as jnp
        import numpy as np

        from smart_quantization_tpu.train.tune import auto_scale_batch_size

        def try_batch(bs):
            st = trainer.init_state(jax.random.key(0))
            step = trainer.build_train_step(st)
            step(
                st,
                jnp.zeros((bs, 32, 32, 3), jnp.uint8),
                jnp.zeros((bs,), jnp.int32),
                jax.random.key(1),
            )

        best = auto_scale_batch_size(try_batch, init_size=args.batch_size)
        print(f"auto_scale_batch_size: {best}")
        data.batch_size = best
    if args.auto_lr_find:
        from smart_quantization_tpu.optim.compressed import build_optimizer
        from smart_quantization_tpu.train.tune import auto_lr_find

        lr = auto_lr_find(trainer)
        print(f"auto_lr_find suggestion: {lr:.3e}")
        trainer.spec = build_optimizer(
            args.optimizer_type, lr, momentum=args.momentum,
            weight_decay=args.weight_decay, beta1=args.beta1,
            beta2=args.beta2, epsilon=args.epsilon,
        )
        trainer._train_step = None
    state = None
    if getattr(args, "resume_from", None):
        from smart_quantization_tpu.train.loop import restore_checkpoint

        state = restore_checkpoint(
            args.resume_from, trainer.init_state(jax.random.key(args.seed))
        )
        print(f"resumed from {args.resume_from} at step {int(state.step)}")
    state = trainer.fit(state)
    final = trainer.evaluate(state)
    final.update(trainer.ratio_acc.summary())
    print("final:", final)
    return final


if __name__ == "__main__":
    main()
