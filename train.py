#!/usr/bin/env python
"""Train the Siamese Attention U-Net for change detection (TPU-native).

CLI contract identical to the reference train.py:325-337:
  python train.py [--root-dir D] [--dataset-subdir S] [--synthetic-data-dir S]
                  [--checkpoint-dir D] [--batch-size N] [--num-epochs N]
                  [--learning-rate F] [--target-size HxW] [--save-every N]
                  [--use-synthetic] [--tune]
plus TPU-build extensions: --augment, --resume, --seed, --compute-dtype,
--no-data-parallel, --n-trials (flagged as additions, defaults preserve
reference behavior — including the reference's augment=False main-training
quirk, SURVEY.md §2 #16).
"""

import argparse

from gan_aug_pfa_tpu.config import (
    DATASET_SUBDIR_DEFAULT,
    SYNTHETIC_DATA_DIR_DEFAULT,
    DataConfig,
    SiameseTrainConfig,
    parse_target_size,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Train Siamese U-Net for Change Detection"
    )
    p.add_argument("--root-dir", type=str, default=".",
                   help="Root project directory")
    p.add_argument("--dataset-subdir", type=str,
                   default=DATASET_SUBDIR_DEFAULT,
                   help="Subdirectory for the Onera dataset")
    p.add_argument("--synthetic-data-dir", type=str,
                   default=SYNTHETIC_DATA_DIR_DEFAULT,
                   help="Directory for synthetic data")
    p.add_argument("--checkpoint-dir", type=str,
                   default="siamese_checkpoints",
                   help="Directory to save model checkpoints")
    p.add_argument("--batch-size", type=int, default=4,
                   help="Training batch size")
    p.add_argument("--num-epochs", type=int, default=50,
                   help="Number of training epochs")
    p.add_argument("--learning-rate", type=float,
                   default=0.00010152447097322304,
                   help="Initial learning rate")
    p.add_argument("--target-size", type=str, default="128x128",
                   help="Target image size HxW (e.g., 128x128)")
    p.add_argument("--save-every", type=int, default=5,
                   help="Save checkpoint every N epochs")
    p.add_argument("--use-synthetic", action="store_true",
                   help="Include synthetic data during training")
    p.add_argument("--tune", action="store_true",
                   help="Run hyperparameter tuning")
    # TPU-build extensions:
    p.add_argument("--augment", action="store_true",
                   help="[extension] enable joint augmentation in main "
                        "training (the reference only augments under --tune)")
    p.add_argument("--native-aug", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="[extension] augment at each sample's NATIVE "
                        "resolution and resize to target as chain step 5 "
                        "(the reference's augment-then-resize order, "
                        "dataset.py:172-193); DEFAULT ON for --tune and "
                        "--augment.  --no-native-aug augments the "
                        "pre-resized cache instead (fixed-shape perf mode)")
    p.add_argument("--stream", type=str, default="hbm",
                   choices=["hbm", "host", "decode"],
                   help="[extension] train-data placement: 'hbm' keeps the "
                        "decoded corpus device-resident (default, fastest "
                        "for small corpora); 'host' keeps it in host RAM "
                        "and double-buffers batches to HBM per step "
                        "(corpora larger than HBM); 'decode' re-decodes "
                        "batches on demand (larger than host RAM)")
    p.add_argument("--resume", action="store_true",
                   help="[extension] resume from the last saved state")
    p.add_argument("--seed", type=int, default=0, help="[extension] PRNG seed")
    p.add_argument("--compute-dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="[extension] model compute dtype")
    p.add_argument("--no-data-parallel", action="store_true",
                   help="[extension] disable multi-device data parallelism")
    p.add_argument("--n-trials", type=int, default=50,
                   help="[extension] number of tuning trials for --tune")
    p.add_argument("--parallel-trials", type=int, default=1,
                   help="[extension] run N trials concurrently, one "
                        "data-parallel trial per device-slice partition")
    p.add_argument("--fused-loss", action="store_true",
                   help="[extension] use the single-pass Pallas FocalDice "
                        "kernel (ops/pallas_kernels/fused_loss.py)")
    p.add_argument("--pallas-augment", action="store_true", default=None,
                   help="[extension] force the fused Pallas photometric "
                        "kernel ON (default: auto — ON for the native-"
                        "resolution augment chain on TPU, where it wins "
                        "2.2x on the full train step; OFF otherwise)")
    p.add_argument("--no-pallas-augment", dest="pallas_augment",
                   action="store_false",
                   help="[extension] force the Pallas photometric kernel "
                        "OFF (pure-XLA augmentation)")
    p.add_argument("--batched-encoder", action="store_true",
                   help="[extension] run the shared Siamese encoder as one "
                        "2B-batch pass (~15%% faster; train-mode BN stats "
                        "become joint over both images)")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="[extension] write a jax.profiler trace + per-step "
                        "timing stats")
    p.add_argument("--debug-nans", action="store_true",
                   help="[extension] enable the jax_debug_nans sanitizer")
    p.add_argument("--concat-free", action="store_true",
                   help="[extension] decoder fast path: skip-concats stay "
                        "as slice tuples consumed by kernel-sliced convs "
                        "(no HBM concatenates; numerically equivalent)")
    p.add_argument("--no-compile-cache", action="store_true",
                   help="[extension] disable the persistent XLA compilation "
                        "cache (utils/compile_cache.py)")
    p.add_argument("--momentum-dtype", type=str, default=None,
                   choices=["bfloat16", "float32"],
                   help="[extension] dtype for Adam's first-moment state "
                        "(default: param dtype, torch-exact; bfloat16 "
                        "halves one optimizer state tensor's HBM traffic)")
    p.add_argument("--flat-opt-state", action="store_true",
                   help="[extension] run the optimizer update on one "
                        "concatenated vector (optax.flatten): 2 large "
                        "moment buffers instead of ~200 small ones; same "
                        "arithmetic, different opt-state checkpoint layout")
    p.add_argument("--defer-best-ckpt", action="store_true",
                   help="[extension] keep the best model as a device-HBM "
                        "snapshot; write best_model.msgpack on the "
                        "save-every cadence instead of every improving "
                        "epoch (avoids ~165 MB device->host pulls per "
                        "improvement on slow links)")
    p.add_argument("--remat", action="store_true",
                   help="[extension] rematerialize U-Net block activations "
                        "in the backward pass (jax.checkpoint): fits "
                        "larger batches/resolutions in HBM for ~1/3 more "
                        "conv FLOPs; identical math")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="[extension] average gradients over K steps and "
                        "apply one optimizer update (emulates "
                        "batch-size*K beyond HBM; BN stats stay "
                        "per-mini-batch)")
    p.add_argument("--async-ckpt", action="store_true",
                   help="[extension] write checkpoints on a background "
                        "thread (device-side snapshot first; the "
                        "device->host pull overlaps later epochs)")
    p.add_argument("--early-stop", type=int, default=0, metavar="N",
                   help="[extension] stop after N consecutive epochs "
                        "without validation-loss improvement (0 = off, "
                        "reference behavior: always run --num-epochs); "
                        "the bad-epoch count rides the resume state")
    p.add_argument("--log-jsonl", type=str, default=None,
                   help="[extension] append machine-readable run events "
                        "(run_start/epoch/checkpoint/preemption/run_end) "
                        "as one JSON object per line to this file; "
                        "--resume appends to the same file")
    return p


def main() -> None:
    args = build_parser().parse_args()
    if not args.no_compile_cache:
        from gan_aug_pfa_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()
    try:
        target_size = parse_target_size(args.target_size)
    except ValueError:
        print("Error: target_size must be in format HxW (e.g., 128x128)")
        return
    data_cfg = DataConfig(
        root_dir=args.root_dir,
        dataset_subdir=args.dataset_subdir,
        synthetic_data_dir=args.synthetic_data_dir,
        target_size=target_size,
        use_synthetic=args.use_synthetic,
        augment=args.augment,
        native_aug=args.native_aug,
        stream=args.stream,
    )
    if args.tune:
        if args.stream != "hbm":
            print(
                "--stream applies only to main training; tuning trials "
                "use the HBM-resident cache (their datasets are rebuilt "
                "per trial at tuning batch sizes)."
            )
        from gan_aug_pfa_tpu.tune import run_tuning

        run_tuning(data_cfg, n_trials=args.n_trials,
                   n_parallel=args.parallel_trials,
                   native_aug=args.native_aug)
        return
    train_cfg = SiameseTrainConfig(
        batch_size=args.batch_size,
        num_epochs=args.num_epochs,
        learning_rate=args.learning_rate,
        checkpoint_dir=args.checkpoint_dir,
        save_every=args.save_every,
        seed=args.seed,
        compute_dtype=args.compute_dtype,
        data_parallel=not args.no_data_parallel,
        resume=args.resume,
        fused_loss=args.fused_loss,
        pallas_augment=args.pallas_augment,
        batched_encoder=args.batched_encoder,
        concat_free=args.concat_free,
        opt_momentum_dtype=args.momentum_dtype,
        opt_flat_state=args.flat_opt_state,
        grad_accum=args.grad_accum,
        remat=args.remat,
        defer_best_ckpt=args.defer_best_ckpt,
        async_ckpt=args.async_ckpt,
        profile_dir=args.profile_dir,
        debug_nans=args.debug_nans,
        log_jsonl=args.log_jsonl,
        early_stop_patience=args.early_stop,
    )
    from gan_aug_pfa_tpu.parallel.mesh import maybe_distributed_init
    from gan_aug_pfa_tpu.pipelines import run_siamese_training

    maybe_distributed_init()
    run_siamese_training(data_cfg, train_cfg)


if __name__ == "__main__":
    main()
