#!/usr/bin/env python
"""Train the Pix2Pix GAN for change-data augmentation (TPU-native).

The reference train_gan.py has NO argparse (module constants only,
train_gan.py:17-35); invocation compatibility is `python train_gan.py`.
This build adds flags for everything that was a hardcoded constant
(defaults identical to the reference's constants).
"""

import argparse

from gan_aug_pfa_tpu.config import (
    DATASET_SUBDIR_DEFAULT,
    DataConfig,
    GANTrainConfig,
    parse_target_size,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Train Pix2Pix GAN for change-data augmentation"
    )
    p.add_argument("--root-dir", type=str, default=".")
    p.add_argument("--dataset-subdir", type=str,
                   default=DATASET_SUBDIR_DEFAULT)
    p.add_argument("--checkpoint-dir", type=str, default="gan_checkpoints")
    p.add_argument("--output-dir", type=str, default="gan_samples")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--num-epochs", type=int, default=200)
    p.add_argument("--learning-rate-g", type=float, default=1e-4)
    p.add_argument("--learning-rate-d", type=float, default=1e-4)
    p.add_argument("--beta1", type=float, default=0.5)
    p.add_argument("--lambda-l1", type=float, default=100.0)
    p.add_argument("--target-size", type=str, default="256x256")
    p.add_argument("--save-every", type=int, default=10)
    p.add_argument("--sample-every", type=int, default=5)
    p.add_argument("--num-downs", type=int, default=7,
                   help="[extension] generator U-Net depth (reference "
                        "UNetGenerator num_downs constructor arg, "
                        "models.py:149); must be >= 5, and target size "
                        "must be >= 2**N")
    p.add_argument("--ngf", type=int, default=64,
                   help="[extension] generator base filter count")
    p.add_argument("--ndf", type=int, default=64,
                   help="[extension] discriminator base filter count")
    p.add_argument("--n-layers", type=int, default=3,
                   help="[extension] discriminator depth (reference "
                        "NLayerDiscriminator n_layers, models.py:212)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute-dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--no-data-parallel", action="store_true")
    p.add_argument("--stream", type=str, default="hbm",
                   choices=["hbm", "host", "decode"],
                   help="[extension] train-data placement: 'hbm' keeps the "
                        "decoded corpus device-resident (default); 'host' "
                        "keeps it in host RAM, staging batches per step; "
                        "'decode' re-decodes batches on demand")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--batched-disc", action="store_true",
                   help="one 2B discriminator pass over [real|fake] (~8%% "
                        "faster; D's BN batch stats mix real and fake)")
    p.add_argument("--concat-free-disc", action="store_true",
                   help="[extension] feed D the (A,B) pair; first conv "
                        "runs as a split-kernel sum, skipping the "
                        "6-channel HBM concat (numerically equivalent)")
    p.add_argument("--shared-gen-fwd", action="store_true",
                   help="[extension] compute the generator forward once "
                        "per step (jax.vjp) instead of the reference's "
                        "twice; same losses/gradients, BN running stats "
                        "reconstructed to ~1e-7")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="write a jax.profiler trace + per-step timing stats")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable the jax_debug_nans numeric sanitizer")
    p.add_argument("--no-compile-cache", action="store_true",
                   help="[extension] disable the persistent XLA compilation cache")
    p.add_argument("--ema-decay", type=float, default=None,
                   help="[extension] keep an exponential moving average of "
                        "the generator weights (e.g. 0.999), updated inside "
                        "the compiled step; saved as generator_ema_epoch_N"
                        ".msgpack — a regular generator checkpoint usable "
                        "by generate_synthetic_data.py")
    p.add_argument("--momentum-dtype", type=str, default=None,
                   choices=["bfloat16", "float32"],
                   help="[extension] dtype for Adam's first-moment state "
                        "(default: param dtype, torch-exact)")
    p.add_argument("--flat-opt-state", action="store_true",
                   help="[extension] optimizer update on one concatenated "
                        "vector (optax.flatten; see train.py --help)")
    p.add_argument("--async-ckpt", action="store_true",
                   help="[extension] write checkpoints on a background "
                        "thread (see train.py --help)")
    p.add_argument("--log-jsonl", type=str, default=None,
                   help="[extension] append machine-readable run events "
                        "(run_start/epoch/checkpoint/sample/preemption/"
                        "run_end) as one JSON object per line to this "
                        "file; --resume appends to the same file")
    return p


def main() -> None:
    args = build_parser().parse_args()
    if not args.no_compile_cache:
        from gan_aug_pfa_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()
    target_size = parse_target_size(args.target_size)
    data_cfg = DataConfig(
        root_dir=args.root_dir,
        dataset_subdir=args.dataset_subdir,
        target_size=target_size,
        stream=args.stream,
    )
    gan_cfg = GANTrainConfig(
        batch_size=args.batch_size,
        num_epochs=args.num_epochs,
        learning_rate_g=args.learning_rate_g,
        learning_rate_d=args.learning_rate_d,
        beta1=args.beta1,
        lambda_l1=args.lambda_l1,
        target_size=target_size,
        save_every=args.save_every,
        sample_every=args.sample_every,
        checkpoint_dir=args.checkpoint_dir,
        output_dir=args.output_dir,
        num_downs=args.num_downs,
        ngf=args.ngf,
        ndf=args.ndf,
        n_layers=args.n_layers,
        seed=args.seed,
        compute_dtype=args.compute_dtype,
        data_parallel=not args.no_data_parallel,
        resume=args.resume,
        batched_disc=args.batched_disc,
        concat_free_disc=args.concat_free_disc,
        shared_gen_fwd=args.shared_gen_fwd,
        ema_decay=args.ema_decay,
        opt_momentum_dtype=args.momentum_dtype,
        opt_flat_state=args.flat_opt_state,
        async_ckpt=args.async_ckpt,
        profile_dir=args.profile_dir,
        debug_nans=args.debug_nans,
        log_jsonl=args.log_jsonl,
    )
    from gan_aug_pfa_tpu.parallel.mesh import maybe_distributed_init
    from gan_aug_pfa_tpu.pipelines import run_gan_training

    maybe_distributed_init()
    run_gan_training(data_cfg, gan_cfg)


if __name__ == "__main__":
    main()
