#!/usr/bin/env python
"""Generate the synthetic training corpus with a trained Pix2Pix generator.

Reference generate_synthetic_data.py has no argparse (constants at :13-24);
invocation compatibility is `python generate_synthetic_data.py`.  Flags added
for the previously hardcoded constants, same defaults.  Output layout is the
reference's contract: synthetic_data/images/[city]/img{1,2}_synth_N.png +
synthetic_data/labels/[city]/cm_synth_N.png, uint8 PNGs produced by the
same truncating float->byte conversion.
"""

import argparse

from gan_aug_pfa_tpu.config import (
    DATASET_SUBDIR_DEFAULT,
    SYNTHETIC_DATA_DIR_DEFAULT,
    DataConfig,
    GenerateConfig,
    parse_target_size,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Generate synthetic change data")
    p.add_argument("--root-dir", type=str, default=".")
    p.add_argument("--dataset-subdir", type=str,
                   default=DATASET_SUBDIR_DEFAULT)
    p.add_argument("--synthetic-data-dir", type=str,
                   default=SYNTHETIC_DATA_DIR_DEFAULT)
    p.add_argument("--gan-checkpoint-dir", type=str, default="gan_checkpoints")
    p.add_argument("--generator-checkpoint-name", type=str,
                   default="generator_epoch_200.msgpack")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--target-size", type=str, default="256x256",
                   help="Must match GAN training size")
    p.add_argument("--compute-dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="[extension] generator inference dtype (float32 "
                        "default for bit-comparable PNG outputs)")
    p.add_argument("--num-downs", type=int, default=7,
                   help="[extension] generator U-Net depth; must match "
                        "the checkpoint (train_gan.py --num-downs)")
    p.add_argument("--ngf", type=int, default=64,
                   help="[extension] generator base filter count; must "
                        "match the checkpoint")
    p.add_argument("--stream", type=str, default="hbm",
                   choices=["hbm", "host", "decode"],
                   help="[extension] corpus placement: 'hbm' stages the "
                        "whole corpus device-resident (default); 'host' "
                        "keeps it in host RAM, staging per batch; 'decode' "
                        "re-decodes per batch (corpora beyond host RAM)")
    p.add_argument("--no-compile-cache", action="store_true",
                   help="[extension] disable the persistent XLA compilation cache")
    p.add_argument("--serving-artifact", type=str, default=None,
                   help="[extension] use a pre-exported generator serving "
                        "artifact (export_model.py) instead of the "
                        "checkpoint; with an AOT sidecar "
                        "(--aot-batch-sizes) this stage pays no XLA "
                        "compile")
    p.add_argument("--serving-aot", type=str, default="auto",
                   choices=["auto", "never", "require"],
                   help="[extension] AOT sidecar policy for "
                        "--serving-artifact: auto uses a valid .aotc, "
                        "never ignores it (on a slow remote link the "
                        "executable upload can cost more than the compile "
                        "it skips), require fails without one")
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
        synthetic_data_dir=args.synthetic_data_dir,
        target_size=target_size,
        stream=args.stream,
    )
    gen_cfg = GenerateConfig(
        batch_size=args.batch_size,
        target_size=target_size,
        generator_checkpoint_name=args.generator_checkpoint_name,
        gan_checkpoint_dir=args.gan_checkpoint_dir,
        synthetic_data_dir=args.synthetic_data_dir,
        num_downs=args.num_downs,
        ngf=args.ngf,
        compute_dtype=args.compute_dtype,
        serving_artifact=args.serving_artifact,
        serving_aot=args.serving_aot,
    )
    from gan_aug_pfa_tpu.pipelines import run_generate_synthetic

    run_generate_synthetic(data_cfg, gen_cfg)


if __name__ == "__main__":
    main()
