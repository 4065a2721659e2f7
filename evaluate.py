#!/usr/bin/env python
"""Evaluate the change-detection model: full-dataset metrics + visualizations,
or single-pair mode.

CLI contract identical to the reference evaluate.py:358-362:
  python evaluate.py [--image1-path P --image2-path P --city-name N
                      [--label-path P]]
plus flags for previously hardcoded constants (evaluate.py:15-28), same
defaults.
"""

import argparse

from gan_aug_pfa_tpu.config import (
    DATASET_SUBDIR_DEFAULT,
    DataConfig,
    EvalConfig,
    parse_target_size,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Evaluate Change Detection Model")
    p.add_argument("--image1-path", type=str,
                   help="Path to the first image (before change)")
    p.add_argument("--image2-path", type=str,
                   help="Path to the second image (after change)")
    p.add_argument("--label-path", type=str, default=None,
                   help="Optional path to the ground truth change mask")
    p.add_argument("--city-name", type=str,
                   help="Name of the city/area for identification in output")
    p.add_argument("--root-dir", type=str, default=".")
    p.add_argument("--dataset-subdir", type=str,
                   default=DATASET_SUBDIR_DEFAULT)
    p.add_argument("--checkpoint-path", type=str, default=None,
                   help="Model checkpoint (default "
                        "<root>/siamese_checkpoints/best_model.msgpack)")
    p.add_argument("--output-dir", type=str, default="evaluation_results")
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--target-size", type=str, default="128x128",
                   help="Must match the size used for training")
    p.add_argument("--num-visualizations", type=int, default=5)
    p.add_argument("--post-process", action="store_true",
                   help="Morphological opening+closing on predictions "
                        "(the reference README's Step 6, implemented)")
    p.add_argument("--post-process-kernel", type=int, default=3,
                   help="Structuring-element side for --post-process")
    p.add_argument("--ensemble", type=str, nargs="+", default=None,
                   metavar="CKPT",
                   help="Two or more checkpoints to ensemble by averaging "
                        "sigmoid probabilities (the reference README's "
                        "Step 7, implemented)")
    p.add_argument("--threshold", type=float, default=0.5,
                   help="[extension] decision threshold for the metrics "
                        "(the reference hardcodes 0.5)")
    p.add_argument("--threshold-sweep", action="store_true",
                   help="[extension] also report macro-F1/IoU over a "
                        "0.05..0.95 threshold grid and the best operating "
                        "point")
    p.add_argument("--stream", type=str, default="hbm",
                   choices=["hbm", "host", "decode"],
                   help="[extension] corpus placement: 'hbm' stages the "
                        "whole corpus device-resident (default); 'host' "
                        "keeps it in host RAM, staging per batch; 'decode' "
                        "re-decodes per batch (corpora beyond host RAM)")
    p.add_argument("--json-out", type=str, default=None,
                   help="[extension] also write the full metrics report "
                        "(overall + per-city means + sweep) as one JSON "
                        "file at this path")
    p.add_argument("--no-compile-cache", action="store_true",
                   help="[extension] disable the persistent XLA compilation cache")
    p.add_argument("--serving-artifact", type=str, default=None,
                   help="[extension] use a pre-exported siamese serving "
                        "artifact (export_model.py) instead of a "
                        "checkpoint; with an AOT sidecar the evaluation "
                        "pays no XLA compile (mutually exclusive with "
                        "--ensemble)")
    p.add_argument("--serving-aot", type=str, default="auto",
                   choices=["auto", "never", "require"],
                   help="[extension] AOT sidecar policy for "
                        "--serving-artifact: auto uses a valid .aotc, "
                        "never ignores it (on a slow remote link the "
                        "executable upload can cost more than the compile "
                        "it skips), require fails without one")
    p.add_argument("--compute-dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="[extension] model compute dtype for evaluation")
    return p


def main() -> None:
    parser = build_parser()
    args = parser.parse_args()
    if args.ensemble is not None and len(args.ensemble) < 2:
        parser.error(
            "--ensemble needs two or more checkpoints; for a single "
            "checkpoint use --checkpoint-path"
        )
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
    eval_cfg = EvalConfig(
        batch_size=args.batch_size,
        target_size=target_size,
        checkpoint_path=args.checkpoint_path,
        output_dir=args.output_dir,
        num_visualizations=args.num_visualizations,
        post_process=args.post_process,
        post_process_kernel=args.post_process_kernel,
        ensemble_paths=tuple(args.ensemble) if args.ensemble else None,
        threshold=args.threshold,
        threshold_sweep=args.threshold_sweep,
        json_out=args.json_out,
        serving_artifact=args.serving_artifact,
        serving_aot=args.serving_aot,
        compute_dtype=args.compute_dtype,
    )
    from gan_aug_pfa_tpu import pipelines

    if args.image1_path and args.image2_path and args.city_name:
        print(f"Evaluating single image pair for city: {args.city_name}")
        pipelines.evaluate_single_pair(
            data_cfg, eval_cfg, args.image1_path, args.image2_path,
            args.city_name, label_path=args.label_path,
        )
        return
    pipelines.run_evaluation(data_cfg, eval_cfg)


if __name__ == "__main__":
    main()
