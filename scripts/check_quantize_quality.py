#!/usr/bin/env python
"""Measure weight-only int8 quantization quality on a TRAINED generator.

Runs the synthetic-data forward (normalize -> G -> x*0.5+0.5 -> uint8, the
reference generate_synthetic_data.py:61-85 chain) over every pair in the
corpus twice — fp weights vs int8-quantized-then-dequantized weights
(exactly what a `--quantize int8` serving artifact computes,
tests/test_quantize.py proves the artifact is bit-identical to this) — and
reports the uint8 output deltas: PSNR, mean/max abs pixel error, fraction
of exactly-equal pixels.

  python scripts/check_quantize_quality.py \
      --checkpoint-path /tmp/gan_ckpt/generator_epoch_100.msgpack \
      --root-dir /tmp/corpus
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint-path", required=True)
    p.add_argument("--root-dir", required=True)
    p.add_argument("--dataset-subdir",
                   default="Onera Satellite Change Detection Dataset")
    p.add_argument("--target-size", default="256x256")
    p.add_argument("--compute-dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--num-downs", type=int, default=7,
                   help="generator depth; must match the checkpoint")
    p.add_argument("--ngf", type=int, default=64,
                   help="generator base filters; must match the checkpoint")
    args = p.parse_args()

    import jax
    import numpy as np

    from gan_aug_pfa_tpu import checkpoint as ckpt
    from gan_aug_pfa_tpu import quantize as qz
    from gan_aug_pfa_tpu.config import GANTrainConfig, parse_target_size
    from gan_aug_pfa_tpu.data.loader import (
        build_cached_dataset, float_to_uint8,
    )
    from gan_aug_pfa_tpu.data.scanner import create_sample_lists
    from gan_aug_pfa_tpu.train.gan import GANTrainer
    from gan_aug_pfa_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    size = parse_target_size(args.target_size)
    samples = create_sample_lists(
        args.root_dir, args.dataset_subdir, "synthetic_data", mode="all",
        verbose=False,
    )
    if not samples:
        raise SystemExit(f"no samples under {args.root_dir}")
    ds = build_cached_dataset(samples, size, verbose=False)

    trainer = GANTrainer(GANTrainConfig(
        target_size=size, compute_dtype=args.compute_dtype,
        num_downs=args.num_downs, ngf=args.ngf,
    ))
    sg, _ = trainer.init_states(jax.random.PRNGKey(0))
    sg = ckpt.restore_checkpoint(args.checkpoint_path, sg)

    host_params = jax.tree_util.tree_map(np.asarray, sg.params)
    qtree, report = qz.quantize_tree(host_params)
    sg_q = sg.replace(params=qz.dequantize_tree(qtree, np.float32))
    print(f"quantized {report['quantized']} tensors "
          f"({report['bytes_fp'] / 1e6:.1f} -> "
          f"{report['bytes_q'] / 1e6:.1f} MB), "
          f"{report['kept_fp']} kept fp")

    dev1 = jax.device_put(ds.img1)
    bs = args.batch_size
    se = 0.0
    n_px = 0
    max_abs = 0
    n_equal = 0
    sum_abs = 0.0
    for i in range(0, len(ds), bs):
        batch = dev1[i:i + bs]
        fp = float_to_uint8(np.asarray(trainer.generate(sg, batch)))
        q = float_to_uint8(np.asarray(trainer.generate(sg_q, batch)))
        d = fp.astype(np.int32) - q.astype(np.int32)
        se += float(np.sum(d.astype(np.float64) ** 2))
        sum_abs += float(np.sum(np.abs(d)))
        max_abs = max(max_abs, int(np.max(np.abs(d))))
        n_equal += int(np.sum(d == 0))
        n_px += d.size
    mse = se / n_px
    psnr = float("inf") if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)
    out = {
        "samples": len(ds),
        "pixels": n_px,
        "psnr_db": round(psnr, 2),
        "mean_abs_err": round(sum_abs / n_px, 4),
        "max_abs_err": max_abs,
        "frac_identical": round(n_equal / n_px, 4),
        "checkpoint": os.path.abspath(args.checkpoint_path),
        "compute_dtype": args.compute_dtype,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
