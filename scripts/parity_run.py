#!/usr/bin/env python
"""Empirical parity run: reference torch model vs this framework on
IDENTICAL data, hyperparameters, and metric formulas.

BASELINE.md's acceptance criterion is "eval F1/IoU within 1%" of the
reference, which publishes no numbers — parity must be established against
a locally reproduced reference run.  torchvision is not installed in this
image, so the reference's PIL/torchvision data pipeline cannot run; instead
BOTH sides consume the same decoded/resized cache (data/loader.py, whose
numerics are tested to match torch's interpolation exactly), and the
reference side runs the reference's own model file
(/root/reference/models.py, imported at runtime — not copied) under torch
AdamW with the reference's frozen loss constants (train.py:294-296).

Usage:
  python scripts/parity_run.py --root-dir <oscd_root> [--epochs 20]
                               [--target-size 128x128] [--out PARITY.md]

Writes a markdown report with per-side Accuracy/Precision/Recall/F1/IoU
(per-sample macro-averaged over ALL cities, mirroring evaluate.py) and the
relative deltas."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gan_aug_pfa_tpu.config import (  # noqa: E402
    DataConfig, SiameseTrainConfig, parse_target_size,
)
from gan_aug_pfa_tpu.data import (  # noqa: E402
    build_cached_dataset, create_sample_lists,
)

# The reference's frozen tuned constants (reference train.py:294-296, 332).
LOSS = dict(beta=0.6699803915247974, focal_gamma=1.7930869982898021,
            focal_alpha=0.6030489822904476,
            dice_smooth=1.956571276926647e-06)
LR = 0.00010152447097322304
WD = 1.1180726948943663e-05
BS = 4


def macro_metrics(probs: np.ndarray, labels: np.ndarray) -> dict:
    """Per-sample macro-averaged metrics (reference evaluate.py:34-64,
    159-173 semantics), computed in numpy so both sides share the code."""
    smooth = 1e-6
    out = {k: 0.0 for k in ("accuracy", "precision", "recall", "f1", "iou")}
    n = probs.shape[0]
    for i in range(n):
        p = (probs[i] > 0.5).astype(np.float64).ravel()
        t = labels[i].astype(np.float64).ravel()
        tp = float((p * t).sum())
        fp = float(((1 - t) * p).sum())
        fn = float((t * (1 - p)).sum())
        tn = float(((1 - t) * (1 - p)).sum())
        prec = (tp + smooth) / (tp + fp + smooth)
        rec = (tp + smooth) / (tp + fn + smooth)
        out["accuracy"] += (tp + tn + smooth) / (tp + tn + fp + fn + smooth)
        out["precision"] += prec
        out["recall"] += rec
        out["f1"] += (2 * prec * rec + smooth) / (prec + rec + smooth)
        out["iou"] += (tp + smooth) / (tp + fp + fn + smooth)
    return {k: v / n for k, v in out.items()}


def run_torch_reference(train_ds, eval_ds, epochs: int, seed: int = 0):
    """Train/eval the REFERENCE model (imported from /root/reference) with
    torch AdamW + the frozen FocalDice constants on the shared cache."""
    import torch
    import torch.nn.functional as F

    sys.path.insert(0, "/root/reference")
    import models as ref_models  # the reference's own model definitions

    torch.manual_seed(seed)
    device = torch.device("cpu")
    model = ref_models.SiameseUNet(n_channels=3, n_classes=1).to(device)
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD)

    def to_t(x):  # NHWC [0,1] -> NCHW [-1,1]
        return torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)) * 2.0 - 1.0
        ).float()

    def focal_dice(logits, targets):
        bce = F.binary_cross_entropy_with_logits(
            logits, targets, reduction="none"
        )
        pt = torch.exp(-bce)
        alpha_t = targets * LOSS["focal_alpha"] + (1 - targets) * (
            1 - LOSS["focal_alpha"]
        )
        focal = (alpha_t * (1 - pt) ** LOSS["focal_gamma"] * bce).mean()
        probs = torch.sigmoid(logits).reshape(-1)
        t = targets.reshape(-1)
        inter = (probs * t).sum()
        dice = 1 - (2 * inter + LOSS["dice_smooth"]) / (
            probs.sum() + t.sum() + LOSS["dice_smooth"]
        )
        return LOSS["beta"] * focal + (1 - LOSS["beta"]) * dice

    rng = np.random.RandomState(seed)
    n = len(train_ds)
    t0 = time.time()
    for epoch in range(epochs):
        model.train()
        perm = rng.permutation(n)
        ep_loss = []
        for s in range(0, n, BS):
            idx = perm[s:s + BS]
            x1 = to_t(train_ds.img1[idx])
            x2 = to_t(train_ds.img2[idx])
            y = torch.from_numpy(
                train_ds.labels[idx].astype(np.float32)
            )[:, None]
            opt.zero_grad()
            logits = model(x1, x2)
            loss = focal_dice(logits, y)
            loss.backward()
            opt.step()
            ep_loss.append(float(loss))
        print(f"  torch epoch {epoch + 1}/{epochs} "
              f"loss={np.mean(ep_loss):.4f} ({time.time() - t0:.0f}s)",
              flush=True)
    model.eval()
    probs = []
    with torch.no_grad():
        for s in range(0, len(eval_ds), BS):
            x1 = to_t(eval_ds.img1[s:s + BS])
            x2 = to_t(eval_ds.img2[s:s + BS])
            probs.append(torch.sigmoid(model(x1, x2)).numpy()[:, 0])
    return np.concatenate(probs), time.time() - t0


def run_jax_side(train_ds, eval_ds, epochs: int, seed: int = 0,
                 compute_dtype: str = "float32"):
    import jax

    from gan_aug_pfa_tpu.train import SiameseTrainer

    cfg = SiameseTrainConfig(
        batch_size=BS, learning_rate=LR, weight_decay=WD,
        focal_alpha=LOSS["focal_alpha"], focal_gamma=LOSS["focal_gamma"],
        loss_beta=LOSS["beta"], dice_smooth=LOSS["dice_smooth"],
        seed=seed, data_parallel=False, compute_dtype=compute_dtype,
    )
    trainer = SiameseTrainer(cfg, augment=False)
    state = trainer.init_state(
        jax.random.PRNGKey(seed), train_ds.target_size
    )
    dev = trainer._device_arrays(train_ds)
    rng = jax.random.PRNGKey(seed + 1)
    epoch_rng = np.random.RandomState(seed)
    t0 = time.time()
    for epoch in range(epochs):
        rng, erng = jax.random.split(rng)
        state, loss = trainer.train_epoch(
            state, dev, len(train_ds), erng, epoch_rng
        )
        print(f"  jax epoch {epoch + 1}/{epochs} loss={loss:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)
    probs = []
    for s in range(0, len(eval_ds), BS):
        p = trainer.predict(
            state, eval_ds.img1[s:s + BS], eval_ds.img2[s:s + BS]
        )
        probs.append(np.asarray(p)[..., 0])
    return np.concatenate(probs), time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root-dir", required=True)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--target-size", type=str, default="128x128")
    ap.add_argument("--out", type=str, default="PARITY.md")
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument("--compute-dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"],
                    help="JAX-side compute dtype (torch side is f32; "
                    "float32 default keeps the comparison apples-to-apples)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seeds", type=str, default=None,
                    help="comma-separated list; runs BOTH sides once per "
                    "seed and reports mean +/- spread deltas (the "
                    "multi-seed evidence behind the PARITY.md claim)")
    args = ap.parse_args()
    size = parse_target_size(args.target_size)
    dc = DataConfig(root_dir=args.root_dir, target_size=size)

    train_samples = create_sample_lists(
        dc.root_dir, dc.dataset_subdir, dc.synthetic_data_dir, mode="train",
    )
    eval_samples = create_sample_lists(
        dc.root_dir, dc.dataset_subdir, dc.synthetic_data_dir, mode="all",
    )
    train_ds = build_cached_dataset(train_samples, size)
    eval_ds = build_cached_dataset(eval_samples, size)
    labels = eval_ds.labels

    seeds = ([int(s) for s in args.seeds.split(",")] if args.seeds
             else [args.seed])
    results = []  # (seed, jax_metrics, ref_metrics, jax_t, ref_t)
    for seed in seeds:
        print(f"== seed {seed}: JAX/TPU framework ==", flush=True)
        jax_probs, jax_t = run_jax_side(
            train_ds, eval_ds, args.epochs, seed=seed,
            compute_dtype=args.compute_dtype,
        )
        jax_m = macro_metrics(jax_probs, labels)
        print(json.dumps(jax_m, indent=2), flush=True)
        if args.skip_torch:
            continue
        print(f"== seed {seed}: torch reference (reference models.py) ==",
              flush=True)
        ref_probs, ref_t = run_torch_reference(
            train_ds, eval_ds, args.epochs, seed=seed
        )
        ref_m = macro_metrics(ref_probs, labels)
        print(json.dumps(ref_m, indent=2), flush=True)
        results.append((seed, jax_m, ref_m, jax_t, ref_t))

    if args.skip_torch or not results:
        return

    keys = ("accuracy", "precision", "recall", "f1", "iou")
    lines = [
        "# PARITY — reference torch model vs gan_aug_pfa_tpu",
        "",
        f"Identical data cache ({len(train_ds)} train / {len(eval_ds)} eval "
        f"samples at {size[0]}x{size[1]}), identical hyperparameters "
        f"(reference train.py:294-296 frozen constants), {args.epochs} "
        "epochs, augment=False (the reference main-path default), metrics "
        "per-sample macro-averaged over ALL cities (reference "
        "evaluate.py semantics).  The reference side runs the reference's "
        "own models.py under torch CPU (torchvision is unavailable, so its "
        "PIL pipeline is replaced by the shared cache — whose numerics are "
        "tested equal to torch's).  "
        f"Seeds: {', '.join(str(s) for s in seeds)} (each seed trains both "
        "sides from scratch).",
        "",
    ]
    for seed, jax_m, ref_m, jax_t, ref_t in results:
        lines += [
            f"## Seed {seed}",
            "",
            "| metric | torch reference | this framework | delta |",
            "|---|---|---|---|",
        ]
        for k in keys:
            d = jax_m[k] - ref_m[k]
            lines.append(
                f"| {k} | {ref_m[k]:.4f} | {jax_m[k]:.4f} | {d:+.4f} |"
            )
        lines += [
            "",
            f"Train wall-clock for {args.epochs} epochs: torch-CPU "
            f"{ref_t:.0f}s vs this framework {jax_t:.0f}s.",
            "",
        ]
    if len(results) > 1:
        lines += [
            "## Across seeds (delta = framework - reference)",
            "",
            "| metric | mean delta | min | max | mean |ref| |",
            "|---|---|---|---|---|",
        ]
        for k in keys:
            ds = [jm[k] - rm[k] for _, jm, rm, _, _ in results]
            refs = [rm[k] for _, _, rm, _, _ in results]
            lines.append(
                f"| {k} | {np.mean(ds):+.4f} | {min(ds):+.4f} | "
                f"{max(ds):+.4f} | {np.mean(refs):.4f} |"
            )
        lines.append("")
    lines.append(
        "Run: `python scripts/parity_run.py --root-dir <oscd_root> "
        "--seeds 0,1,2`."
    )
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
