#!/usr/bin/env python
"""Lockstep training-dynamics parity check: identical initial weights
(ported from the reference torch SiameseUNet, imported at runtime from
/root/reference — not copied), identical batches, identical hyperparameters
(the reference's frozen tuned constants) on BOTH frameworks.

Default mode: 12 steps on random data, CPU f32 both sides, printing
per-step losses side by side.  Validates forward/backward, the BatchNorm
double-pass stat updates, the loss, and AdamW semantics end to end.
Measured 2026-08-16: per-step |loss_torch - loss_jax| ~1e-4 (f32
reassociation noise).

--full --root-dir <oscd_root>: 50 epochs on the real cached dataset,
then evaluates BOTH models with identical metric formulas — the
init-variance-free end-metric parity number reported in PARITY.md.

Run: python scripts/check_training_parity.py [--full --root-dir ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/reference")

LOSS = dict(beta=0.6699803915247974, focal_gamma=1.7930869982898021,
            focal_alpha=0.6030489822904476,
            dice_smooth=1.956571276926647e-06)
LR, WD, BS = 0.00010152447097322304, 1.1180726948943663e-05, 4


def build_models(seed: int = 0):
    """Reference torch model + Flax twin initialized with the SAME weights."""
    import torch
    import models as ref_models

    import jax
    import jax.numpy as jnp

    from check_forward_parity import conv_w, port_attention, port_double_conv

    torch.manual_seed(seed)
    tm = ref_models.SiameseUNet(3, 1)
    params, stats = {}, {}
    for name in ("dconv_down1", "dconv_down2", "dconv_down3", "dconv_down4",
                 "bottleneck", "dconv_up3", "dconv_up2", "dconv_up1",
                 "dconv_last"):
        p, s = port_double_conv(getattr(tm, name))
        params[name] = p
        stats[name] = s
    for name in ("att3", "att2", "att1", "att_last"):
        p, s = port_attention(getattr(tm, name))
        params[name] = p
        stats[name] = s
    params["conv_head"] = {
        "kernel": conv_w(tm.conv_last.weight),
        "bias": tm.conv_last.bias.detach().numpy(),
    }
    params = jax.tree.map(jnp.asarray, params)
    stats = jax.tree.map(jnp.asarray, stats)
    return tm, params, stats


def torch_loss(logits, y):
    import torch
    import torch.nn.functional as F

    bce = F.binary_cross_entropy_with_logits(logits, y, reduction="none")
    pt = torch.exp(-bce)
    at = y * LOSS["focal_alpha"] + (1 - y) * (1 - LOSS["focal_alpha"])
    focal = (at * (1 - pt) ** LOSS["focal_gamma"] * bce).mean()
    p = torch.sigmoid(logits).reshape(-1)
    t = y.reshape(-1)
    dice = 1 - (2 * (p * t).sum() + LOSS["dice_smooth"]) / (
        p.sum() + t.sum() + LOSS["dice_smooth"]
    )
    return LOSS["beta"] * focal + (1 - LOSS["beta"]) * dice


def make_jax_step(jm, tx):
    import jax
    import optax

    from gan_aug_pfa_tpu.losses import focal_dice_loss

    @jax.jit
    def jstep(params, stats, opt_state, x1, x2, y):
        def loss_fn(p):
            logits, mut = jm.apply(
                {"params": p, "batch_stats": stats}, x1, x2, train=True,
                mutable=["batch_stats"],
            )
            loss = focal_dice_loss(
                logits, y[..., None], beta=LOSS["beta"],
                focal_gamma=LOSS["focal_gamma"],
                focal_alpha=LOSS["focal_alpha"],
                dice_smooth=LOSS["dice_smooth"],
            )
            return loss, mut["batch_stats"]

        (loss, new_stats), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), new_stats, opt_state, loss

    return jstep


def run_lockstep(steps: int = 12, size: int = 64):
    import torch

    import jax.numpy as jnp
    import optax

    from gan_aug_pfa_tpu.models import SiameseUNet

    tm, params, stats = build_models()
    jm = SiameseUNet(3, 1)
    tx = optax.adamw(LR, weight_decay=WD)
    opt_state = tx.init(params)
    topt = torch.optim.AdamW(tm.parameters(), lr=LR, weight_decay=WD)
    jstep = make_jax_step(jm, tx)

    rng = np.random.RandomState(0)
    tm.train()
    worst = 0.0
    for i in range(steps):
        x1 = rng.rand(BS, size, size, 3).astype(np.float32) * 2 - 1
        x2 = rng.rand(BS, size, size, 3).astype(np.float32) * 2 - 1
        y = (rng.rand(BS, size, size) > 0.9).astype(np.float32)
        t1 = torch.from_numpy(np.transpose(x1, (0, 3, 1, 2)))
        t2 = torch.from_numpy(np.transpose(x2, (0, 3, 1, 2)))
        ty = torch.from_numpy(y)[:, None]
        topt.zero_grad()
        tl = torch_loss(tm(t1, t2), ty)
        tl.backward()
        topt.step()
        params, stats, opt_state, jl = jstep(
            params, stats, opt_state, jnp.asarray(x1), jnp.asarray(x2),
            jnp.asarray(y),
        )
        d = abs(float(tl) - float(jl))
        worst = max(worst, d)
        print(f"step {i}: torch={float(tl):.6f} jax={float(jl):.6f} "
              f"diff={d:.2e}", flush=True)
    assert worst < 5e-3, f"lockstep divergence: {worst}"
    print(f"lockstep parity OK (max per-step diff {worst:.2e})")


def run_full(root_dir: str, epochs: int = 50, seed: int = 0):
    import torch

    import jax.numpy as jnp
    import optax

    from gan_aug_pfa_tpu.config import DataConfig
    from gan_aug_pfa_tpu.data import build_cached_dataset, create_sample_lists
    from gan_aug_pfa_tpu.models import SiameseUNet
    from parity_run import macro_metrics

    dc = DataConfig(root_dir=root_dir, target_size=(128, 128))
    tr = create_sample_lists(dc.root_dir, dc.dataset_subdir,
                             dc.synthetic_data_dir, mode="train",
                             verbose=False)
    ev = create_sample_lists(dc.root_dir, dc.dataset_subdir,
                             dc.synthetic_data_dir, mode="all", verbose=False)
    train_ds = build_cached_dataset(tr, (128, 128), verbose=False)
    eval_ds = build_cached_dataset(ev, (128, 128), verbose=False)

    # One "seed pair" = one shared init (ported torch init at `seed`) plus
    # the batch-order stream derived from the same seed; both sides see
    # identical weights and batches, so the delta isolates framework math.
    tm, params, stats = build_models(seed)
    jm = SiameseUNet(3, 1)
    tx = optax.adamw(LR, weight_decay=WD)
    opt_state = tx.init(params)
    topt = torch.optim.AdamW(tm.parameters(), lr=LR, weight_decay=WD)
    jstep = make_jax_step(jm, tx)

    n = len(train_ds)
    rng = np.random.RandomState(seed)
    t0 = time.time()
    tm.train()
    for epoch in range(epochs):
        perm = rng.permutation(n)
        tl = jl = 0.0
        for s in range(0, n, BS):
            idx = perm[s:s + BS]
            x1 = train_ds.img1[idx] * 2 - 1
            x2 = train_ds.img2[idx] * 2 - 1
            y = train_ds.labels[idx].astype(np.float32)
            t1 = torch.from_numpy(np.transpose(x1, (0, 3, 1, 2)))
            t2 = torch.from_numpy(np.transpose(x2, (0, 3, 1, 2)))
            topt.zero_grad()
            tloss = torch_loss(tm(t1, t2), torch.from_numpy(y)[:, None])
            tloss.backward()
            topt.step()
            params, stats, opt_state, jloss = jstep(
                params, stats, opt_state, jnp.asarray(x1), jnp.asarray(x2),
                jnp.asarray(y),
            )
            tl, jl = float(tloss), float(jloss)
        print(f"epoch {epoch + 1}/{epochs}: torch={tl:.4f} jax={jl:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    # Eval both with running stats.
    tm.eval()
    tprobs, jprobs = [], []
    import jax as _jax

    for s in range(0, len(eval_ds), BS):
        x1 = eval_ds.img1[s:s + BS] * 2 - 1
        x2 = eval_ds.img2[s:s + BS] * 2 - 1
        with torch.no_grad():
            t1 = torch.from_numpy(np.transpose(x1, (0, 3, 1, 2)))
            t2 = torch.from_numpy(np.transpose(x2, (0, 3, 1, 2)))
            tprobs.append(torch.sigmoid(tm(t1, t2)).numpy()[:, 0])
        logits = jm.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x1), jnp.asarray(x2), train=False,
        )
        jprobs.append(np.asarray(_jax.nn.sigmoid(logits))[..., 0])
    tm_m = macro_metrics(np.concatenate(tprobs), eval_ds.labels)
    jm_m = macro_metrics(np.concatenate(jprobs), eval_ds.labels)
    print("torch:", {k: round(v, 4) for k, v in tm_m.items()}, flush=True)
    print("jax:  ", {k: round(v, 4) for k, v in jm_m.items()}, flush=True)
    return tm_m, jm_m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--root-dir", type=str, default=None)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--seeds", type=str, default="0",
                    help="comma-separated init/batch-order seeds for --full; "
                    "with several, prints per-seed tables plus mean/min/max "
                    "relative deltas (the PARITY.md 1b multi-seed evidence)")
    args = ap.parse_args()
    import jax

    jax.config.update("jax_platforms", "cpu")  # f32 CPU on both sides
    if args.full:
        assert args.root_dir, "--full requires --root-dir"
        seeds = [int(s) for s in args.seeds.split(",")]
        results = []
        for seed in seeds:
            print(f"=== seed pair {seed} ===", flush=True)
            results.append(run_full(args.root_dir, args.epochs, seed=seed))
        if len(results) > 1:
            keys = ("accuracy", "precision", "recall", "f1", "iou")
            print("\n| metric | mean rel. delta | min | max | torch mean |")
            print("|---|---|---|---|---|")
            for k in keys:
                rel = [(jm[k] - tm[k]) / tm[k] for tm, jm in results]
                tms = [tm[k] for tm, _ in results]
                print(f"| {k} | {np.mean(rel):+.2%} | {min(rel):+.2%} | "
                      f"{max(rel):+.2%} | {np.mean(tms):.4f} |", flush=True)
    else:
        run_lockstep(steps=args.steps)


if __name__ == "__main__":
    main()
