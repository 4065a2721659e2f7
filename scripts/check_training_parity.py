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


def port_from_torch(tm):
    """Port the torch SiameseUNet's CURRENT params + BN running stats into
    Flax tree form (numpy leaves) — used both for shared-init setup and for
    mid-training divergence snapshots."""
    from check_forward_parity import conv_w, port_attention, port_double_conv

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
    return params, stats


def build_models(seed: int = 0):
    """Reference torch model + Flax twin initialized with the SAME weights."""
    import torch
    import models as ref_models

    import jax
    import jax.numpy as jnp

    torch.manual_seed(seed)
    tm = ref_models.SiameseUNet(3, 1)
    params, stats = port_from_torch(tm)
    params = jax.tree.map(jnp.asarray, params)
    stats = jax.tree.map(jnp.asarray, stats)
    return tm, params, stats


def state_divergence(tm, params, stats):
    """Relative L2 divergence ||jax - torch|| / ||torch|| between the two
    frameworks' live training state: params, BN running means, BN running
    vars — the instrumentation showing WHERE a seed's walk diverges."""
    import jax
    import numpy as np_

    tparams, tstats = port_from_torch(tm)

    def rel_norm(tree_t, tree_j, select=None):
        num = den = 0.0
        flat_t = jax.tree_util.tree_flatten_with_path(tree_t)[0]
        flat_j = jax.tree_util.tree_flatten_with_path(tree_j)[0]
        for (path_t, leaf_t), (_, leaf_j) in zip(flat_t, flat_j):
            key = jax.tree_util.keystr(path_t)
            if select is not None and select not in key:
                continue
            d = np_.asarray(leaf_j, np_.float64) - np_.asarray(
                leaf_t, np_.float64
            )
            num += float(np_.sum(d * d))
            den += float(np_.sum(np_.asarray(leaf_t, np_.float64) ** 2))
        return (num ** 0.5) / max(den ** 0.5, 1e-12)

    return {
        "d_params": rel_norm(tparams, params),
        "d_bn_mean": rel_norm(tstats, stats, select="mean"),
        "d_bn_var": rel_norm(tstats, stats, select="var"),
    }


def evaluate_pair(tm, jm, params, stats, eval_ds):
    """Eval-mode macro metrics for both frameworks on the cached eval set."""
    import torch

    import jax as _jax
    import jax.numpy as jnp

    from parity_run import macro_metrics

    was_training = tm.training
    tm.eval()
    tprobs, jprobs = [], []
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
    if was_training:
        tm.train()
    tm_m = macro_metrics(np.concatenate(tprobs), eval_ds.labels)
    jm_m = macro_metrics(np.concatenate(jprobs), eval_ds.labels)
    return tm_m, jm_m


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


def run_full(root_dir: str, epochs: int = 50, seed: int = 0,
             trace_every: int = 0):
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
    traces = []
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
            tl, jl = float(tloss.detach()), float(jloss)
        print(f"epoch {epoch + 1}/{epochs}: torch={tl:.4f} jax={jl:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)
        if trace_every and (epoch + 1) % trace_every == 0:
            # Instrumented divergence trajectory: eval F1 both sides +
            # state divergence norms (shows WHERE an outlier seed's walk
            # splits — params vs BN running stats).
            tmm, jmm = evaluate_pair(tm, jm, params, stats, eval_ds)
            div = state_divergence(tm, params, stats)
            traces.append(dict(epoch=epoch + 1, torch_f1=tmm["f1"],
                               jax_f1=jmm["f1"], torch_iou=tmm["iou"],
                               jax_iou=jmm["iou"], **div))
            print(
                f"  trace e{epoch + 1}: F1 torch={tmm['f1']:.4f} "
                f"jax={jmm['f1']:.4f} d_params={div['d_params']:.2e} "
                f"d_bn_mean={div['d_bn_mean']:.2e} "
                f"d_bn_var={div['d_bn_var']:.2e}", flush=True
            )

    # Eval both with running stats.
    tm_m, jm_m = evaluate_pair(tm, jm, params, stats, eval_ds)
    print("torch:", {k: round(v, 4) for k, v in tm_m.items()}, flush=True)
    print("jax:  ", {k: round(v, 4) for k, v in jm_m.items()}, flush=True)
    return tm_m, jm_m, traces


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
    ap.add_argument("--trace-every", type=int, default=0,
                    help="every N epochs, record eval F1 for both sides and "
                    "param/BN-stat divergence norms (outlier forensics)")
    ap.add_argument("--out-json", type=str, default=None,
                    help="append one JSON line per seed (final metrics + "
                    "trace trajectory) for machine-readable aggregation")
    args = ap.parse_args()
    import jax

    jax.config.update("jax_platforms", "cpu")  # f32 CPU on both sides
    if args.full:
        assert args.root_dir, "--full requires --root-dir"
        seeds = [int(s) for s in args.seeds.split(",")]
        results = []
        for seed in seeds:
            print(f"=== seed pair {seed} ===", flush=True)
            tm_m, jm_m, traces = run_full(
                args.root_dir, args.epochs, seed=seed,
                trace_every=args.trace_every,
            )
            results.append((tm_m, jm_m))
            if args.out_json:
                import json

                with open(args.out_json, "a") as f:
                    f.write(json.dumps(dict(
                        seed=seed, epochs=args.epochs, torch=tm_m, jax=jm_m,
                        traces=traces,
                    )) + "\n")
        if len(results) > 1:
            keys = ("accuracy", "precision", "recall", "f1", "iou")
            print("\n| metric | mean rel. delta | 95% CI | min | max | "
                  "torch mean |")
            print("|---|---|---|---|---|---|")
            for k in keys:
                rel = [(jm[k] - tm[k]) / tm[k] for tm, jm in results]
                tms = [tm[k] for tm, _ in results]
                n_ = len(rel)
                sem = float(np.std(rel, ddof=1)) / n_ ** 0.5
                tcrit = _t_crit(n_ - 1)
                lo, hi = np.mean(rel) - tcrit * sem, np.mean(rel) + tcrit * sem
                print(f"| {k} | {np.mean(rel):+.2%} | ({lo:+.2%}, {hi:+.2%})"
                      f" | {min(rel):+.2%} | {max(rel):+.2%} | "
                      f"{np.mean(tms):.4f} |", flush=True)
    else:
        run_lockstep(steps=args.steps)


def _t_crit(df: int) -> float:
    """Two-sided 95% Student-t critical value (table lookup, no scipy)."""
    table = {1: 12.706, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571, 6: 2.447,
             7: 2.365, 8: 2.306, 9: 2.262, 10: 2.228, 11: 2.201, 12: 2.179,
             13: 2.160, 14: 2.145, 15: 2.131, 16: 2.120, 17: 2.110,
             18: 2.101, 19: 2.093, 20: 2.086, 24: 2.064, 29: 2.045,
             39: 2.023, 59: 2.001}
    if df in table:
        return table[df]
    for key in sorted(table):
        if df <= key:
            return table[key]
    return 1.96


if __name__ == "__main__":
    main()
