#!/usr/bin/env python
"""Forward-parity check: port weights from the reference torch SiameseUNet
(imported at runtime from /root/reference — not copied) into the Flax
SiameseUNet and compare logits on identical inputs.

Any wiring/op-semantics difference (upsample alignment, BN behavior,
attention-gate plumbing, padding) shows up here directly, independent of
training stochasticity.

Usage: python scripts/check_forward_parity.py [--size 64]"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")


def conv_w(t):  # torch (O, I, kh, kw) -> flax (kh, kw, I, O)
    return np.transpose(t.detach().numpy(), (2, 3, 1, 0))


def port_double_conv(seq):
    """torch double_conv Sequential(Conv,BN,ReLU,Conv,BN,ReLU) -> flax
    DoubleConv {conv0,bn0,conv1,bn1} params + batch_stats."""
    conv_a, bn_a, _, conv_b, bn_b, _ = list(seq)
    params = {
        "conv0": {"kernel": conv_w(conv_a.weight)},
        "bn0": {"scale": bn_a.weight.detach().numpy(),
                "bias": bn_a.bias.detach().numpy()},
        "conv1": {"kernel": conv_w(conv_b.weight)},
        "bn1": {"scale": bn_b.weight.detach().numpy(),
                "bias": bn_b.bias.detach().numpy()},
    }
    stats = {
        "bn0": {"mean": bn_a.running_mean.numpy(),
                "var": bn_a.running_var.numpy()},
        "bn1": {"mean": bn_b.running_mean.numpy(),
                "var": bn_b.running_var.numpy()},
    }
    return params, stats


def port_attention(gate):
    """torch AttentionGate {W_g: Seq(Conv,BN), W_x: Seq(Conv,BN),
    psi: Seq(Conv,BN,Sigmoid)} -> flax {w_g,bn_g,w_x,bn_x,psi,bn_psi}."""
    cg, bg = list(gate.W_g)
    cx, bx = list(gate.W_x)
    cp, bp, _ = list(gate.psi)
    params = {
        "w_g": {"kernel": conv_w(cg.weight), "bias": cg.bias.detach().numpy()},
        "bn_g": {"scale": bg.weight.detach().numpy(),
                 "bias": bg.bias.detach().numpy()},
        "w_x": {"kernel": conv_w(cx.weight), "bias": cx.bias.detach().numpy()},
        "bn_x": {"scale": bx.weight.detach().numpy(),
                 "bias": bx.bias.detach().numpy()},
        "psi": {"kernel": conv_w(cp.weight), "bias": cp.bias.detach().numpy()},
        "bn_psi": {"scale": bp.weight.detach().numpy(),
                   "bias": bp.bias.detach().numpy()},
    }
    stats = {
        "bn_g": {"mean": bg.running_mean.numpy(), "var": bg.running_var.numpy()},
        "bn_x": {"mean": bx.running_mean.numpy(), "var": bx.running_var.numpy()},
        "bn_psi": {"mean": bp.running_mean.numpy(),
                   "var": bp.running_var.numpy()},
    }
    return params, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--train-mode", action="store_true",
                    help="compare train-mode forward (batch statistics)")
    args = ap.parse_args()

    import torch
    import models as ref_models  # reference models.py

    import jax
    import jax.numpy as jnp

    from gan_aug_pfa_tpu.models import SiameseUNet

    torch.manual_seed(0)
    tmodel = ref_models.SiameseUNet(n_channels=3, n_classes=1)
    # Perturb running stats so eval-mode BN is a real test, not mean0/var1.
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    tmodel.eval()

    params = {}
    stats = {}
    for name in ("dconv_down1", "dconv_down2", "dconv_down3", "dconv_down4",
                 "bottleneck", "dconv_up3", "dconv_up2", "dconv_up1",
                 "dconv_last"):
        p, s = port_double_conv(getattr(tmodel, name))
        params[name] = p
        stats[name] = s
    for name in ("att3", "att2", "att1", "att_last"):
        p, s = port_attention(getattr(tmodel, name))
        params[name] = p
        stats[name] = s
    params["conv_head"] = {
        "kernel": conv_w(tmodel.conv_last.weight),
        "bias": tmodel.conv_last.bias.detach().numpy(),
    }

    jmodel = SiameseUNet(n_channels=3, n_classes=1)
    rng = np.random.RandomState(0)
    s = args.size
    x1 = rng.rand(2, s, s, 3).astype(np.float32) * 2 - 1
    x2 = rng.rand(2, s, s, 3).astype(np.float32) * 2 - 1

    variables = {"params": jax.tree.map(jnp.asarray, params),
                 "batch_stats": jax.tree.map(jnp.asarray, stats)}
    # Structure check against a fresh init.
    ref_vars = jmodel.init(jax.random.PRNGKey(0),
                           jnp.asarray(x1[:1]), jnp.asarray(x2[:1]),
                           train=False)
    import flax

    def paths(tree):
        return {jax.tree_util.keystr(p): np.shape(l) for p, l in
                jax.tree_util.tree_flatten_with_path(tree)[0]}

    ours, theirs = paths(variables), paths(ref_vars)
    assert ours == theirs, (
        "param-structure mismatch:\n"
        + "\n".join(sorted(set(ours.items()) ^ set(theirs.items()))[:10])
    )

    t1 = torch.from_numpy(np.transpose(x1, (0, 3, 1, 2)))
    t2 = torch.from_numpy(np.transpose(x2, (0, 3, 1, 2)))
    if args.train_mode:
        tmodel.train()
        with torch.no_grad():
            t_out = tmodel(t1, t2).numpy()
        j_out, _ = jmodel.apply(
            variables, jnp.asarray(x1), jnp.asarray(x2), train=True,
            mutable=["batch_stats"],
        )
    else:
        with torch.no_grad():
            t_out = tmodel(t1, t2).numpy()
        j_out = jmodel.apply(variables, jnp.asarray(x1), jnp.asarray(x2),
                             train=False)
    j_out = np.transpose(np.asarray(j_out), (0, 3, 1, 2))
    diff = np.abs(t_out - j_out)
    denom = np.abs(t_out).max()
    print(f"mode={'train' if args.train_mode else 'eval'}  "
          f"max|Δ|={diff.max():.3e}  rel={diff.max() / denom:.3e}  "
          f"out-range=[{t_out.min():.3f},{t_out.max():.3f}]")
    assert diff.max() / denom < 1e-3, "FORWARD MISMATCH"
    print("forward parity OK")


if __name__ == "__main__":
    main()
