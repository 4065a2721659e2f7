#!/usr/bin/env python
"""GAN forward-parity check: port weights from the reference Pix2Pix
UNetGenerator + NLayerDiscriminator (imported at runtime from
/root/reference — not copied) into the Flax models and compare outputs.

Covers the parity hard-parts called out in SURVEY.md §7: ConvTranspose
conventions (torch ConvTranspose2d(4,2,1) == flax ConvTranspose 'SAME'
with a spatially FLIPPED kernel — verified empirically 2026-08-16) and the
recursive skip-block wiring.

Run: python scripts/check_gan_parity.py [--size 128]"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")


def conv_w(t):  # torch Conv2d (O, I, kh, kw) -> flax (kh, kw, I, O)
    return np.transpose(t.detach().numpy(), (2, 3, 1, 0))


def convT_w(t):
    """torch ConvTranspose2d (I, O, kh, kw) -> flax ConvTranspose
    (kh, kw, I, O) with spatial flip."""
    w = np.transpose(t.detach().numpy(), (2, 3, 0, 1))
    return np.ascontiguousarray(w[::-1, ::-1])


def bn_params(bn):
    return (
        {"scale": bn.weight.detach().numpy(),
         "bias": bn.bias.detach().numpy()},
        {"mean": bn.running_mean.numpy(), "var": bn.running_var.numpy()},
    )


def port_skip_block(tblock):
    """Recursively port a reference UnetSkipConnectionBlock.

    The torch block is Sequential of (by position, reference
    models.py:199-202):
      outermost: [downconv, submodule, uprelu, upconv, tanh]
      innermost: [downrelu, downconv, uprelu, upconv, upnorm]
      middle:    [downrelu, downconv, downnorm, submodule, uprelu, upconv,
                  upnorm] (+ dropout)
    We pick modules out by type, recursing into the nested block."""
    import torch

    params, stats = {}, {}
    sub_p = sub_s = None
    downnorm_seen = False
    for m in tblock.model:
        if isinstance(m, torch.nn.Conv2d):
            params["downconv"] = {"kernel": conv_w(m.weight)}
            if m.bias is not None:
                params["downconv"]["bias"] = m.bias.detach().numpy()
        elif isinstance(m, torch.nn.ConvTranspose2d):
            params["upconv"] = {"kernel": convT_w(m.weight)}
            if m.bias is not None:
                params["upconv"]["bias"] = m.bias.detach().numpy()
        elif isinstance(m, torch.nn.BatchNorm2d):
            name = "downnorm" if (
                "upconv" not in params and not downnorm_seen
            ) else "upnorm"
            downnorm_seen = True
            p, s = bn_params(m)
            params[name] = p
            stats[name] = s
        elif type(m).__name__ == "UnetSkipConnectionBlock":
            sub_p, sub_s = port_skip_block(m)
    if sub_p is not None:
        params["submodule"] = sub_p
        stats["submodule"] = sub_s
    return params, stats


def port_generator(tgen):
    p, s = port_skip_block(tgen.model)
    return {"model": p}, {"model": s}


def port_discriminator(tdisc):
    """Reference NLayerDiscriminator.model: Sequential of Conv2d /
    BatchNorm2d / LeakyReLU; our names conv0..convN, bn1.., conv_out."""
    import torch

    convs = [m for m in tdisc.model if isinstance(m, torch.nn.Conv2d)]
    bns = [m for m in tdisc.model if isinstance(m, torch.nn.BatchNorm2d)]
    params, stats = {}, {}
    for i, c in enumerate(convs):
        name = "conv_out" if i == len(convs) - 1 else f"conv{i}"
        params[name] = {"kernel": conv_w(c.weight)}
        if c.bias is not None:
            params[name]["bias"] = c.bias.detach().numpy()
    for i, bn in enumerate(bns, start=1):
        p, s = bn_params(bn)
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s
    return params, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    args = ap.parse_args()

    import torch
    import models as ref_models

    import jax
    import jax.numpy as jnp

    from gan_aug_pfa_tpu.models import NLayerDiscriminator, UNetGenerator

    torch.manual_seed(0)
    tgen = ref_models.UNetGenerator(3, 3, num_downs=7, ngf=64)
    tdisc = ref_models.NLayerDiscriminator(6, ndf=64, n_layers=3)
    with torch.no_grad():
        for m in list(tgen.modules()) + list(tdisc.modules()):
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    tgen.eval()
    tdisc.eval()

    gp, gs = port_generator(tgen)
    dp, ds = port_discriminator(tdisc)

    jgen = UNetGenerator(3, 3)
    jdisc = NLayerDiscriminator(6)
    rng = np.random.RandomState(0)
    s = args.size
    x = rng.rand(1, s, s, 3).astype(np.float32) * 2 - 1
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    # Structure check.
    gvars = {"params": jax.tree.map(jnp.asarray, gp),
             "batch_stats": jax.tree.map(jnp.asarray, gs)}
    ref = jgen.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    def paths(t):
        return {jax.tree_util.keystr(p): np.shape(l) for p, l in
                jax.tree_util.tree_flatten_with_path(t)[0]}

    assert paths(gvars) == paths(ref), (
        "generator structure mismatch:\n"
        + "\n".join(str(x) for x in sorted(
            set(paths(gvars).items()) ^ set(paths(ref).items()))[:8])
    )

    with torch.no_grad():
        tg = tgen(xt).numpy()
    jg = np.transpose(
        np.asarray(jgen.apply(gvars, jnp.asarray(x), train=False)),
        (0, 3, 1, 2),
    )
    gd = np.abs(tg - jg).max()
    print(f"generator  max|Δ|={gd:.3e}  (out range [{tg.min():.3f}, "
          f"{tg.max():.3f}])")
    assert gd < 5e-3, "GENERATOR FORWARD MISMATCH"

    dvars = {"params": jax.tree.map(jnp.asarray, dp),
             "batch_stats": jax.tree.map(jnp.asarray, ds)}
    refd = jdisc.init(
        jax.random.PRNGKey(0),
        jnp.concatenate([jnp.asarray(x)] * 2, axis=-1), train=False,
    )
    assert paths(dvars) == paths(refd), "discriminator structure mismatch"
    xx = np.concatenate([x, x], axis=-1)
    with torch.no_grad():
        td = tdisc(torch.cat([xt, xt], dim=1)).numpy()
    jd = np.transpose(
        np.asarray(jdisc.apply(dvars, jnp.asarray(xx), train=False)),
        (0, 3, 1, 2),
    )
    dd = np.abs(td - jd).max()
    print(f"discriminator  max|Δ|={dd:.3e}  patch map {td.shape}")
    assert dd < 5e-3, "DISCRIMINATOR FORWARD MISMATCH"
    print("GAN forward parity OK")


if __name__ == "__main__":
    main()
