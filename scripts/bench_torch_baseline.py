#!/usr/bin/env python
"""Measure the reference implementation's torch-CPU training throughput —
the provenance script for the baseline constants hardcoded in bench.py
(VERDICT r1 weak item 6: the 1035x/277x headline must be reproducible from
the repo alone).

Imports the reference models at runtime from /root/reference (not copied)
and times the exact reference train steps on this machine's CPU:

  siamese: fwd + FocalDice-equivalent loss + bwd + AdamW step,
           bs=4 @128x128 (reference train.py:24-29, 289-296)
  gan:     full D-step + G-step, bs=1 @256x256 (reference train_gan.py:26-74)

Prints one JSON line: {"siamese_ips": ..., "gan_ips": ..., "steps": ...,
"torch": ...}.  Steps are few because one siamese step takes ~10 s on this
1-core container.

Run: python scripts/bench_torch_baseline.py [--steps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, "/root/reference")


def bench_siamese(steps: int) -> float:
    import torch

    import models as ref_models

    torch.manual_seed(0)
    model = ref_models.SiameseUNet(n_channels=3, n_classes=1)
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4)
    # FocalDice-equivalent loss cost (BCEWithLogits + sigmoid/sum terms) —
    # the loss is negligible next to the 41M-param conv net either way.
    bce = torch.nn.BCEWithLogitsLoss()
    x1 = torch.randn(4, 3, 128, 128)
    x2 = torch.randn(4, 3, 128, 128)
    t = (torch.rand(4, 1, 128, 128) > 0.8).float()

    def step():
        opt.zero_grad()
        out = model(x1, x2)
        probs = torch.sigmoid(out)
        dice = 1 - (2 * (probs * t).sum() + 1) / (probs.sum() + t.sum() + 1)
        loss = 0.67 * bce(out, t) + 0.33 * dice
        loss.backward()
        opt.step()

    step()  # warmup (allocator, threading)
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = (time.perf_counter() - t0) / steps
    return 4.0 / dt


def bench_gan(steps: int) -> float:
    import torch

    import models as ref_models

    torch.manual_seed(0)
    gen = ref_models.UNetGenerator(3, 3, num_downs=7, ngf=64)
    disc = ref_models.NLayerDiscriminator(6, ndf=64, n_layers=3)
    og = torch.optim.Adam(gen.parameters(), lr=1e-4, betas=(0.5, 0.999))
    od = torch.optim.Adam(disc.parameters(), lr=1e-4, betas=(0.5, 0.999))
    bce = torch.nn.BCEWithLogitsLoss()
    l1 = torch.nn.L1Loss()
    a = torch.randn(1, 3, 256, 256)
    b = torch.randn(1, 3, 256, 256)

    def step():
        # D-step then G-step, reference train_gan.py:52-74.
        od.zero_grad()
        fake = gen(a).detach()
        pr = disc(torch.cat([a, b], 1))
        pf = disc(torch.cat([a, fake], 1))
        ld = 0.5 * (bce(pr, torch.ones_like(pr))
                    + bce(pf, torch.zeros_like(pf)))
        ld.backward()
        od.step()
        og.zero_grad()
        fake = gen(a)
        pf = disc(torch.cat([a, fake], 1))
        lg = bce(pf, torch.ones_like(pf)) + 100.0 * l1(fake, b)
        lg.backward()
        og.step()

    step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = (time.perf_counter() - t0) / steps
    return 1.0 / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()
    import torch

    s = bench_siamese(args.steps)
    g = bench_gan(args.steps)
    print(json.dumps({
        "siamese_ips": round(s, 4),
        "gan_ips": round(g, 4),
        "steps": args.steps,
        "torch": torch.__version__,
    }))


if __name__ == "__main__":
    main()
