#!/usr/bin/env python
"""Aggregate a multi-seed shared-init parity study (the JSONL written by
`check_training_parity.py --full --out-json ...`) into the PARITY.md 1b
statistics: per-seed table, mean relative deltas with 95% CIs, paired
t-statistics, and the chaos analysis that compares the cross-framework
end-metric delta against each framework's OWN late-training epoch-to-epoch
variability (from the --trace-every trajectories).

The chaos comparison is the mechanism demonstration VERDICT r2 item 3 asked
for: if |jax - torch| at epoch 50 is no larger than |F1(e) - F1(e-5)| of a
single framework's own walk over the last trace points, the per-seed scatter
is intrinsic optimization chaos at that operating point, not a systematic
framework difference.

Usage: python scripts/parity_aggregate.py artifacts/parity_seeds_r03.jsonl
           [--late-from 35] [--markdown]
"""
import argparse
import json
import math
import sys

import numpy as np


def t_crit(df: int) -> float:
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl")
    ap.add_argument("--late-from", type=int, default=35,
                    help="trace epochs >= this define 'late training' for "
                    "the within-framework variability baseline")
    ap.add_argument("--markdown", action="store_true",
                    help="emit the PARITY.md-ready per-seed table")
    args = ap.parse_args()

    rows = [json.loads(l) for l in open(args.jsonl) if l.strip()]
    if not rows:
        sys.exit("empty jsonl")
    n = len(rows)
    print(f"{n} seed pairs from {args.jsonl} "
          f"(seeds {[r['seed'] for r in rows]})\n")

    # Per-seed relative deltas ------------------------------------------------
    metrics = ("f1", "iou")
    rel = {m: np.array([(r["jax"][m] - r["torch"][m]) / r["torch"][m]
                        for r in rows]) for m in metrics}

    if args.markdown:
        print("| seed | torch F1 | jax F1 | ΔF1 | torch IoU | jax IoU "
              "| ΔIoU |")
        print("|---|---|---|---|---|---|---|")
        for r in rows:
            d1 = (r["jax"]["f1"] - r["torch"]["f1"]) / r["torch"]["f1"]
            d2 = (r["jax"]["iou"] - r["torch"]["iou"]) / r["torch"]["iou"]
            print(f"| {r['seed']} | {r['torch']['f1']:.4f} | "
                  f"{r['jax']['f1']:.4f} | {d1:+.2%} | "
                  f"{r['torch']['iou']:.4f} | {r['jax']['iou']:.4f} | "
                  f"{d2:+.2%} |")
        print()

    for m in metrics:
        d = rel[m]
        mean, sd = float(np.mean(d)), float(np.std(d, ddof=1))
        sem = sd / math.sqrt(n)
        tc = t_crit(n - 1)
        tstat = mean / sem if sem else float("inf")
        tmean = float(np.mean([r["torch"][m] for r in rows]))
        jmean = float(np.mean([r["jax"][m] for r in rows]))
        dom = (jmean - tmean) / tmean
        pos = int(np.sum(d > 0))
        print(f"{m}: mean rel Δ {mean:+.2%}  sd {sd:.2%}  "
              f"95% CI ({mean - tc * sem:+.2%}, {mean + tc * sem:+.2%})  "
              f"paired t={tstat:+.2f} (|t|<{tc:.2f} ⇒ no detectable bias)  "
              f"Δ of means {dom:+.2%}  jax better on {pos}/{n}")

    # Chaos analysis from traces ----------------------------------------------
    traced = [r for r in rows if r.get("traces")]
    if not traced:
        return
    cross, within_t, within_j = [], [], []
    for r in traced:
        tr = [t for t in r["traces"] if t["epoch"] >= args.late_from]
        if len(tr) < 2:
            continue
        cross.append(abs(rel["f1"][rows.index(r)]))
        for a, b in zip(tr, tr[1:]):
            within_t.append(abs(b["torch_f1"] - a["torch_f1"])
                            / max(a["torch_f1"], 1e-9))
            within_j.append(abs(b["jax_f1"] - a["jax_f1"])
                            / max(a["jax_f1"], 1e-9))
    if cross and within_t:
        print(f"\nchaos analysis (late training, trace epochs >= "
              f"{args.late_from}):")
        print(f"  cross-framework |ΔF1| at epoch 50:      mean "
              f"{np.mean(cross):.2%}  median {np.median(cross):.2%}")
        print(f"  torch's own |F1(e) - F1(e-5)| late:     mean "
              f"{np.mean(within_t):.2%}  median {np.median(within_t):.2%}"
              f"  ({len(within_t)} intervals)")
        print(f"  jax's own |F1(e) - F1(e-5)| late:       mean "
              f"{np.mean(within_j):.2%}  median {np.median(within_j):.2%}")
        ratio = np.mean(cross) / max(np.mean(within_t), 1e-12)
        print(f"  ⇒ end-point framework delta is {ratio:.2f}x one "
              f"framework's own 5-epoch late-training swing")

    # State divergence at the end ---------------------------------------------
    ends = [r["traces"][-1] for r in traced if r["traces"]]
    if ends:
        print(f"\nstate divergence at final trace point (relative L2):")
        for k in ("d_params", "d_bn_mean", "d_bn_var"):
            v = [e[k] for e in ends]
            print(f"  {k}: mean {np.mean(v):.3f}  max {max(v):.3f}")


if __name__ == "__main__":
    main()
