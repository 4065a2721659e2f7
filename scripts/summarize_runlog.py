#!/usr/bin/env python
"""Summarize a --log-jsonl run log (utils/runlog.py) as a compact report.

Usage:  python scripts/summarize_runlog.py <run.jsonl>

Works for both training CLIs' logs (siamese_train: train/val loss + lr;
gan_train: loss_d/loss_g).  Pure stdlib — usable on hosts without jax.
"""

from __future__ import annotations

import json
import sys


def load_events(path: str):
    events = []
    with open(path) as f:
        for i, line in enumerate(f, 1):
            line = line.strip()
            if not line:
                continue
            try:
                events.append(json.loads(line))
            except json.JSONDecodeError:
                # A crash can truncate the in-flight last line; anything
                # else malformed is worth flagging but not fatal.
                print(f"(skipping malformed line {i})", file=sys.stderr)
    return events


def summarize(events) -> str:
    out = []
    starts = [e for e in events if e.get("event") == "run_start"]
    epochs = [e for e in events if e.get("event") == "epoch"]
    ckpts = [e for e in events if e.get("event") == "checkpoint"]
    pre = [e for e in events if e.get("event") == "preemption"]
    ends = [e for e in events if e.get("event") == "run_end"]

    kind = starts[0].get("kind", "?") if starts else "?"
    out.append(f"run kind: {kind}  (runs in file: {len(starts)}, "
               f"resumed {max(0, len(starts) - 1)}x)")
    if not epochs:
        out.append("no epoch events.")
        return "\n".join(out)

    wall = sum(e.get("wall_s", 0.0) for e in epochs)
    out.append(
        f"epochs: {epochs[0]['epoch']}..{epochs[-1]['epoch']} "
        f"({len(epochs)} logged, {wall:.1f}s epoch wall total)"
    )
    last = epochs[-1]
    if "train_loss" in last:  # siamese_train
        best = min(epochs, key=lambda e: e.get("val_loss", float("inf")))
        out.append(
            f"last epoch {last['epoch']}: train {last['train_loss']:.4f}, "
            f"val {last['val_loss']:.4f}, lr {last.get('lr', 0):.2e}"
        )
        out.append(
            f"best val loss: {best.get('val_loss', float('nan')):.4f} "
            f"(epoch {best['epoch']})"
        )
    if "loss_d" in last:  # gan_train
        out.append(
            f"last epoch {last['epoch']}: loss_d {last['loss_d']:.4f}, "
            f"loss_g {last['loss_g']:.4f}"
        )
    if ckpts:
        by_kind = {}
        for e in ckpts:
            by_kind.setdefault(e.get("kind", "?"), []).append(e)
        for k, es in by_kind.items():
            paths = {e.get("path") or e.get("generator") for e in es}
            out.append(
                f"checkpoints [{k}]: {len(es)} saves, last -> "
                f"{sorted(paths)[-1]}"
            )
    if pre:
        out.append(f"preempted at epoch {pre[-1]['epoch']} "
                   "(resume state saved; relaunch with --resume)")
    if ends and "best_val_loss" in ends[-1] and ends[-1]["best_val_loss"]:
        out.append(f"run_end best_val_loss: {ends[-1]['best_val_loss']:.4f}")
    elif not ends:
        out.append("no run_end event (run crashed, was preempted mid-file, "
                   "or is still going).")
    return "\n".join(out)


def main() -> None:
    if len(sys.argv) != 2:
        print(__doc__.strip())
        raise SystemExit(2)
    print(summarize(load_events(sys.argv[1])))


if __name__ == "__main__":
    main()
