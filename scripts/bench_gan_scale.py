#!/usr/bin/env python
"""GAN D+G step throughput vs batch size at 256² (VERDICT r4 weak #6).

The bs=1 contract step (reference train_gan.py:26) is latency-bound at
~8.8% FLOP utilization — an accepted floor, demonstrated by the round-4
subtraction experiment (removing 12% of FLOPs changed nothing).  The
recorded decision says GAN perf work beyond the contract starts from
larger batch, where the step becomes compute-bound.  This script
measures that curve: the production whole-epoch `_gan_epoch_scan`
(bench.py protocol — one dispatch, scalar-readback sync, min over
repeats) at bs 1/2/4/8.

  python scripts/bench_gan_scale.py [--sizes 1,2,4,8] [--steps 48]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_bs(bs: int, steps: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gan_aug_pfa_tpu.config import GANTrainConfig
    from gan_aug_pfa_tpu.train import GANTrainer

    cfg = GANTrainConfig(batch_size=bs, compute_dtype="bfloat16")
    trainer = GANTrainer(cfg)
    sg, sd = trainer.init_states(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    n = max(14, bs * 2)
    ds = tuple(
        jax.device_put(rng.rand(n, 256, 256, 3).astype(np.float32))
        for _ in range(2)
    )
    erng = np.random.RandomState(1)
    perm = np.concatenate(
        [erng.permutation(n) for _ in range(steps * bs // n + 1)]
    )[: steps * bs]
    idx_mat = jnp.asarray(perm.reshape(steps, bs), dtype=jnp.int32)

    t0 = time.perf_counter()
    dts = []
    for rep in range(4):
        t1 = time.perf_counter()
        sg, sd, ld, lg = trainer._gan_epoch_scan(sg, sd, *ds, idx_mat)
        float(ld[-1])
        if rep == 0:
            compile_s = time.perf_counter() - t0
        dts.append(time.perf_counter() - t1)
    dt = min(dts[1:])
    return dict(
        batch_size=bs,
        ms_per_step=round(dt / steps * 1e3, 2),
        img_per_sec=round(steps * bs / dt, 1),
        compile_s=round(compile_s, 1),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=str, default="1,2,4,8")
    ap.add_argument("--steps", type=int, default=48)
    args = ap.parse_args()
    rows = []
    for bs in (int(x) for x in args.sizes.split(",")):
        r = bench_bs(bs, args.steps)
        rows.append(r)
        print(json.dumps(r), flush=True)
    base = rows[0]
    print("\n| bs | ms/step | img/s | vs bs=%d img/s |" % base["batch_size"])
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['batch_size']} | {r['ms_per_step']} | "
              f"{r['img_per_sec']} | "
              f"{r['img_per_sec'] / base['img_per_sec']:.2f}x |")


if __name__ == "__main__":
    main()
