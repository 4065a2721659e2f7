#!/usr/bin/env python
"""Benchmark: Siamese U-Net training throughput on the reference's headline
workload (batch 4, 128x128, FocalDice + AdamW — reference train.py:24-29,
294-296).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

vs_baseline compares against the PyTorch reference implementation executing
the same train step, measured on this machine's CPU (the reference has no
published numbers and targets cuda-else-cpu; see BASELINE.md).  The measured
torch-CPU number is hardcoded below with its measurement provenance.
"""

import json
import sys
import time

# Reference throughput: torch 2.13 CPU, SiameseUNet fwd+bwd+AdamW train
# step, bs=4 @128x128, measured in this container 2026-08-16 (10.62 s/step
# -> 0.377 images/s; the GAN reference measured 0.597 images/s at bs=1
# 256x256).  The reference has no published numbers (BASELINE.md).
TORCH_CPU_IMAGES_PER_SEC = 0.3767


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from gan_aug_pfa_tpu.config import SiameseTrainConfig
    from gan_aug_pfa_tpu.train import SiameseTrainer

    cfg = SiameseTrainConfig(batch_size=4, compute_dtype="bfloat16")
    trainer = SiameseTrainer(cfg, augment=False)
    state = trainer.init_state(jax.random.PRNGKey(0), (128, 128))

    rng = np.random.RandomState(0)
    n = 12  # ~the OSCD train-set size
    ds = (
        jnp.asarray(rng.rand(n, 128, 128, 3).astype(np.float32)),
        jnp.asarray(rng.rand(n, 128, 128, 3).astype(np.float32)),
        jnp.asarray((rng.rand(n, 128, 128) > 0.8).astype(np.int32)),
    )
    step_rng = jax.random.PRNGKey(1)

    def run_step(state, i):
        idx = jnp.asarray(
            (np.arange(4) + i * 4) % n, dtype=jnp.int32
        )
        return trainer._train_step(state, ds[0], ds[1], ds[2], idx, step_rng)

    # Warmup / compile.
    for i in range(3):
        state, loss = run_step(state, i)
    jax.block_until_ready(loss)

    steps = 50
    t0 = time.perf_counter()
    for i in range(steps):
        state, loss = run_step(state, i)
    jax.block_until_ready((state.params, loss))
    dt = time.perf_counter() - t0
    images_per_sec = steps * cfg.batch_size / dt

    baseline = TORCH_CPU_IMAGES_PER_SEC
    print(
        json.dumps(
            {
                "metric": "siamese_train_throughput_bs4_128px",
                "value": round(images_per_sec, 2),
                "unit": "images/sec",
                "vs_baseline": round(images_per_sec / baseline, 2),
            }
        )
    )
    print(
        f"# {steps} steps in {dt:.3f}s ({dt / steps * 1e3:.2f} ms/step), "
        f"loss={float(loss):.4f}, baseline={baseline} img/s (torch-cpu)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
