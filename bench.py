#!/usr/bin/env python
"""Benchmark: Siamese U-Net training throughput on the reference's headline
workload (batch 4, 128x128, FocalDice + AdamW — reference train.py:24-29,
294-296), measured over the production whole-epoch lax.scan path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}
plus secondary numbers (GAN step, per-step latency) on stderr.

vs_baseline compares against the PyTorch reference implementation executing
the same train step, measured on this machine's CPU (the reference has no
published numbers and targets cuda-else-cpu; see BASELINE.md).  The measured
torch-CPU numbers are hardcoded below with their measurement provenance.
"""

import json
import sys
import time

# Reference throughput: torch 2.13 CPU in this container, pinned by the
# median-of-5 protocol (VERDICT r2 item 7): `python
# scripts/bench_torch_baseline.py` on a QUIET host (background studies
# SIGSTOPped) — warmup + 5 timed steps per model, median, with an
# environment fingerprint.  2026-08-19 run (artifacts/
# torch_baseline_r03.json): siamese 0.6165 (samples 0.604-0.626),
# gan 0.5664 (0.527-0.580); fingerprint Intel Xeon @2.10GHz, nproc=1,
# torch 2.13.0+cpu.  Earlier rounds' ad-hoc numbers (0.377-0.582
# siamese) varied with host load; this protocol replaces them.  The
# reference itself publishes no numbers (BASELINE.md).
TORCH_CPU_SIAMESE_IPS = 0.6165
TORCH_CPU_GAN_IPS = 0.5664


def bench_siamese(batched_encoder: bool = True, batch_size: int = 4,
                  momentum_dtype: str | None = None,
                  flat_opt_state: bool = False, size: int = 128,
                  remat: bool = False, steps: int = 120):
    import numpy as np
    import jax

    from gan_aug_pfa_tpu.config import SiameseTrainConfig
    from gan_aug_pfa_tpu.train import SiameseTrainer

    cfg = SiameseTrainConfig(batch_size=batch_size,
                             compute_dtype="bfloat16",
                             batched_encoder=batched_encoder,
                             opt_momentum_dtype=momentum_dtype,
                             opt_flat_state=flat_opt_state,
                             remat=remat)
    trainer = SiameseTrainer(cfg, augment=False)
    state = trainer.init_state(jax.random.PRNGKey(0), (size, size))

    rng = np.random.RandomState(0)
    n = max(12, batch_size * 3)  # >= the OSCD train-set size
    ds = tuple(
        jax.device_put(a)
        for a in (
            rng.rand(n, size, size, 3).astype(np.float32),
            rng.rand(n, size, size, 3).astype(np.float32),
            (rng.rand(n, size, size) > 0.8).astype(np.int32),
        )
    )
    import jax.numpy as jnp

    key = jax.random.PRNGKey(1)
    epoch_rng = np.random.RandomState(1)

    # Measure the production lax.scan path with ONE dispatch + ONE sync so
    # the number reflects device throughput, not host/tunnel round-trips
    # (production syncs once per epoch for the plateau scheduler).
    bs = batch_size
    perm = np.concatenate(
        [epoch_rng.permutation(n) for _ in range(steps * bs // n + 1)]
    )[: steps * bs]
    idx_mat = jnp.asarray(perm.reshape(steps, bs), dtype=jnp.int32)
    keys = jax.random.split(key, steps)

    # Sync via a scalar readback: through the axon tunnel,
    # block_until_ready can return before execution finishes (measured
    # 2026-08-16); a device->host transfer is a true barrier.  Rep 0 warms
    # the compile; steady-state reps agree to <1%.
    dts = []
    last = 0.0
    for rep in range(4):
        t0 = time.perf_counter()
        state, losses = trainer._train_epoch_scan(state, *ds, idx_mat, keys)
        last = float(losses[-1])
        dts.append(time.perf_counter() - t0)
    dt = min(dts[1:])
    images_per_sec = steps * cfg.batch_size / dt
    ms_per_step = dt / steps * 1e3

    # FLOPs per step from XLA's own cost model (cached compile), for an
    # honest model-FLOPs-utilization line on stderr.
    flops_per_step = None
    try:
        # Cost-analyze the SINGLE-step program: XLA counts a lax.scan
        # body once regardless of trip count, so the epoch program's
        # flops ARE one step's (verified: scan total == step total).
        # .lower on the jitted method is unbound — pass self explicitly
        # (static_argnums=0 makes it a plain static arg).
        comp = trainer._train_step.lower(
            trainer, state, *ds, idx_mat[0], keys[0]
        ).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        if ca and ca.get("flops"):
            flops_per_step = float(ca["flops"])
    except Exception:
        pass
    return images_per_sec, ms_per_step, last, flops_per_step


def _peak_flops() -> float | None:
    """bf16 peak of the attached chip (public figures), for MFU."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for hint, peak in (
        ("v5 lite", 197e12), ("v5e", 197e12), ("v5p", 459e12),
        ("v6", 918e12), ("v4", 275e12),
    ):
        if hint in kind:
            return peak
    return None


def bench_gan(concat_free_disc: bool = False, shared_gen_fwd: bool = False):
    import numpy as np
    import jax

    from gan_aug_pfa_tpu.config import GANTrainConfig
    from gan_aug_pfa_tpu.train import GANTrainer

    cfg = GANTrainConfig(batch_size=1, compute_dtype="bfloat16",
                         concat_free_disc=concat_free_disc,
                         shared_gen_fwd=shared_gen_fwd)
    trainer = GANTrainer(cfg)
    sg, sd = trainer.init_states(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    n = 14  # all-cities GAN set size (reference train_gan.py:99-108)
    ds = tuple(
        jax.device_put(rng.rand(n, 256, 256, 3).astype(np.float32))
        for _ in range(2)
    )
    import jax.numpy as jnp

    epoch_rng = np.random.RandomState(1)
    steps = 70
    perm = np.concatenate(
        [epoch_rng.permutation(n) for _ in range(steps // n + 1)]
    )[:steps]
    idx_mat = jnp.asarray(perm.reshape(steps, 1), dtype=jnp.int32)

    dts = []
    last_d = last_g = 0.0
    for rep in range(4):
        t0 = time.perf_counter()
        sg, sd, ld, lg = trainer._gan_epoch_scan(sg, sd, *ds, idx_mat)
        last_d, last_g = float(ld[-1]), float(lg[-1])
        dts.append(time.perf_counter() - t0)
    dt = min(dts[1:])
    return steps / dt, dt / steps * 1e3, last_d, last_g


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=4,
                    help="Siamese bench batch size (scaling rows; the "
                         "headline/driver contract is the default bs=4)")
    ap.add_argument("--skip-secondary", action="store_true",
                    help="print only the JSON line")
    ap.add_argument("--momentum-dtype", type=str, default=None,
                    choices=["bfloat16", "float32"],
                    help="[extension] Adam first-moment dtype A/B knob "
                         "(see train/optim.py; default param dtype)")
    ap.add_argument("--gan-concat-free", action="store_true",
                    help="[extension] A/B knob: run the GAN bench with "
                         "concat_free_disc (split-kernel D first conv)")
    ap.add_argument("--gan-shared-fwd", action="store_true",
                    help="[extension] A/B knob: run the GAN bench with "
                         "shared_gen_fwd (one vjp'd G forward per step)")
    ap.add_argument("--flat-opt-state", action="store_true",
                    help="[extension] A/B knob: optimizer update on one "
                         "concatenated vector (optax.flatten)")
    ap.add_argument("--size", type=int, default=128,
                    help="[extension] square resolution for the Siamese "
                         "bench (scaling rows; the headline/driver "
                         "contract is 128)")
    ap.add_argument("--remat", action="store_true",
                    help="[extension] activation rematerialization "
                         "(pairs with large --size)")
    ap.add_argument("--steps", type=int, default=120,
                    help="[extension] scan length per timed rep")
    args = ap.parse_args()

    from gan_aug_pfa_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    # Headline: the framework's fast path (batched 2B encoder pass; same
    # params and eval forward as the reference's two-pass form — see
    # models/siamese_unet.py).  The parity-exact two-pass number follows
    # on stderr.
    siamese_ips, ms_step, loss, flops = bench_siamese(
        batched_encoder=True, batch_size=args.batch_size,
        momentum_dtype=args.momentum_dtype,
        flat_opt_state=args.flat_opt_state,
        size=args.size, remat=args.remat, steps=args.steps,
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"siamese_train_throughput_bs{args.batch_size}_"
                    f"{args.size}px"
                ),
                "value": round(siamese_ips, 2),
                "unit": "images/sec",
                "vs_baseline": round(siamese_ips / TORCH_CPU_SIAMESE_IPS, 2),
            }
        )
    )
    print(
        f"# siamese: {ms_step:.2f} ms/step (bs={args.batch_size} "
        f"@{args.size}px, epoch-scan path, batched encoder), "
        f"loss={loss:.4f}, baseline={TORCH_CPU_SIAMESE_IPS} img/s "
        "(torch-cpu)",
        file=sys.stderr,
    )
    peak = _peak_flops()
    if flops and peak:
        # Model FLOPs utilization from XLA's own cost model and the
        # chip's public bf16 peak — the honest hardware-efficiency line.
        achieved = flops / (ms_step / 1e3)
        print(
            f"# siamese MFU: {achieved / peak * 100:.1f}% "
            f"({flops / 1e9:.0f} GFLOP/step, {achieved / 1e12:.1f} "
            f"TFLOP/s of {peak / 1e12:.0f} peak)",
            file=sys.stderr,
        )
    if args.skip_secondary:
        return
    try:
        ips2, ms2, _, _ = bench_siamese(batched_encoder=False,
                                        batch_size=args.batch_size,
                                        size=args.size)
        print(
            f"# siamese (reference-parity two-pass encoder): {ips2:.2f} "
            f"img/s, {ms2:.2f} ms/step",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"# two-pass bench skipped: {e}", file=sys.stderr)
    try:
        gan_ips, gan_ms, ld, lg = bench_gan(
            concat_free_disc=args.gan_concat_free,
            shared_gen_fwd=args.gan_shared_fwd,
        )
        print(
            f"# gan: {gan_ips:.2f} img/s, {gan_ms:.2f} ms/step (bs=1 "
            f"@256px, D+G), loss_d={ld:.3f}, loss_g={lg:.3f}, "
            f"vs torch-cpu {TORCH_CPU_GAN_IPS} img/s = "
            f"{gan_ips / TORCH_CPU_GAN_IPS:.0f}x",
            file=sys.stderr,
        )
    except Exception as e:  # secondary metric — never break the JSON line
        print(f"# gan bench skipped: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
