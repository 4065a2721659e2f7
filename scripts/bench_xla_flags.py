#!/usr/bin/env python
"""A/B XLA compiler flags on the Siamese bs4@128² full train step
(VERDICT r3 item 9: the backward pass at ~28% MFU is the last large
consumer in the round-3 floor analysis, RESULTS.md "Round 3: why 10.3
ms/step is the bs=4 floor").

Each arm runs in a FRESH subprocess and measures the production
`_train_epoch_scan` program exactly the way bench.py does: one
whole-epoch lax.scan dispatch + one scalar readback, min over repeats —
robust to tunnel RTT and host load.  Arms inject their flag set as PJRT
per-compile compiler_options (see the ARMS comment: env XLA_FLAGS cannot
carry TPU flags through the axon tunnel), compiled fresh via
.lower().compile() with no persistent cache.

Usage:
  python scripts/bench_xla_flags.py            # run all arms, print table
  python scripts/bench_xla_flags.py --child    # (internal) one measurement
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Candidate flag sets.  Comments say the hypothesis being tested; results
# are recorded in RESULTS.md regardless of sign.
# Round-5 finding: env-var XLA_FLAGS cannot carry TPU flags through the
# axon tunnel (the LOCAL parser rejects them: "Unknown flag in XLA_FLAGS"
# — artifacts/xla_flags_r05.log) because the TPU compiler runs server-side.
# Per-compile PJRT compiler_options DO reach it (a bogus option errors
# server-side, a real one compiles), so each arm is a compiler_options
# dict applied via .lower().compile(...).
ARMS = [
    ("baseline", {}),
    # Overlap HBM loads of the next conv with current compute; helps when
    # the bottleneck is scheduling rather than raw MXU occupancy.
    ("latency-hiding",
     {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    # Double the scoped VMEM budget: larger conv tiles -> better MXU
    # utilization for the backward filter pass at small batch.
    ("vmem-128M", {"xla_tpu_scoped_vmem_limit_kib": "131072"}),
    # Both together.
    ("lhs+vmem", {"xla_tpu_enable_latency_hiding_scheduler": "true",
                  "xla_tpu_scoped_vmem_limit_kib": "131072"}),
]


def child(steps: int) -> None:
    sys.path.insert(0, REPO)
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gan_aug_pfa_tpu.config import SiameseTrainConfig
    from gan_aug_pfa_tpu.train import SiameseTrainer

    # No persistent compile cache here: every arm must compile fresh with
    # its own compiler_options.
    options = json.loads(os.environ.get("BENCH_COMPILER_OPTIONS", "{}"))
    size, bs = 128, 4
    cfg = SiameseTrainConfig(batch_size=bs, compute_dtype="bfloat16",
                             batched_encoder=True)
    trainer = SiameseTrainer(cfg, augment=False)
    state = trainer.init_state(jax.random.PRNGKey(0), (size, size))
    rng = np.random.RandomState(0)
    n = 12
    ds1, ds2, dsl = (
        jax.device_put(rng.rand(n, size, size, 3).astype(np.float32)),
        jax.device_put(rng.rand(n, size, size, 3).astype(np.float32)),
        jax.device_put((rng.rand(n, size, size) > 0.8).astype(np.int32)),
    )
    perm = np.concatenate(
        [np.random.RandomState(1).permutation(n)
         for _ in range(steps * bs // n + 1)]
    )[: steps * bs]
    idx_mat = jnp.asarray(perm.reshape(steps, bs), dtype=jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(1), steps)

    t_c0 = time.perf_counter()
    # .lower on the instance-bound jit wrapper does not re-bind self, so
    # go through the class attribute with trainer as the (static) arg 0.
    compiled = type(trainer)._train_epoch_scan.lower(
        trainer, state, ds1, ds2, dsl, idx_mat, keys
    ).compile(compiler_options=options or None)
    dts = []
    st = state  # threaded: the production scan donates its input buffers
    for rep in range(5):
        t0 = time.perf_counter()
        st, losses = compiled(st, ds1, ds2, dsl, idx_mat, keys)
        float(losses[-1])
        if rep == 0:
            compile_s = time.perf_counter() - t_c0
        dts.append(time.perf_counter() - t0)
    print(json.dumps(dict(
        ms_per_step=min(dts[1:]) / steps * 1e3,
        compile_s=compile_s,
        loss=float(losses[-1]),
    )), flush=True)


def main() -> None:
    if "--child" in sys.argv:
        child(int(sys.argv[sys.argv.index("--child") + 1]))
        return
    steps = 120
    results = []
    for name, flags in ARMS:
        env = dict(os.environ)
        env["BENCH_COMPILER_OPTIONS"] = json.dumps(flags)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", str(steps)],
                env=env, capture_output=True, text=True, timeout=1800,
            )
        except subprocess.TimeoutExpired:
            # A hung compile (observed >25 min through the tunnel) must not
            # abort the remaining arms — record and continue.
            print(f"{name:16s} FAILED (timeout 1800 s)", flush=True)
            results.append((name, flags, None))
            continue
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if r.returncode != 0 or not line:
            print(f"{name:16s} FAILED\n{r.stdout[-500:]}\n{r.stderr[-800:]}")
            results.append((name, flags, None))
            continue
        d = json.loads(line[-1])
        results.append((name, flags, d))
        print(f"{name:16s} {d['ms_per_step']:7.2f} ms/step  "
              f"(compile+warm {d['compile_s']:5.1f} s, "
              f"loss {d['loss']:.5f})", flush=True)
    base = next((d for n_, _, d in results if n_ == "baseline" and d), None)
    print("\n| arm | flags | ms/step | vs baseline |")
    print("|---|---|---|---|")
    for name, flags, d in results:
        if d is None:
            print(f"| {name} | `{flags}` | FAILED | — |")
        elif base is None:
            print(f"| {name} | `{flags or '(none)'}` | "
                  f"{d['ms_per_step']:.2f} | n/a (baseline failed) |")
        else:
            print(f"| {name} | `{flags or '(none)'}` | "
                  f"{d['ms_per_step']:.2f} | "
                  f"{d['ms_per_step'] / base['ms_per_step'] - 1:+.1%} |")


if __name__ == "__main__":
    main()
