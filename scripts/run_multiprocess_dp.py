#!/usr/bin/env python
"""Two-process `jax.distributed` data-parallel validation on CPU.

The reference has NO distributed layer (SURVEY.md §5.8, /root/reference/
train.py:23 is a bare cuda-or-cpu device pick); this framework's TPU-native
replacement is `parallel/mesh.py` — and its multi-HOST branches
(`put_dataset_global`'s `jax.make_array_from_process_local_data` path and
`maybe_distributed_init`) can only execute with a real multi-process
runtime.  This launcher provides one, on CPU, with no cluster:

  * launcher mode (default): picks a free port, spawns NUM_PROCESSES=2
    worker subprocesses (2 virtual CPU devices each -> a 4-device global
    mesh spanning both), waits for both, then runs the IDENTICAL workload
    single-process over a local 4-device mesh and asserts the per-step
    training losses match across the process boundary (same SPMD program,
    same partitioning; collectives ride Gloo cross-process instead of
    shared memory).
  * worker mode (--worker K --port P --out F): JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars are set by the launcher;
    the worker calls `maybe_distributed_init()` (the same entry the CLIs
    use), builds the global ('data',) mesh, places a deterministic dataset
    via the trainer's `_device_arrays` -> `put_dataset_global` (the
    multi-process branch, asserted taken), and runs 2 train steps + 1 eval
    step of the real SiameseTrainer.

Run:  python scripts/run_multiprocess_dp.py
Test: tests/test_multiprocess.py (slow tier) shells out to this script.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NUM_PROCESSES = 2
DEVICES_PER_PROCESS = 2
SIZE = 32  # divisible by 16 (SiameseUNet constraint); tiny for CPU speed
N_SAMPLES = 8
BATCH = 4


def make_dataset():
    """Deterministic tiny dataset — identical on every process."""
    import numpy as np

    from gan_aug_pfa_tpu.data.loader import CachedDataset

    rng = np.random.RandomState(0)
    return CachedDataset(
        img1=rng.rand(N_SAMPLES, SIZE, SIZE, 3).astype(np.float32),
        img2=rng.rand(N_SAMPLES, SIZE, SIZE, 3).astype(np.float32),
        labels=(rng.rand(N_SAMPLES, SIZE, SIZE) > 0.9).astype(np.int32),
        cities=[f"c{i}" for i in range(N_SAMPLES)],
    )


def run_workload(mesh):
    """2 deterministic train steps + 1 eval step of the real trainer on
    `mesh`; returns the scalar losses.  float32 compute so the
    single-process reference comparison is at full precision."""
    import jax
    import numpy as np

    from gan_aug_pfa_tpu.config import SiameseTrainConfig
    from gan_aug_pfa_tpu.train import SiameseTrainer

    cfg = SiameseTrainConfig(batch_size=BATCH, compute_dtype="float32")
    trainer = SiameseTrainer(cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), (SIZE, SIZE))
    ds = make_dataset()
    dev = trainer._device_arrays(ds)  # -> put_dataset_global on a mesh
    losses = []
    for step in range(2):
        idx = trainer._put_idx(
            np.arange(step * BATCH, (step + 1) * BATCH, dtype=np.int32)
        )
        state, loss = trainer._train_step(
            state, *dev, idx, jax.random.PRNGKey(42)
        )
        losses.append(float(loss))
    val = trainer.validate(state, dev, N_SAMPLES)
    losses.append(float(val))
    return losses


def worker(out_path: str):
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gan_aug_pfa_tpu.parallel import mesh as pmesh

    pmesh.maybe_distributed_init()
    assert jax.process_count() == NUM_PROCESSES, (
        f"expected {NUM_PROCESSES} processes, got {jax.process_count()}"
    )
    n_global = NUM_PROCESSES * DEVICES_PER_PROCESS
    assert len(jax.devices()) == n_global
    mesh = pmesh.make_mesh(n_global, ("data",))
    # Prove the multi-process branch of put_dataset_global is the live one.
    assert jax.process_count() > 1
    losses = run_workload(mesh)
    print(f"[proc {jax.process_index()}] losses={losses}", flush=True)
    if jax.process_index() == 0:
        with open(out_path, "w") as f:
            json.dump({"losses": losses}, f)


def single(out_path: str):
    """Reference run: same workload, one process, local 4-device mesh."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gan_aug_pfa_tpu.parallel import mesh as pmesh

    n_global = NUM_PROCESSES * DEVICES_PER_PROCESS
    mesh = pmesh.make_mesh(n_global, ("data",))
    losses = run_workload(mesh)
    print(f"[single] losses={losses}", flush=True)
    with open(out_path, "w") as f:
        json.dump({"losses": losses}, f)


def launch() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    tmp = os.path.join(REPO, ".scratch")
    os.makedirs(tmp, exist_ok=True)
    mp_out = os.path.join(tmp, "mp_dp_multi.json")
    sp_out = os.path.join(tmp, "mp_dp_single.json")
    for f in (mp_out, sp_out):
        if os.path.exists(f):
            os.remove(f)

    base_env = dict(os.environ)
    base_env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEVICES_PER_PROCESS}"
    )
    procs = []
    for k in range(NUM_PROCESSES):
        env = dict(base_env)
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = str(NUM_PROCESSES)
        env["JAX_PROCESS_ID"] = str(k)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(k),
             "--out", mp_out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    ok = True
    for k, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        sys.stdout.write(out)
        if p.returncode != 0:
            print(f"worker {k} FAILED (exit {p.returncode})")
            ok = False
    if not ok:
        return 1

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count="
        f"{NUM_PROCESSES * DEVICES_PER_PROCESS}"
    )
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--single",
         "--out", sp_out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=900,
    )
    sys.stdout.write(r.stdout)
    if r.returncode != 0:
        print(f"single-process reference FAILED (exit {r.returncode})")
        return 1

    with open(mp_out) as f:
        mp = json.load(f)["losses"]
    with open(sp_out) as f:
        sp = json.load(f)["losses"]
    worst = max(abs(a - b) for a, b in zip(mp, sp))
    print(f"multi-process : {mp}")
    print(f"single-process: {sp}")
    print(f"max |delta| = {worst:.2e}")
    if worst > 1e-5:
        print("MULTIPROCESS DP MISMATCH")
        return 1
    print("MULTIPROCESS DP OK: 2-process 4-device dp losses match "
          "single-process")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.out)
    elif args.single:
        single(args.out)
    else:
        sys.exit(launch())


if __name__ == "__main__":
    main()
