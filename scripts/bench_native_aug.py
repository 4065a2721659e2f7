#!/usr/bin/env python
"""A/B the native-resolution augmentation chain: XLA ops vs the fused
native-extent Pallas photometric kernel (--pallas-augment), at the default
--tune workload shape (bs4, native 256² corpus, 128² target — reference
dataset.py:172-193 order, train.py:333 target size).

Measures, bench.py-style (whole-epoch lax.scan = ONE dispatch, scalar
readback sync so tunnel dispatch latency doesn't pollute device numbers):

  aug-only scan      — just augment_batch_native per step (isolates the
                       kernel A/B from the model fwd/bwd)
  full train step    — the production _train_epoch_scan (what a --tune
                       trial actually runs)
  fixed-chain step   — the pre-resized 128² chain (--no-native-aug), the
                       cost floor the 40%-overhead claim compares against

Usage: python scripts/bench_native_aug.py [steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gan_aug_pfa_tpu.config import SiameseTrainConfig
from gan_aug_pfa_tpu.data.transforms import AugmentConfig, augment_batch_native
from gan_aug_pfa_tpu.train import SiameseTrainer
from gan_aug_pfa_tpu.utils.compile_cache import enable_compile_cache


def main():
    enable_compile_cache()
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    bs, native, target = 4, 256, 128
    n = max(12, bs * 3)
    r = np.random.RandomState(0)
    ds1 = jax.device_put(r.rand(n, native, native, 3).astype(np.float32))
    ds2 = jax.device_put(r.rand(n, native, native, 3).astype(np.float32))
    lbl = jax.device_put((r.rand(n, native, native) > 0.8).astype(np.int32))
    sizes = jax.device_put(
        np.full((n, 2), native, np.int32))  # the sample corpus is all-256²
    perm = np.concatenate(
        [np.random.RandomState(1).permutation(n)
         for _ in range(steps * bs // n + 1)])[: steps * bs]
    idx_mat = jnp.asarray(perm.reshape(steps, bs), dtype=jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(1), steps)

    def timed(run, reps=4):
        dts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run()
            dts.append(time.perf_counter() - t0)
        return min(dts[1:]) / steps * 1e3

    # -- aug-only scans ---------------------------------------------------
    def make_aug_scan(use_pallas):
        @jax.jit
        def aug_scan(idx_mat, keys):
            def body(acc, x):
                idx, key = x
                i1 = jnp.take(ds1, idx, axis=0)
                i2 = jnp.take(ds2, idx, axis=0)
                lb = jnp.take(lbl, idx, axis=0)
                sz = jnp.take(sizes, idx, axis=0)
                a1, a2, al = augment_batch_native(
                    key, i1, i2, lb, sz, (target, target),
                    AugmentConfig(), use_pallas=use_pallas,
                )
                # Consume all outputs so nothing is dead code.
                return acc + jnp.sum(a1) + jnp.sum(a2) + jnp.sum(al), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), (idx_mat, keys))
            return acc

        return aug_scan

    for name, use_pallas in (("xla", False), ("pallas", True)):
        scan = make_aug_scan(use_pallas)

        def run():
            float(scan(idx_mat, keys))

        print(f"aug-only [{name:6s}]: {timed(run):7.2f} ms/step", flush=True)

    # -- per-stage breakdown of the native chain ---------------------------
    # Times cumulative prefixes of the chain (each as its own scan program)
    # so stage cost = difference of adjacent rows.  Identical math to
    # augment_batch_native's stages (transforms.py).
    from gan_aug_pfa_tpu.data import transforms as T

    def make_prefix_scan(upto):
        @jax.jit
        def scan(idx_mat, keys):
            def body(acc, x):
                idx, key = x
                i1 = jnp.take(ds1, idx, axis=0)
                i2 = jnp.take(ds2, idx, axis=0)
                lb = jnp.take(lbl, idx, axis=0)
                sz = jnp.take(sizes, idx, axis=0)
                kb = jax.random.split(key, bs)
                p = jax.vmap(
                    lambda k, s: T.sample_augment_params(
                        k, s[0], s[1], AugmentConfig())
                )(kb, sz)
                i1, i2, lb2 = jax.vmap(T._native_affine,
                                       in_axes=(0, 0, 0, 0, 0))(
                    i1, i2, lb, sz, p)
                acc = acc + jnp.sum(i1)
                if upto >= 2:
                    i1 = jax.vmap(T._native_photometric_one)(
                        i1, p["factors1"], p["order1"], p["sigma1"], sz)
                    i2 = jax.vmap(T._native_photometric_one)(
                        i2, p["factors2"], p["order2"], p["sigma2"], sz)
                    acc = acc + jnp.sum(i1)
                if upto >= 3:
                    a1, a2, al = jax.vmap(
                        T._native_tail, in_axes=(0, 0, 0, 0, None, 0)
                    )(i1, i2, lb2, sz, (target, target), p)
                    acc = acc + jnp.sum(a1) + jnp.sum(a2) + jnp.sum(al)
                return acc, None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), (idx_mat, keys))
            return acc

        return scan

    for name, upto in (("affine", 1), ("+photom", 2), ("+tail", 3)):
        scan = make_prefix_scan(upto)

        def run():
            float(scan(idx_mat, keys))

        print(f"stage prefix [{name:8s}]: {timed(run):7.2f} ms/step",
              flush=True)

    # -- full train-step scans ---------------------------------------------
    def bench_full_step(name, tr, data):
        # _train_epoch_scan donates the state: give each rep its own copy.
        base = tr.init_state(jax.random.PRNGKey(0), (target, target))
        host = jax.tree.map(np.asarray, base)
        reps = 4
        dts = []
        for _ in range(reps):
            state = jax.tree.map(jnp.asarray, host)
            t0 = time.perf_counter()
            st, losses = tr._train_epoch_scan(state, *data, idx_mat, keys)
            float(losses[-1])
            dts.append(time.perf_counter() - t0)
        print(f"train step [{name}]: {min(dts[1:]) / steps * 1e3:7.2f} "
              f"ms/step", flush=True)

    for name, use_pallas in (("native-xla   ", False), ("native-pallas", True)):
        cfg = SiameseTrainConfig(batch_size=bs, compute_dtype="bfloat16",
                                 batched_encoder=True,
                                 pallas_augment=use_pallas)
        tr = SiameseTrainer(cfg, augment=True,
                            native_out_size=(target, target))
        bench_full_step(name, tr, (ds1, ds2, (lbl, sizes)))

    # -- fixed-chain floor ---------------------------------------------------
    f1 = jax.device_put(r.rand(n, target, target, 3).astype(np.float32))
    f2 = jax.device_put(r.rand(n, target, target, 3).astype(np.float32))
    fl = jax.device_put((r.rand(n, target, target) > 0.8).astype(np.int32))
    cfg = SiameseTrainConfig(batch_size=bs, compute_dtype="bfloat16",
                             batched_encoder=True)
    tr = SiameseTrainer(cfg, augment=True)
    bench_full_step("fixed-chain  ", tr, (f1, f2, fl))


if __name__ == "__main__":
    main()
