#!/usr/bin/env python
"""Phase breakdown of the Siamese bs4@128² train step, measured the way
bench.py measures: each phase as a whole-epoch lax.scan program (ONE
dispatch + ONE scalar-readback sync per measurement), so the numbers
reflect device time even on a loaded host / high-RTT tunnel — unlike
scripts/profile_step_breakdown.py whose per-step jit timings are
dispatch-bound in that regime.

Phases:
  fwd (eval)   — _eval_epoch_scan: forward only, train=False
  fwd+bwd      — custom scan: value_and_grad + BN-stat carry + a global
                 grad-l2 readback term (so no grad leaf is dead code),
                 NO optimizer update
  full step    — _train_epoch_scan: the production program
  opt only     — scan of apply_gradients with fixed grads (isolates the
                 AdamW update's HBM traffic over 41.16M params)

Uses the persistent compile cache; config/shapes match bench.py exactly so
the full-step program is shared with it.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gan_aug_pfa_tpu.config import SiameseTrainConfig
from gan_aug_pfa_tpu.train import SiameseTrainer
from gan_aug_pfa_tpu.utils.compile_cache import enable_compile_cache


def main():
    enable_compile_cache()
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    size, bs = 128, 4
    cfg = SiameseTrainConfig(batch_size=bs, compute_dtype="bfloat16",
                             batched_encoder=True)
    trainer = SiameseTrainer(cfg, augment=False)
    state = trainer.init_state(jax.random.PRNGKey(0), (size, size))

    rng = np.random.RandomState(0)
    n = max(12, bs * 3)
    ds = tuple(
        jax.device_put(a)
        for a in (
            rng.rand(n, size, size, 3).astype(np.float32),
            rng.rand(n, size, size, 3).astype(np.float32),
            (rng.rand(n, size, size) > 0.8).astype(np.int32),
        )
    )
    epoch_rng = np.random.RandomState(1)
    perm = np.concatenate(
        [epoch_rng.permutation(n) for _ in range(steps * bs // n + 1)]
    )[: steps * bs]
    idx_mat = jnp.asarray(perm.reshape(steps, bs), dtype=jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(1), steps)

    def timed(run, reps=4):
        """min-of-(reps-1) wall for one whole-scan dispatch, synced via a
        scalar readback (bench.py protocol)."""
        dts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run()
            dts.append(time.perf_counter() - t0)
        return min(dts[1:]) / steps * 1e3

    ds1, ds2, dsl = ds

    # -- fwd (eval) ----------------------------------------------------
    def run_fwd():
        losses = trainer._eval_epoch_scan(state, ds1, ds2, dsl, idx_mat)
        float(losses[-1])

    ms_fwd = timed(run_fwd)
    print(f"fwd (eval scan):   {ms_fwd:7.2f} ms/step", flush=True)

    # -- fwd+bwd (no optimizer) -----------------------------------------
    @jax.jit
    def fwdbwd_scan(params, batch_stats, idx_mat, keys):
        def body(carry, x):
            params, bstats = carry
            idx, key = x
            img1 = jnp.take(ds1, idx, axis=0)
            img2 = jnp.take(ds2, idx, axis=0)
            labels = jnp.take(dsl, idx, axis=0)
            from gan_aug_pfa_tpu.data.transforms import normalize

            img1, img2 = normalize(img1), normalize(img2)
            labels_f = labels.astype(jnp.float32)[..., None]

            def loss_fn(p):
                logits, mut = trainer.model.apply(
                    {"params": p, "batch_stats": bstats}, img1, img2,
                    train=True, mutable=["batch_stats"],
                )
                return trainer._loss(logits, labels_f), mut["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            # Consume every grad leaf AS AN OUTPUT so none is dead code
            # (an 0.0*gnorm trick could be algebraically simplified away);
            # the global l2 costs one elementwise pass over 41M params.
            gnorm = sum(jnp.vdot(g, g) for g in jax.tree.leaves(grads))
            return (params, new_bs), (loss, gnorm)

        (_, _), (losses, gnorms) = jax.lax.scan(
            body, (params, batch_stats), (idx_mat, keys)
        )
        return losses, gnorms

    def run_fwdbwd():
        losses, gnorms = fwdbwd_scan(
            state.params, state.batch_stats, idx_mat, keys
        )
        float(losses[-1]); float(gnorms[-1])

    ms_fwdbwd = timed(run_fwdbwd)
    print(f"fwd+bwd scan:      {ms_fwdbwd:7.2f} ms/step "
          f"(bwd ≈ {ms_fwdbwd - ms_fwd:.2f})", flush=True)

    # -- optimizer only ---------------------------------------------------
    zeros_grads = jax.tree.map(jnp.zeros_like, state.params)

    @jax.jit
    def opt_scan(state):
        def body(st, _):
            st = st.apply_gradients(
                grads=zeros_grads, batch_stats=st.batch_stats
            )
            return st, st.step

        st, steps_out = jax.lax.scan(body, state, None, length=steps)
        return st, steps_out

    def run_opt():
        _, steps_out = opt_scan(state)
        float(steps_out[-1])

    ms_opt = timed(run_opt)
    print(f"optimizer scan:    {ms_opt:7.2f} ms/step "
          f"(AdamW over 41.16M f32 params, zero grads)", flush=True)

    # -- full step ---------------------------------------------------------
    st = state
    dts = []
    for _ in range(4):
        t0 = time.perf_counter()
        st, losses = trainer._train_epoch_scan(
            st, ds1, ds2, dsl, idx_mat, keys
        )
        float(losses[-1])
        dts.append(time.perf_counter() - t0)
    ms_full = min(dts[1:]) / steps * 1e3
    print(f"full step scan:    {ms_full:7.2f} ms/step", flush=True)
    print(f"\nimplied split: fwd {ms_fwd:.2f} + bwd "
          f"{ms_fwdbwd - ms_fwd:.2f} + opt/BN/rest "
          f"{ms_full - ms_fwdbwd:.2f}  (direct opt-only {ms_opt:.2f})",
          flush=True)


if __name__ == "__main__":
    main()
