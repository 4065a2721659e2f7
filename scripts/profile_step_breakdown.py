#!/usr/bin/env python
"""Ablation profile of the Siamese train step on the attached TPU.

Times (median over reps, device-synced via scalar readback) for:
  fwd-only / fwd+bwd / full step, bf16 vs fp32, batched vs two-pass encoder,
  and an encoder-only forward — to localize where the step time goes.
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


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, *args, reps=30):
    fn(*args)  # compile
    fn(*args)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    img = jax.device_put(rng.rand(4, 128, 128, 3).astype(np.float32))
    img2 = jax.device_put(rng.rand(4, 128, 128, 3).astype(np.float32))
    lbl = jax.device_put((rng.rand(4, 128, 128) > 0.8).astype(np.int32))

    dtypes = sys.argv[1:] or ["bfloat16"]
    cfree = os.environ.get("CONCAT_FREE", "0") == "1"
    for dtype in dtypes:
        for be in (True, False):
            cfg = SiameseTrainConfig(
                batch_size=4, compute_dtype=dtype, batched_encoder=be,
                concat_free=cfree,
            )
            tr = SiameseTrainer(cfg, augment=False)
            state = tr.init_state(jax.random.PRNGKey(0), (128, 128))
            key = jax.random.PRNGKey(1)
            idx = jnp.arange(4, dtype=jnp.int32)

            # full step: thread the donated state through a holder
            holder = {"state": state}

            def full():
                s2, loss = tr._train_step(
                    holder["state"], img, img2, lbl, idx, key
                )
                holder["state"] = s2
                return sync(loss)

            # fwd+bwd only
            from gan_aug_pfa_tpu.data.transforms import normalize
            from gan_aug_pfa_tpu.losses import focal_dice_loss

            @jax.jit
            def fwdbwd(params, bs):
                i1, i2 = normalize(img), normalize(img2)
                lf = lbl.astype(jnp.float32)[..., None]

                def loss_fn(p):
                    logits, mut = tr.model.apply(
                        {"params": p, "batch_stats": bs}, i1, i2,
                        train=True, mutable=["batch_stats"],
                    )
                    return focal_dice_loss(logits, lf), mut

                (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
                return l

            @jax.jit
            def fwd(params, bs):
                i1, i2 = normalize(img), normalize(img2)
                logits, _ = tr.model.apply(
                    {"params": params, "batch_stats": bs}, i1, i2,
                    train=True, mutable=["batch_stats"],
                )
                return jnp.sum(logits)

            @jax.jit
            def fwd_eval(params, bs):
                i1, i2 = normalize(img), normalize(img2)
                logits = tr.model.apply(
                    {"params": params, "batch_stats": bs}, i1, i2,
                    train=False,
                )
                return jnp.sum(logits)

            t_fb = timeit(lambda: sync(fwdbwd(state.params, state.batch_stats)))
            t_f = timeit(lambda: sync(fwd(state.params, state.batch_stats)))
            t_fe = timeit(
                lambda: sync(fwd_eval(state.params, state.batch_stats))
            )
            t_full = timeit(lambda: full())  # donates state; keep last
            print(
                f"{dtype:9s} batched_enc={be!s:5s}  "
                f"full={t_full:7.2f}ms  fwd+bwd={t_fb:7.2f}ms  "
                f"fwd(train)={t_f:7.2f}ms  fwd(eval)={t_fe:7.2f}ms"
            )


if __name__ == "__main__":
    main()
