#!/usr/bin/env python
"""Measure the streaming data path's overhead vs the HBM-resident path.

Times the Siamese train step at the headline workload (bs4 @128px,
bfloat16, batched encoder) three ways over the same synthetic corpus:

  resident — HBM cache + whole-epoch lax.scan (the bench.py headline)
  host     — StreamingSource(cache='host'): host-RAM arrays, batches
             staged to HBM per step with depth-2 prefetch
  decode   — StreamingSource(cache='decode'): PNGs re-decoded per batch
             in a thread pool, then staged

All modes sync once at the end (scalar readback — block_until_ready is
unreliable through the axon tunnel), so numbers reflect pipeline
throughput, not per-step round-trips.

  python scripts/bench_stream.py [--n 64] [--steps 96] [--batch-size 4]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_corpus(root: str, n: int, size: int):
    """n triplets of random PNGs in the flat layout StreamingSource's
    Sample records point at."""
    import numpy as np
    from PIL import Image

    from gan_aug_pfa_tpu.data.scanner import Sample

    rng = np.random.RandomState(0)
    samples = []
    for i in range(n):
        d = os.path.join(root, f"c{i:03d}")
        os.makedirs(d, exist_ok=True)
        paths = []
        for name in ("img1.png", "img2.png"):
            p = os.path.join(d, name)
            Image.fromarray(
                rng.randint(0, 256, (size, size, 3), dtype=np.uint8)
            ).save(p)
            paths.append(p)
        lp = os.path.join(d, "cm.png")
        Image.fromarray(
            ((rng.rand(size, size) > 0.8) * 255).astype(np.uint8), mode="L"
        ).save(lp)
        samples.append(Sample(
            city=f"c{i:03d}", img1=paths[0], img2=paths[1], label=lp,
        ))
    return samples


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64, help="corpus size")
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from gan_aug_pfa_tpu.config import SiameseTrainConfig
    from gan_aug_pfa_tpu.data.loader import build_cached_dataset
    from gan_aug_pfa_tpu.data.stream import StreamingSource, prefetch_batches
    from gan_aug_pfa_tpu.train import SiameseTrainer
    from gan_aug_pfa_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    size = (args.size, args.size)
    bs = args.batch_size

    with tempfile.TemporaryDirectory() as root:
        samples = _write_corpus(root, args.n, args.size)

        def make():
            cfg = SiameseTrainConfig(
                batch_size=bs, compute_dtype="bfloat16",
                batched_encoder=True,
            )
            tr = SiameseTrainer(cfg, augment=False)
            return tr, tr.init_state(jax.random.PRNGKey(0), size)

        erng = np.random.RandomState(1)
        perm = np.concatenate(
            [erng.permutation(args.n)
             for _ in range(args.steps * bs // args.n + 1)]
        )[: args.steps * bs]
        batches = [perm[s:s + bs] for s in range(0, args.steps * bs, bs)]
        results = {}

        # resident: whole-epoch scan, one dispatch, one sync.
        tr, state = make()
        ds = build_cached_dataset(samples, size, verbose=False)
        dev = tr._device_arrays(ds)
        idx_mat = jnp.asarray(np.stack(batches), dtype=jnp.int32)
        keys = jax.random.split(jax.random.PRNGKey(1), args.steps)
        dts = []
        for _ in range(args.reps + 1):
            t0 = time.perf_counter()
            state, losses = tr._train_epoch_scan(state, *dev, idx_mat, keys)
            float(losses[-1])
            dts.append(time.perf_counter() - t0)
        results["resident"] = min(dts[1:])

        for mode in ("host", "decode"):
            tr, state = make()
            src = StreamingSource(samples, size, cache=mode, verbose=False)
            key = jax.random.PRNGKey(1)
            dts = []
            for _ in range(args.reps + 1):
                t0 = time.perf_counter()
                loss = None
                for _, (i1, i2, lb) in prefetch_batches(
                    src, batches, tr._put_batch, depth=2
                ):
                    key, k = jax.random.split(key)
                    state, loss = tr._train_step_batch(state, i1, i2, lb, k)
                float(loss)
                dts.append(time.perf_counter() - t0)
            src.close()
            results[mode] = min(dts[1:])

    out = {"steps": args.steps, "batch_size": bs, "size": args.size}
    for mode, dt in results.items():
        out[f"{mode}_ms_per_step"] = round(dt / args.steps * 1e3, 3)
        out[f"{mode}_img_per_sec"] = round(args.steps * bs / dt, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
