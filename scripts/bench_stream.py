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

At-scale mode (VERDICT r4 item 9 — the depth-bounded memory claim with a
corpus whose DECODED footprint exceeds device HBM): persist the corpus
with --root, pick one mode per process with --mode so the reported peak
RSS (VmHWM) is attributable, e.g.

  python scripts/bench_stream.py --root /tmp/stream_corpus --n 10000 \
      --size 256 --steps 200 --mode decode
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
    ap.add_argument("--root", type=str, default=None,
                    help="persistent corpus dir (reused if populated) "
                    "instead of a tempdir")
    ap.add_argument("--mode", choices=["all", "resident", "host", "decode"],
                    default="all",
                    help="run one mode per process so peak RSS (VmHWM) "
                    "is attributable to it")
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

    import contextlib

    if args.root:
        os.makedirs(args.root, exist_ok=True)
        ctx = contextlib.nullcontext(args.root)
    else:
        ctx = tempfile.TemporaryDirectory()
    with ctx as root:
        marker = os.path.join(root, f".corpus_{args.n}_{args.size}")
        if os.path.exists(marker):
            from gan_aug_pfa_tpu.data.scanner import Sample

            samples = [
                Sample(city=f"c{i:03d}",  # _write_corpus's naming
                       img1=os.path.join(root, f"c{i:03d}", "img1.png"),
                       img2=os.path.join(root, f"c{i:03d}", "img2.png"),
                       label=os.path.join(root, f"c{i:03d}", "cm.png"))
                for i in range(args.n)
            ]
        else:
            t0 = time.perf_counter()
            samples = _write_corpus(root, args.n, args.size)
            open(marker, "w").close()
            print(f"# corpus written in {time.perf_counter()-t0:.0f}s",
                  file=sys.stderr)

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
        modes = (("resident", "host", "decode") if args.mode == "all"
                 else (args.mode,))

        # resident: whole-epoch scan, one dispatch, one sync.
        if "resident" in modes:
            tr, state = make()
            ds = build_cached_dataset(samples, size, verbose=False)
            dev = tr._device_arrays(ds)
            idx_mat = jnp.asarray(np.stack(batches), dtype=jnp.int32)
            keys = jax.random.split(jax.random.PRNGKey(1), args.steps)
            dts = []
            for _ in range(args.reps + 1):
                t0 = time.perf_counter()
                state, losses = tr._train_epoch_scan(
                    state, *dev, idx_mat, keys
                )
                float(losses[-1])
                dts.append(time.perf_counter() - t0)
            results["resident"] = min(dts[1:])

        for mode in ("host", "decode"):
            if mode not in modes:
                continue
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

    decoded_bytes_per_sample = (
        2 * args.size * args.size * 3 * 4 + args.size * args.size * 4
    )
    out = {"steps": args.steps, "batch_size": bs, "size": args.size,
           "n": args.n,
           "corpus_decoded_gb": round(
               args.n * decoded_bytes_per_sample / 1e9, 2)}
    # Peak RSS of THIS process (VmHWM): with --mode the number is
    # attributable to the single mode that ran.
    try:
        with open("/proc/self/status") as f:
            for ln in f:
                if ln.startswith("VmHWM"):
                    out["peak_rss_gb"] = round(
                        int(ln.split()[1]) / 1e6, 2)
    except OSError:
        pass
    for mode, dt in results.items():
        out[f"{mode}_ms_per_step"] = round(dt / args.steps * 1e3, 3)
        out[f"{mode}_img_per_sec"] = round(args.steps * bs / dt, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
