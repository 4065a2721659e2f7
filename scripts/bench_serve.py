#!/usr/bin/env python
"""Benchmark the AOT serving path on the current backend (TPU by default).

Exports a serving artifact (random-init weights unless --checkpoint-path is
given — serve latency does not depend on weight values), loads it back the
way a deployment would (gan_aug_pfa_tpu.serve.load_serving_fn), and times
steady-state inference.  Timing syncs via scalar readback — through the
axon tunnel block_until_ready can return early (RESULTS.md).

  python scripts/bench_serve.py                 # siamese @128, bs 1,4,16
  python scripts/bench_serve.py --arch generator --target-size 256x256
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="siamese",
                   choices=["siamese", "generator", "discriminator"])
    p.add_argument("--target-size", default=None)
    p.add_argument("--checkpoint-path", default=None)
    p.add_argument("--batch-sizes", default="1,4,16")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--backend", default=None,
                   help="Force the jax platform (e.g. cpu)")
    p.add_argument("--artifact", default=None,
                   help="Reuse an existing artifact instead of exporting")
    p.add_argument("--quantize", default=None, choices=["int8"],
                   help="Weight-only int8 export (quantize.py)")
    p.add_argument("--aot", action="store_true",
                   help="After exporting, AOT-compile the executable "
                        "sidecar for --batch-sizes (serve.compile_artifact)."
                        " Cold-start protocol: run once with --aot, then "
                        "re-run in a FRESH process with --artifact <path> — "
                        "first_call_s then measures the no-XLA-compile path")
    args = p.parse_args()

    import jax

    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    import jax.numpy as jnp
    import numpy as np

    from gan_aug_pfa_tpu import serve
    from gan_aug_pfa_tpu.config import parse_target_size
    from gan_aug_pfa_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    if args.target_size:
        h, w = parse_target_size(args.target_size)
    else:
        h, w = (128, 128) if args.arch == "siamese" else (256, 256)

    if args.artifact:
        path = args.artifact
    else:
        model = serve._build_model(args.arch, 3, args.compute_dtype)
        rng = jax.random.PRNGKey(0)
        dummy = jnp.zeros(
            (1, h, w, 6 if args.arch == "discriminator" else 3), jnp.float32
        )
        if args.arch == "siamese":
            variables = model.init(rng, dummy, dummy, train=False)
        else:
            variables = model.init(rng, dummy, train=False)
        if args.checkpoint_path:
            from gan_aug_pfa_tpu import checkpoint as ckpt

            variables = ckpt.restore_model_only(
                args.checkpoint_path, variables
            )
        t0 = time.perf_counter()
        weights = None
        if args.quantize == "int8":
            exported, weights, report = serve.export_model_quantized(
                args.arch, variables, h, w,
                compute_dtype=args.compute_dtype,
                platforms=[jax.default_backend()],
            )
            print(f"int8: {report['quantized']} tensors, "
                  f"{report['bytes_fp'] / 1e6:.1f} -> "
                  f"{report['bytes_q'] / 1e6:.1f} MB")
        else:
            exported = serve.export_model(
                args.arch, variables, h, w,
                compute_dtype=args.compute_dtype,
                platforms=[jax.default_backend()],
            )
        export_s = time.perf_counter() - t0
        path = (f"/tmp/bench_serve_{args.arch}"
                f"{'_int8' if args.quantize else ''}.ghlo")
        serve.save_artifact(path, exported, {"arch": args.arch},
                            weights=weights)
        print(f"export: {export_s:.1f}s, artifact "
              f"{os.path.getsize(path) / 1e6:.1f} MB")

    if args.aot:
        t0 = time.perf_counter()
        serve.compile_artifact(
            path, [int(b) for b in args.batch_sizes.split(",")]
        )
        print(f"aot sidecar build: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    header, fn = serve.load_serving_fn(path)
    load_s = time.perf_counter() - t0
    print(f"load: {load_s:.2f}s on {jax.default_backend()} "
          f"(platforms={header['platforms']}, "
          f"aot={header.get('aot_batch_sizes', 'none')})")

    rows = []
    r = np.random.RandomState(0)
    for bs in [int(b) for b in args.batch_sizes.split(",")]:
        x1 = jnp.asarray(r.rand(bs, h, w, 3).astype(np.float32) * 2 - 1)
        x2 = jnp.asarray(r.rand(bs, h, w, 3).astype(np.float32) * 2 - 1)
        inputs = (x1,) if args.arch == "generator" else (x1, x2)
        t0 = time.perf_counter()
        out = fn(*inputs)
        _ = float(jnp.asarray(out).ravel()[0])  # sync incl. first compile
        first_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*inputs)
        _ = float(jnp.asarray(out).ravel()[0])
        dt = (time.perf_counter() - t0) / args.iters
        rows.append({
            "batch": bs, "first_call_s": round(first_s, 3),
            "steady_ms": round(dt * 1e3, 3),
            "img_per_s": round(bs / dt, 1),
        })
        print(rows[-1])
    print(json.dumps({
        "arch": args.arch, "size": [h, w], "backend": jax.default_backend(),
        "compute_dtype": args.compute_dtype, "quantize": args.quantize,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
