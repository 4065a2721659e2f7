#!/usr/bin/env python
"""Device-side HLO op profile of the production epoch-scan train step.

Captures a jax.profiler trace of the whole-epoch lax.scan program on the
attached TPU and prints the top ops by self time (xprof hlo_op_profile),
so optimization targets device time, not tunnel dispatch latency.

Usage: python scripts/profile_device_trace.py [--batched-encoder] [--steps N]
"""
import argparse
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batched-encoder", action="store_true")
    ap.add_argument("--concat-free", action="store_true")
    ap.add_argument("--gan", action="store_true",
                    help="profile the Pix2Pix D+G step instead")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--tool", default="op_profile")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    tdir = tempfile.mkdtemp(prefix="trace_")
    if args.gan:
        from gan_aug_pfa_tpu.config import GANTrainConfig
        from gan_aug_pfa_tpu.train import GANTrainer

        gcfg = GANTrainConfig(batch_size=1, compute_dtype="bfloat16")
        tr = GANTrainer(gcfg)
        sg, sd = tr.init_states(jax.random.PRNGKey(0))
        n = 14
        ds = tuple(jax.device_put(a) for a in (
            rng.rand(n, 256, 256, 3).astype(np.float32),
            rng.rand(n, 256, 256, 3).astype(np.float32),
        ))
        idx_mat = jnp.asarray(
            np.concatenate([np.random.RandomState(i).permutation(n)
                            for i in range(args.steps // n + 1)])
            [: args.steps].reshape(args.steps, 1), jnp.int32)
        sg, sd, ld, lg = tr._gan_epoch_scan(sg, sd, *ds, idx_mat)
        float(jnp.sum(ld))
        with jax.profiler.trace(tdir):
            sg, sd, ld, lg = tr._gan_epoch_scan(sg, sd, *ds, idx_mat)
            float(jnp.sum(ld))
    else:
        from gan_aug_pfa_tpu.config import SiameseTrainConfig
        from gan_aug_pfa_tpu.train import SiameseTrainer

        cfg = SiameseTrainConfig(
            batch_size=4, compute_dtype="bfloat16",
            batched_encoder=args.batched_encoder,
            concat_free=args.concat_free,
        )
        tr = SiameseTrainer(cfg, augment=False)
        state = tr.init_state(jax.random.PRNGKey(0), (128, 128))

        n = 12
        ds = tuple(jax.device_put(a) for a in (
            rng.rand(n, 128, 128, 3).astype(np.float32),
            rng.rand(n, 128, 128, 3).astype(np.float32),
            (rng.rand(n, 128, 128) > 0.8).astype(np.int32),
        ))
        perm = np.concatenate([np.random.RandomState(i).permutation(n)
                               for i in range(args.steps * 4 // n + 1)])
        idx_mat = jnp.asarray(
            perm[: args.steps * 4].reshape(args.steps, 4), jnp.int32
        )
        keys = jax.random.split(jax.random.PRNGKey(1), args.steps)

        # compile + warm
        state, losses = tr._train_epoch_scan(state, *ds, idx_mat, keys)
        float(jnp.sum(losses))

        with jax.profiler.trace(tdir):
            state, losses = tr._train_epoch_scan(state, *ds, idx_mat, keys)
            float(jnp.sum(losses))

    paths = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                      recursive=True)
    print(f"xplane: {paths}", file=sys.stderr)
    from xprof.convert import raw_to_tool_data as r

    data, _ = r.xspace_to_tool_data(paths, args.tool, {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")
    out = os.path.join(tdir, f"{args.tool}.json")
    with open(out, "w") as f:
        f.write(data)
    print(f"wrote {out}", file=sys.stderr)

    if args.tool == "op_profile":
        prof = json.loads(data)

        def walk(node, depth=0, out_rows=None):
            m = node.get("metrics", {})
            out_rows.append((m.get("time", 0.0), node.get("name", "?"),
                             depth, m))
            for c in node.get("children", []):
                walk(c, depth + 1, out_rows)
            return out_rows

        root = prof.get("byCategory", prof)
        rows = walk(root, 0, [])
        rows.sort(key=lambda t: -t[0])
        for t, name, depth, m in rows[:40]:
            print(f"{t:8.3f}%  flops={m.get('flops', 0):6.2f}% "
                  f"membw={m.get('memoryBandwidth', 0):6.2f}%  {name}")


if __name__ == "__main__":
    main()
