#!/usr/bin/env python
"""[extension] Export a checkpoint as a self-contained serving artifact.

The reference has no deployment path — its inference scripts rebuild the
torch model and load a ``.pth`` per run (reference
generate_synthetic_data.py:44-48, evaluate.py:343-351).  This CLI bakes a
trained checkpoint (our ``.msgpack`` or a reference-trained ``.pth`` via
the interop converter) into one StableHLO artifact with a dynamic batch
dimension, loadable with ``gan_aug_pfa_tpu.serve.load_serving_fn`` and no
model code.

  python export_model.py --checkpoint-path siamese_checkpoints/best_model.msgpack \
      --output artifacts/siamese_serve.ghlo --platform tpu cpu
"""

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Export a trained model as an AOT serving artifact"
    )
    p.add_argument("--checkpoint-path", type=str, required=True,
                   help=".msgpack (ours) or .pth (reference-trained)")
    p.add_argument("--arch", type=str, default=None,
                   choices=["siamese", "generator", "discriminator"],
                   help="Inferred from the checkpoint stem if omitted")
    p.add_argument("--output", type=str, default=None,
                   help="Artifact path (default: <checkpoint>.ghlo)")
    p.add_argument("--target-size", type=str, default=None,
                   help="HxW the model will serve at (default: 128x128 for "
                        "siamese, 256x256 for GAN archs — the reference's "
                        "training sizes)")
    p.add_argument("--batch-size", type=int, default=None,
                   help="Fix the batch dimension (default: dynamic)")
    p.add_argument("--platform", type=str, nargs="+", default=None,
                   metavar="P",
                   help="Target platform(s), e.g. tpu cpu (default: the "
                        "current jax backend)")
    p.add_argument("--n-channels", type=int, default=3)
    p.add_argument("--num-downs", type=int, default=7,
                   help="generator U-Net depth; must match the checkpoint "
                        "(train_gan.py --num-downs)")
    p.add_argument("--ngf", type=int, default=64,
                   help="generator base filter count; must match the "
                        "checkpoint")
    p.add_argument("--ndf", type=int, default=64,
                   help="discriminator base filter count; must match the "
                        "checkpoint")
    p.add_argument("--n-layers", type=int, default=3,
                   help="discriminator depth; must match the checkpoint")
    p.add_argument("--compute-dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="Dtype the forward computes in inside the artifact")
    p.add_argument("--quantize", type=str, default=None,
                   choices=["int8"],
                   help="Weight-only quantization: int8 = symmetric "
                        "per-output-channel conv kernels, fp activations "
                        "(~4x smaller artifact and HBM weight footprint; "
                        "see gan_aug_pfa_tpu/quantize.py)")
    p.add_argument("--aot-batch-sizes", type=str, default=None,
                   metavar="B1,B2",
                   help="After exporting, AOT-compile the artifact at these "
                        "batch sizes ON THE CURRENT BACKEND and write the "
                        "executable sidecar (<output>.aotc) — serving "
                        "processes then skip the per-shape XLA compile "
                        "entirely (serve.compile_artifact). The sidecar is "
                        "hardware/jax-version pinned; run this step on the "
                        "deployment host (also standalone: python -m "
                        "gan_aug_pfa_tpu.serve ARTIFACT B1,B2)")
    p.add_argument("--backend", type=str, default=None,
                   help="Force the local jax platform for the export "
                        "process (e.g. cpu). Cross-platform lowering means "
                        "a cpu host can still export --platform tpu "
                        "artifacts. The deployment image force-registers "
                        "the TPU plugin, so an env JAX_PLATFORMS=cpu alone "
                        "does not stick — this flag applies it after "
                        "import, before the backend initializes.")
    return p


def main() -> None:
    args = build_parser().parse_args()

    if args.backend:
        import jax

        jax.config.update("jax_platforms", args.backend)

    from gan_aug_pfa_tpu import checkpoint as ckpt
    from gan_aug_pfa_tpu import serve
    from gan_aug_pfa_tpu.config import parse_target_size

    arch = args.arch or serve.arch_from_stem(args.checkpoint_path)
    if arch is None:
        raise SystemExit(
            f"cannot infer --arch from {args.checkpoint_path!r} "
            "(expected a best_model/model_epoch_N/generator_epoch_N/"
            "discriminator_epoch_N stem); pass --arch explicitly"
        )
    if args.target_size:
        h, w = parse_target_size(args.target_size)
    else:
        h, w = (128, 128) if arch == "siamese" else (256, 256)

    import jax
    import jax.numpy as jnp

    if arch == "generator":
        arch_kwargs = {"num_downs": args.num_downs, "ngf": args.ngf}
    elif arch == "discriminator":
        arch_kwargs = {"ndf": args.ndf, "n_layers": args.n_layers}
    else:
        arch_kwargs = {}

    # Build a variables template of the right structure, then restore the
    # checkpoint into it (handles .msgpack and .pth alike).
    model = serve._build_model(
        arch, args.n_channels, args.compute_dtype, arch_kwargs
    )
    dummy = jnp.zeros((1, h, w, args.n_channels), jnp.float32)
    if arch == "siamese":
        template = model.init(jax.random.PRNGKey(0), dummy, dummy,
                              train=False)
    elif arch == "generator":
        template = model.init(jax.random.PRNGKey(0), dummy, train=False)
    else:
        template = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, h, w, 2 * args.n_channels), jnp.float32),
            train=False,
        )
    variables = ckpt.restore_model_only(args.checkpoint_path, template)

    print(f"Exporting {arch} at {h}x{w} "
          f"(batch={'dynamic' if args.batch_size is None else args.batch_size}"
          f", platforms={args.platform or [jax.default_backend()]}, "
          f"compute={args.compute_dtype}"
          f"{', quantize=' + args.quantize if args.quantize else ''})")
    meta = {
        "arch": arch,
        "target_size": [h, w],
        "n_channels": args.n_channels,
        "compute_dtype": args.compute_dtype,
        "source_checkpoint": os.path.abspath(args.checkpoint_path),
    }
    if arch_kwargs:
        meta["arch_kwargs"] = arch_kwargs
    weights = None
    if args.quantize == "int8":
        exported, weights, report = serve.export_model_quantized(
            arch, variables, h, w, n_channels=args.n_channels,
            batch_size=args.batch_size, platforms=args.platform,
            compute_dtype=args.compute_dtype, arch_kwargs=arch_kwargs,
        )
        meta["quantize"] = "int8"
        meta["quantize_report"] = report
        print(f"  int8 weight-only: {report['quantized']} tensors "
              f"quantized ({report['bytes_fp'] / 1e6:.1f} MB fp32 -> "
              f"{report['bytes_q'] / 1e6:.1f} MB), "
              f"{report['kept_fp']} kept fp")
    else:
        exported = serve.export_model(
            arch, variables, h, w, n_channels=args.n_channels,
            batch_size=args.batch_size, platforms=args.platform,
            compute_dtype=args.compute_dtype, arch_kwargs=arch_kwargs,
        )
    out = args.output or (
        os.path.splitext(args.checkpoint_path)[0] + ".ghlo"
    )
    serve.save_artifact(out, exported, meta, weights=weights)
    print(f"Saved serving artifact to {out} "
          f"({os.path.getsize(out) / 1e6:.1f} MB)")
    if args.aot_batch_sizes:
        sizes = [int(s) for s in args.aot_batch_sizes.split(",")]
        print(f"AOT-compiling for batch sizes {sizes} on "
              f"{jax.default_backend()} ...")
        serve.compile_artifact(out, sizes)


if __name__ == "__main__":
    main()
