#!/usr/bin/env python
"""Convert checkpoints between the reference's torch ``.pth`` format and
this framework's ``.msgpack`` (both directions).

The reference ecosystem loads bare state_dicts by stem (reference
generate_synthetic_data.py:18,48; evaluate.py:20,343-351); this converter
makes those artifacts interchangeable with TPU-trained ones:

    # reference-trained -> TPU framework
    python scripts/convert_checkpoint.py generator_epoch_200.pth \
        generator_epoch_200.msgpack

    # TPU-trained -> reference tooling
    python scripts/convert_checkpoint.py best_model.msgpack best_model.pth \
        --arch siamese

Architecture is auto-detected from ``.pth`` key structure; for
``.msgpack`` -> ``.pth`` pass --arch (siamese | generator | discriminator)
or let the stem guess it (best_model/model_epoch -> siamese,
generator_* -> generator, discriminator_* -> discriminator).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def guess_arch_from_stem(path: str) -> str:
    stem = os.path.basename(path)
    if stem.startswith("generator"):
        return "generator"
    if stem.startswith("discriminator"):
        return "discriminator"
    if stem.startswith(("best_model", "model_epoch", "siamese")):
        return "siamese"
    raise SystemExit(
        f"cannot guess architecture from stem {stem!r}; pass --arch"
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--arch", choices=("siamese", "generator",
                                       "discriminator"), default=None)
    args = ap.parse_args()

    from flax import serialization

    from gan_aug_pfa_tpu import interop

    if args.input.endswith(".pth"):
        sd = interop.load_torch_state_dict(args.input)
        arch = args.arch or interop.detect_arch(sd)
        variables = interop._FROM_TORCH[arch](sd)
        payload = serialization.to_bytes(variables)
        with open(args.output, "wb") as f:
            f.write(payload)
    elif args.input.endswith(".msgpack"):
        arch = args.arch or guess_arch_from_stem(args.input)
        with open(args.input, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        variables = {"params": payload["params"],
                     "batch_stats": payload["batch_stats"]}
        sd = interop.torch_state_dict_from_variables(variables, arch)
        interop.save_torch_state_dict(args.output, sd)
    else:
        raise SystemExit("input must end in .pth or .msgpack")
    print(f"converted {args.input} ({arch}) -> {args.output} "
          f"[{os.path.getsize(args.output)} bytes]")


if __name__ == "__main__":
    main()
