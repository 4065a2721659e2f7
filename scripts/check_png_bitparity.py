#!/usr/bin/env python
"""Synthetic-PNG bit-comparability proof (BASELINE.json's "bit-comparable"
requirement; VERDICT r1 item 4).

Both generation paths run on the SAME on-disk OSCD-shaped tree with the
SAME generator weights (seeded torch init + perturbed BN stats, saved as a
.pth consumed directly by our CLI via the interop converter):

  reference path: the reference's own models.UNetGenerator imported at
    runtime from /root/reference under torch CPU f32, with the exact save
    arithmetic of generate_synthetic_data.py:61-85 (x*0.5+0.5, then
    to_pil_image's mul(255).byte() truncation — torchvision itself is not
    installed in this image, so its one-line float->byte formula is
    replicated here; the data pipeline is the shared cache, whose numerics
    are separately tested equal to torch interpolation);
  our path: pipelines.run_generate_synthetic with the .pth checkpoint,
    float32 compute, on the JAX CPU backend.

Output: per-file byte comparison; when bytes differ, a per-pixel |delta|
histogram in uint8 LSBs (the honest bound the PARITY.md claim carries).

Run: python scripts/check_png_bitparity.py [--cities N] [--size 256]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
REFERENCE = "/root/reference"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cities", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--keep", action="store_true",
                    help="keep the temp work tree")
    args = ap.parse_args()

    # Force the CPU platform before JAX initializes (f32 conv parity run;
    # avoids the TPU tunnel entirely).
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, REFERENCE)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    import torch
    from PIL import Image

    import models as ref_models  # reference models.py (runtime import)

    from arrange_sample_corpus import arrange
    from gan_aug_pfa_tpu.config import DataConfig, GenerateConfig
    from gan_aug_pfa_tpu.data import build_cached_dataset, create_sample_lists
    from gan_aug_pfa_tpu.pipelines import run_generate_synthetic

    def to_png_bytes(chw: "torch.Tensor") -> np.ndarray:
        # torchvision to_pil_image on float CHW: pic.mul(255).byte() (no
        # rounding, no clip) then HWC — replicated verbatim.
        return (
            chw.mul(255).byte().permute(1, 2, 0).numpy()
        )

    work = tempfile.mkdtemp(prefix="png_bitparity_")
    print(f"work tree: {work}")

    # 1. Arrange a small tree from the reference's shipped sample corpus.
    src = os.path.join(REFERENCE, "synthetic_data")
    staged = os.path.join(work, "src")
    for sub in ("images", "labels"):
        os.makedirs(os.path.join(staged, sub), exist_ok=True)
        for c in sorted(os.listdir(os.path.join(src, sub)))[:args.cities]:
            shutil.copytree(os.path.join(src, sub, c),
                            os.path.join(staged, sub, c))
    root = os.path.join(work, "tree")
    n = arrange(staged, root)
    print(f"{n} cities arranged")

    # 2. Seeded generator weights -> .pth (BN stats perturbed so eval-mode
    # normalization is a real test).
    torch.manual_seed(0)
    tgen = ref_models.UNetGenerator(3, 3, num_downs=7, ngf=64)
    with torch.no_grad():
        for m in tgen.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    tgen.eval()
    ckpt_dir = os.path.join(root, "gan_checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    pth = os.path.join(ckpt_dir, "generator_epoch_0.pth")
    torch.save(tgen.state_dict(), pth)

    # 3. Reference generation path (generate_synthetic_data.py:33-92
    # semantics): shared cache -> [-1,1] normalize -> torch G -> denorm ->
    # truncating byte conversion -> PNG.
    data_cfg0 = DataConfig(root_dir=root)
    samples = create_sample_lists(
        data_cfg0.root_dir, data_cfg0.dataset_subdir,
        data_cfg0.synthetic_data_dir, mode="all", verbose=False,
    )
    cache = build_cached_dataset(
        samples, (args.size, args.size), verbose=False
    )
    ref_out = os.path.join(work, "ref_out")
    with torch.no_grad():
        for i in range(len(cache)):
            city = cache.cities[i]
            x1 = torch.from_numpy(
                np.transpose(cache.img1[i], (2, 0, 1))
            ) * 2.0 - 1.0
            fake = tgen(x1[None])[0]
            d = os.path.join(ref_out, "images", city)
            ld = os.path.join(ref_out, "labels", city)
            os.makedirs(d, exist_ok=True)
            os.makedirs(ld, exist_ok=True)
            # No clamp — the reference doesn't (generate_synthetic_data.py
            # :70-85); normalize/tanh outputs stay in [-1, 1] anyway.
            Image.fromarray(to_png_bytes(x1 * 0.5 + 0.5)).save(
                os.path.join(d, f"img1_synth_{i}.png"))
            Image.fromarray(to_png_bytes(fake * 0.5 + 0.5)).save(
                os.path.join(d, f"img2_synth_{i}.png"))
            lbl = (cache.labels[i].astype(np.uint8)) * 255
            Image.fromarray(lbl, mode="L").save(
                os.path.join(ld, f"cm_synth_{i}.png"))
    print(f"reference path wrote {len(cache)} triplets")

    # 4. Our path: the real pipeline, .pth consumed via interop.
    data_cfg = DataConfig(root_dir=root)
    gen_cfg = GenerateConfig(
        target_size=(args.size, args.size),
        generator_checkpoint_name="generator_epoch_0.pth",
        compute_dtype="float32",
    )
    run_generate_synthetic(data_cfg, gen_cfg, verbose=False)
    ours_out = os.path.join(root, "synthetic_data")

    # 5. Compare.
    total = identical = 0
    hist = np.zeros(256, np.int64)
    worst = {}
    for sub in ("images", "labels"):
        for city in sorted(os.listdir(os.path.join(ref_out, sub))):
            rdir = os.path.join(ref_out, sub, city)
            odir = os.path.join(ours_out, sub, city)
            for f in sorted(os.listdir(rdir)):
                total += 1
                a = np.asarray(Image.open(os.path.join(rdir, f)))
                b = np.asarray(Image.open(os.path.join(odir, f)))
                if np.array_equal(a, b):
                    identical += 1
                    continue
                d = np.abs(a.astype(np.int32) - b.astype(np.int32))
                u, c = np.unique(d, return_counts=True)
                hist[u] += c
                worst[f"{sub}/{city}/{f}"] = (
                    int(d.max()), float((d > 0).mean())
                )
    print(f"\n{identical}/{total} PNGs byte-identical")
    if identical < total:
        nonzero = hist[1:].sum()
        denom = hist.sum()
        print(f"differing pixels: {nonzero} of {denom} compared "
              f"({100.0 * nonzero / max(denom, 1):.4f}%)")
        for lsb in range(1, 256):
            if hist[lsb]:
                print(f"  |delta|={lsb}: {hist[lsb]} pixels")
        for k, (mx, frac) in sorted(worst.items()):
            print(f"  {k}: max|delta|={mx}, {100 * frac:.4f}% pixels differ")
    if not args.keep:
        shutil.rmtree(work)


if __name__ == "__main__":
    main()
