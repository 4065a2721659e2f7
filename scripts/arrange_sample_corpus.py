#!/usr/bin/env python
"""Arrange a sample corpus of (img1, img2, cm) triplets into the OSCD
directory layout (reference dataset.py:268-270, 302-304) so the 4-stage
headline workflow can run end to end without the real OSCD download.

Source layout (the reference ships one of these as its sample output):
  <src>/images/<city>/img1_synth_N.png, img2_synth_N.png [, cm_synth_N.png]
  <src>/labels/<city>/cm_synth_N.png           (cm may live in either dir)

Usage: python scripts/arrange_sample_corpus.py <src> <dest_root>
"""
import glob
import os
import shutil
import sys

SUBDIR = "Onera Satellite Change Detection Dataset"
IMG_SUB = "Onera Satellite Change Detection dataset - Images"
LBL_SUB = "Onera Satellite Change Detection dataset - Train Labels"


def arrange(src: str, root: str) -> int:
    img_base = os.path.join(root, SUBDIR, "images", IMG_SUB)
    lbl_base = os.path.join(root, SUBDIR, "train_labels", LBL_SUB)
    cities = sorted(os.listdir(os.path.join(src, "images")))
    for c in cities:
        cdir = os.path.join(src, "images", c)
        i1 = sorted(glob.glob(os.path.join(cdir, "img1_synth_*.png")))[0]
        n = os.path.basename(i1).split("_synth_")[1]
        i2 = os.path.join(cdir, f"img2_synth_{n}")
        cm = os.path.join(cdir, f"cm_synth_{n}")
        if not os.path.exists(cm):
            cm = os.path.join(src, "labels", c, f"cm_synth_{n}")
        pair = os.path.join(img_base, c, "pair")
        cmdir = os.path.join(lbl_base, c, "cm")
        os.makedirs(pair, exist_ok=True)
        os.makedirs(cmdir, exist_ok=True)
        shutil.copy(i1, os.path.join(pair, "img1.png"))
        shutil.copy(i2, os.path.join(pair, "img2.png"))
        shutil.copy(cm, os.path.join(cmdir, "cm.png"))
    return len(cities)


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    n = arrange(sys.argv[1], sys.argv[2])
    print(f"{n} cities arranged at {sys.argv[2]}")
