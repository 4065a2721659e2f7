#!/usr/bin/env python
"""Build the deterministic 5-city parity drive tree (the round-4
converging-corpus parity study's dataset; same recipe as
tests/conftest.py's oscd_tree fixture, RandomState(0) PNG content, so the
tree is bit-reproducible anywhere).

With train == eval cities and only 4 train images, a 41M-param SiameseUNet
memorizes this corpus — 50-epoch runs converge (final FocalDice ~0.15,
F1 ~0.7), which is exactly the operating point the PARITY.md §1b "within
1% in expectation" band claim needs (the 14-city sample corpus trains to a
chaotic knife-edge instead; see PARITY.md §1b-r3).

Usage: python scripts/build_parity_tree.py [/tmp/parity_corpus_r02]
"""
import shutil
import sys
from pathlib import Path

import numpy as np
from PIL import Image


def build(root: Path) -> None:
    if root.exists():
        shutil.rmtree(root)
    rng = np.random.RandomState(0)
    subdir = "Onera Satellite Change Detection Dataset"
    img_base = root / subdir / "images" / (
        "Onera Satellite Change Detection dataset - Images"
    )
    lbl_base = root / subdir / "train_labels" / (
        "Onera Satellite Change Detection dataset - Train Labels"
    )
    cities = {
        "abudhabi": (40, 52),
        "beirut": (36, 36),
        "paris": (48, 40),
        "nantes": (44, 44),
        "pisa": (38, 46),  # val city (reference dataset.py:299-301)
    }
    for city, (h, w) in cities.items():
        pair = img_base / city / "pair"
        pair.mkdir(parents=True)
        for name in ("img1.png", "img2.png"):
            arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            Image.fromarray(arr).save(pair / name)
        cm = lbl_base / city / "cm"
        cm.mkdir(parents=True)
        lbl = (rng.rand(h, w) > 0.8).astype(np.uint8) * 255
        Image.fromarray(lbl, mode="L").save(cm / "cm.png")
    print(f"5-city parity tree at {root}")


if __name__ == "__main__":
    build(Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_corpus_r02"))
