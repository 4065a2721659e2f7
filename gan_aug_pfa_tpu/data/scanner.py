"""Dataset scanning: OSCD directory-tree contract and synthetic-corpus pairing.

Pure-Python, no JAX.  Reimplements the on-disk contracts of the reference
(dataset.py:240-295 `scan_dataset`, dataset.py:298-352
`create_change_detection_dataset`):

  real sample:       <data_dir>/<city>/pair/img1.png + img2.png
  real label:        <label_dir>/<city>/cm/cm.png
  synthetic sample:  <data_dir>/<city>/img1_synth_N.png + img2_synth_N.png
  synthetic label:   <label_dir>/<city>/cm_synth_N.png
  synthetic city tag: "<city>_synth"

Every file is pre-validated for readability (verify + load double-open, as in
reference dataset.py:285-295) so unreadable files are skipped at scan time.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import List, Optional

from PIL import Image, UnidentifiedImageError

from ..config import (
    IMAGES_SUBTREE,
    LABELS_SUBTREE,
    TRAIN_CITIES,
    VAL_CITIES,
)


@dataclasses.dataclass(frozen=True)
class Sample:
    img1: str
    img2: str
    label: Optional[str]
    city: str

    @property
    def is_synthetic(self) -> bool:
        return self.city.endswith("_synth")


def _image_readable(path: Optional[str]) -> bool:
    """Readability check (reference dataset.py:285-295's verify+load
    contract).  Uses the native C++ decoder when built (one full decode —
    catches truncated/corrupt streams like PIL's load); PIL double-open
    otherwise."""
    if path is None:
        return True
    from . import native_loader

    if native_loader.available():
        try:
            native_loader.decode_rgb(path)  # PIL fallback inside on odd files
            return True
        except Exception:  # noqa: BLE001 — any decode failure means skip
            return False
    try:
        with Image.open(path) as img:
            img.verify()
        with Image.open(path) as img:
            img.load()
        return True
    except (FileNotFoundError, UnidentifiedImageError, SyntaxError, OSError,
            ValueError):
        return False


def scan_dataset(
    data_dir: str,
    label_dir: Optional[str] = None,
    is_synthetic: bool = False,
    verbose: bool = True,
) -> List[Sample]:
    """Walk city folders and collect valid (img1, img2, label) triplets.

    Mirrors reference dataset.py:240-283: same globbing, same pairing of
    synthetic files by basename, same skip-with-warning behavior.
    """
    samples: List[Sample] = []
    skipped = 0
    for city_folder in sorted(glob.glob(os.path.join(data_dir, "*"))):
        if not os.path.isdir(city_folder):
            continue
        city = os.path.basename(city_folder)
        if is_synthetic:
            for img1_file in sorted(
                glob.glob(os.path.join(city_folder, "img1_synth_*.png"))
            ):
                base = os.path.basename(img1_file).replace("img1_", "")
                img2_file = os.path.join(city_folder, f"img2_{base}")
                label_file = (
                    os.path.join(label_dir, city, f"cm_{base}")
                    if label_dir
                    else None
                )
                if not os.path.exists(img2_file):
                    skipped += 1
                    continue
                if label_dir and not os.path.exists(label_file):
                    skipped += 1
                    continue
                if (
                    _image_readable(img1_file)
                    and _image_readable(img2_file)
                    and _image_readable(label_file)
                ):
                    samples.append(
                        Sample(img1_file, img2_file, label_file, f"{city}_synth")
                    )
                else:
                    skipped += 1
        else:
            img1_file = os.path.join(city_folder, "pair", "img1.png")
            img2_file = os.path.join(city_folder, "pair", "img2.png")
            label_file = (
                os.path.join(label_dir, city, "cm", "cm.png")
                if label_dir
                else None
            )
            if not (os.path.exists(img1_file) and os.path.exists(img2_file)):
                skipped += 1
                continue
            if label_dir and not os.path.exists(label_file):
                skipped += 1
                continue
            if (
                _image_readable(img1_file)
                and _image_readable(img2_file)
                and _image_readable(label_file)
            ):
                samples.append(Sample(img1_file, img2_file, label_file, city))
            else:
                skipped += 1
    if verbose:
        print(
            f"Scanned {data_dir}. Found {len(samples)} valid samples. "
            f"Skipped {skipped}."
        )
    return samples


def dataset_paths(root_dir: str, dataset_subdir: str, synthetic_data_dir: str):
    """Resolve the nested OSCD paths (reference dataset.py:302-307)."""
    base = os.path.join(root_dir, dataset_subdir)
    real_image_base = os.path.join(base, *IMAGES_SUBTREE)
    real_label_base = os.path.join(base, *LABELS_SUBTREE)
    synth_base = os.path.join(root_dir, synthetic_data_dir)
    synth_image_base = os.path.join(synth_base, "images")
    synth_label_base = os.path.join(synth_base, "labels")
    return real_image_base, real_label_base, synth_image_base, synth_label_base


def create_sample_lists(
    root_dir: str,
    dataset_subdir: str,
    synthetic_data_dir: str,
    mode: str = "train",
    use_synthetic: bool = False,
    verbose: bool = True,
) -> List[Sample]:
    """Assemble the split sample list (reference dataset.py:298-352).

    mode="train": TRAIN_CITIES (11 cities), labels; optionally concat the
        synthetic corpus filtered to train cities (``_synth`` suffix stripped
        for the filter, as in dataset.py:342).
    mode="val":   VAL_CITIES {pisa, rennes, saclay_e}, labels.
    mode="test":  every city folder present, no labels.
    mode="all":   every city, labels (used by train_gan/evaluate/generate,
        which scan all 14 cities without a split — reference
        train_gan.py:99-108, evaluate.py:315, generate_synthetic_data.py:35).
    """
    real_image_base, real_label_base, synth_image_base, synth_label_base = (
        dataset_paths(root_dir, dataset_subdir, synthetic_data_dir)
    )
    if mode == "train":
        target_cities, has_labels = TRAIN_CITIES, True
    elif mode == "val":
        target_cities, has_labels = VAL_CITIES, True
    elif mode == "test":
        try:
            target_cities = [
                d
                for d in os.listdir(real_image_base)
                if os.path.isdir(os.path.join(real_image_base, d))
            ]
        except FileNotFoundError:
            target_cities = []
        has_labels = False
    elif mode == "all":
        target_cities, has_labels = None, True
    else:
        raise ValueError(f"Invalid mode: {mode}")

    real = scan_dataset(
        real_image_base,
        real_label_base if has_labels else None,
        is_synthetic=False,
        verbose=verbose,
    )
    if mode in ("train", "val"):
        real = [s for s in real if s.city in target_cities]

    if mode == "train" and use_synthetic:
        if not os.path.isdir(synth_image_base):
            if verbose:
                print(
                    f"Warning: Synthetic image directory not found at "
                    f"{synth_image_base}. Cannot use synthetic data."
                )
            return real
        synth = scan_dataset(
            synth_image_base,
            synth_label_base if has_labels else None,
            is_synthetic=True,
            verbose=verbose,
        )
        synth = [
            s for s in synth if s.city.replace("_synth", "") in target_cities
        ]
        if verbose:
            print(
                f"Combining {len(real)} real and {len(synth)} synthetic "
                f"samples for training."
            )
        return real + synth
    return real
