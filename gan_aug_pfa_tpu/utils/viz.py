"""Visualization: evaluation panels and GAN sample strips.

Matplotlib (Agg) counterparts of reference evaluate.py:67-126
(``visualize_sample`` 1x4 panel: img1, img2, ground truth, prediction) and
train_gan.py:78-92 (``save_samples`` [real_A | fake_B | real_B] strip).
Images arrive as numpy HWC float arrays.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ..data.loader import float_to_uint8  # noqa: E402

# Sentinel-2 13-band ordering: display uses B4/B3/B2 (R/G/B).  The
# reference carries this as a dead branch (evaluate.py:73-75, unreachable
# because its n_channels is fixed at 3); here n_channels is configurable so
# the branch is live.
_S2_RGB_BANDS = (3, 2, 1)


def _displayable_rgb(img: np.ndarray) -> np.ndarray:
    """HWC float image -> displayable [0,1] RGB (band-select if >3ch)."""
    if img.ndim == 3 and img.shape[-1] > 3:
        img = img[..., list(_S2_RGB_BANDS)]
    return np.clip(img, 0.0, 1.0)


def visualize_sample(
    img1: np.ndarray,
    img2: np.ndarray,
    label: Optional[np.ndarray],
    pred: np.ndarray,
    city_name: str,
    index,
    output_dir: str,
) -> str:
    """Save a 1x4 panel PNG named validation_sample_{city}_{index}.png
    (reference evaluate.py:103-126).  img1/img2 HWC in [0,1] (clipped for
    display), label HW {0,1} or None (dummy black if absent,
    evaluate.py:92-95), pred HW probabilities (thresholded at 0.5)."""
    os.makedirs(output_dir, exist_ok=True)
    img1 = _displayable_rgb(np.asarray(img1))
    img2 = _displayable_rgb(np.asarray(img2))
    h, w = pred.shape[-2], pred.shape[-1]
    if label is None:
        label_np = np.zeros((h, w), dtype=np.uint8)
    else:
        label_np = np.asarray(label).reshape(h, w)
    pred_np = (np.asarray(pred).reshape(h, w) > 0.5).astype(np.uint8)

    fig, axes = plt.subplots(1, 4, figsize=(20, 5))
    fig.suptitle(f"Validation Sample {index} - City: {city_name}")
    for ax, (im, title, kw) in zip(
        axes,
        [
            (img1, "Image 1 (RGB)", {}),
            (img2, "Image 2 (RGB)", {}),
            (label_np, "Ground Truth Change", {"cmap": "gray"}),
            (pred_np, "Predicted Change", {"cmap": "gray"}),
        ],
    ):
        ax.imshow(im, **kw)
        ax.set_title(title)
        ax.axis("off")
    plt.tight_layout(rect=[0, 0.03, 1, 0.95])
    save_path = os.path.join(
        output_dir, f"validation_sample_{city_name}_{index}.png"
    )
    plt.savefig(save_path)
    plt.close(fig)
    return save_path


def save_gan_sample_strip(
    real_a: np.ndarray,
    fake_b: np.ndarray,
    real_b: np.ndarray,
    city: str,
    epoch: int,
    output_dir: str,
) -> str:
    """Save the [real_A | fake_B | real_B] comparison strip
    (reference train_gan.py:86-92).  Inputs HWC in [0,1]."""
    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    strip = np.concatenate([real_a, fake_b, real_b], axis=1)
    path = os.path.join(output_dir, f"sample_{city}_epoch_{epoch:03d}.png")
    Image.fromarray(float_to_uint8(strip)).save(path)
    return path
