"""Host-side decode + one-time resize, producing HBM-resident cached datasets.

The reference's hot host loop re-decodes PNGs and re-runs a PIL transform
chain in DataLoader workers on every epoch (reference dataset.py:218-237,
SURVEY.md section 3 "hot loops").  TPU-first redesign: decode each PNG exactly
once at startup, resize to the target size on the host with the reference's
exact numerics (bilinear align_corners=False for images after /255, legacy
nearest for binarized labels — see ops/resize.py), stack into dense arrays,
and push to device HBM once.  Every subsequent step reads from HBM; the
per-step gather + augmentation is fused into the compiled train step
(data/transforms.py), so the host never touches pixels after startup.

Deterministic-path parity: for augment=False datasets (validation, GAN
training, synthetic generation, evaluation — the reference's own defaults)
the cached arrays are numerically the reference pipeline's output up to the
final [-1,1] normalize, which is applied on device.
"""

from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Tuple

import numpy as np

from . import native_loader
from .scanner import Sample


def _resize_bilinear_np(x: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Bilinear align_corners=False resize on host (float32 HWC)."""

    def coeffs(in_size, out_size):
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        src = np.clip(src, 0, in_size - 1)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, in_size - 1)
        w = (src - lo).astype(np.float32)
        return lo, hi, w

    for axis, out_size in ((0, size[0]), (1, size[1])):
        if x.shape[axis] == out_size:
            continue
        lo, hi, w = coeffs(x.shape[axis], out_size)
        x_lo = np.take(x, lo, axis=axis)
        x_hi = np.take(x, hi, axis=axis)
        shape = [1, 1, 1]
        shape[axis] = out_size
        wb = w.reshape(shape)
        x = x_lo * (1 - wb) + x_hi * wb
    return x


def _resize_nearest_np(x: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Legacy-nearest resize on host (HW arrays)."""
    for axis, out_size in ((0, size[0]), (1, size[1])):
        if x.shape[axis] == out_size:
            continue
        idx = np.floor(
            np.arange(out_size, dtype=np.float64) * x.shape[axis] / out_size
        ).astype(np.int64)
        idx = np.minimum(idx, x.shape[axis] - 1)
        x = np.take(x, idx, axis=axis)
    return x


def load_sample_arrays(
    sample: Sample, target_size: Tuple[int, int]
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Decode one triplet and resize to target size with reference numerics.

    Returns (img1, img2, label): float32 HWC in [0,1] for images, int32 HW in
    {0,1} for the label (binarized at >128 before the nearest resize, matching
    reference dataset.py:31-33 then 146).
    """
    # Decode via the native C++ engine (PIL-identical bytes; falls back to
    # PIL per file — see data/native_loader.py).
    img1 = native_loader.decode_rgb(sample.img1).astype(np.float32) / 255.0
    img2 = native_loader.decode_rgb(sample.img2).astype(np.float32) / 255.0
    img1 = _resize_bilinear_np(img1, target_size)
    img2 = _resize_bilinear_np(img2, target_size)
    label = None
    if sample.label is not None:
        label_np = native_loader.decode_gray(sample.label)
        label = (label_np > 128).astype(np.int32)
        label = _resize_nearest_np(label, target_size)
    return img1, img2, label


@dataclasses.dataclass
class CachedDataset:
    """A fully decoded, fixed-size dataset ready to be placed in HBM.

    images are float32 in [0,1]; the [-1,1] normalize (reference
    dataset.py:155-159) happens on device in the pipeline/augment stage.
    """

    img1: np.ndarray  # (N, H, W, 3) float32 in [0, 1]
    img2: np.ndarray  # (N, H, W, 3) float32 in [0, 1]
    labels: Optional[np.ndarray]  # (N, H, W) int32 in {0, 1}, or None
    cities: List[str]

    def __len__(self) -> int:
        return self.img1.shape[0]

    @property
    def target_size(self) -> Tuple[int, int]:
        return self.img1.shape[1], self.img1.shape[2]


def build_cached_dataset(
    samples: List[Sample], target_size: Tuple[int, int], verbose: bool = True
) -> CachedDataset:
    """Decode + resize every sample once; skip unreadable ones with a warning
    (the reference's None-sample skipping, dataset.py:235-237, happens at
    build time here since the cache is static)."""
    img1s, img2s, labels, cities = [], [], [], []
    has_labels = all(s.label is not None for s in samples)

    def load_one(s):
        try:
            return load_sample_arrays(s, target_size)
        except Exception as e:  # noqa: BLE001 — parity with reference skip
            print(f"Failed to load sample for city {s.city}: {e}. Skipping.")
            return None

    # Concurrent decode: the native PNG decoder releases the GIL and the
    # numpy resize is vectorized, so threads give real parallelism on the
    # one-time cache build.
    with ThreadPoolExecutor(max_workers=min(8, max(1, len(samples)))) as ex:
        results = list(ex.map(load_one, samples))
    for s, res in zip(samples, results):
        if res is None:
            continue
        i1, i2, lb = res
        img1s.append(i1)
        img2s.append(i2)
        if has_labels:
            labels.append(lb)
        cities.append(s.city)
    if not img1s:
        return CachedDataset(
            np.zeros((0, *target_size, 3), np.float32),
            np.zeros((0, *target_size, 3), np.float32),
            np.zeros((0, *target_size), np.int32) if has_labels else None,
            [],
        )
    ds = CachedDataset(
        np.stack(img1s),
        np.stack(img2s),
        np.stack(labels) if has_labels else None,
        cities,
    )
    if verbose:
        print(
            f"Cached {len(ds)} samples at {target_size[0]}x{target_size[1]} "
            f"({ds.img1.nbytes * 2 / 1e6:.1f} MB of image data)."
        )
    return ds


@dataclasses.dataclass
class PaddedNativeDataset:
    """A native-resolution dataset: each sample decoded at its ORIGINAL
    size and placed in the top-left corner of a zero-padded (Hmax, Wmax)
    buffer, with per-sample true sizes.  Feeds the native-resolution
    augmentation path (data/transforms.augment_batch_native), which runs
    the reference's augment-at-native-size-then-resize chain
    (reference dataset.py:172-193) on device with dynamic extents."""

    img1: np.ndarray  # (N, Hmax, Wmax, 3) float32 in [0, 1], zero-padded
    img2: np.ndarray  # (N, Hmax, Wmax, 3)
    labels: Optional[np.ndarray]  # (N, Hmax, Wmax) int32 in {0, 1}
    sizes: np.ndarray  # (N, 2) int32 native (h, w)
    cities: List[str]

    def __len__(self) -> int:
        return self.img1.shape[0]


def build_padded_native_dataset(
    samples: List[Sample], pad_multiple: int = 8, verbose: bool = True
) -> PaddedNativeDataset:
    """Decode every sample ONCE at native size into a padded dense cache.

    The pad target is the max native extent rounded up to pad_multiple
    (keeps the trailing dims friendly to TPU tiling).  Unreadable samples
    are skipped with a warning, like build_cached_dataset."""

    def load_one(s):
        try:
            i1 = native_loader.decode_rgb(s.img1).astype(np.float32) / 255.0
            i2 = native_loader.decode_rgb(s.img2).astype(np.float32) / 255.0
            if i1.shape != i2.shape:
                # Joint augmentation needs one canvas per pair.  KEEP the
                # pair (the fixed-size cache keeps it too — each image is
                # resized to target independently there): bring img2 to
                # img1's native extent with the same bilinear resize the
                # cache uses, and say so.
                print(
                    f"img1/img2 native sizes differ for {s.city} "
                    f"({i1.shape} vs {i2.shape}); resizing img2 to "
                    "img1's extent for native-resolution augmentation."
                )
                i2 = _resize_bilinear_np(i2, (i1.shape[0], i1.shape[1]))
            lb = None
            if s.label is not None:
                lb = (native_loader.decode_gray(s.label) > 128).astype(
                    np.int32
                )
                if lb.shape != i1.shape[:2]:
                    # Anomaly warnings print unconditionally (like the
                    # 'Failed to load ... Skipping.' message below) — a
                    # wrong-resolution label usually means corrupt or
                    # misplaced data and should never pass silently.
                    print(
                        f"label native size differs for {s.city} "
                        f"({lb.shape} vs {i1.shape[:2]}); nearest-"
                        "resizing the label to img1's extent."
                    )
                    lb = _resize_nearest_np(
                        lb, (i1.shape[0], i1.shape[1])
                    )
            return i1, i2, lb
        except Exception as e:  # noqa: BLE001 — parity with reference skip
            print(f"Failed to load sample for city {s.city}: {e}. Skipping.")
            return None

    with ThreadPoolExecutor(max_workers=min(8, max(1, len(samples)))) as ex:
        results = list(ex.map(load_one, samples))
    loaded = [(s, r) for s, r in zip(samples, results) if r is not None]
    has_labels = all(r[2] is not None for _, r in loaded) and bool(loaded)
    if not loaded:
        return PaddedNativeDataset(
            np.zeros((0, 0, 0, 3), np.float32),
            np.zeros((0, 0, 0, 3), np.float32),
            None, np.zeros((0, 2), np.int32), [],
        )

    def up(n):
        return ((n + pad_multiple - 1) // pad_multiple) * pad_multiple

    hmax = up(max(r[0].shape[0] for _, r in loaded))
    wmax = up(max(r[0].shape[1] for _, r in loaded))
    n = len(loaded)
    img1 = np.zeros((n, hmax, wmax, 3), np.float32)
    img2 = np.zeros((n, hmax, wmax, 3), np.float32)
    labels = np.zeros((n, hmax, wmax), np.int32) if has_labels else None
    sizes = np.zeros((n, 2), np.int32)
    cities = []
    for i, (s, (i1, i2, lb)) in enumerate(loaded):
        h, w = i1.shape[0], i1.shape[1]
        img1[i, :h, :w] = i1
        img2[i, :h, :w] = i2
        if has_labels:
            labels[i, :lb.shape[0], :lb.shape[1]] = lb
        sizes[i] = (h, w)
        cities.append(s.city)
    ds = PaddedNativeDataset(img1, img2, labels, sizes, cities)
    if verbose:
        print(
            f"Cached {n} samples at native size (padded to {hmax}x{wmax}, "
            f"{img1.nbytes * 2 / 1e6:.1f} MB of image data)."
        )
    return ds


def float_to_uint8(x: np.ndarray) -> np.ndarray:
    """float [0,1] -> uint8 with truncation, matching torchvision
    ``to_pil_image``'s ``mul(255).byte()`` (used for bit-comparable PNG
    outputs; reference generate_synthetic_data.py:83-85)."""
    return (np.clip(x, 0.0, 1.0) * 255.0).astype(np.uint8)
