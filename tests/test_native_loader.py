"""Tests for the native C++ PNG decode engine (native/png_loader.cpp via
gan_aug_pfa_tpu/data/native_loader.py): bit-identical to PIL across PNG
flavors, graceful fallback on unsupported/corrupt inputs."""

import os

import numpy as np
import pytest
from PIL import Image

from gan_aug_pfa_tpu.data import native_loader as nl

RNG = np.random.RandomState(7)

pytestmark = pytest.mark.skipif(
    not nl.available(), reason="native library unavailable (no g++/zlib)"
)


def _save(tmp_path, name, arr, mode):
    p = str(tmp_path / name)
    Image.fromarray(arr, mode=mode).save(p)
    return p


def test_rgb_roundtrip_matches_pil(tmp_path):
    arr = RNG.randint(0, 256, (37, 53, 3), dtype=np.uint8)
    p = _save(tmp_path, "rgb.png", arr, "RGB")
    out = nl.decode_rgb(p)
    np.testing.assert_array_equal(out, arr)


def test_gray_file_as_rgb(tmp_path):
    arr = RNG.randint(0, 256, (20, 30), dtype=np.uint8)
    p = _save(tmp_path, "gray.png", arr, "L")
    out = nl.decode_rgb(p)
    ref = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(out, ref)


def test_rgba_drops_alpha_like_pil(tmp_path):
    arr = RNG.randint(0, 256, (16, 24, 4), dtype=np.uint8)
    p = _save(tmp_path, "rgba.png", arr, "RGBA")
    out = nl.decode_rgb(p)
    ref = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(out, ref)


def test_palette_png_matches_pil(tmp_path):
    arr = RNG.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    p = str(tmp_path / "pal.png")
    Image.fromarray(arr, "RGB").quantize(colors=64).save(p)
    out = nl.decode_rgb(p)
    ref = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(out, ref)


def test_gray_decode_matches_pil_luma(tmp_path):
    """convert("L") of an RGB file uses PIL's ITU-R 601-2 integer luma."""
    arr = RNG.randint(0, 256, (25, 31, 3), dtype=np.uint8)
    p = _save(tmp_path, "rgb2.png", arr, "RGB")
    out = nl.decode_gray(p)
    ref = np.asarray(Image.open(p).convert("L"))
    np.testing.assert_array_equal(out, ref)


def test_gray_label_roundtrip(tmp_path):
    lbl = ((RNG.rand(40, 52) > 0.8) * 255).astype(np.uint8)
    p = _save(tmp_path, "cm.png", lbl, "L")
    np.testing.assert_array_equal(nl.decode_gray(p), lbl)


def test_probe(tmp_path):
    arr = RNG.randint(0, 256, (19, 44, 3), dtype=np.uint8)
    p = _save(tmp_path, "probe.png", arr, "RGB")
    assert nl.probe(p) == (19, 44, 3)


def test_corrupt_file_raises_via_fallback(tmp_path):
    p = str(tmp_path / "bad.png")
    with open(p, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n" + b"garbage" * 10)
    # Native decoder rejects; PIL fallback raises — scanner treats as
    # unreadable (reference dataset.py:285-295 semantics).
    with pytest.raises(Exception):
        nl.decode_rgb(p)
    from gan_aug_pfa_tpu.data.scanner import _image_readable

    assert not _image_readable(p)


def test_truncated_idat_detected(tmp_path):
    arr = RNG.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    p = _save(tmp_path, "trunc.png", arr, "RGB")
    data = open(p, "rb").read()
    with open(p, "wb") as f:
        f.write(data[: len(data) // 2])
    from gan_aug_pfa_tpu.data.scanner import _image_readable

    assert not _image_readable(p)


def test_batch_decode_threads(tmp_path):
    paths = []
    arrs = []
    for i in range(6):
        a = RNG.randint(0, 256, (24, 24, 3), dtype=np.uint8)
        paths.append(_save(tmp_path, f"b{i}.png", a, "RGB"))
        arrs.append(a)
    outs = nl.decode_rgb_batch(paths, workers=4)
    for o, a in zip(outs, arrs):
        np.testing.assert_array_equal(o, a)


def test_loader_cache_path_uses_native(tmp_path, oscd_tree):
    """build_cached_dataset on the fixture tree produces identical arrays
    whether or not the native decoder is active."""
    from gan_aug_pfa_tpu.data import build_cached_dataset, create_sample_lists

    samples = create_sample_lists(
        str(oscd_tree), "Onera Satellite Change Detection Dataset",
        "synthetic_data", mode="val", verbose=False,
    )
    ds_native = build_cached_dataset(samples, (32, 32), verbose=False)
    # Force the PIL path.
    old = nl._lib, nl._lib_failed
    nl._lib, nl._lib_failed = None, True
    try:
        ds_pil = build_cached_dataset(samples, (32, 32), verbose=False)
    finally:
        nl._lib, nl._lib_failed = old
    np.testing.assert_array_equal(ds_native.img1, ds_pil.img1)
    np.testing.assert_array_equal(ds_native.img2, ds_pil.img2)
    np.testing.assert_array_equal(ds_native.labels, ds_pil.labels)
