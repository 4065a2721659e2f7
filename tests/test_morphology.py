"""Morphological post-processing (ops/morphology.py) — the reference
README's Step 6 (README.md:145-148) implemented for real; validated against
scipy.ndimage binary morphology."""

import numpy as np
import jax.numpy as jnp
from scipy import ndimage

from gan_aug_pfa_tpu.ops.morphology import (
    closing,
    dilate,
    erode,
    opening,
    postprocess_prediction,
)


def _rand_mask(shape, seed=0, p=0.3):
    return (np.random.RandomState(seed).rand(*shape) < p).astype(np.float32)


def test_dilate_matches_scipy():
    m = _rand_mask((17, 23))
    ours = np.asarray(dilate(jnp.asarray(m), 3))
    ref = ndimage.binary_dilation(
        m.astype(bool), structure=np.ones((3, 3), bool), border_value=0
    ).astype(np.float32)
    np.testing.assert_array_equal(ours, ref)


def test_erode_matches_scipy():
    m = _rand_mask((17, 23), seed=1, p=0.7)
    ours = np.asarray(erode(jnp.asarray(m), 3))
    # reduce_window pads with +inf, i.e. out-of-bounds counts as foreground.
    ref = ndimage.binary_erosion(
        m.astype(bool), structure=np.ones((3, 3), bool), border_value=1
    ).astype(np.float32)
    np.testing.assert_array_equal(ours, ref)


def test_opening_removes_speck():
    m = np.zeros((11, 11), np.float32)
    m[5, 5] = 1.0  # isolated pixel: smaller than the 3x3 element
    m[1:4, 1:4] = 1.0  # 3x3 block: survives
    out = np.asarray(opening(jnp.asarray(m), 3))
    assert out[5, 5] == 0.0
    assert out[2, 2] == 1.0


def test_closing_fills_hole():
    m = np.ones((11, 11), np.float32)
    m[5, 5] = 0.0  # single-pixel hole
    out = np.asarray(closing(jnp.asarray(m), 3))
    assert out[5, 5] == 1.0


def test_postprocess_is_binary_and_batched():
    probs = np.random.RandomState(2).rand(2, 16, 16).astype(np.float32)
    out = np.asarray(postprocess_prediction(jnp.asarray(probs)))
    assert out.shape == probs.shape
    assert set(np.unique(out)).issubset({0.0, 1.0})


def test_postprocess_equals_scipy_composition():
    probs = np.random.RandomState(3).rand(32, 32).astype(np.float32)
    ours = np.asarray(postprocess_prediction(jnp.asarray(probs), 0.5, 3))
    s = np.ones((3, 3), bool)
    ref = probs > 0.5
    # opening = erode(border 1) -> dilate(border 0)
    ref = ndimage.binary_dilation(
        ndimage.binary_erosion(ref, s, border_value=1), s, border_value=0
    )
    # closing = dilate(border 0) -> erode(border 1)
    ref = ndimage.binary_erosion(
        ndimage.binary_dilation(ref, s, border_value=0), s, border_value=1
    )
    np.testing.assert_array_equal(ours, ref.astype(np.float32))
