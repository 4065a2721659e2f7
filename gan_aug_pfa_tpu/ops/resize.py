"""Image resizing with exact PyTorch interpolation semantics, TPU-style.

The reference resizes *tensors* (after ToTensor), so its resize is
``torch.nn.functional.interpolate`` — bilinear with ``align_corners=False``
and no antialiasing for images (reference dataset.py:143-147 via torchvision
``TF.resize`` on tensors), legacy-nearest for labels, and bilinear with
``align_corners=True`` for the U-Net decoder upsample (reference models.py:64).

Rather than translating torch's gather loops, we precompute the static source
indices and lerp weights on the host (shapes are static under jit) and express
the resize as two dense ``jnp.take`` gathers + a lerp per axis.  XLA fuses
these into the surrounding elementwise work; there is no dynamic shape or
data-dependent control flow anywhere.

All functions take NHWC or HWC arrays and resize the (H, W) axes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _linear_coeffs(in_size: int, out_size: int, align_corners: bool):
    """Source indices and weights for 1-D linear interpolation.

    align_corners=False: src = (i + 0.5) * (in/out) - 0.5   (torch default)
    align_corners=True:  src = i * (in-1)/(out-1)           (torch Upsample)
    """
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,), dtype=np.float64)
        else:
            src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (
                out_size - 1
            )
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int32)
    hi = np.minimum(lo + 1, in_size - 1).astype(np.int32)
    w = (src - lo).astype(np.float32)
    return lo, hi, w


@functools.lru_cache(maxsize=None)
def _nearest_indices(in_size: int, out_size: int):
    """torch legacy-nearest: src = floor(i * in/out)."""
    idx = np.floor(np.arange(out_size, dtype=np.float64) * in_size / out_size)
    return np.minimum(idx, in_size - 1).astype(np.int32)


def _lerp_axis(x: jnp.ndarray, axis: int, in_size: int, out_size: int,
               align_corners: bool) -> jnp.ndarray:
    if in_size == out_size:
        return x
    lo, hi, w = _linear_coeffs(in_size, out_size, align_corners)
    x_lo = jnp.take(x, jnp.asarray(lo), axis=axis)
    x_hi = jnp.take(x, jnp.asarray(hi), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    wb = jnp.asarray(w).reshape(shape).astype(x.dtype)
    return x_lo * (1 - wb) + x_hi * wb


def resize_bilinear(
    x: jnp.ndarray,
    size: Tuple[int, int],
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear resize of the (H, W) axes (axes -3, -2) of an NHWC/HWC array."""
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    out = _lerp_axis(x, h_axis, x.shape[h_axis], size[0], align_corners)
    out = _lerp_axis(out, w_axis, out.shape[w_axis], size[1], align_corners)
    return out


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int],
                   spatial_axes: Tuple[int, int] | None = None) -> jnp.ndarray:
    """Legacy-nearest resize.

    By default resizes the last two axes (for (..., H, W) label arrays); pass
    ``spatial_axes`` to resize other axes (e.g. (-3, -2) for NHWC images).
    """
    if spatial_axes is None:
        spatial_axes = (x.ndim - 2, x.ndim - 1)
    h_axis, w_axis = spatial_axes
    h_axis %= x.ndim
    w_axis %= x.ndim
    if x.shape[h_axis] != size[0]:
        x = jnp.take(
            x, jnp.asarray(_nearest_indices(x.shape[h_axis], size[0])),
            axis=h_axis,
        )
    if x.shape[w_axis] != size[1]:
        x = jnp.take(
            x, jnp.asarray(_nearest_indices(x.shape[w_axis], size[1])),
            axis=w_axis,
        )
    return x


@functools.lru_cache(maxsize=None)
def _upsample_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out, in) interpolation matrix for align_corners=True linear
    upsampling — two nonzeros per row (the lerp weights)."""
    lo, hi, w = _linear_coeffs(in_size, out_size, align_corners=True)
    m = np.zeros((out_size, in_size), np.float32)
    np.add.at(m, (np.arange(out_size), lo), 1.0 - w)
    np.add.at(m, (np.arange(out_size), hi), w)
    return m


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample with align_corners=True (reference models.py:64).

    Expressed as two tiny dense matmuls (one per spatial axis) instead of
    gather+lerp: the backward pass is then just the transposed matmuls on
    the MXU rather than a scatter-add — measured ~0.4 ms/train-step cheaper
    on v5e at the reference 128px workload (scripts/profile_device_trace.py).
    In fp32 this is bitwise identical to the gather form (rows have exactly
    the two lerp weights; zero terms are exact — tested in
    tests/test_resize.py).  In bf16 the MXU einsum accumulates in fp32
    while the gather-lerp path computes in bf16, so results can differ by
    that accumulation.  Per-output cost is O(h) vs the gather form's O(1);
    the measured win holds at the profiled sizes (<=256px) and could invert
    at resolutions far beyond them.
    """
    h, w = x.shape[-3], x.shape[-2]
    mh = jnp.asarray(_upsample_matrix(h, 2 * h)).astype(x.dtype)
    mw = jnp.asarray(_upsample_matrix(w, 2 * w)).astype(x.dtype)
    y = jnp.einsum("oh,...hwc->...owc", mh, x)
    return jnp.einsum("pw,...owc->...opc", mw, y)


def _upsample2x_gather(x: jnp.ndarray) -> jnp.ndarray:
    """Gather-lerp reference form of upsample2x_align_corners (kept for
    numerical cross-checks in tests/test_resize.py)."""
    h, w = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, (2 * h, 2 * w), align_corners=True)
