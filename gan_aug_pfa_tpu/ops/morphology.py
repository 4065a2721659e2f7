"""Morphological post-processing for change masks (TPU-native).

The reference README *claims* "Added morphological operations in
evaluate.py" (reference README.md:145-148, Step 6) but the code contains no
morphology (no cv2/scipy import anywhere — SURVEY.md §6).  This module
implements the claimed capability for real: binary erosion/dilation as
`lax.reduce_window` max/min reductions — which XLA lowers to fused
vectorized window ops on the VPU — plus the standard opening/closing
compositions used to denoise change maps.

All functions are jittable, operate on (..., H, W) float arrays in {0,1},
and use a square structuring element of side `kernel_size` with SAME
padding.  Edge behavior: each op pads with its reduction identity, so
dilation (max, pad -inf) treats out-of-bounds as background while erosion
(min, pad +inf) treats it as foreground — matching
scipy.ndimage.binary_dilation with border_value=0 and binary_erosion with
border_value=1 (and cv2's default morphology border).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _window(x: jnp.ndarray, kernel_size: int, init, op) -> jnp.ndarray:
    """Apply a k×k reduce_window over the trailing two dims."""
    nd = x.ndim
    dims = (1,) * (nd - 2) + (kernel_size, kernel_size)
    return lax.reduce_window(
        x, init, op, window_dimensions=dims, window_strides=(1,) * nd,
        padding="SAME",
    )


@partial(jax.jit, static_argnames="kernel_size")
def dilate(mask: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    """Binary dilation: max over the structuring element."""
    return _window(mask, kernel_size, -jnp.inf, lax.max)


@partial(jax.jit, static_argnames="kernel_size")
def erode(mask: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    """Binary erosion: min over the structuring element."""
    return _window(mask, kernel_size, jnp.inf, lax.min)


@partial(jax.jit, static_argnames="kernel_size")
def opening(mask: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    """Erosion then dilation — removes specks smaller than the kernel."""
    return dilate(erode(mask, kernel_size), kernel_size)


@partial(jax.jit, static_argnames="kernel_size")
def closing(mask: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    """Dilation then erosion — fills holes smaller than the kernel."""
    return erode(dilate(mask, kernel_size), kernel_size)


@partial(jax.jit, static_argnames=("kernel_size", "threshold"))
def postprocess_prediction(
    probs: jnp.ndarray,
    threshold: float = 0.5,
    kernel_size: int = 3,
) -> jnp.ndarray:
    """Threshold → opening → closing, the standard denoise for change maps
    (the reference README's Step 6, implemented).  Returns a {0,1} float
    mask with the same shape as `probs`."""
    mask = (probs > threshold).astype(probs.dtype)
    return closing(opening(mask, kernel_size), kernel_size)
