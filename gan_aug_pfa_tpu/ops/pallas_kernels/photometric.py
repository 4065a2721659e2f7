"""Fused photometric augmentation + joint flips as a Pallas TPU kernel.

One VMEM-resident pass per image applying, in the reference chain's order
(reference dataset.py:103-134, 38-64 via BaseChangeDetectionDataset's
transform list, dataset.py:172-193):

  1. ColorJitter (brightness/contrast/saturation, random torchvision order);
  2. 3x3 separable Gaussian blur, reflect padding.

This is the BASELINE.json-named fused augmentation kernel: the photometric
stages read and write HBM once instead of once per stage.  The flips ride
in the XLA wrapper (Mosaic has no `rev` lowering; XLA flips are layout
ops), and the geometric warps (affine, rotation) stay in XLA-land — they
are gathers the MXU/VPU can't tile better than XLA's own lowering.

Parameter protocol: all randomness is sampled OUTSIDE the kernel with
jax.random (data/transforms.sample_augment_params), so the kernel is a pure
function and bit-comparable with the jnp reference path.  Per-image params
are packed into a (B, 8) f32 row read from SMEM:

  [brightness, contrast, saturation, order_idx, sigma, flip_h, flip_v, pad]

Layout: images are processed channels-first (B, 3, H, W) so the (H, W) axes
land on the VPU's (sublane, lane) tiling; the NHWC<->NCHW transposes in the
wrapper fuse into the surrounding program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_JITTER_ORDERS = (
    (0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0),
)


def _gray(x):  # x: (3, H, W)
    return 0.2989 * x[0] + 0.587 * x[1] + 0.114 * x[2]


def _apply_jitter(x, factors, order_idx):
    """torchvision ColorJitter on a (3, H, W) block: the three enhancement
    ops in one of six orders, each recomputing from the current value."""

    def brightness(x):
        return jnp.clip(x * factors[0], 0.0, 1.0)

    def contrast(x):
        m = jnp.mean(_gray(x))
        return jnp.clip(m * (1.0 - factors[1]) + x * factors[1], 0.0, 1.0)

    def saturation(x):
        g = _gray(x)[None]
        return jnp.clip(g * (1.0 - factors[2]) + x * factors[2], 0.0, 1.0)

    ops = [brightness, contrast, saturation]

    def chain(perm):
        def fn(x):
            for i in perm:
                x = ops[i](x)
            return x
        return fn

    return jax.lax.switch(order_idx, [chain(p) for p in _JITTER_ORDERS], x)


def _blur3(x, sigma):
    """3x3 separable Gaussian, reflect padding, on a (3, H, W) block."""
    w = jnp.exp(-0.5 / (sigma * sigma))
    k1 = 1.0 / (1.0 + 2.0 * w)
    k0 = w * k1
    # Reflect-pad H (axis 1) then convolve.
    ph = jnp.concatenate([x[:, 1:2], x, x[:, -2:-1]], axis=1)
    x = ph[:, :-2] * k0 + ph[:, 1:-1] * k1 + ph[:, 2:] * k0
    pw = jnp.concatenate([x[:, :, 1:2], x, x[:, :, -2:-1]], axis=2)
    return pw[:, :, :-2] * k0 + pw[:, :, 1:-1] * k1 + pw[:, :, 2:] * k0


def _kernel(img_ref, par_ref, out_ref):
    # par_ref is the whole (B, 8) SMEM buffer (a (1, 8) blocked SMEM spec
    # would violate the (8, 128) tiling rule); each grid step reads its row.
    i = pl.program_id(0)
    x = img_ref[0]  # (3, H, W)
    factors = jnp.stack([par_ref[i, 0], par_ref[i, 1], par_ref[i, 2]])
    order_idx = par_ref[i, 3].astype(jnp.int32)
    sigma = par_ref[i, 4]

    x = _apply_jitter(x, factors, order_idx)
    out_ref[0] = _blur3(x, sigma)


@functools.partial(jax.jit, static_argnames=("interpret",))
def photometric_flip_chw(
    imgs_chw: jnp.ndarray,
    params: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(B, 3, H, W) images in [0,1] + (B, 8) param rows -> processed images."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, c, h, w = imgs_chw.shape
    return pl.pallas_call(
        _kernel,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=bool(interpret),
    )(imgs_chw.astype(jnp.float32), params.astype(jnp.float32))


def photometric_flip_batch(
    imgs_nhwc: jnp.ndarray,
    params: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """NHWC wrapper: transpose to channels-first for VPU-friendly tiling,
    run the fused jitter+blur kernel, transpose back, then apply the
    shared flips (params cols 5/6) as XLA layout ops."""
    chw = jnp.transpose(imgs_nhwc, (0, 3, 1, 2))
    out = photometric_flip_chw(chw, params, interpret=interpret)
    out = jnp.transpose(out, (0, 2, 3, 1))
    flip_h = (params[:, 5] > 0.5)[:, None, None, None]
    flip_v = (params[:, 6] > 0.5)[:, None, None, None]
    out = jnp.where(flip_h, out[:, :, ::-1, :], out)
    return jnp.where(flip_v, out[:, ::-1, :, :], out)


# ---------------------------------------------------------------------------
# Native-resolution variant: the same fused jitter+blur pass with the
# sample's true (h, w) extent carried as SMEM scalars — the default
# `--tune` path since the augment-then-resize order became the default
# (reference dataset.py:172-193).  The contrast mean is masked to the
# native region (transforms.adjust_contrast_masked) and the blur reflects
# at the DYNAMIC bottom/right boundary (transforms.gaussian_blur3_dyn).
#
# Param row protocol (B, 8) f32:
#   [brightness, contrast, saturation, order_idx, sigma, h, w, count]
#
# Values in the padded tail (rows >= h, cols >= w) are unspecified on
# output — the downstream native chain (dynamic flips, hw-clamped warp
# gathers, native-extent resize) never reads them (transforms.py), and the
# equality tests compare in-extent regions / full-chain outputs.
# ---------------------------------------------------------------------------


def _apply_jitter_masked(x, factors, order_idx, mask, count):
    """torchvision ColorJitter on a (3, H, W) block with the contrast mean
    taken over the native (h, w) region only (mirrors
    transforms.apply_color_jitter_masked)."""

    def brightness(x):
        return jnp.clip(x * factors[0], 0.0, 1.0)

    def contrast(x):
        m = jnp.sum(_gray(x) * mask) / count
        return jnp.clip(m * (1.0 - factors[1]) + x * factors[1], 0.0, 1.0)

    def saturation(x):
        g = _gray(x)[None]
        return jnp.clip(g * (1.0 - factors[2]) + x * factors[2], 0.0, 1.0)

    ops = [brightness, contrast, saturation]

    def chain(perm):
        def fn(x):
            for i in perm:
                x = ops[i](x)
            return x
        return fn

    return jax.lax.switch(order_idx, [chain(p) for p in _JITTER_ORDERS], x)


def _blur3_native(x, sigma, h, w):
    """3x3 separable Gaussian with reflect-101 at the dynamic (h, w)
    boundary of a padded (3, Hp, Wp) block.  Static shifts + one dynamic
    row/col fix-up replace transforms.gaussian_blur3_dyn's index gathers
    (Mosaic has no cross-sublane gather); the in-extent per-pixel
    arithmetic (prev*k0 + mid*k1 + next*k2, same kernel normalization) is
    identical."""
    # Scalar taps (no array constants — Mosaic kernels can't capture
    # them): k_edge = e/(1+2e), k_mid = 1/(1+2e) with e = exp(-0.5/σ²),
    # the normalized [e, 1, e] kernel of transforms.gaussian_blur3_dyn.
    e = jnp.exp(-0.5 / (sigma * sigma))
    s = (e + 1.0) + e
    k_edge = e / s
    k_mid = 1.0 / s

    # Rows (axis 1).  prev[i] = x[|i-1|] (static reflect at the top);
    # next[i] = x[i+1] for i < h-1, x[h-2] (== prev[i]) at i = h-1.
    prev = jnp.concatenate([x[:, 1:2], x[:, :-1]], axis=1)
    nxt = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    nxt = jnp.where(row == h - 1, prev, nxt)
    x = prev * k_edge + x * k_mid + nxt * k_edge

    # Cols (axis 2), same construction at dynamic w.
    prev = jnp.concatenate([x[:, :, 1:2], x[:, :, :-1]], axis=2)
    nxt = jnp.concatenate([x[:, :, 1:], x[:, :, -1:]], axis=2)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    nxt = jnp.where(col == w - 1, prev, nxt)
    return prev * k_edge + x * k_mid + nxt * k_edge


def _kernel_native(img_ref, par_ref, out_ref):
    i = pl.program_id(0)
    x = img_ref[0]  # (3, H, W)
    factors = jnp.stack([par_ref[i, 0], par_ref[i, 1], par_ref[i, 2]])
    order_idx = par_ref[i, 3].astype(jnp.int32)
    sigma = par_ref[i, 4]
    h = par_ref[i, 5].astype(jnp.int32)
    w = par_ref[i, 6].astype(jnp.int32)
    count = par_ref[i, 7]

    row = jax.lax.broadcasted_iota(jnp.int32, x.shape[1:], 0)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape[1:], 1)
    mask = ((row < h) & (col < w)).astype(jnp.float32)

    x = _apply_jitter_masked(x, factors, order_idx, mask, count)
    out_ref[0] = _blur3_native(x, sigma, h, w)


@functools.partial(jax.jit, static_argnames=("interpret",))
def photometric_native_chw(
    imgs_chw: jnp.ndarray,
    params: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(B, 3, Hp, Wp) padded images in [0,1] + (B, 8) native-extent param
    rows -> fused masked-jitter + dynamic-blur images (padded tail
    unspecified)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, c, h, w = imgs_chw.shape
    return pl.pallas_call(
        _kernel_native,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=bool(interpret),
    )(imgs_chw.astype(jnp.float32), params.astype(jnp.float32))


def photometric_native_batch(
    imgs_nhwc: jnp.ndarray,
    params: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """NHWC wrapper for the native-extent fused kernel.  The (dynamic)
    flips stay with the caller — in the native chain they are index-gather
    ops shared with the label (transforms._apply_flips_dyn)."""
    chw = jnp.transpose(imgs_nhwc, (0, 3, 1, 2))
    out = photometric_native_chw(chw, params, interpret=interpret)
    return jnp.transpose(out, (0, 2, 3, 1))
