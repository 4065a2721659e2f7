"""Device-side joint augmentation: the reference's 9 Joint* transforms as
pure, jittable JAX ops (reference dataset.py:21-193).

The reference runs this chain on the host in PIL, per sample, per epoch — its
measured bottleneck (SURVEY.md §3).  Here the whole chain is a pure function
of (rng, sample) that is vmapped over the batch and fused INTO the compiled
train step, so augmentation runs on the TPU's VPU inside the same XLA
program (measured 2026-08-16 on v5e at bs4/128px: 12.96 -> 18.32 ms/step,
+5.4 ms for the full chain — vs seconds per batch for the reference's
host-side PIL path).

Semantics (augment=True order, reference dataset.py:172-193), applied at
target size (the cache is pre-resized; deviation from the reference's
native-size augmentation is documented in SURVEY.md §7 "hard parts" and only
affects --tune trials — every headline path uses augment=False):

  1. JointRandomAffine(deg=15, translate=.05, scale=.95-1.05, shear=5):
     shared params across img1/img2/label; bilinear imgs / nearest label.
  2. JointColorJitter(b/c/s=0.3, hue=0): independent per image; the three
     enhancements are applied in a random order (torchvision semantics).
  3. JointGaussianBlur(k=3, sigma~U(0.1,1.0)): independent sigma per image,
     reflect padding.
  4. JointRandomHorizontalFlip / JointRandomVerticalFlip, p=0.5, shared.
  5. JointRandomRotation(±30°): shared angle; NEAREST for images AND label
     (torchvision TF.rotate's default interpolation, dataset.py:71-77).
  6. JointNormalize: [0,1] -> [-1,1].

Images are HWC float32 in [0,1]; labels HW int32 in {0,1}.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    degrees: float = 15.0
    translate: float = 0.05
    scale_min: float = 0.95
    scale_max: float = 1.05
    shear: float = 5.0
    jitter: float = 0.3
    blur_sigma_min: float = 0.1
    blur_sigma_max: float = 1.0
    rotation_degrees: float = 30.0
    flip_prob: float = 0.5


# ---------------------------------------------------------------------------
# Geometric warps (inverse-mapped, constant-0 fill, torchvision conventions)
# ---------------------------------------------------------------------------


def _inverse_affine_coords(
    h: int, w: int, angle_deg, translate_xy, scale, shear_x_deg, hw=None
):
    """Output-pixel -> input-pixel coordinates for the torchvision affine
    (rotation + x-shear + scale about the image center, then translation).

    Returns (ys, xs) float32 grids of shape (h, w).  h/w are the STATIC
    buffer dims; hw=(h_dyn, w_dyn) optionally gives the (traced) true image
    extent for the rotation center — the native-resolution path, where the
    image sits in the top-left corner of a padded buffer."""
    a = jnp.deg2rad(angle_deg)
    sx = jnp.deg2rad(shear_x_deg)
    ch, cw = hw if hw is not None else (h, w)
    cx, cy = (cw - 1) * 0.5, (ch - 1) * 0.5
    # Forward matrix F = T(c+t) @ R(a) @ Shear_x(sx) @ Scale(s) @ T(-c).
    cos_a, sin_a = jnp.cos(a), jnp.sin(a)
    # R @ Shear_x: shear_x maps (x, y) -> (x + tan(sx) * y, y)
    tan_sx = jnp.tan(sx)
    m00 = scale * cos_a
    m01 = scale * (cos_a * tan_sx - sin_a)
    m10 = scale * sin_a
    m11 = scale * (sin_a * tan_sx + cos_a)
    tx, ty = translate_xy
    # Invert the 2x2 and the translation.
    det = m00 * m11 - m01 * m10
    i00, i01 = m11 / det, -m01 / det
    i10, i11 = -m10 / det, m00 / det
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    # Shift output coords to center (+ undo translation), apply inverse,
    # shift back.
    dx = xx - cx - tx
    dy = yy - cy - ty
    xs = i00 * dx + i01 * dy + cx
    ys = i10 * dx + i11 * dy + cy
    return ys, xs


def _sample_bilinear(img: jnp.ndarray, ys, xs, hw=None) -> jnp.ndarray:
    """Bilinear sample of an HWC image at float coords, 0 outside.

    hw=(h, w) overrides the valid extent with (possibly traced) dynamic
    sizes — used by the native-resolution path where the image occupies the
    top-left (h, w) corner of a larger padded buffer."""
    h, w = hw if hw is not None else (img.shape[0], img.shape[1])
    valid = (ys >= 0) & (ys <= h - 1) & (xs >= 0) & (xs <= w - 1)
    ysc = jnp.clip(ys, 0.0, h - 1)
    xsc = jnp.clip(xs, 0.0, w - 1)
    y0 = jnp.floor(ysc).astype(jnp.int32)
    x0 = jnp.floor(xsc).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ysc - y0)[..., None]
    wx = (xsc - x0)[..., None]
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    out = (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )
    return jnp.where(valid[..., None], out, 0.0)


def _sample_nearest(img: jnp.ndarray, ys, xs, hw=None) -> jnp.ndarray:
    """Nearest sample (round-half-up like torchvision), 0 outside.
    Works for HW (labels) and HWC arrays.  hw as in _sample_bilinear."""
    h, w = hw if hw is not None else (img.shape[0], img.shape[1])
    valid = (ys >= -0.5) & (ys < h - 0.5) & (xs >= -0.5) & (xs < w - 0.5)
    yi = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, h - 1)
    xi = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, w - 1)
    out = img[yi, xi]
    if img.ndim == 3:
        valid = valid[..., None]
    return jnp.where(valid, out, jnp.zeros_like(out))


def affine_warp(img, angle_deg, translate_xy, scale, shear_x_deg,
                method: str = "bilinear"):
    ys, xs = _inverse_affine_coords(
        img.shape[0], img.shape[1], angle_deg, translate_xy, scale,
        shear_x_deg,
    )
    if method == "bilinear":
        return _sample_bilinear(img, ys, xs)
    return _sample_nearest(img, ys, xs)


# ---------------------------------------------------------------------------
# Photometric ops (torchvision tensor formulas)
# ---------------------------------------------------------------------------


def _grayscale(img: jnp.ndarray) -> jnp.ndarray:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return 0.2989 * r + 0.587 * g + 0.114 * b


def adjust_brightness(img, factor):
    return jnp.clip(img * factor, 0.0, 1.0)


def adjust_contrast(img, factor):
    mean = jnp.mean(_grayscale(img))
    return jnp.clip(mean * (1.0 - factor) + img * factor, 0.0, 1.0)


def adjust_saturation(img, factor):
    gray = _grayscale(img)[..., None]
    return jnp.clip(gray * (1.0 - factor) + img * factor, 0.0, 1.0)


_JITTER_ORDERS = (
    (0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0),
)


def apply_color_jitter(img, factors, order_idx):
    """Brightness/contrast/saturation with explicit factors (3,) applied in
    the order _JITTER_ORDERS[order_idx] (torchvision ColorJitter semantics:
    each op recomputes from the current value)."""

    def apply_op(i, img):
        return jax.lax.switch(
            i,
            [
                lambda x: adjust_brightness(x, factors[0]),
                lambda x: adjust_contrast(x, factors[1]),
                lambda x: adjust_saturation(x, factors[2]),
            ],
            img,
        )

    def apply_order(perm):
        def fn(x):
            for i in perm:
                x = apply_op(i, x)
            return x
        return fn

    return jax.lax.switch(
        order_idx, [apply_order(p) for p in _JITTER_ORDERS], img
    )


def _sample_jitter_params(rng, strength: float):
    k_f, k_o = jax.random.split(rng)
    lo = max(0.0, 1.0 - strength)
    factors = jax.random.uniform(
        k_f, (3,), minval=lo, maxval=1.0 + strength
    )
    order_idx = jax.random.randint(k_o, (), 0, 6)
    return factors, order_idx


def color_jitter(rng, img, strength: float):
    """Jitter with factors ~U(1-s, 1+s) in a random order."""
    factors, order_idx = _sample_jitter_params(rng, strength)
    return apply_color_jitter(img, factors, order_idx)


def gaussian_blur3(img: jnp.ndarray, sigma) -> jnp.ndarray:
    """3x3 separable Gaussian blur with reflect padding on an HWC image
    (torchvision gaussian_blur with kernel_size=3)."""
    x = jnp.array([-1.0, 0.0, 1.0])
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="reflect")
    # Separable: along H then W (weighted adds — VPU work, fused by XLA).
    h = (
        pad[:-2, 1:-1] * k[0] + pad[1:-1, 1:-1] * k[1] + pad[2:, 1:-1] * k[2]
    )
    hpad = jnp.pad(h, ((0, 0), (1, 1), (0, 0)), mode="reflect")
    return hpad[:, :-2] * k[0] + hpad[:, 1:-1] * k[1] + hpad[:, 2:] * k[2]


# ---------------------------------------------------------------------------
# The joint chain
# ---------------------------------------------------------------------------


def normalize(img: jnp.ndarray) -> jnp.ndarray:
    """[0,1] -> [-1,1] (reference dataset.py:155-159)."""
    return img * 2.0 - 1.0


def sample_augment_params(
    rng: jax.Array, h: int, w: int, cfg: AugmentConfig = AugmentConfig()
) -> dict:
    """Draw every random parameter of the augmentation chain for one sample.

    Sampling is separated from application so the jnp path and the Pallas
    fused photometric kernel (ops/pallas_kernels/photometric.py) consume
    IDENTICAL parameters and can be tested for equality."""
    keys = jax.random.split(rng, 10)
    max_dx, max_dy = cfg.translate * w, cfg.translate * h
    k21, k22 = jax.random.split(keys[5])
    factors1, order1 = _sample_jitter_params(k21, cfg.jitter)
    factors2, order2 = _sample_jitter_params(k22, cfg.jitter)
    k31, k32 = jax.random.split(keys[6])
    return {
        "angle": jax.random.uniform(
            keys[0], (), minval=-cfg.degrees, maxval=cfg.degrees
        ),
        "tx": jnp.round(jax.random.uniform(
            keys[1], (), minval=-max_dx, maxval=max_dx
        )),
        "ty": jnp.round(jax.random.uniform(
            keys[2], (), minval=-max_dy, maxval=max_dy
        )),
        "scale": jax.random.uniform(
            keys[3], (), minval=cfg.scale_min, maxval=cfg.scale_max
        ),
        "shear": jax.random.uniform(
            keys[4], (), minval=-cfg.shear, maxval=cfg.shear
        ),
        "factors1": factors1,
        "order1": order1,
        "factors2": factors2,
        "order2": order2,
        "sigma1": jax.random.uniform(
            k31, (), minval=cfg.blur_sigma_min, maxval=cfg.blur_sigma_max
        ),
        "sigma2": jax.random.uniform(
            k32, (), minval=cfg.blur_sigma_min, maxval=cfg.blur_sigma_max
        ),
        "do_h": jax.random.uniform(keys[7]) < cfg.flip_prob,
        "do_v": jax.random.uniform(keys[8]) < cfg.flip_prob,
        "rot": jax.random.uniform(
            keys[9], (), minval=-cfg.rotation_degrees,
            maxval=cfg.rotation_degrees,
        ),
    }


def _apply_geometric_pre(img1, img2, label, p):
    """Stage 1: the shared joint affine (bilinear imgs / nearest label).

    img1/img2 share the SAME sampling coordinates (JointRandomAffine's
    shared params, reference dataset.py:81-101), so both are warped by ONE
    4-corner gather over the channel-stacked pair — TPU gather cost scales
    with the index count, not the bytes per index, and the per-pixel
    arithmetic is bit-identical to two separate warps (measured 2026-08-17:
    the affine/rotation gathers were the single largest op of the augmented
    train step, 5.2 of 16.3 ms)."""
    c = img1.shape[-1]
    ys, xs = _inverse_affine_coords(
        img1.shape[0], img1.shape[1], p["angle"], (p["tx"], p["ty"]),
        p["scale"], p["shear"],
    )
    pair = _sample_bilinear(jnp.concatenate([img1, img2], axis=-1), ys, xs)
    img1, img2 = pair[..., :c], pair[..., c:]
    if label is not None:
        label = _sample_nearest(label, ys, xs)
    return img1, img2, label


def _apply_photometric_flip_one(img, factors, order, sigma, do_h, do_v):
    """Stages 2-4 for one image: jitter, blur, shared flips (the jnp
    reference for the Pallas fused kernel)."""
    img = apply_color_jitter(img, factors, order)
    img = gaussian_blur3(img, sigma)
    img = jnp.where(do_h, img[:, ::-1], img)
    return jnp.where(do_v, img[::-1], img)


def _apply_label_flips(label, do_h, do_v):
    label = jnp.where(do_h, label[:, ::-1], label)
    return jnp.where(do_v, label[::-1], label)


def _apply_geometric_post(img1, img2, label, p):
    """Stage 5-6: shared rotation (NEAREST for images AND label —
    torchvision TF.rotate default, reference dataset.py:71-77), then the
    [-1,1] normalize."""
    zero = jnp.zeros(())
    c = img1.shape[-1]
    ys, xs = _inverse_affine_coords(
        img1.shape[0], img1.shape[1], p["rot"], (zero, zero), 1.0, 0.0
    )
    # All three share the rotation coords and NEAREST sampling: one gather
    # over the channel-stacked [img1 | img2 | label] (the int label rides
    # along as an exact float channel — nearest sampling does no
    # arithmetic on values).
    stack = [img1, img2]
    if label is not None:
        stack.append(label.astype(img1.dtype)[..., None])
    warped = _sample_nearest(jnp.concatenate(stack, axis=-1), ys, xs)
    img1, img2 = warped[..., :c], warped[..., c:2 * c]
    if label is not None:
        label = warped[..., 2 * c].astype(label.dtype)
    return normalize(img1), normalize(img2), label


def apply_augment_sample(img1, img2, label, p):
    """The full chain for ONE sample given explicit params (jnp path)."""
    img1, img2, label = _apply_geometric_pre(img1, img2, label, p)
    img1 = _apply_photometric_flip_one(
        img1, p["factors1"], p["order1"], p["sigma1"], p["do_h"], p["do_v"]
    )
    img2 = _apply_photometric_flip_one(
        img2, p["factors2"], p["order2"], p["sigma2"], p["do_h"], p["do_v"]
    )
    if label is not None:
        label = _apply_label_flips(label, p["do_h"], p["do_v"])
    return _apply_geometric_post(img1, img2, label, p)


def augment_sample(
    rng: jax.Array,
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    label: Optional[jnp.ndarray],
    cfg: AugmentConfig = AugmentConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Full augment=True chain for ONE sample (imgs HWC [0,1], label HW int).
    Returns images in [-1,1] and the (still-binary) label."""
    p = sample_augment_params(rng, img1.shape[0], img1.shape[1], cfg)
    return apply_augment_sample(img1, img2, label, p)


def _warp_label(label, angle, translate_xy, scale, shear):
    ys, xs = _inverse_affine_coords(
        label.shape[0], label.shape[1], angle, translate_xy, scale, shear
    )
    return _sample_nearest(label, ys, xs)


def _pack_photometric_params(factors, order, sigma, do_h, do_v):
    """Pack per-sample photometric params into the (B, 8) SMEM rows the
    Pallas kernel reads: [b, c, s, order, sigma, flip_h, flip_v, 0]."""
    b = factors.shape[0]
    return jnp.concatenate(
        [
            factors.astype(jnp.float32),
            order.astype(jnp.float32)[:, None],
            sigma.astype(jnp.float32)[:, None],
            do_h.astype(jnp.float32)[:, None],
            do_v.astype(jnp.float32)[:, None],
            jnp.zeros((b, 1), jnp.float32),
        ],
        axis=1,
    )


def augment_batch(rng, img1, img2, labels, cfg=AugmentConfig(),
                  use_pallas: bool = False):
    """Batched augment: (B,H,W,C) imgs, (B,H,W) labels (or None).

    use_pallas=True routes stages 2-4 (jitter/blur/flips) through the fused
    Pallas kernel (ops/pallas_kernels/photometric.py); the default jnp path
    is numerically identical — both consume the same sampled params."""
    b, h, w = img1.shape[0], img1.shape[1], img1.shape[2]
    keys = jax.random.split(rng, b)
    p = jax.vmap(lambda k: sample_augment_params(k, h, w, cfg))(keys)

    has_labels = labels is not None
    i1, i2, labels = jax.vmap(
        _apply_geometric_pre, in_axes=(0, 0, 0 if has_labels else None, 0)
    )(img1, img2, labels, p)

    if use_pallas:
        from ..ops.pallas_kernels import photometric_flip_batch

        par1 = _pack_photometric_params(
            p["factors1"], p["order1"], p["sigma1"], p["do_h"], p["do_v"]
        )
        par2 = _pack_photometric_params(
            p["factors2"], p["order2"], p["sigma2"], p["do_h"], p["do_v"]
        )
        i1 = photometric_flip_batch(i1, par1)
        i2 = photometric_flip_batch(i2, par2)
    else:
        i1 = jax.vmap(_apply_photometric_flip_one)(
            i1, p["factors1"], p["order1"], p["sigma1"], p["do_h"], p["do_v"]
        )
        i2 = jax.vmap(_apply_photometric_flip_one)(
            i2, p["factors2"], p["order2"], p["sigma2"], p["do_h"], p["do_v"]
        )
    if has_labels:
        labels = jax.vmap(_apply_label_flips)(labels, p["do_h"], p["do_v"])

    return jax.vmap(
        _apply_geometric_post, in_axes=(0, 0, 0 if has_labels else None, 0)
    )(i1, i2, labels, p)


def eval_batch(img1, img2):
    """augment=False path: just the [-1,1] normalize."""
    return normalize(img1), normalize(img2)


# ---------------------------------------------------------------------------
# Native-resolution augmentation (reference chain order, dataset.py:172-193:
# augment at NATIVE size, resize to target as the second-to-last step).
#
# The round-1 build augmented the pre-resized target-size cache (deviation
# documented above); this path closes that gap: samples are cached at native
# size in a padded (Hmax, Wmax) buffer with per-sample (h, w), the whole
# chain runs with dynamic extents on the padded buffer, and the
# bilinear/nearest resize to target happens ON DEVICE as chain step 5.
# When (h, w) == buffer size == target, every op below reduces to the exact
# arithmetic of the fixed-size chain (tested in tests/test_transforms.py).
# ---------------------------------------------------------------------------


def _valid_mask(hp: int, wp: int, h, w):
    """(hp, wp) float mask of the top-left (h, w) native region."""
    yy, xx = jnp.meshgrid(
        jnp.arange(hp, dtype=jnp.int32),
        jnp.arange(wp, dtype=jnp.int32),
        indexing="ij",
    )
    return ((yy < h) & (xx < w)).astype(jnp.float32)


def adjust_contrast_masked(img, factor, mask, count):
    """adjust_contrast with the grayscale mean taken over the native region
    only (the padded tail must not shift the mean)."""
    mean = jnp.sum(_grayscale(img) * mask) / count
    return jnp.clip(mean * (1.0 - factor) + img * factor, 0.0, 1.0)


def apply_color_jitter_masked(img, factors, order_idx, mask, count):
    """apply_color_jitter with the masked contrast mean."""

    def apply_op(i, img):
        return jax.lax.switch(
            i,
            [
                lambda x: adjust_brightness(x, factors[0]),
                lambda x: adjust_contrast_masked(x, factors[1], mask, count),
                lambda x: adjust_saturation(x, factors[2]),
            ],
            img,
        )

    def apply_order(perm):
        def fn(x):
            for i in perm:
                x = apply_op(i, x)
            return x
        return fn

    return jax.lax.switch(
        order_idx, [apply_order(p) for p in _JITTER_ORDERS], img
    )


def _reflect_neighbors(n_buf: int, n):
    """Index vectors (prev, next) over a length-n_buf axis implementing
    3-tap reflect padding at the DYNAMIC extent n (reflect-101: -1 -> 1,
    n -> n-2, like jnp.pad mode='reflect')."""
    i = jnp.arange(n_buf, dtype=jnp.int32)
    prev = jnp.abs(i - 1)
    nxt = (n - 1) - jnp.abs(n - 2 - i)
    return jnp.clip(prev, 0, n_buf - 1), jnp.clip(nxt, 0, n_buf - 1)


def gaussian_blur3_dyn(img: jnp.ndarray, sigma, h, w) -> jnp.ndarray:
    """gaussian_blur3 with reflect boundaries at the dynamic (h, w) extent
    of a padded buffer (identical per-pixel arithmetic: prev*k0 + mid*k1 +
    next*k2 along each axis)."""
    x = jnp.array([-1.0, 0.0, 1.0])
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    hp, wp = img.shape[0], img.shape[1]
    up, dn = _reflect_neighbors(hp, h)
    a = jnp.take(img, up, axis=0) * k[0] + img * k[1] + jnp.take(
        img, dn, axis=0
    ) * k[2]
    lf, rt = _reflect_neighbors(wp, w)
    return jnp.take(a, lf, axis=1) * k[0] + a * k[1] + jnp.take(
        a, rt, axis=1
    ) * k[2]


def _flip_indices(n_buf: int, n, do_flip):
    i = jnp.arange(n_buf, dtype=jnp.int32)
    flipped = jnp.where(i < n, n - 1 - i, i)
    return jnp.where(do_flip, jnp.clip(flipped, 0, n_buf - 1), i)


def _apply_flips_dyn(arr, do_h, do_v, h, w):
    """H/V flips within the dynamic (h, w) region of a padded buffer (HW or
    HWC arrays)."""
    xi = _flip_indices(arr.shape[1], w, do_h)
    arr = jnp.take(arr, xi, axis=1)
    yi = _flip_indices(arr.shape[0], h, do_v)
    return jnp.take(arr, yi, axis=0)


def resize_from_native_bilinear(img, h, w, out_size):
    """Bilinear align_corners=False resize from the dynamic (h, w) corner
    of a padded buffer to a static out_size — the device twin of the host
    cache resize (loader._resize_bilinear_np, reference tensor-resize
    numerics)."""

    def axis_pass(x, n, out_n, axis):
        n = jnp.asarray(n, jnp.int32)
        # src = (i+0.5)*n/out_n - 0.5 = (q - out_n)/(2*out_n) with
        # q = (2i+1)*n.  floor and remainder in exact int32 arithmetic
        # (values < 2^24 at these extents), so lo/hi match the host
        # twin's float64 coordinates EXACTLY even when n/out_n is not
        # f32-representable; only the fractional weight t pays one f32
        # rounding.  A plain f32 src was observed to flip floor() at
        # near-integer coordinates (e.g. 290->96).
        i = jnp.arange(out_n, dtype=jnp.int32)
        num = (2 * i + 1) * n - out_n
        den = 2 * out_n
        lo = jnp.floor_divide(num, den)
        t = (num - lo * den).astype(jnp.float32) / den
        # Host clip of src to [0, n-1]: below 0 -> lo=0, t=0; at or above
        # n-1 -> lo=n-1, t=0.
        t = jnp.where((lo < 0) | (lo >= n - 1), 0.0, t)
        lo = jnp.clip(lo, 0, n - 1)
        hi = jnp.minimum(lo + 1, n - 1)
        shape = [1] * x.ndim
        shape[axis] = out_n
        t = t.reshape(shape)
        return jnp.take(x, lo, axis=axis) * (1 - t) + jnp.take(
            x, hi, axis=axis
        ) * t

    img = axis_pass(img, h, out_size[0], 0)
    return axis_pass(img, w, out_size[1], 1)


def resize_from_native_nearest(label, h, w, out_size):
    """Legacy-nearest resize (loader._resize_nearest_np) with dynamic
    source extent: src = floor(i * n / out_n)."""

    def axis_pass(x, n, out_n, axis):
        n = jnp.asarray(n, jnp.int32)
        # (i * n) / out_n, multiply FIRST: exact in f32 below 2^24, so the
        # floor lands like the host's float64 computation at integer
        # crossings (loader._resize_nearest_np) — (i * (n/out_n)) would
        # round the ratio and can floor one pixel low.
        idx = jnp.floor(
            (jnp.arange(out_n, dtype=jnp.float32) * n) / out_n
        ).astype(jnp.int32)
        return jnp.take(x, jnp.minimum(idx, n - 1), axis=axis)

    label = axis_pass(label, h, out_size[0], 0)
    return axis_pass(label, w, out_size[1], 1)


def _native_affine(img1, img2, label, size_hw, p):
    """Native chain stage 1: the joint affine at native extent (bilinear
    imgs / nearest label) on a padded buffer."""
    h, w = size_hw[0], size_hw[1]
    hp, wp = img1.shape[0], img1.shape[1]
    c = img1.shape[-1]
    ys, xs = _inverse_affine_coords(
        hp, wp, p["angle"], (p["tx"], p["ty"]), p["scale"], p["shear"],
        hw=(h, w),
    )
    pair = _sample_bilinear(
        jnp.concatenate([img1, img2], axis=-1), ys, xs, hw=(h, w)
    )
    img1, img2 = pair[..., :c], pair[..., c:]
    if label is not None:
        label = _sample_nearest(label, ys, xs, hw=(h, w))
    return img1, img2, label


def _native_photometric_one(img, factors, order, sigma, size_hw):
    """Native chain stages 2-3 for one image: masked jitter + dynamic-extent
    blur (the jnp reference for the native-extent Pallas kernel)."""
    h, w = size_hw[0], size_hw[1]
    hp, wp = img.shape[0], img.shape[1]
    mask = _valid_mask(hp, wp, h, w)
    count = (h * w).astype(jnp.float32)
    img = apply_color_jitter_masked(img, factors, order, mask, count)
    return gaussian_blur3_dyn(img, sigma, h, w)


def _native_tail(img1, img2, label, size_hw, out_size, p):
    """Native chain stages 4-6: shared dynamic flips, shared rotation at
    native extent, resize to target (reference chain step 5), normalize."""
    h, w = size_hw[0], size_hw[1]
    hp, wp = img1.shape[0], img1.shape[1]
    c = img1.shape[-1]
    img1 = _apply_flips_dyn(img1, p["do_h"], p["do_v"], h, w)
    img2 = _apply_flips_dyn(img2, p["do_h"], p["do_v"], h, w)
    if label is not None:
        label = _apply_flips_dyn(label, p["do_h"], p["do_v"], h, w)

    # 5a. shared rotation at native extent (NEAREST for all three).
    zero = jnp.zeros(())
    ys, xs = _inverse_affine_coords(
        hp, wp, p["rot"], (zero, zero), 1.0, 0.0, hw=(h, w)
    )
    stack = [img1, img2]
    if label is not None:
        stack.append(label.astype(img1.dtype)[..., None])
    warped = _sample_nearest(
        jnp.concatenate(stack, axis=-1), ys, xs, hw=(h, w)
    )
    img1, img2 = warped[..., :c], warped[..., c:2 * c]

    # 5b. resize native -> target (bilinear imgs / legacy-nearest label).
    img1 = resize_from_native_bilinear(img1, h, w, out_size)
    img2 = resize_from_native_bilinear(img2, h, w, out_size)
    if label is not None:
        lab_f = resize_from_native_nearest(
            warped[..., 2 * c], h, w, out_size
        )
        label = lab_f.astype(label.dtype)

    # 6. normalize.
    return normalize(img1), normalize(img2), label


def augment_sample_native(img1, img2, label, size_hw, out_size, p):
    """The full augment=True chain for ONE padded native-size sample given
    explicit params, producing target-size outputs.  Same stage order and
    per-stage arithmetic as apply_augment_sample, plus the resize step the
    reference runs at position 5 (dataset.py:186-192)."""
    img1, img2, label = _native_affine(img1, img2, label, size_hw, p)
    img1 = _native_photometric_one(
        img1, p["factors1"], p["order1"], p["sigma1"], size_hw
    )
    img2 = _native_photometric_one(
        img2, p["factors2"], p["order2"], p["sigma2"], size_hw
    )
    return _native_tail(img1, img2, label, size_hw, out_size, p)


def augment_batch_native(rng, img1, img2, labels, sizes, out_size,
                         cfg=AugmentConfig(), use_pallas: bool = False):
    """Batched native-resolution augment: (B, Hp, Wp, C) padded imgs,
    (B, Hp, Wp) padded labels (or None), (B, 2) int32 native sizes ->
    target-size augmented batch.  Per-sample params are drawn from the same
    sampler as the fixed-size path (max translation scales with the
    NATIVE size, like the reference's degrees-of-the-native-image
    semantics).

    use_pallas=True routes stages 2-3 (masked jitter + dynamic-extent
    blur) through the fused native-extent Pallas kernel
    (ops/pallas_kernels/photometric.photometric_native_batch) — one VMEM
    pass instead of ~6 HBM round-trips per image at padded size; the
    geometric warps/flips/resize stay in XLA either way."""
    b = img1.shape[0]
    keys = jax.random.split(rng, b)
    p = jax.vmap(
        lambda k, s: sample_augment_params(k, s[0], s[1], cfg)
    )(keys, sizes)
    has_labels = labels is not None
    if not use_pallas:
        return jax.vmap(
            augment_sample_native,
            in_axes=(0, 0, 0 if has_labels else None, 0, None, 0),
        )(img1, img2, labels, sizes, out_size, p)

    from ..ops.pallas_kernels import photometric_native_batch

    i1, i2, labels = jax.vmap(
        _native_affine, in_axes=(0, 0, 0 if has_labels else None, 0, 0)
    )(img1, img2, labels, sizes, p)
    hw = sizes.astype(jnp.float32)
    count = (sizes[:, 0] * sizes[:, 1]).astype(jnp.float32)[:, None]

    def pack(factors, order, sigma):
        return jnp.concatenate(
            [factors.astype(jnp.float32),
             order.astype(jnp.float32)[:, None],
             sigma.astype(jnp.float32)[:, None],
             hw, count],
            axis=1,
        )

    i1 = photometric_native_batch(
        i1, pack(p["factors1"], p["order1"], p["sigma1"]))
    i2 = photometric_native_batch(
        i2, pack(p["factors2"], p["order2"], p["sigma2"]))
    return jax.vmap(
        _native_tail, in_axes=(0, 0, 0 if has_labels else None, 0, None, 0)
    )(i1, i2, labels, sizes, out_size, p)
