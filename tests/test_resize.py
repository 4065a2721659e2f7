"""Resize-op parity vs torch.nn.functional.interpolate (the reference resizes
tensors, so torch interpolate — not PIL — defines the target numerics;
reference dataset.py:136-153 via torchvision TF.resize on tensors)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from gan_aug_pfa_tpu.data.loader import _resize_bilinear_np, _resize_nearest_np
from gan_aug_pfa_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
    upsample2x_align_corners,
)

RNG = np.random.RandomState(0)


def torch_resize(x_hwc, size, mode, align_corners=None):
    t = torch.from_numpy(x_hwc).permute(2, 0, 1).unsqueeze(0)
    out = F.interpolate(t, size=size, mode=mode, align_corners=align_corners)
    return out.squeeze(0).permute(1, 2, 0).numpy()


def test_bilinear_downscale_matches_torch():
    x = RNG.rand(37, 53, 3).astype(np.float32)
    ref = torch_resize(x, (16, 24), "bilinear", align_corners=False)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), (16, 24)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_bilinear_upscale_matches_torch():
    x = RNG.rand(16, 16, 3).astype(np.float32)
    ref = torch_resize(x, (41, 33), "bilinear", align_corners=False)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), (41, 33)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_upsample2x_align_corners_matches_torch():
    x = RNG.rand(2, 9, 13, 5).astype(np.float32)
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = (
        F.interpolate(t, scale_factor=2, mode="bilinear", align_corners=True)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    ours = np.asarray(upsample2x_align_corners(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_upsample2x_matmul_equals_gather_form():
    from gan_aug_pfa_tpu.ops.resize import _upsample2x_gather

    x = RNG.rand(3, 8, 11, 7).astype(np.float32)
    a = np.asarray(upsample2x_align_corners(jnp.asarray(x)))
    b = np.asarray(_upsample2x_gather(jnp.asarray(x)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_upsample2x_matmul_gradient_equals_gather_gradient():
    import jax

    from gan_aug_pfa_tpu.ops.resize import _upsample2x_gather

    x = jnp.asarray(RNG.rand(2, 6, 6, 4).astype(np.float32))
    g_mm = jax.grad(lambda v: jnp.sum(upsample2x_align_corners(v) ** 2))(x)
    g_ga = jax.grad(lambda v: jnp.sum(_upsample2x_gather(v) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_ga), atol=1e-5)


def test_nearest_matches_torch_legacy():
    x = (RNG.rand(29, 31) > 0.5).astype(np.float32)
    t = torch.from_numpy(x)[None, None]
    ref = F.interpolate(t, size=(13, 17), mode="nearest")[0, 0].numpy()
    ours = np.asarray(resize_nearest(jnp.asarray(x), (13, 17)))
    np.testing.assert_array_equal(ours, ref)


def test_host_resize_matches_device_resize():
    x = RNG.rand(40, 52, 3).astype(np.float32)
    host = _resize_bilinear_np(x, (128, 128))
    dev = np.asarray(resize_bilinear(jnp.asarray(x), (128, 128)))
    np.testing.assert_allclose(host, dev, atol=1e-5)

    lbl = (RNG.rand(40, 52) > 0.5).astype(np.int32)
    host_l = _resize_nearest_np(lbl, (128, 128))
    dev_l = np.asarray(resize_nearest(jnp.asarray(lbl), (128, 128)))
    np.testing.assert_array_equal(host_l, dev_l)


def test_nearest_nhwc_spatial_axes():
    x = RNG.rand(2, 8, 8, 3).astype(np.float32)
    out = np.asarray(
        resize_nearest(jnp.asarray(x), (4, 4), spatial_axes=(-3, -2))
    )
    assert out.shape == (2, 4, 4, 3)
