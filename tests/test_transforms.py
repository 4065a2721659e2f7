"""Property tests for the device-side joint augmentation chain
(reference dataset.py:21-193 semantics; see data/transforms.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_aug_pfa_tpu.data import transforms as T

RNG = np.random.RandomState(0)
H = W = 24
IMG1 = jnp.asarray(RNG.rand(H, W, 3).astype(np.float32))
IMG2 = jnp.asarray(RNG.rand(H, W, 3).astype(np.float32))
LABEL = jnp.asarray((RNG.rand(H, W) > 0.7).astype(np.int32))


def test_normalize_range():
    out = T.normalize(IMG1)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(IMG1) * 2 - 1, rtol=1e-6
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_label_stays_binary(seed):
    _, _, lbl = T.augment_sample(
        jax.random.PRNGKey(seed), IMG1, IMG2, LABEL
    )
    vals = np.unique(np.asarray(lbl))
    assert set(vals).issubset({0, 1})


def test_deterministic_given_key():
    a = T.augment_sample(jax.random.PRNGKey(5), IMG1, IMG2, LABEL)
    b = T.augment_sample(jax.random.PRNGKey(5), IMG1, IMG2, LABEL)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_different_keys_differ():
    a, _, _ = T.augment_sample(jax.random.PRNGKey(1), IMG1, IMG2, LABEL)
    b, _, _ = T.augment_sample(jax.random.PRNGKey(2), IMG1, IMG2, LABEL)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_geometric_congruence_img_vs_label():
    """A label painted as a copy of an image channel must stay aligned with
    that channel through the SHARED geometric ops.  Use a config with no
    photometric changes and nearest resampling everywhere to compare."""
    cfg = T.AugmentConfig(jitter=0.0, blur_sigma_min=1e-6,
                          blur_sigma_max=1e-6)
    # Blocky mask (4x4 blocks) so bilinear-vs-nearest edge effects are a
    # small fraction of pixels.
    mask = np.kron(
        (RNG.rand(H // 4, W // 4) > 0.5), np.ones((4, 4))
    ).astype(np.float32)
    img = jnp.asarray(np.stack([mask] * 3, -1))
    lbl = jnp.asarray(mask.astype(np.int32))
    for seed in range(4):
        out1, _, out_lbl = T.augment_sample(
            jax.random.PRNGKey(seed), img, img, lbl, cfg
        )
        img_bin = (np.asarray(out1[..., 0]) * 0.5 + 0.5) > 0.5
        lbl_bin = np.asarray(out_lbl) > 0
        # Bilinear (img) vs nearest (label) differ only near edges; overlap
        # must still be overwhelming.
        agree = (img_bin == lbl_bin).mean()
        assert agree > 0.93, f"seed {seed}: agreement {agree}"


def test_flips_are_shared_between_images():
    """With geometry-only config and identical inputs, outputs must stay
    identical (all geometric params are shared across img1/img2)."""
    cfg = T.AugmentConfig(jitter=0.0, blur_sigma_min=1e-6,
                          blur_sigma_max=1e-6)
    for seed in range(4):
        o1, o2, _ = T.augment_sample(
            jax.random.PRNGKey(seed), IMG1, IMG1, LABEL, cfg
        )
        np.testing.assert_allclose(
            np.asarray(o1), np.asarray(o2), atol=1e-6
        )


def test_color_jitter_is_independent_per_image():
    cfg = T.AugmentConfig(degrees=0.0, translate=0.0, scale_min=1.0,
                          scale_max=1.0, shear=0.0, jitter=0.5,
                          blur_sigma_min=1e-6, blur_sigma_max=1e-6,
                          rotation_degrees=0.0)
    o1, o2, _ = T.augment_sample(
        jax.random.PRNGKey(3), IMG1, IMG1, LABEL, cfg
    )
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_identity_config_is_normalize_only():
    cfg = T.AugmentConfig(degrees=0.0, translate=0.0, scale_min=1.0,
                          scale_max=1.0, shear=0.0, jitter=0.0,
                          blur_sigma_min=1e-6, blur_sigma_max=1e-6,
                          rotation_degrees=0.0, flip_prob=0.0)
    o1, o2, lbl = T.augment_sample(
        jax.random.PRNGKey(0), IMG1, IMG2, LABEL, cfg
    )
    np.testing.assert_allclose(
        np.asarray(o1), np.asarray(IMG1) * 2 - 1, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(lbl), np.asarray(LABEL))


def test_augment_batch_shapes():
    b1 = jnp.stack([IMG1, IMG2])
    b2 = jnp.stack([IMG2, IMG1])
    bl = jnp.stack([LABEL, LABEL])
    o1, o2, ol = T.augment_batch(jax.random.PRNGKey(0), b1, b2, bl)
    assert o1.shape == b1.shape and ol.shape == bl.shape
    # Per-sample keys: the two samples get different augmentations.
    assert not np.allclose(np.asarray(o1[0]), np.asarray(o1[1]))


def test_color_jitter_matches_torch_formulas():
    """adjust_* match torchvision's tensor formulas."""
    import torch
    import torch as th

    img = RNG.rand(8, 8, 3).astype(np.float32)
    t = torch.from_numpy(img).permute(2, 0, 1)

    # brightness
    ours = np.asarray(T.adjust_brightness(jnp.asarray(img), 1.3))
    ref = (t * 1.3).clamp(0, 1).permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)

    # saturation: blend with grayscale
    f = 0.7
    gray = (0.2989 * t[0] + 0.587 * t[1] + 0.114 * t[2]).unsqueeze(0)
    ref = (gray * (1 - f) + t * f).clamp(0, 1).permute(1, 2, 0).numpy()
    ours = np.asarray(T.adjust_saturation(jnp.asarray(img), f))
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    # contrast: blend with mean of grayscale
    f = 1.2
    mean = gray.mean()
    ref = (mean * (1 - f) + t * f).clamp(0, 1).permute(1, 2, 0).numpy()
    ours = np.asarray(T.adjust_contrast(jnp.asarray(img), f))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_gaussian_blur_preserves_mean_roughly():
    out = T.gaussian_blur3(IMG1, 0.8)
    assert abs(float(out.mean()) - float(IMG1.mean())) < 0.01
    assert float(out.var()) < float(IMG1.var())  # smoothing reduces variance


# -- native-resolution augmentation (VERDICT r1 item 5) ----------------------


@pytest.mark.slow
def test_native_equals_fixed_when_sizes_match():
    """When native == buffer == target size, the native chain reduces to
    the fixed-size chain (same params, same per-stage arithmetic)."""
    from gan_aug_pfa_tpu.data.transforms import (
        augment_batch,
        augment_batch_native,
    )

    r = np.random.RandomState(0)
    b, s = 3, 32
    i1 = jnp.asarray(r.rand(b, s, s, 3).astype(np.float32))
    i2 = jnp.asarray(r.rand(b, s, s, 3).astype(np.float32))
    lb = jnp.asarray((r.rand(b, s, s) > 0.8).astype(np.int32))
    sizes = jnp.full((b, 2), s, jnp.int32)
    rng = jax.random.PRNGKey(7)

    f1, f2, fl = augment_batch(rng, i1, i2, lb)
    n1, n2, nl = augment_batch_native(rng, i1, i2, lb, sizes, (s, s))
    np.testing.assert_allclose(np.asarray(n1), np.asarray(f1), atol=2e-6)
    np.testing.assert_allclose(np.asarray(n2), np.asarray(f2), atol=2e-6)
    np.testing.assert_array_equal(np.asarray(nl), np.asarray(fl))


@pytest.mark.slow
def test_native_output_independent_of_padding_garbage():
    """The padded tail beyond each sample's native extent must not leak
    into the augmented output."""
    from gan_aug_pfa_tpu.data.transforms import augment_batch_native

    r = np.random.RandomState(1)
    b, hp, wp = 2, 48, 48
    sizes = np.array([[32, 27], [40, 48]], np.int32)
    clean1 = np.zeros((b, hp, wp, 3), np.float32)
    clean2 = np.zeros((b, hp, wp, 3), np.float32)
    lclean = np.zeros((b, hp, wp), np.int32)
    for i, (h, w) in enumerate(sizes):
        clean1[i, :h, :w] = r.rand(h, w, 3)
        clean2[i, :h, :w] = r.rand(h, w, 3)
        lclean[i, :h, :w] = (r.rand(h, w) > 0.8)
    junk1, junk2, ljunk = clean1.copy(), clean2.copy(), lclean.copy()
    for i, (h, w) in enumerate(sizes):
        junk1[i, h:, :] = r.rand(hp - h, wp, 3)
        junk1[i, :, w:] = r.rand(hp, wp - w, 3)
        junk2[i, h:, :] = 9.0
        junk2[i, :, w:] = -3.0
        ljunk[i, h:, :] = 1
        ljunk[i, :, w:] = 1

    rng = jax.random.PRNGKey(3)
    out_c = augment_batch_native(
        rng, jnp.asarray(clean1), jnp.asarray(clean2), jnp.asarray(lclean),
        jnp.asarray(sizes), (24, 24),
    )
    out_j = augment_batch_native(
        rng, jnp.asarray(junk1), jnp.asarray(junk2), jnp.asarray(ljunk),
        jnp.asarray(sizes), (24, 24),
    )
    for a, bb in zip(out_c, out_j):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
    # Label stays binary, images in [-1, 1].
    assert set(np.unique(np.asarray(out_c[2]))) <= {0, 1}
    assert np.asarray(out_c[0]).min() >= -1.0
    assert np.asarray(out_c[0]).max() <= 1.0


def test_resize_from_native_matches_host_resize():
    """The device-side dynamic-extent resizes match the host cache resizes
    (loader numerics) on the cropped native region."""
    from gan_aug_pfa_tpu.data.loader import (
        _resize_bilinear_np,
        _resize_nearest_np,
    )
    from gan_aug_pfa_tpu.data.transforms import (
        resize_from_native_bilinear,
        resize_from_native_nearest,
    )

    r = np.random.RandomState(2)
    # (290, 173) -> 96: non-dyadic ratios where n/out_n is inexact in f32 —
    # the device path must multiply before dividing to match the host's
    # float64 coordinates.
    for (h, w), out, buf in [((20, 30), (16, 16), 40),
                             ((14, 9), (16, 16), 40),
                             ((33, 17), (8, 24), 40),
                             ((290, 173), (96, 96), 300)]:
        img = r.rand(buf, buf, 3).astype(np.float32)
        got = np.asarray(resize_from_native_bilinear(
            jnp.asarray(img), h, w, out
        ))
        want = _resize_bilinear_np(img[:h, :w].copy(), out)
        np.testing.assert_allclose(got, want, atol=1e-5)

        lab = (r.rand(buf, buf) > 0.5).astype(np.int32)
        got_l = np.asarray(resize_from_native_nearest(
            jnp.asarray(lab), h, w, out
        ))
        want_l = _resize_nearest_np(lab[:h, :w].copy(), out)
        np.testing.assert_array_equal(got_l, want_l)


def test_padded_native_dataset_keeps_mismatched_pair(tmp_path, capsys):
    """A pair whose img1/img2 native sizes differ is KEPT (img2 and label
    are brought to img1's extent), matching the fixed-size cache path,
    which also keeps such pairs — not silently dropped.  Both anomalies
    must WARN (a wrong-resolution label usually means corrupt data), and
    the stretched label must be the nearest-resize of the decoded one."""
    from PIL import Image

    from gan_aug_pfa_tpu.data.loader import (
        _resize_nearest_np,
        build_padded_native_dataset,
    )
    from gan_aug_pfa_tpu.data.scanner import Sample

    r = np.random.RandomState(0)
    arrs = {}

    def png(name, h, w, mode):
        arr = (
            (r.rand(h, w, 3) * 255).astype(np.uint8)
            if mode == "RGB"
            else (r.rand(h, w) > 0.5).astype(np.uint8) * 255
        )
        arrs[name] = arr
        p = str(tmp_path / name)
        Image.fromarray(arr, mode).save(p)
        return p

    s = Sample(
        img1=png("a1.png", 24, 32, "RGB"),
        img2=png("a2.png", 20, 28, "RGB"),  # differing native size
        label=png("cm.png", 20, 28, "L"),   # matches img2, not img1
        city="mismatch",
    )
    ds = build_padded_native_dataset([s], verbose=False)
    out = capsys.readouterr().out
    assert len(ds) == 1  # kept, not skipped
    assert tuple(ds.sizes[0].tolist()) == (24, 32)  # img1's extent rules
    assert "img1/img2 native sizes differ for mismatch" in out
    assert "label native size differs for mismatch" in out
    want_lb = _resize_nearest_np(
        (arrs["cm.png"] > 128).astype(np.int32), (24, 32)
    )
    np.testing.assert_array_equal(np.asarray(ds.labels[0])[:24, :32], want_lb)


@pytest.mark.slow
def test_padded_native_dataset_and_trainer_step(oscd_tree):
    """End-to-end: build the padded native cache from the fixture tree and
    run one native-augment train step to target size."""
    from gan_aug_pfa_tpu.config import SiameseTrainConfig
    from gan_aug_pfa_tpu.data.loader import build_padded_native_dataset
    from gan_aug_pfa_tpu.data.scanner import create_sample_lists
    from gan_aug_pfa_tpu.train import SiameseTrainer

    samples = create_sample_lists(
        str(oscd_tree), "Onera Satellite Change Detection Dataset",
        "synthetic_data", mode="train", verbose=False,
    )
    ds = build_padded_native_dataset(samples, verbose=False)
    assert len(ds) == 4
    assert ds.sizes.shape == (4, 2)
    # Native sizes preserved (fixture: abudhabi 40x52, paris 48x40, ...).
    assert [tuple(s) for s in ds.sizes.tolist()].count((40, 52)) == 1
    hp, wp = ds.img1.shape[1], ds.img1.shape[2]
    assert hp % 8 == 0 and wp % 8 == 0
    assert hp >= 48 and wp >= 52

    cfg = SiameseTrainConfig(batch_size=2, compute_dtype="float32")
    tr = SiameseTrainer(cfg, augment=True, native_out_size=(16, 16))
    state = tr.init_state(jax.random.PRNGKey(0), (16, 16))
    dev = tr._device_arrays(ds)
    state, loss = tr.train_epoch(
        state, dev, len(ds), jax.random.PRNGKey(1),
        np.random.RandomState(0),
    )
    assert np.isfinite(loss)
