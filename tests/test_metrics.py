"""Metric parity tests vs the reference formulas (evaluate.py:34-64),
restated independently in numpy."""

import jax.numpy as jnp
import numpy as np

from gan_aug_pfa_tpu.metrics import calculate_metrics, per_sample_metrics


def ref_metrics(preds, targets, smooth=1e-6):
    p = (preds > 0.5).astype(np.float64).reshape(-1)
    t = targets.astype(np.float64).reshape(-1)
    tp = (p * t).sum()
    fp = ((1 - t) * p).sum()
    fn = (t * (1 - p)).sum()
    tn = ((1 - t) * (1 - p)).sum()
    precision = (tp + smooth) / (tp + fp + smooth)
    recall = (tp + smooth) / (tp + fn + smooth)
    f1 = (2 * precision * recall + smooth) / (precision + recall + smooth)
    iou = (tp + smooth) / (tp + fp + fn + smooth)
    acc = (tp + tn + smooth) / (tp + tn + fp + fn + smooth)
    return dict(accuracy=acc, precision=precision, recall=recall, f1=f1,
                iou=iou)


def test_calculate_metrics_matches_reference_formula():
    rng = np.random.RandomState(7)
    preds = rng.rand(3, 32, 32).astype(np.float32)
    targets = (rng.rand(3, 32, 32) > 0.8).astype(np.float32)
    ours = calculate_metrics(jnp.asarray(preds), jnp.asarray(targets))
    ref = ref_metrics(preds, targets)
    for k, v in ref.items():
        np.testing.assert_allclose(float(ours[k]), v, rtol=1e-5)


def test_all_negative_edge_case():
    preds = np.zeros((1, 8, 8), np.float32)
    targets = np.zeros((1, 8, 8), np.float32)
    ours = calculate_metrics(jnp.asarray(preds), jnp.asarray(targets))
    ref = ref_metrics(preds, targets)
    for k in ref:
        np.testing.assert_allclose(float(ours[k]), ref[k], rtol=1e-5)


def test_per_sample_metrics_macro_average():
    rng = np.random.RandomState(3)
    preds = rng.rand(4, 16, 16).astype(np.float32)
    targets = (rng.rand(4, 16, 16) > 0.7).astype(np.float32)
    batched = per_sample_metrics(jnp.asarray(preds), jnp.asarray(targets))
    assert batched["f1"].shape == (4,)
    for i in range(4):
        ref = ref_metrics(preds[i], targets[i])
        np.testing.assert_allclose(
            float(batched["f1"][i]), ref["f1"], rtol=1e-5
        )


def test_visualize_sample_13band_band_select(tmp_path):
    """The viz layer band-selects B4/B3/B2 for >3-channel inputs."""
    import numpy as np

    from gan_aug_pfa_tpu.utils.viz import visualize_sample

    rng = np.random.RandomState(0)
    img = rng.rand(16, 16, 13).astype(np.float32)
    pred = rng.rand(16, 16).astype(np.float32)
    lbl = (rng.rand(16, 16) > 0.5).astype(np.int32)
    path = visualize_sample(img, img, lbl, pred, "s2city", 0, str(tmp_path))
    import os

    assert os.path.exists(path)
