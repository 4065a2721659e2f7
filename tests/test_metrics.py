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


def test_threshold_param_and_sweep():
    """[extension] confusion_counts honors a non-0.5 threshold; the sweep
    variant returns a (T, B) grid whose 0.5 row equals per_sample_metrics
    and whose best-F1 threshold is the one separating this construction."""
    import jax.numpy as jnp
    import numpy as np

    from gan_aug_pfa_tpu.metrics import (
        calculate_metrics,
        per_sample_metrics,
        per_sample_metrics_sweep,
    )

    # probs: positives at 0.4, negatives at 0.2 -> perfect at t=0.3,
    # all-negative predictions at t=0.5.
    t = np.zeros((2, 8, 8), np.float32)
    t[:, :4] = 1.0
    p = np.where(t > 0, 0.4, 0.2).astype(np.float32)

    m05 = calculate_metrics(jnp.asarray(p), jnp.asarray(t))
    assert float(m05["recall"]) < 1e-4  # nothing crosses 0.5
    m03 = calculate_metrics(jnp.asarray(p), jnp.asarray(t), threshold=0.3)
    assert float(m03["f1"]) > 0.999 and float(m03["iou"]) > 0.999

    grid = jnp.asarray([0.1, 0.3, 0.5], jnp.float32)
    sweep = per_sample_metrics_sweep(jnp.asarray(p), jnp.asarray(t), grid)
    assert sweep["f1"].shape == (3, 2)
    base = per_sample_metrics(jnp.asarray(p), jnp.asarray(t))
    np.testing.assert_allclose(
        np.asarray(sweep["f1"][2]), np.asarray(base["f1"]), rtol=1e-6
    )
    macro_f1 = np.asarray(sweep["f1"]).mean(axis=1)
    assert int(np.argmax(macro_f1)) == 1  # t=0.3 wins
