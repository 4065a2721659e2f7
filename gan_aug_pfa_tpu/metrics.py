"""Evaluation metrics (reference evaluate.py:34-64), jitted.

calculate_metrics: threshold probs at 0.5, flatten, compute tp/fp/fn/tn, then

  precision = (tp + s) / (tp + fp + s)
  recall    = (tp + s) / (tp + fn + s)
  f1        = (2 P R + s) / (P + R + s)        (from the smoothed P, R)
  iou       = (tp + s) / (tp + fp + fn + s)
  accuracy  = (tp + tn + s) / (tp + tn + fp + fn + s)

with smooth s = 1e-6 — bit-for-bit the reference's formulas, which is what
"F1/IoU within 1%" parity is judged on (SURVEY.md §5.5).

The vmapped per-sample variant supports the reference's per-sample
macro-averaging (evaluate.py:159-200).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

METRIC_KEYS = ("accuracy", "precision", "recall", "f1", "iou")


def confusion_counts(preds: jnp.ndarray, targets: jnp.ndarray,
                     threshold: float = 0.5):
    """tp/fp/fn/tn from probability maps and {0,1} targets.  threshold=0.5
    is the reference's fixed decision point (evaluate.py:40); other values
    are an [extension] (evaluate CLI --threshold / --threshold-sweep)."""
    p = (preds.astype(jnp.float32) > threshold).astype(
        jnp.float32
    ).reshape(-1)
    t = targets.astype(jnp.float32).reshape(-1)
    tp = jnp.sum(p * t)
    fp = jnp.sum((1.0 - t) * p)
    fn = jnp.sum(t * (1.0 - p))
    tn = jnp.sum((1.0 - t) * (1.0 - p))
    return tp, fp, fn, tn


def metrics_from_counts(tp, fp, fn, tn, smooth: float = 1e-6
                        ) -> Dict[str, jnp.ndarray]:
    precision = (tp + smooth) / (tp + fp + smooth)
    recall = (tp + smooth) / (tp + fn + smooth)
    f1 = (2.0 * precision * recall + smooth) / (precision + recall + smooth)
    iou = (tp + smooth) / (tp + fp + fn + smooth)
    accuracy = (tp + tn + smooth) / (tp + tn + fp + fn + smooth)
    return {
        "accuracy": accuracy,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "iou": iou,
    }


def calculate_metrics(preds: jnp.ndarray, targets: jnp.ndarray,
                      smooth: float = 1e-6, threshold: float = 0.5
                      ) -> Dict[str, jnp.ndarray]:
    """Metrics over the whole (flattened) input — reference
    evaluate.py:34-64."""
    tp, fp, fn, tn = confusion_counts(preds, targets, threshold)
    return metrics_from_counts(tp, fp, fn, tn, smooth)


@jax.jit
def per_sample_metrics(preds: jnp.ndarray, targets: jnp.ndarray,
                       threshold: float = 0.5) -> Dict[str, jnp.ndarray]:
    """Per-sample metrics over a batch: preds (B, ...), targets (B, ...).
    Returns each metric as a (B,) vector, for the reference's per-sample
    macro-averaging (evaluate.py:159-173)."""
    def one(p, t):
        return calculate_metrics(p, t, threshold=threshold)

    return jax.vmap(one)(preds, targets)


@jax.jit
def per_sample_metrics_sweep(preds: jnp.ndarray, targets: jnp.ndarray,
                             thresholds: jnp.ndarray
                             ) -> Dict[str, jnp.ndarray]:
    """[extension] per_sample_metrics over a (T,) threshold grid in one
    compiled program: each metric comes back as a (T, B) array.  Powers
    `evaluate.py --threshold-sweep` (operating-point selection — the
    reference hardcodes 0.5)."""
    def at_threshold(th):
        return per_sample_metrics(preds, targets, th)

    return jax.vmap(at_threshold)(thresholds)


def per_sample_metrics_pallas(preds: jnp.ndarray, targets: jnp.ndarray,
                              smooth: float = 1e-6
                              ) -> Dict[str, jnp.ndarray]:
    """per_sample_metrics via the one-pass Pallas confusion-counts kernel
    (ops/pallas_kernels/metrics.py) — (B, H, W) maps only; opt-in, same
    numbers as the jnp path (tests/test_pallas.py)."""
    from .ops.pallas_kernels import confusion_counts_batch

    c = confusion_counts_batch(preds, targets)
    return metrics_from_counts(c[:, 0], c[:, 1], c[:, 2], c[:, 3], smooth)
