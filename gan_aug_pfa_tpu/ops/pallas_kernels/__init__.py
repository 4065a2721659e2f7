"""Pallas TPU kernels for the framework's hot ops.

The reference has no native/CUDA kernels (SURVEY.md §2); these kernels fill
the "native compute" role the TPU way.  Each has a numerically-identical jnp
fallback in the main library, auto-selected when the kernel's preconditions
(platform, VMEM fit) don't hold; on CPU the kernels run in Pallas interpret
mode so their numerics are testable without TPU hardware.

  fused_loss.focal_dice_loss_fused — single-pass FocalDice forward with a
      custom-VJP single-pass backward (reference train.py:108-128).
  photometric.photometric_flip_batch — per-sample color-jitter + Gaussian
      blur + joint flips in one VMEM-resident pass (the BASELINE.json-named
      fused augmentation kernel; reference dataset.py:38-134).
  photometric.photometric_native_batch — the native-resolution variant
      (masked contrast mean + dynamic-extent blur) for the default
      augment-then-resize chain (reference dataset.py:172-193).
  metrics.confusion_counts_batch — per-sample tp/fp/fn/tn in one pass
      (reference evaluate.py:34-64).
"""

from .fused_loss import focal_dice_loss_fused
from .metrics import confusion_counts_batch
from .photometric import photometric_flip_batch, photometric_native_batch

__all__ = [
    "focal_dice_loss_fused",
    "confusion_counts_batch",
    "photometric_flip_batch",
    "photometric_native_batch",
]
