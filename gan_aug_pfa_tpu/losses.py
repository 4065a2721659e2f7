"""Loss functions: Dice / Focal / Combined / FocalDice / GAN losses.

Functional jnp counterparts of reference train.py:34-128 and
train_gan.py:42-43, with identical formulas:

  dice       = 1 - (2*sum(p*t) + s) / (sum(p) + sum(t) + s), global flatten
  focal      = mean(alpha_t * (1-pt)^gamma * bce),  pt = exp(-bce)
  combined   = a * BCEWithLogits(pos_weight) + (1-a) * dice
  focal_dice = b * focal + (1-b) * dice
  gan        = BCEWithLogits vs all-ones/all-zeros targets;  l1 = mean |x-y|

Everything is pure and jit-friendly; computation upcasts to float32 so the
reductions are stable regardless of the model's compute dtype.  The fused
focal+dice single-pass Pallas kernel lives in ops/pallas_kernels/fused_loss.py
and is numerically equivalent (XLA already fuses these elementwise chains into
the backward matmuls; the kernel exists for the HBM-bound large-resolution
case and is opt-in via SiameseTrainConfig.fused_loss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _flatten_pair(logits: jnp.ndarray, targets: jnp.ndarray):
    logits = logits.astype(jnp.float32).reshape(-1)
    targets = targets.astype(jnp.float32).reshape(-1)
    return logits, targets


def bce_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    pos_weight: float | None = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Numerically-stable BCE-with-logits, matching
    torch.nn.functional.binary_cross_entropy_with_logits:
      loss = (1 + (pw-1)*t) * (log(1+exp(-|x|)) + max(-x, 0)) ... expanded as
      loss = max(x,0) - x*t + w*log1p(exp(-|x|)) with pos-weight on the
      positive term."""
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    # log(sigmoid(x)) = -softplus(-x); log(1 - sigmoid(x)) = -softplus(x)
    log_p = -jax.nn.softplus(-x)
    log_not_p = -jax.nn.softplus(x)
    if pos_weight is None:
        loss = -(t * log_p + (1.0 - t) * log_not_p)
    else:
        loss = -(pos_weight * t * log_p + (1.0 - t) * log_not_p)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def dice_loss(logits: jnp.ndarray, targets: jnp.ndarray,
              smooth: float = 1.0) -> jnp.ndarray:
    """Global-flatten soft Dice (reference train.py:34-45)."""
    x, t = _flatten_pair(logits, targets)
    probs = jax.nn.sigmoid(x)
    intersection = jnp.sum(probs * t)
    return 1.0 - (2.0 * intersection + smooth) / (
        jnp.sum(probs) + jnp.sum(t) + smooth
    )


def focal_loss(logits: jnp.ndarray, targets: jnp.ndarray, gamma: float = 2.0,
               alpha: float = 0.25, reduction: str = "mean") -> jnp.ndarray:
    """Alpha-balanced focal loss (reference train.py:47-80)."""
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32).reshape(x.shape)
    bce = bce_with_logits(x, t, reduction="none")
    pt = jnp.exp(-bce)
    alpha_t = t * alpha + (1.0 - t) * (1.0 - alpha)
    fl = alpha_t * (1.0 - pt) ** gamma * bce
    if reduction == "mean":
        return jnp.mean(fl)
    if reduction == "sum":
        return jnp.sum(fl)
    return fl


def combined_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                  alpha: float = 0.5, smooth_dice: float = 1.0,
                  pos_weight: float = 9.0) -> jnp.ndarray:
    """alpha * weighted-BCE + (1-alpha) * Dice (reference train.py:82-105)."""
    t = targets.astype(jnp.float32).reshape(logits.shape)
    bce = bce_with_logits(logits, t, pos_weight=pos_weight)
    return alpha * bce + (1.0 - alpha) * dice_loss(logits, t, smooth_dice)


def focal_dice_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                    beta: float = 0.5, focal_gamma: float = 2.0,
                    focal_alpha: float = 0.75,
                    dice_smooth: float = 1.0) -> jnp.ndarray:
    """beta * Focal + (1-beta) * Dice — the training loss
    (reference train.py:108-128, used at train.py:224, 294)."""
    t = targets.astype(jnp.float32).reshape(logits.shape)
    return beta * focal_loss(logits, t, focal_gamma, focal_alpha) + (
        1.0 - beta
    ) * dice_loss(logits, t, dice_smooth)


def gan_bce_loss(pred_logits: jnp.ndarray, is_real: bool) -> jnp.ndarray:
    """BCEWithLogits against an all-ones / all-zeros patch map
    (reference train_gan.py:42, 58-67)."""
    target = jnp.ones_like(pred_logits) if is_real else jnp.zeros_like(
        pred_logits
    )
    return bce_with_logits(pred_logits, target)


def l1_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error (reference train_gan.py:43, 68)."""
    return jnp.mean(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)))
