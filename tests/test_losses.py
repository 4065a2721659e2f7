"""Loss numeric-parity tests against the reference formulas, computed
independently with torch (torch CPU is available; the formulas are re-stated
from SURVEY.md §2 #12-15, not imported from the reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gan_aug_pfa_tpu import losses

RNG = np.random.RandomState(42)
LOGITS = RNG.randn(2, 16, 16, 1).astype(np.float32) * 3
TARGETS = (RNG.rand(2, 16, 16, 1) > 0.7).astype(np.float32)


def torch_dice(logits, targets, smooth):
    probs = torch.sigmoid(torch.from_numpy(logits)).reshape(-1)
    t = torch.from_numpy(targets).reshape(-1)
    inter = (probs * t).sum()
    return (1 - (2 * inter + smooth) / (probs.sum() + t.sum() + smooth)).item()


def torch_focal(logits, targets, gamma, alpha):
    x = torch.from_numpy(logits)
    t = torch.from_numpy(targets)
    bce = F.binary_cross_entropy_with_logits(x, t, reduction="none")
    pt = torch.exp(-bce)
    alpha_t = t * alpha + (1 - t) * (1 - alpha)
    return (alpha_t * (1 - pt) ** gamma * bce).mean().item()


@pytest.mark.parametrize("smooth", [1.0, 1e-6])
def test_dice_matches_torch(smooth):
    ours = losses.dice_loss(jnp.asarray(LOGITS), jnp.asarray(TARGETS), smooth)
    ref = torch_dice(LOGITS, TARGETS, smooth)
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


@pytest.mark.parametrize("gamma,alpha", [(2.0, 0.25), (1.79, 0.603)])
def test_focal_matches_torch(gamma, alpha):
    ours = losses.focal_loss(
        jnp.asarray(LOGITS), jnp.asarray(TARGETS), gamma, alpha
    )
    ref = torch_focal(LOGITS, TARGETS, gamma, alpha)
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_bce_pos_weight_matches_torch():
    x = torch.from_numpy(LOGITS)
    t = torch.from_numpy(TARGETS)
    ref = F.binary_cross_entropy_with_logits(
        x, t, pos_weight=torch.tensor(9.0)
    ).item()
    ours = losses.bce_with_logits(
        jnp.asarray(LOGITS), jnp.asarray(TARGETS), pos_weight=9.0
    )
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_combined_loss_composition():
    a, s = 0.5, 1.0
    ours = losses.combined_loss(
        jnp.asarray(LOGITS), jnp.asarray(TARGETS), alpha=a, smooth_dice=s
    )
    bce = F.binary_cross_entropy_with_logits(
        torch.from_numpy(LOGITS), torch.from_numpy(TARGETS),
        pos_weight=torch.tensor(9.0),
    ).item()
    ref = a * bce + (1 - a) * torch_dice(LOGITS, TARGETS, s)
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_focal_dice_frozen_constants():
    """The exact constants used by reference train.py:294."""
    beta, gamma, alpha, smooth = (
        0.6699803915247974,
        1.7930869982898021,
        0.6030489822904476,
        1.956571276926647e-06,
    )
    ours = losses.focal_dice_loss(
        jnp.asarray(LOGITS), jnp.asarray(TARGETS), beta=beta,
        focal_gamma=gamma, focal_alpha=alpha, dice_smooth=smooth,
    )
    ref = beta * torch_focal(LOGITS, TARGETS, gamma, alpha) + (
        1 - beta
    ) * torch_dice(LOGITS, TARGETS, smooth)
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_focal_dice_accepts_bhw_targets():
    """Reference losses reshape [B,H,W] targets to [B,1,H,W]
    (train.py:56-58); ours reshapes flat to the logits shape."""
    t_bhw = TARGETS.reshape(2, 16, 16)
    a = losses.focal_dice_loss(jnp.asarray(LOGITS), jnp.asarray(t_bhw))
    b = losses.focal_dice_loss(jnp.asarray(LOGITS), jnp.asarray(TARGETS))
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_gan_losses():
    pred = jnp.asarray(RNG.randn(1, 30, 30, 1).astype(np.float32))
    ones = F.binary_cross_entropy_with_logits(
        torch.from_numpy(np.asarray(pred)), torch.ones(1, 30, 30, 1)
    ).item()
    np.testing.assert_allclose(
        float(losses.gan_bce_loss(pred, True)), ones, rtol=1e-5
    )
    x = RNG.randn(4, 8).astype(np.float32)
    y = RNG.randn(4, 8).astype(np.float32)
    np.testing.assert_allclose(
        float(losses.l1_loss(jnp.asarray(x), jnp.asarray(y))),
        np.abs(x - y).mean(), rtol=1e-6,
    )


def test_losses_jit_and_grad():
    grad = jax.grad(
        lambda lg: losses.focal_dice_loss(lg, jnp.asarray(TARGETS))
    )(jnp.asarray(LOGITS))
    assert grad.shape == LOGITS.shape
    assert bool(jnp.all(jnp.isfinite(grad)))


@pytest.mark.slow
def test_gan_trainer_batched_disc_smoke():
    """batched_disc=True: one [real|fake] D pass; the step runs and both
    losses stay finite (CPU, tiny 128px)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gan_aug_pfa_tpu.config import GANTrainConfig
    from gan_aug_pfa_tpu.train import GANTrainer

    cfg = GANTrainConfig(
        batch_size=2, compute_dtype="float32", target_size=(128, 128),
        data_parallel=False, batched_disc=True,
    )
    tr = GANTrainer(cfg)
    sg, sd = tr.init_states(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    ds = tuple(
        jnp.asarray(rng.rand(4, 128, 128, 3).astype(np.float32))
        for _ in range(2)
    )
    sg, sd, ld, lg = tr.train_epoch(sg, sd, ds, 4, np.random.RandomState(0))
    assert np.isfinite(ld) and np.isfinite(lg)


@pytest.mark.slow
def test_gan_trainer_concat_free_disc_equivalence():
    """concat_free_disc=True reproduces the default path's epoch losses to
    fp reassociation noise (the D first conv is a split-kernel sum — no
    behavior change, unlike batched_disc)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gan_aug_pfa_tpu.config import GANTrainConfig
    from gan_aug_pfa_tpu.train import GANTrainer

    rng = np.random.RandomState(0)
    ds = tuple(
        jnp.asarray(rng.rand(4, 128, 128, 3).astype(np.float32))
        for _ in range(2)
    )
    results = []
    for flag in (False, True):
        cfg = GANTrainConfig(
            batch_size=2, compute_dtype="float32", target_size=(128, 128),
            data_parallel=False, concat_free_disc=flag,
        )
        tr = GANTrainer(cfg)
        sg, sd = tr.init_states(jax.random.PRNGKey(0))
        sg, sd, ld, lg = tr.train_epoch(
            sg, sd, ds, 4, np.random.RandomState(0)
        )
        results.append((float(ld), float(lg)))
    (ld0, lg0), (ld1, lg1) = results
    np.testing.assert_allclose(ld1, ld0, rtol=2e-4)
    np.testing.assert_allclose(lg1, lg0, rtol=2e-4)
