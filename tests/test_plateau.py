"""ReduceLROnPlateau parity vs torch.optim.lr_scheduler.ReduceLROnPlateau
(the reference's scheduler, train.py:296)."""

import numpy as np
import torch

from gan_aug_pfa_tpu.train.plateau import ReduceLROnPlateau


def torch_lr_trace(losses, lr0, factor, patience):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=factor, patience=patience
    )
    trace = []
    for loss in losses:
        sched.step(loss)
        trace.append(opt.param_groups[0]["lr"])
    return trace


def ours_lr_trace(losses, lr0, factor, patience):
    sched = ReduceLROnPlateau(lr0, factor=factor, patience=patience)
    return [sched.step(loss) for loss in losses]


def test_matches_torch_on_plateau():
    # Improve for 3 epochs then plateau for 15 -> one (or more) reductions.
    losses = [1.0, 0.9, 0.8] + [0.8] * 15
    ref = torch_lr_trace(losses, 1e-3, 0.2, 7)
    ours = ours_lr_trace(losses, 1e-3, 0.2, 7)
    np.testing.assert_allclose(ours, ref, rtol=1e-9)


def test_matches_torch_on_noisy_loss():
    rng = np.random.RandomState(0)
    losses = list(0.5 + 0.1 * rng.rand(40))
    ref = torch_lr_trace(losses, 1e-4, 0.2, 7)
    ours = ours_lr_trace(losses, 1e-4, 0.2, 7)
    np.testing.assert_allclose(ours, ref, rtol=1e-9)


def test_matches_torch_tiny_improvements_below_threshold():
    # Relative-threshold semantics: 1e-5 improvements don't count.
    losses = [1.0] + [1.0 - 1e-6 * i for i in range(20)]
    ref = torch_lr_trace(losses, 1e-3, 0.5, 3)
    ours = ours_lr_trace(losses, 1e-3, 0.5, 3)
    np.testing.assert_allclose(ours, ref, rtol=1e-9)


def test_state_dict_roundtrip():
    s = ReduceLROnPlateau(1e-3, 0.2, 7)
    for loss in [1.0, 0.9, 0.9, 0.9]:
        s.step(loss)
    s2 = ReduceLROnPlateau(1e-3, 0.2, 7)
    s2.load_state_dict(s.state_dict())
    for loss in [0.9] * 10:
        a, b = s.step(loss), s2.step(loss)
        assert a == b


# ---------------------------------------------------------------------------
# EarlyStopping ([extension] — the reference always runs the full epoch
# budget; see train/plateau.EarlyStopping)
# ---------------------------------------------------------------------------

from gan_aug_pfa_tpu.train.plateau import EarlyStopping  # noqa: E402


def test_early_stopping_triggers_after_patience_bad_epochs():
    s = EarlyStopping(patience=2)
    assert not s.step(1.0)   # first epoch always improves from inf
    assert not s.step(0.9)   # improvement
    assert not s.step(0.95)  # bad 1/2
    assert s.step(0.95)      # bad 2/2 -> stop
    # An improvement resets the count.
    s = EarlyStopping(patience=2)
    s.step(1.0)
    s.step(1.1)              # bad 1/2
    assert not s.step(0.5)   # improvement resets
    assert not s.step(0.6)   # bad 1/2 again
    assert s.step(0.6)


def test_early_stopping_disabled_when_patience_zero():
    s = EarlyStopping(patience=0)
    assert not any(s.step(1.0) for _ in range(50))


def test_early_stopping_nan_never_improves():
    s = EarlyStopping(patience=2)
    assert not s.step(float("nan"))  # nan < inf is False -> bad 1/2
    assert s.step(float("nan"))      # bad 2/2 -> a diverged run stops


def test_early_stopping_state_roundtrip():
    s = EarlyStopping(patience=3)
    s.step(1.0)
    s.step(1.2)
    s2 = EarlyStopping(patience=3)
    s2.load_state_dict(s.state_dict())
    # Identical continuation (the resume path feeds floats back).
    for loss in [1.3, 1.4, 0.2, 0.5, 0.6, 0.7]:
        assert s.step(loss) == s2.step(loss)
