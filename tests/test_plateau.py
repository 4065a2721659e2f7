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
