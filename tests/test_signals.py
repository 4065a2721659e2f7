"""Preemption-safe training (utils/signals.py): the guard latches signals,
the epoch loop saves resume state and exits cleanly, and --resume
continues from the preempted epoch."""

import os
import signal
import threading

import numpy as np
import pytest

from gan_aug_pfa_tpu.utils.signals import GracefulShutdown


def test_guard_latches_first_signal():
    with GracefulShutdown(signals=(signal.SIGTERM,)) as stop:
        assert not stop.requested
        os.kill(os.getpid(), signal.SIGTERM)
        assert stop.requested
        assert stop.signum == signal.SIGTERM
    # Handlers restored on exit.
    assert signal.getsignal(signal.SIGTERM) != stop._handle


def test_second_signal_falls_through_to_previous_handler():
    hits = []
    prev = signal.signal(signal.SIGTERM, lambda s, f: hits.append(s))
    try:
        with GracefulShutdown(signals=(signal.SIGTERM,)) as stop:
            os.kill(os.getpid(), signal.SIGTERM)
            assert stop.requested and not hits
            os.kill(os.getpid(), signal.SIGTERM)
            assert hits == [signal.SIGTERM]
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_guard_is_inert_off_main_thread():
    results = {}

    def run():
        with GracefulShutdown() as stop:
            results["installed"] = bool(stop._previous)

    t = threading.Thread(target=run)
    t.start()
    t.join()
    assert results["installed"] is False


@pytest.mark.slow
def test_training_preempts_and_resumes(oscd_tree, monkeypatch):
    """SIGTERM during epoch 2 of 50 → training stops after epoch 2 with
    last_state saved; a --resume relaunch runs only the remaining epoch."""
    from gan_aug_pfa_tpu.config import DataConfig, SiameseTrainConfig
    from gan_aug_pfa_tpu.pipelines import run_siamese_training
    from gan_aug_pfa_tpu.train import SiameseTrainer

    data_cfg = DataConfig(root_dir=str(oscd_tree), target_size=(16, 16))

    orig = SiameseTrainer.train_epoch
    calls = []

    def wrapped(self, *a, **k):
        calls.append(1)
        if len(calls) == 2:
            os.kill(os.getpid(), signal.SIGTERM)
        return orig(self, *a, **k)

    monkeypatch.setattr(SiameseTrainer, "train_epoch", wrapped)
    cfg = dict(batch_size=2, compute_dtype="float32",
               checkpoint_dir="preempt_ckpt", save_every=10)
    history = run_siamese_training(
        data_cfg, SiameseTrainConfig(num_epochs=50, **cfg), verbose=False
    )
    assert len(history["train_loss"]) == 2  # stopped at the epoch boundary
    assert (oscd_tree / "preempt_ckpt" / "last_state.msgpack").exists()
    # The guard exited with the pipeline: a stray SIGTERM must not be
    # swallowed by a dead handler (default disposition restored).
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.default_int_handler
    ) or callable(signal.getsignal(signal.SIGTERM))

    monkeypatch.setattr(SiameseTrainer, "train_epoch", orig)
    resumed = run_siamese_training(
        data_cfg,
        SiameseTrainConfig(num_epochs=3, resume=True, **cfg),
        verbose=False,
    )
    assert len(resumed["train_loss"]) == 1  # epochs 3 only: resumed at 2+1
    assert np.isfinite(resumed["train_loss"][0])


@pytest.mark.slow
def test_gan_training_preempts_and_resumes(oscd_tree, monkeypatch):
    """Exercises the GAN loop's preemption wiring (signal → off-cadence
    last_* save → break → resume).  train_epoch is stubbed so the test
    checks the loop logic, not the compiled step (test_pipelines covers
    that)."""
    from gan_aug_pfa_tpu.config import DataConfig, GANTrainConfig
    from gan_aug_pfa_tpu.pipelines import run_gan_training
    from gan_aug_pfa_tpu.train import GANTrainer

    data_cfg = DataConfig(root_dir=str(oscd_tree), target_size=(128, 128))
    calls = []

    def fake_epoch(self, sg, sd, dev, n, epoch_rng):
        calls.append(1)
        if len(calls) == 1:
            os.kill(os.getpid(), signal.SIGTERM)
        return sg, sd, 0.5, 40.0

    monkeypatch.setattr(GANTrainer, "train_epoch", fake_epoch)
    # sample_every > num_epochs: the preview-strip generate (a compiled
    # forward) never runs.
    cfg = dict(
        target_size=(128, 128), compute_dtype="float32",
        checkpoint_dir="preempt_gan_ckpt", save_every=10, sample_every=99,
    )
    history = run_gan_training(
        data_cfg, GANTrainConfig(num_epochs=5, **cfg), verbose=False
    )
    assert len(history["loss_d"]) == 1  # stopped after the signaled epoch
    base = oscd_tree / "preempt_gan_ckpt"
    assert (base / "last_generator.msgpack").exists()
    assert (base / "last_discriminator.msgpack").exists()

    resumed = run_gan_training(
        data_cfg, GANTrainConfig(num_epochs=2, resume=True, **cfg),
        verbose=False,
    )
    assert len(resumed["loss_d"]) == 1  # resumed at epoch 2
    assert len(calls) == 2
