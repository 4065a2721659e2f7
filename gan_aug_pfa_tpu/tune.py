"""Optuna-style hyperparameter tuning of the Siamese model (reference
train.py:167-255, 338-374).

Search space mirrors the reference exactly:
  lr            ~ log-uniform [1e-5, 5e-3]
  batch_size    in {2, 4, 8}
  optimizer     in {AdamW, Adam}
  weight_decay  ~ log-uniform [1e-6, 1e-3]
  focal_alpha   ~ uniform [0.1, 0.9]
  focal_gamma   ~ uniform [1.0, 3.0]
  loss_beta     ~ uniform [0.3, 0.7]
  dice_smooth   ~ log-uniform [1e-7, 1e-4]
15 epochs/trial, augment=True train set, per-epoch report + median pruning,
study 'siamese_unet_tuning_v3' in sqlite:///optuna_study.db, 50 trials.

TPU-native difference: datasets are decoded/cached ONCE for the whole study
(the reference re-scans and re-decodes PNGs per trial) and each trial's
training is a jitted HBM-resident run, so the measured ~8-12 min/trial of the
reference (BASELINE.md) becomes seconds.
"""

from __future__ import annotations

import contextlib
import threading

import jax
import numpy as np

from .config import DataConfig, SiameseTrainConfig
from .data import build_cached_dataset, create_sample_lists
from .data.loader import build_padded_native_dataset
from .train import SiameseTrainer
from .tuning import MedianPruner, TrialPruned, TrialState, create_study

# Concurrent FIRST compiles from parallel-trial threads can crash
# jaxlib's CPU client (see objective()); serialize them study-wide.
#
# Trigger characterization (round 3, scripts/repro_concurrent_compile.py):
#   * plain concurrent jit first-compiles from threads (conv+scan+PRNG
#     programs, 4 threads x 3 rounds, with and without a 150-compile
#     process burn-in) do NOT crash this jaxlib (0.9.0) — 4/4 clean runs;
#   * the actual 2-parallel-trial tuning workload UNLOCKED in a fresh
#     process also passes (tests/test_tuning.py
#     test_parallel_trials_unlocked_fresh_process);
#   * the 3 observed crashes (2026-08-17) all required a LONG-LIVED
#     process (~150 prior suite tests) compiling the full 41M-param trial
#     programs concurrently — a jaxlib process-state bug we cannot
#     minimize further in reasonable time.
# The lock therefore stays as cheap insurance for exactly that state: it
# serializes only setup + first-epoch compiles; steady-state epochs
# overlap freely.  Set GAN_AUG_PFA_TPU_UNLOCKED_COMPILES=1 to disable it
# (diagnostic knob; the regression test uses it to detect when a future
# jaxlib makes the lock retirable).
_FIRST_COMPILE_LOCK = threading.Lock()


def _first_compile_guard():
    import os

    if os.environ.get("GAN_AUG_PFA_TPU_UNLOCKED_COMPILES") == "1":
        return contextlib.nullcontext()
    return _FIRST_COMPILE_LOCK


TRIAL_EPOCHS = 15  # reference train.py:183
STUDY_NAME = "siamese_unet_tuning_v3"  # reference train.py:341
STORAGE = "sqlite:///optuna_study.db"  # reference train.py:340
N_TRIALS = 50  # reference train.py:354


def load_tuning_datasets(data_cfg: DataConfig, verbose: bool = True,
                         native_aug: bool = True):
    """Decode/caches once for the whole study (the reference re-scans and
    re-decodes per trial).  native_aug=True caches the TRAIN set at native
    resolution (PaddedNativeDataset) so trials augment-then-resize exactly
    like the reference chain (dataset.py:172-193); validation is always the
    target-size cache."""
    train_samples = create_sample_lists(
        data_cfg.root_dir, data_cfg.dataset_subdir, data_cfg.synthetic_data_dir,
        mode="train", use_synthetic=data_cfg.use_synthetic, verbose=verbose,
    )
    val_samples = create_sample_lists(
        data_cfg.root_dir, data_cfg.dataset_subdir, data_cfg.synthetic_data_dir,
        mode="val", verbose=verbose,
    )
    if native_aug:
        train_ds = build_padded_native_dataset(train_samples, verbose=verbose)
    else:
        train_ds = build_cached_dataset(
            train_samples, data_cfg.target_size, verbose=verbose
        )
    val_ds = build_cached_dataset(
        val_samples, data_cfg.target_size, verbose=verbose
    )
    return train_ds, val_ds


def make_objective(data_cfg: DataConfig, verbose: bool = True,
                   trial_epochs: int = TRIAL_EPOCHS, mesh=None,
                   datasets=None, name: str = "",
                   native_aug: bool = True):
    """Build the Optuna objective.

    mesh: optional sub-mesh this objective's trials train on — the
    mechanism behind parallel trials across slice partitions.
    datasets: optional pre-built (train_ds, val_ds) shared across workers.
    native_aug: augment trials at native resolution (see
    load_tuning_datasets).
    """
    train_ds, val_ds = (
        datasets if datasets is not None
        else load_tuning_datasets(data_cfg, verbose, native_aug=native_aug)
    )

    def objective(trial) -> float:
        lr = trial.suggest_loguniform("lr", 1e-5, 5e-3)
        batch_size = trial.suggest_categorical("batch_size", [2, 4, 8])
        optimizer_name = trial.suggest_categorical(
            "optimizer", ["AdamW", "Adam"]
        )
        weight_decay = trial.suggest_loguniform("weight_decay", 1e-6, 1e-3)
        focal_alpha = trial.suggest_float("focal_alpha", 0.1, 0.9)
        focal_gamma = trial.suggest_float("focal_gamma", 1.0, 3.0)
        loss_beta = trial.suggest_float("loss_beta", 0.3, 0.7)
        dice_smooth = trial.suggest_loguniform("dice_smooth", 1e-7, 1e-4)

        if len(train_ds) == 0:
            raise TrialPruned("Empty training dataset")
        if len(val_ds) == 0:
            raise TrialPruned("Empty validation dataset")

        cfg = SiameseTrainConfig(
            batch_size=batch_size,
            learning_rate=lr,
            weight_decay=weight_decay,
            focal_alpha=focal_alpha,
            focal_gamma=focal_gamma,
            loss_beta=loss_beta,
            dice_smooth=dice_smooth,
            optimizer=optimizer_name.lower(),
            seed=trial.number,
        )
        trainer = SiameseTrainer(
            cfg, mesh=mesh, augment=True,
            native_out_size=data_cfg.target_size if native_aug else None,
        )
        # (augment=True per reference train.py:201)
        # Serialize each trial's compile-heavy setup + first epoch:
        # concurrent first compiles from parallel-trial threads have
        # crashed jaxlib's CPU client (segfault/abort observed in the
        # full suite, 2026-08-17).  Steady-state epochs (the other
        # trial_epochs-1, cache hits) still overlap freely, which is
        # where the parallel-trial win lives.
        with _first_compile_guard():
            state = trainer.init_state(
                jax.random.PRNGKey(trial.number), data_cfg.target_size
            )
            dev_t = trainer._device_arrays(train_ds)
            dev_v = trainer._device_arrays(val_ds)
        if verbose:
            print(
                f"{name}Trial {trial.number}: lr={lr:.2e}, batch={batch_size}, "
                f"opt={optimizer_name}, wd={weight_decay:.2e}, "
                f"f_alpha={focal_alpha:.2f}, f_gamma={focal_gamma:.2f}, "
                f"loss_beta={loss_beta:.2f}, dice_smooth={dice_smooth:.2e}"
            )
        with _first_compile_guard():
            # PRNGKey/split also compile on their first call in a fresh
            # process — keep them under the lock too.
            rng = jax.random.PRNGKey(1000 + trial.number)
        epoch_rng = np.random.RandomState(trial.number)
        best = float("inf")
        for epoch in range(1, trial_epochs + 1):
            # Epoch 1 compiles this trial's program shapes (split, epoch
            # scan, validate); later epochs are cache hits with identical
            # shapes (see lock note above).
            with _first_compile_guard() if epoch == 1 else contextlib.nullcontext():
                rng, erng = jax.random.split(rng)
                state, train_loss = trainer.train_epoch(
                    state, dev_t, len(train_ds), erng, epoch_rng
                )
                val_loss = trainer.validate(state, dev_v, len(val_ds))
            trial.report(val_loss, epoch)
            if trial.should_prune():
                if verbose:
                    print(f"Trial {trial.number} pruned at epoch {epoch}.")
                raise TrialPruned()
            best = min(best, val_loss)
            if verbose:
                print(
                    f"  Epoch {epoch}/{trial_epochs} - Train Loss: "
                    f"{train_loss:.4f}, Val Loss: {val_loss:.4f}"
                )
        return best

    return objective


def run_tuning(
    data_cfg: DataConfig,
    n_trials: int = N_TRIALS,
    storage: str = STORAGE,
    study_name: str = STUDY_NAME,
    trial_epochs: int = TRIAL_EPOCHS,
    verbose: bool = True,
    n_parallel: int = 1,
    native_aug: bool = True,
):
    """Run the study.  n_parallel > 1 partitions the device slice into
    n_parallel sub-meshes and runs that many trials CONCURRENTLY, one
    data-parallel trial per partition (the BASELINE.json "multi-city
    data-parallel training across a TPU slice" sweep shape) — trial
    results land in the same shared study/storage."""
    study = create_study(
        study_name=study_name,
        storage=storage,
        direction="minimize",
        load_if_exists=True,
        pruner=MedianPruner(
            n_startup_trials=5, n_warmup_steps=5, interval_steps=1
        ),
    )
    if n_parallel <= 1:
        objective = make_objective(data_cfg, verbose=verbose,
                                   trial_epochs=trial_epochs,
                                   native_aug=native_aug)
        study.optimize(objective, n_trials=n_trials, n_jobs=1)
    else:
        import threading

        devs = jax.devices()
        n_parallel = min(n_parallel, max(1, len(devs)))
        per = len(devs) // n_parallel
        datasets = load_tuning_datasets(data_cfg, verbose,
                                        native_aug=native_aug)
        # Each worker's sub-mesh over its own slice partition.
        import numpy as _np
        from jax.sharding import Mesh as _Mesh

        meshes = [
            _Mesh(_np.asarray(devs[k * per:(k + 1) * per]), ("data",))
            if per > 1 else None  # 1-device partition: no mesh needed
            for k in range(n_parallel)
        ]
        shares = [n_trials // n_parallel] * n_parallel
        for k in range(n_trials % n_parallel):
            shares[k] += 1
        errors = []

        def worker(k):
            objective = make_objective(
                data_cfg, verbose=verbose, trial_epochs=trial_epochs,
                mesh=meshes[k], datasets=datasets, name=f"[w{k}] ",
                native_aug=native_aug,
            )
            try:
                study.optimize(objective, n_trials=shares[k], n_jobs=1)
            except Exception as e:  # noqa: BLE001 — surface after join
                errors.append((k, e))

        threads = [
            threading.Thread(target=worker, args=(k,), daemon=True)
            for k in range(n_parallel)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors:
            raise errors[0][1]
    if verbose:
        print("\n--- Tuning Study Complete ---")
        print(f"Study name: {study_name}")
        print(f"Number of finished trials: {len(study.trials)}")
        best = study.best_trial
        print(f"Best trial number: {best.number}")
        print(f"Best validation loss: {best.value:.4f}")
        print("Best hyperparameters:")
        for key, value in best.params.items():
            if isinstance(value, float):
                print(f"  {key}: {value:.4e}")
            else:
                print(f"  {key}: {value}")
    return study


def display_study_results(storage: str = STORAGE,
                          study_name: str = STUDY_NAME) -> None:
    """Print the study report (reference show_optuna_results.py:10-66)."""
    from .tuning import load_study

    try:
        study = load_study(study_name=study_name, storage=storage)
    except Exception as e:  # noqa: BLE001
        print(f"Error loading study '{study_name}' from {storage}: {e}")
        return
    trials = study.trials
    print(f"Study: {study_name}")
    print(f"Number of trials: {len(trials)}")
    completed = [t for t in trials if t.state == TrialState.COMPLETE]
    print(f"Completed trials: {len(completed)}")
    if not completed:
        print("No completed trials.")
        return
    best = study.best_trial
    print("\n--- Best Trial ---")
    print(f"Trial number: {best.number}")
    print(f"Value (val loss): {best.value:.5f}")
    print("Params:")
    for k, v in best.params.items():
        print(f"  {k}: {v}")
    print("\n--- All Completed Trials ---")
    for t in completed:
        print(f"Trial {t.number}: value={t.value:.5f} params={t.params}")
