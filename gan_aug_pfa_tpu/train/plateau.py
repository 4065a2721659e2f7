"""ReduceLROnPlateau — host-side LR controller (reference train.py:296).

Optax has no built-in plateau scheduler driven by validation loss; this is a
faithful reimplementation of torch.optim.lr_scheduler.ReduceLROnPlateau's
semantics (mode='min', threshold=1e-4 relative, cooldown=0, the reference's
factor=0.2 / patience=7).  It lives OUTSIDE jit — validation loss is a
host-side scalar — and the resulting LR is injected into the optimizer state
via optax.inject_hyperparams (see optim.py).
"""

from __future__ import annotations


class ReduceLROnPlateau:
    def __init__(
        self,
        initial_lr: float,
        factor: float = 0.2,
        patience: int = 7,
        threshold: float = 1e-4,
        threshold_mode: str = "rel",
        cooldown: int = 0,
        min_lr: float = 0.0,
        eps: float = 1e-8,
    ):
        self.lr = float(initial_lr)
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.cooldown = cooldown
        self.min_lr = min_lr
        self.eps = eps
        self.best = float("inf")
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    def _is_better(self, current: float) -> bool:
        if self.threshold_mode == "rel":
            return current < self.best * (1.0 - self.threshold)
        return current < self.best - self.threshold

    def step(self, metric: float) -> float:
        """Feed the epoch's validation loss; returns the (possibly reduced)
        learning rate."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            new_lr = max(self.lr * self.factor, self.min_lr)
            if self.lr - new_lr > self.eps:
                self.lr = new_lr
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr

    def state_dict(self) -> dict:
        return {
            "lr": self.lr,
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
            "cooldown_counter": self.cooldown_counter,
        }

    def load_state_dict(self, state: dict) -> None:
        self.lr = state["lr"]
        self.best = state["best"]
        self.num_bad_epochs = state["num_bad_epochs"]
        self.cooldown_counter = state["cooldown_counter"]


class EarlyStopping:
    """[extension] Stop training after `patience` consecutive epochs with
    no validation-loss improvement (the reference always runs the full
    --num-epochs budget).  Improvement uses the same strict `<`-best
    criterion as best-model checkpointing (reference train.py:307-309), so
    "stopped" always means "the best_model checkpoint stopped advancing
    `patience` epochs ago".  A NaN validation loss never counts as an
    improvement, so a diverged run stops after `patience` epochs.

    patience <= 0 disables (``step`` always returns False).  Host-side and
    checkpointable (state_dict/load_state_dict ride the last_state extra)
    so --resume continues the bad-epoch count instead of resetting it."""

    def __init__(self, patience: int = 0):
        self.patience = int(patience)
        self.best = float("inf")
        self.num_bad_epochs = 0

    def step(self, metric: float) -> bool:
        """Feed the epoch's validation loss; True = stop now."""
        if metric < self.best:
            self.best = float(metric)
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        return self.patience > 0 and self.num_bad_epochs >= self.patience

    def state_dict(self) -> dict:
        return {"best": self.best, "num_bad_epochs": self.num_bad_epochs}

    def load_state_dict(self, state: dict) -> None:
        self.best = float(state["best"])
        self.num_bad_epochs = int(state["num_bad_epochs"])
