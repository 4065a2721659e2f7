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
