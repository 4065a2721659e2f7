"""Optimizer factories with torch-matching semantics.

  adamw: decoupled weight decay (optax.adamw == torch.optim.AdamW).
  adam:  torch.optim.Adam's weight_decay adds wd*param to the GRADIENT
         (L2 regularization, coupled), i.e. add_decayed_weights BEFORE the
         Adam moment update — not optax.adamw's decoupled form.

Learning rates are injected as mutable hyperparams so the host-side
ReduceLROnPlateau (plateau.py) can rewrite them between epochs without
recompiling the train step.
"""

from __future__ import annotations

import optax


def make_optimizer(
    name: str,
    learning_rate: float,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype: str | None = None,
    flat_state: bool = False,
    grad_accum: int = 1,
) -> optax.GradientTransformation:
    """mu_dtype: dtype for the first-moment accumulator (e.g. "bfloat16").
    None keeps the torch-exact default (momentum in the param dtype).  A
    bf16 momentum halves one of the optimizer's three HBM-resident state
    tensors — the Adam update is bandwidth-bound on TPU — at the cost of
    momentum rounding, so it is an opt-in deviation.

    flat_state: run the update on ONE concatenated vector (optax.flatten)
    instead of per-leaf tree_map — the moment buffers become two large
    arrays rather than ~200 small ones, collapsing the per-leaf copy and
    fusion overhead a scan-carried state tree causes on TPU, at the cost
    of one ravel/unravel of the gradients per step.  Same arithmetic per
    element; opt-in because the optimizer-state checkpoint layout changes
    (resume remains self-consistent either way)."""
    name = name.lower()
    if name == "adamw":
        tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=learning_rate, b1=b1, b2=b2, eps=eps,
            weight_decay=weight_decay, mu_dtype=mu_dtype,
        )
    elif name == "adam":

        def torch_adam(learning_rate, weight_decay=0.0):
            # add_decayed_weights BEFORE the moment update == torch Adam's
            # coupled L2; weight_decay=0 is a numeric no-op (and the
            # hyperparam is traced under inject_hyperparams, so no branching).
            return optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.scale_by_adam(b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype),
                optax.scale_by_learning_rate(learning_rate),
            )

        tx = optax.inject_hyperparams(torch_adam)(
            learning_rate=learning_rate, weight_decay=weight_decay
        )
    else:
        raise ValueError(f"Unknown optimizer: {name}")
    if flat_state:
        # flatten() wraps update/init but passes the inner state through
        # unchanged, so set_learning_rate's hyperparams access still works.
        tx = optax.flatten(tx)
    if grad_accum > 1:
        # Gradient accumulation: average grads over k mini-steps and apply
        # one optimizer update — emulates batch_size*k beyond what fits in
        # HBM.  BatchNorm batch stats still update per MINI-batch (the
        # standard accumulation semantics caveat).  set/get_learning_rate
        # reach through MultiStepsState.inner_opt_state.
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def _hyperparams(opt_state):
    """The injected-hyperparams dict, reached through any MultiSteps
    wrapper."""
    while not hasattr(opt_state, "hyperparams"):
        if hasattr(opt_state, "inner_opt_state"):
            opt_state = opt_state.inner_opt_state
        else:
            raise AttributeError(
                f"no hyperparams in opt state of type {type(opt_state)}"
            )
    return opt_state.hyperparams


def set_learning_rate(opt_state, lr: float):
    """Rewrite the injected learning-rate hyperparam in an opt state
    (a one-scalar host->device transfer, done once per epoch at most)."""
    import jax.numpy as jnp

    hp = _hyperparams(opt_state)
    old = hp["learning_rate"]
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.asarray(old).dtype)
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(_hyperparams(opt_state)["learning_rate"])
