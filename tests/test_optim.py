"""Optimizer factory tests — the [extension] momentum-dtype knob.

The reference uses torch AdamW/Adam with fp32 state (train.py:292,
train_gan.py:63-66); `mu_dtype=None` reproduces that (momentum kept in the
param dtype). `mu_dtype="bfloat16"` is an opt-in deviation that halves one
of the three optimizer-state tensors' HBM traffic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_aug_pfa_tpu.train.optim import make_optimizer


def _params():
    return {"w": jnp.ones((4, 4), jnp.float32), "b": jnp.zeros((4,), jnp.float32)}


def _mu_leaves(state):
    # Both adam (chain) and adamw (inject_hyperparams) wrap a ScaleByAdamState
    # somewhere inside; find it by attribute.
    found = []

    def visit(s):
        if hasattr(s, "mu") and hasattr(s, "nu"):
            found.append(s)
        if isinstance(s, tuple):
            for item in s:
                visit(item)
        elif hasattr(s, "inner_state"):
            visit(s.inner_state)

    visit(state)
    assert found, f"no ScaleByAdamState found in {state}"
    return jax.tree_util.tree_leaves(found[0].mu)


@pytest.mark.parametrize("name", ["adam", "adamw"])
def test_default_momentum_dtype_is_param_dtype(name):
    tx = make_optimizer(name, 1e-3, weight_decay=1e-2)
    state = tx.init(_params())
    for leaf in _mu_leaves(state):
        assert leaf.dtype == jnp.float32


@pytest.mark.parametrize("name", ["adam", "adamw"])
def test_bf16_momentum_dtype(name):
    tx = make_optimizer(name, 1e-3, weight_decay=1e-2, mu_dtype="bfloat16")
    state = tx.init(_params())
    for leaf in _mu_leaves(state):
        assert leaf.dtype == jnp.bfloat16


@pytest.mark.parametrize("name", ["adam", "adamw"])
def test_flat_state_update_equivalence(name):
    """flat_state=True (optax.flatten) produces the SAME parameter updates
    as the per-leaf path — the arithmetic is identical, only the state
    layout changes (two concatenated moment vectors)."""
    params = _params()
    tx_tree = make_optimizer(name, 1e-3, weight_decay=1e-2)
    tx_flat = make_optimizer(name, 1e-3, weight_decay=1e-2, flat_state=True)
    st, sf = tx_tree.init(params), tx_flat.init(params)
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, sub = jax.random.split(key)
        grads = {
            "w": jax.random.normal(sub, (4, 4), jnp.float32),
            "b": jax.random.normal(sub, (4,), jnp.float32),
        }
        ut, st = tx_tree.update(grads, st, params)
        uf, sf = tx_flat.update(grads, sf, params)
        for a, b in zip(
            jax.tree_util.tree_leaves(ut), jax.tree_util.tree_leaves(uf)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
            )
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, ut)


def test_flat_state_keeps_hyperparams_access():
    """set_learning_rate/get_learning_rate (the plateau scheduler's device
    hook) still work under flat_state — flatten passes the inner
    InjectHyperparamsState through unchanged."""
    from gan_aug_pfa_tpu.train.optim import (
        get_learning_rate,
        set_learning_rate,
    )

    tx = make_optimizer("adamw", 1e-3, weight_decay=1e-2, flat_state=True)
    state = tx.init(_params())
    assert abs(get_learning_rate(state) - 1e-3) < 1e-9  # fp32 storage
    state = set_learning_rate(state, 5e-4)
    assert abs(get_learning_rate(state) - 5e-4) < 1e-9
    # the rewritten LR actually feeds the next update
    grads = jax.tree_util.tree_map(jnp.ones_like, _params())
    updates, _ = tx.update(grads, state, _params())
    assert all(
        bool(jnp.all(jnp.isfinite(u)))
        for u in jax.tree_util.tree_leaves(updates)
    )


def test_bf16_momentum_updates_stay_close():
    """A few steps of bf16-momentum Adam track fp32-momentum Adam to bf16
    rounding error (the deviation is bounded, not a behavior change)."""
    params32 = _params()
    params16 = _params()
    tx32 = make_optimizer("adam", 1e-2)
    tx16 = make_optimizer("adam", 1e-2, mu_dtype="bfloat16")
    s32, s16 = tx32.init(params32), tx16.init(params16)
    key = jax.random.PRNGKey(0)
    for i in range(5):
        key, sub = jax.random.split(key)
        grads = {
            "w": jax.random.normal(sub, (4, 4), jnp.float32),
            "b": jax.random.normal(sub, (4,), jnp.float32),
        }
        u32, s32 = tx32.update(grads, s32, params32)
        u16, s16 = tx16.update(grads, s16, params16)
        params32 = jax.tree_util.tree_map(lambda p, u: p + u, params32, u32)
        params16 = jax.tree_util.tree_map(lambda p, u: p + u, params16, u16)
    for a, b in zip(
        jax.tree_util.tree_leaves(params32), jax.tree_util.tree_leaves(params16)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2)
        assert b.dtype == jnp.float32  # params themselves stay fp32


def test_grad_accum_matches_mean_gradient_update():
    """[extension] grad_accum=k: params move only every k-th update, and
    that move equals one plain update on the MEAN of the k gradients.
    set/get_learning_rate reach through the MultiSteps wrapper."""
    from gan_aug_pfa_tpu.train.optim import (
        get_learning_rate,
        make_optimizer,
        set_learning_rate,
    )

    params = {"w": jnp.ones((4,), jnp.float32)}
    g1 = {"w": jnp.full((4,), 0.5, jnp.float32)}
    g2 = {"w": jnp.full((4,), 1.5, jnp.float32)}

    tx = make_optimizer("adamw", 1e-2, 1e-3, grad_accum=2)
    s = tx.init(params)
    assert get_learning_rate(s) == pytest.approx(1e-2)
    u1, s = tx.update(g1, s, params)
    # Mini-step 1 of 2: no parameter movement yet.
    assert all(
        float(jnp.abs(v).max()) == 0.0
        for v in jax.tree_util.tree_leaves(u1)
    )
    u2, s = tx.update(g2, s, params)

    ref_tx = make_optimizer("adamw", 1e-2, 1e-3)
    ref_s = ref_tx.init(params)
    gmean = {"w": (g1["w"] + g2["w"]) / 2.0}
    ref_u, _ = ref_tx.update(gmean, ref_s, params)
    np.testing.assert_allclose(
        np.asarray(u2["w"]), np.asarray(ref_u["w"]), rtol=1e-6
    )
    s = set_learning_rate(s, 5e-3)
    assert get_learning_rate(s) == pytest.approx(5e-3)
