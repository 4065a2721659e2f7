"""Generator weight EMA (--ema-decay): update math, checkpoint round-trip,
and the generator_ema_epoch_N artifact contract.

The reference has no EMA (SURVEY.md §2 #18 — plain alternating Adam,
train_gan.py:46-75); this is a flagged extension.  The EMA checkpoint is a
REGULAR generator checkpoint (params + batch_stats) so it drops straight
into the generate/evaluate load paths (generate_synthetic_data.py:44-48
analog).

One tiny-GAN epoch is trained once (module fixture) and shared by every
test here — each extra GAN epoch program costs ~40 s of XLA compile on the
1-core CPU test host."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_aug_pfa_tpu import checkpoint as ckpt
from gan_aug_pfa_tpu.config import GANTrainConfig
from gan_aug_pfa_tpu.train import GANTrainer

# Tiny architecture so compiles stay cheap on the CPU test platform.
TINY = dict(
    num_downs=5, ngf=8, ndf=8, n_layers=1, target_size=(32, 32),
    compute_dtype="float32", data_parallel=False, batch_size=2,
)
DECAY = 0.9


def _tiny_ds(n=2, size=32, seed=0):
    rng = np.random.RandomState(seed)
    return tuple(
        jnp.asarray(rng.rand(n, size, size, 3).astype(np.float32))
        for _ in range(2)
    )


@pytest.fixture(scope="module")
def ema_run():
    """(trainer, init_params, state_g after one 1-step epoch)."""
    tr = GANTrainer(GANTrainConfig(ema_decay=DECAY, **TINY))
    sg, sd = tr.init_states(jax.random.PRNGKey(0))
    p0 = jax.tree.map(np.asarray, sg.params)
    sg, sd, _, _ = tr.train_epoch(
        sg, sd, _tiny_ds(), 2, np.random.RandomState(0)
    )
    return tr, p0, sg


def test_ema_one_step_recurrence(ema_run):
    """After exactly one G update, ema == d*init + (1-d)*new, leaf-exact."""
    _, p0, sg = ema_run
    p1 = jax.tree.map(np.asarray, sg.params)
    ema = jax.tree.map(np.asarray, sg.ema_params)
    expect = jax.tree.map(lambda a, b: DECAY * a + (1 - DECAY) * b, p0, p1)
    jax.tree.map(
        lambda e, x: np.testing.assert_allclose(e, x, rtol=1e-6, atol=1e-7),
        expect, ema,
    )
    # And the params actually moved, so the EMA check is non-vacuous.
    moved = jax.tree.map(lambda a, b: np.any(a != b), p0, p1)
    assert any(jax.tree.leaves(moved))


def test_ema_disabled_is_none():
    tr = GANTrainer(GANTrainConfig(**TINY))
    sg, _ = tr.init_states(jax.random.PRNGKey(0))
    assert sg.ema_params is None


def test_ema_checkpoint_roundtrip(ema_run, tmp_path):
    """Full (resume) checkpoints carry ema_params; restoring a pre-EMA
    checkpoint into an EMA-enabled template seeds the EMA from params."""
    tr, _, sg = ema_run
    path = str(tmp_path / "last_generator.msgpack")
    ckpt.save_checkpoint(path, sg, extra={"epoch": 1})

    template, _ = tr.init_states(jax.random.PRNGKey(1))
    restored, extra = ckpt.restore_checkpoint(path, template, with_extra=True)
    assert extra["epoch"] == 1
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored.ema_params, sg.ema_params,
    )
    # EMA state is distinct from params after training.
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: np.any(np.asarray(a) != np.asarray(b)),
        restored.ema_params, restored.params,
    ))
    assert any(diffs)

    # Pre-EMA checkpoint (no ema_params key) -> EMA template: seeded from
    # the restored params.  Build it by stripping the field, no retrain.
    path0 = str(tmp_path / "old_generator.msgpack")
    ckpt.save_checkpoint(path0, sg.replace(ema_params=None))
    template2, _ = tr.init_states(jax.random.PRNGKey(2))
    restored2 = ckpt.restore_checkpoint(path0, template2)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored2.ema_params, restored2.params,
    )


def test_ema_artifact_loads_as_generator(ema_run, tmp_path):
    """generator_ema_epoch_N.msgpack (model-only, params=ema) restores via
    restore_model_only into generator variables and runs inference — the
    same load path generate_synthetic_data uses."""
    tr, _, sg = ema_run
    path = str(tmp_path / "generator_ema_epoch_1.msgpack")
    ckpt.save_checkpoint(
        path, sg.replace(params=sg.ema_params, ema_params=None),
        extra={"epoch": 1, "ema_decay": DECAY}, model_only=True,
    )
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = tr.generator.init(jax.random.PRNGKey(1), dummy, train=False)
    loaded = ckpt.restore_model_only(path, variables)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        loaded["params"], sg.ema_params,
    )
    out = tr.generator.apply(loaded, dummy, train=False)
    assert out.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ema_decay_out_of_range_fails_fast():
    """ema_decay outside [0, 1) must raise at config construction, not
    silently produce a divergent EMA checkpoint (ADVICE r2)."""
    for bad in (1.0, 1.5, -0.1):
        with pytest.raises(ValueError, match="ema_decay"):
            GANTrainConfig(ema_decay=bad)
    GANTrainConfig(ema_decay=0.999)  # valid value still constructs
    GANTrainConfig(ema_decay=None)
