"""Regression tests: the whole-epoch lax.scan path must match the per-step
jit path (same math, different dispatch granularity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compile/pipeline tier

from gan_aug_pfa_tpu.config import SiameseTrainConfig
from gan_aug_pfa_tpu.parallel.mesh import make_mesh
from gan_aug_pfa_tpu.train import SiameseTrainer
from gan_aug_pfa_tpu.utils.profiling import StepTimer

RNG = np.random.RandomState(0)
N = 10
DS = (
    jnp.asarray(RNG.rand(N, 16, 16, 3).astype(np.float32)),
    jnp.asarray(RNG.rand(N, 16, 16, 3).astype(np.float32)),
    jnp.asarray((RNG.rand(N, 16, 16) > 0.8).astype(np.int32)),
)


def _run_epoch(mesh, use_timer):
    cfg = SiameseTrainConfig(
        batch_size=4, compute_dtype="float32",
        data_parallel=mesh is not None,
    )
    tr = SiameseTrainer(cfg, mesh=mesh)
    if use_timer:
        tr.step_timer = StepTimer()  # forces the per-step path
    state = tr.init_state(jax.random.PRNGKey(0), (16, 16))
    ds = tr._device_arrays(
        type("D", (), {"img1": DS[0], "img2": DS[1], "labels": DS[2]})()
    )
    state, loss = tr.train_epoch(
        state, ds, N, jax.random.PRNGKey(1), np.random.RandomState(5)
    )
    val = tr.validate(state, ds, N)
    return loss, val


def test_scan_matches_per_step():
    """Same math, different dispatch granularity (mesh variants of the scan
    path are exercised by __graft_entry__ and tests/test_pipelines.py)."""
    scan_loss, scan_val = _run_epoch(None, use_timer=False)
    step_loss, step_val = _run_epoch(None, use_timer=True)
    # Tolerance covers XLA reassociation across the two programs.
    assert scan_loss == pytest.approx(step_loss, rel=2e-3)
    assert scan_val == pytest.approx(step_val, rel=2e-3)


def test_scan_on_mesh_with_partial_batch():
    """Data-parallel scan epoch with a trailing partial batch (10 = 2x4 + 2)
    produces a finite loss; the partial batch's gather replicates (batch not
    divisible by the data axis)."""
    mesh = make_mesh(4, axis_names=("data",))
    loss, val = _run_epoch(mesh, use_timer=False)
    assert np.isfinite(loss) and np.isfinite(val)


def test_scan_on_mesh_matches_single_device():
    """Data-parallel training over a 4-device mesh is the SAME math as
    single-device: the batch shards across the 'data' axis and XLA's SPMD
    partitioner inserts the cross-device reductions (global BN batch stats,
    summed grads), so an identical seed run lands on the same losses up to
    collective reassociation."""
    single_loss, single_val = _run_epoch(None, use_timer=False)
    mesh = make_mesh(4, axis_names=("data",))
    mesh_loss, mesh_val = _run_epoch(mesh, use_timer=False)
    assert mesh_loss == pytest.approx(single_loss, rel=2e-3)
    assert mesh_val == pytest.approx(single_val, rel=2e-3)


def test_grad_accum_epoch_param_update_cadence():
    """[extension] grad_accum=2: the epoch runs (scan path), loss is
    finite, and params only move on every second mini-step (checked via a
    2-step manual drive)."""
    cfg = SiameseTrainConfig(
        batch_size=4, compute_dtype="float32", data_parallel=False,
        grad_accum=2,
    )
    tr = SiameseTrainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0), (16, 16))
    # Materialize before the step: the state is DONATED into _train_step,
    # so device references into it are invalidated afterwards.
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    ds = tr._device_arrays(
        type("D", (), {"img1": DS[0], "img2": DS[1], "labels": DS[2]})()
    )
    idx = tr._put_idx(np.arange(4))
    state, loss = tr._train_step(
        state, ds[0], ds[1], ds[2], idx, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss))
    # After one mini-step, params are unchanged (accumulating).
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]), p0
    )
    state, loss = tr._train_step(
        state, ds[0], ds[1], ds[2], idx, jax.random.PRNGKey(2)
    )
    assert float(
        jnp.abs(jax.tree_util.tree_leaves(state.params)[0] - p0).max()
    ) > 0.0
    # Whole-epoch scan path also runs under accumulation.
    state, epoch_loss = tr.train_epoch(
        state, ds, N, jax.random.PRNGKey(3), np.random.RandomState(7)
    )
    assert np.isfinite(epoch_loss)
