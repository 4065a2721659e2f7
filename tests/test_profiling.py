"""Tests for the tracing/profiling/numeric-safety subsystem
(utils/profiling.py — SURVEY.md §5.1-5.2 equivalents)."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_aug_pfa_tpu.utils.profiling import StepTimer, nan_guard, trace


def test_step_timer_stats():
    timer = StepTimer(items_per_step=4, skip_first=1)
    for _ in range(6):
        with timer.step():
            time.sleep(0.002)
    s = timer.summary()
    assert s["steps"] == 5  # first excluded as compile
    assert s["mean_s"] >= 0.002
    assert s["p95_s"] >= s["p50_s"] > 0
    assert s["items_per_s"] == pytest.approx(4 / s["mean_s"])
    assert "items/s" in timer.format_summary()


def test_step_timer_empty():
    timer = StepTimer()
    s = timer.summary()
    assert s["steps"] == 0 and np.isnan(s["mean_s"])


def test_trace_noop_when_disabled():
    with trace(None):
        x = jnp.ones((4,)) * 2
    assert float(x.sum()) == 8.0


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "prof")
    with trace(d):
        jnp.ones((64, 64)).sum().block_until_ready()
    import os

    # jax.profiler writes plugins/profile/<timestamp>/... under the dir.
    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert found, "profiler trace produced no files"


def test_nan_guard_passes_on_finite():
    nan_guard({"a": jnp.ones((3,)), "b": {"c": jnp.zeros((2, 2))}})


def test_nan_guard_raises_on_nan():
    bad = {"w": jnp.asarray([1.0, float("nan")])}
    with pytest.raises(FloatingPointError, match="non-finite"):
        nan_guard(bad, where="test")


def test_nan_guard_ignores_int_leaves():
    nan_guard({"idx": jnp.arange(5), "x": jnp.ones(2)})


@pytest.mark.slow
def test_pipeline_profile_integration(tmp_path):
    """run through SiameseTrainer with a timer attached — the pipeline's
    profiling path.

    Runs in a FRESH interpreter: this test's per-step-jit compile
    segfaulted deterministically at the ~155-prior-tests mark in TWO
    independent single-process full-suite runs (2026-08-21) while
    passing every time in a fresh process — the same jaxlib CPU-client
    process-state bug test_parallel_trials_across_submeshes documents,
    so it isolates itself the same way."""
    import os
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(
        f"""
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        import numpy as np
        from gan_aug_pfa_tpu.config import SiameseTrainConfig
        from gan_aug_pfa_tpu.train import SiameseTrainer
        from gan_aug_pfa_tpu.utils.profiling import StepTimer

        cfg = SiameseTrainConfig(
            batch_size=2, compute_dtype="float32", data_parallel=False,
            profile_dir={str(tmp_path / "prof")!r},
        )
        trainer = SiameseTrainer(cfg)
        trainer.step_timer = StepTimer(items_per_step=2)
        state = trainer.init_state(jax.random.PRNGKey(0), (16, 16))
        rng = np.random.RandomState(0)
        ds = (
            jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32)),
            jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32)),
            jnp.asarray((rng.rand(4, 16, 16) > 0.8).astype(np.int32)),
        )
        state, loss = trainer.train_epoch(
            state, ds, 4, jax.random.PRNGKey(1), np.random.RandomState(1)
        )
        s = trainer.step_timer.summary()
        assert s["steps"] + len(trainer.step_timer.warmup_times) == 2
        assert np.isfinite(loss)
        print("PROF_OK")
        """
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [os.path.dirname(os.path.dirname(__file__)),
                    env.get("PYTHONPATH", "")] if p
    )
    r = subprocess.run(
        [sys.executable, "-c", script], env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "PROF_OK" in r.stdout
