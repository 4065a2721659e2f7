"""Persistent XLA compilation cache wiring (utils/compile_cache.py)."""

import os

import jax
import pytest

from gan_aug_pfa_tpu.utils.compile_cache import enable_compile_cache


@pytest.fixture(autouse=True)
def _restore_cache_config():
    """Snapshot/restore the global jax cache config so these tests are
    order-independent and don't leak a persistent cache into later tests.

    Restoring the CONFIG VALUES alone is not enough: jax's persistent
    cache is a lazily-initialized module singleton, and once any test
    here initializes it, every later compile in the process keeps writing
    entries regardless of jax_compilation_cache_dir — observed to abort
    the interpreter when two tuning-trial threads serialized CPU
    executables concurrently (full-suite crash, 2026-08-17).  reset_cache()
    drops the singleton too."""
    from jax._src import compilation_cache as _cc

    keys = (
        "jax_compilation_cache_dir",
        "jax_persistent_cache_min_compile_time_secs",
        "jax_persistent_cache_min_entry_size_bytes",
    )
    saved = {k: getattr(jax.config, k) for k in keys}
    yield
    for k, v in saved.items():
        jax.config.update(k, v)
    _cc.reset_cache()


def test_enable_sets_config_and_creates_dir(tmp_path):
    d = str(tmp_path / "xla_cache")
    assert enable_compile_cache(d) == d
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.0


def test_env_var_wins_over_default(tmp_path, monkeypatch):
    d = str(tmp_path / "env_cache")
    monkeypatch.setenv("GAN_AUG_PFA_TPU_CACHE_DIR", d)
    assert enable_compile_cache() == d
    assert os.path.isdir(d)


def test_unwritable_dir_disables_quietly(tmp_path):
    blocker = tmp_path / "file"
    blocker.write_text("x")
    # a path under a regular file cannot be created
    assert enable_compile_cache(str(blocker / "sub")) is None


def test_cache_round_trip_writes_entries(tmp_path):
    d = str(tmp_path / "rt")
    enable_compile_cache(d)
    import jax.numpy as jnp

    jax.jit(lambda x: x * 2 + 1)(jnp.ones((4,)))
    assert len(os.listdir(d)) >= 1


def test_cpu_backend_default_is_skipped(monkeypatch):
    """Without an explicit dir/env var, the plain-CPU backend skips the
    cache (XLA:CPU AOT results are machine-feature-specific; loading them
    on another host can SIGILL)."""
    monkeypatch.delenv("GAN_AUG_PFA_TPU_CACHE_DIR", raising=False)
    monkeypatch.delenv("GAN_AUG_PFA_TPU_CACHE_CPU", raising=False)
    assert jax.default_backend() == "cpu"
    assert enable_compile_cache() is None
