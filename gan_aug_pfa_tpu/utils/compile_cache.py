"""Persistent XLA compilation cache for the CLI entry points.

The reference re-JITs nothing (eager torch), so its wall time is all
compute; in this framework the headline workloads are compile-dominated on
first run (RESULTS.md: the 4-stage pipeline spends most of its wall in XLA
compiles, not device compute).  JAX's persistent compilation cache
serializes compiled executables to disk keyed by (HLO, compile options,
backend); re-running any CLI — or a later pipeline stage that compiles the
same program shape — loads the binary instead of recompiling.

Enabled by default in every CLI (`--no-compile-cache` opts out). Cache
location: $GAN_AUG_PFA_TPU_CACHE_DIR, else ~/.cache/gan_aug_pfa_tpu/xla.
"""

from __future__ import annotations

import os

_ENV_VAR = "GAN_AUG_PFA_TPU_CACHE_DIR"
_DEFAULT = os.path.join(
    os.path.expanduser("~"), ".cache", "gan_aug_pfa_tpu", "xla"
)


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a writable directory.

    Safe to call multiple times; returns the cache dir in use, or None if
    the directory could not be created (cache disabled, never fatal).

    On the plain-CPU backend the cache is skipped unless a dir is passed
    explicitly or $GAN_AUG_PFA_TPU_CACHE_CPU=1: XLA:CPU executables are
    AOT-compiled for the build host's machine features, and loading them on
    a different host can SIGILL — accelerator backends don't have this
    hazard, and CPU compiles are not the workload that hurts.  A second
    CPU-only hazard: concurrently SERIALIZING CPU executables from
    multiple threads (e.g. --parallel-trials) has been observed to abort
    the process in XLA — one more reason the CPU cache stays opt-in.
    """
    explicit = cache_dir is not None or _ENV_VAR in os.environ
    cache_dir = cache_dir or os.environ.get(_ENV_VAR) or _DEFAULT
    import jax

    if (not explicit and os.environ.get("GAN_AUG_PFA_TPU_CACHE_CPU") != "1"
            and jax.default_backend() == "cpu"):
        return None
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return None

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # The default thresholds skip "cheap" compiles (<1s / small binaries);
    # with a tiny dataset and many distinct program shapes (full + partial
    # batches, eval, predict) those add up — cache everything.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
