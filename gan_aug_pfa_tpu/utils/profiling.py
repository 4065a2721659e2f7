"""Tracing / profiling / numeric-safety subsystem.

The reference has NO profiling or tracing — only tqdm progress bars with a
live loss postfix (reference train.py:134,146; train_gan.py:51,74) — and no
sanitizers (SURVEY.md §5.1-5.2).  TPU-native equivalents:

  * StepTimer      — per-step wall-clock stats (mean/p50/p95, throughput),
                     the quantitative replacement for tqdm's it/s.
  * trace()        — context manager around jax.profiler for XLA-level
                     traces viewable in TensorBoard/Perfetto.
  * annotate()     — named TraceAnnotation so host phases show up in traces.
  * enable_nan_checks() / nan_guard() — jax_debug_nans config + an explicit
                     finite-check helper, the race-detector/sanitizer analog
                     for numerical training bugs.
"""

from __future__ import annotations

import contextlib
import math
import time
from typing import Dict, List, Optional

import jax


class StepTimer:
    """Collects per-step wall times; reports throughput statistics.

    Usage:
        timer = StepTimer(items_per_step=batch_size)
        with timer.step():
            state, loss = train_step(...)
        print(timer.summary())
    """

    def __init__(self, items_per_step: int = 1, skip_first: int = 1):
        self.items_per_step = items_per_step
        # First step(s) include XLA compilation; excluded from stats but
        # recorded separately as compile_time.
        self.skip_first = skip_first
        self.times: List[float] = []
        self.warmup_times: List[float] = []

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        if len(self.warmup_times) < self.skip_first:
            self.warmup_times.append(dt)
        else:
            self.times.append(dt)

    def _percentile(self, q: float) -> float:
        if not self.times:
            return math.nan
        s = sorted(self.times)
        k = min(len(s) - 1, max(0, int(round(q * (len(s) - 1)))))
        return s[k]

    def summary(self) -> Dict[str, float]:
        n = len(self.times)
        total = sum(self.times)
        mean = total / n if n else math.nan
        return {
            "steps": n,
            "mean_s": mean,
            "p50_s": self._percentile(0.50),
            "p95_s": self._percentile(0.95),
            "total_s": total,
            "items_per_s": (
                self.items_per_step / mean if n and mean > 0 else math.nan
            ),
            "compile_s": sum(self.warmup_times),
        }

    def format_summary(self, prefix: str = "") -> str:
        s = self.summary()
        return (
            f"{prefix}{s['steps']} steps: mean {s['mean_s'] * 1e3:.2f} ms, "
            f"p50 {s['p50_s'] * 1e3:.2f} ms, p95 {s['p95_s'] * 1e3:.2f} ms, "
            f"{s['items_per_s']:.1f} items/s "
            f"(first-step compile {s['compile_s']:.1f} s)"
        )


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace of everything inside the context (device + host).
    No-op when log_dir is falsy, so call sites can pass the config value
    straight through.  View with TensorBoard's profile plugin or Perfetto."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named host annotation that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


def enable_nan_checks() -> None:
    """Turn on jax_debug_nans: any NaN produced under jit raises at the
    producing op (re-run un-jitted automatically).  The numerical analog of
    the race detectors/sanitizers the reference also lacks (SURVEY.md §5.2).
    Costs a sync per dispatch — debugging only."""
    jax.config.update("jax_debug_nans", True)


def nan_guard(tree, where: str = "") -> None:
    """Explicit host-side finite check over a pytree (cheap enough per
    epoch; use when debug_nans' per-dispatch sync is too slow)."""
    import jax.numpy as jnp

    bad = [
        path
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)
        and not bool(jnp.all(jnp.isfinite(leaf)))
    ]
    if bad:
        raise FloatingPointError(
            f"non-finite values {('in ' + where) if where else ''}: "
            f"{[jax.tree_util.keystr(p) for p in bad[:5]]}"
        )
