"""Per-sample confusion counts as a one-pass Pallas kernel.

Computes tp/fp/fn/tn per sample from probability maps (threshold 0.5) and
binary targets — the reductions behind calculate_metrics (reference
evaluate.py:34-64) — with one VMEM-resident pass per sample instead of the
four separate masked reductions of the naive formulation.  Grid = batch; each
grid step reduces one (H, W) map and writes four scalars to SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(p_ref, t_ref, out_ref):
    # out_ref is the whole (B, 4) SMEM buffer (a blocked SMEM output would
    # violate the (8, 128) tiling rule); each grid step writes its own row.
    i = pl.program_id(0)
    p = (p_ref[0] > 0.5).astype(jnp.float32)
    t = t_ref[0]
    tp = jnp.sum(p * t)
    sum_p = jnp.sum(p)
    sum_t = jnp.sum(t)
    n = p.shape[0] * p.shape[1]
    out_ref[i, 0] = tp
    out_ref[i, 1] = sum_p - tp          # fp
    out_ref[i, 2] = sum_t - tp          # fn
    out_ref[i, 3] = n - sum_p - sum_t + tp  # tn


@functools.partial(jax.jit, static_argnames=("interpret",))
def confusion_counts_batch(
    probs: jnp.ndarray,
    targets: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """probs, targets: (B, H, W) float maps -> (B, 4) f32 [tp, fp, fn, tn]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w = probs.shape
    return pl.pallas_call(
        _kernel,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, 4), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, 4), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        interpret=bool(interpret),
    )(probs.astype(jnp.float32), targets.astype(jnp.float32))
