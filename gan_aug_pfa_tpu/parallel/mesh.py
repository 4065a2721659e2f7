"""Device mesh + sharding helpers.

The reference has no distributed layer at all (SURVEY.md §2, §5.8); this is
the TPU-native parallelism the rebuild adds.  Strategy (scaling-book style):

  * a 1-D (or 2-D) `jax.sharding.Mesh` over the slice's chips;
  * data parallelism: batch arrays sharded over the 'data' axis, parameters
    replicated.  Train steps are plain `jax.jit` with sharding annotations —
    the XLA SPMD partitioner inserts the psum gradient all-reduce over ICI;
    no hand-written collectives needed for DP.
  * spatial parallelism (optional, for resolutions beyond per-core HBM):
    feature maps additionally sharded over an 'spatial' (H) axis; XLA inserts
    halo exchanges for the convs.

Multi-host entry: `jax.distributed.initialize()` is called by the CLI when
launched under multi-process runtime (gated — a no-op in single-process runs).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first n_devices devices (default: all).

    Raises ValueError with an actionable hint when the process has fewer
    devices than requested or the shape doesn't factor the device count —
    never a bare numpy reshape error."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"make_mesh wanted {n_devices} devices but this process "
                f"has {len(devs)} ({devs[0].platform} platform). Hint: to "
                "simulate a multi-chip mesh on CPU, set XLA_FLAGS="
                f"--xla_force_host_platform_device_count={n_devices} and "
                "JAX_PLATFORMS=cpu before JAX initializes."
            )
        devs = devs[:n_devices]
    if shape is None:
        # Default: all devices on the first axis, trailing axes size 1.
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    shape = tuple(shape)
    if len(shape) != len(axis_names):
        raise ValueError(
            f"make_mesh shape {shape} has {len(shape)} dims but "
            f"axis_names {tuple(axis_names)} has {len(axis_names)}."
        )
    if int(np.prod(shape)) != len(devs):
        raise ValueError(
            f"make_mesh shape {shape} needs {int(np.prod(shape))} devices "
            f"but {len(devs)} are selected (of {len(jax.devices())} "
            "visible). Pass a shape whose product matches, or adjust "
            "n_devices."
        )
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data",
                   spatial_axis: Optional[str] = None) -> NamedSharding:
    """Shard dim 0 (batch) over `axis`; optionally dim 1 (H) over
    `spatial_axis`; other dims replicated."""
    spec = [None] * ndim
    spec[0] = axis
    if spatial_axis is not None and ndim >= 3:
        spec[1] = spatial_axis
    return NamedSharding(mesh, P(*spec))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(mesh: Mesh, tree, model_axis: str = "model",
                    min_size: int = 256):
    """Tensor-parallel placement: a sharding per leaf of a train-state tree.

    Conv kernels (HWIO, ndim 4) with an output-channel dim that is both
    >= min_size and divisible by the '{model_axis}' mesh extent are sharded
    over that dim; 1-D channel vectors (biases, BN scale/shift, running
    stats) shard the same way so they stay aligned with their kernels.
    Everything else (small kernels, scalars, opt-state counters) replicates.
    Optimizer moments mirror their params automatically because they are
    leaves of the same tree with the same shapes.

    This is real tensor parallelism in the XLA SPMD style: the placement is
    declared on the arrays and the partitioner inserts the all-gathers /
    reduce-scatters on ICI — no hand-written collectives.  For these U-Nets
    it is an HBM-relief axis (each chip holds 1/n of the wide bottleneck
    kernels and their fp32 Adam moments), composable with 'data' and
    'spatial' axes on the same mesh.  The reference has no parallelism of
    any kind (SURVEY.md §5.8)."""
    n = mesh.shape.get(model_axis, 1)
    rep = NamedSharding(mesh, P())
    if n <= 1:
        return jax.tree_util.tree_map(lambda _: rep, tree)
    kernel = NamedSharding(mesh, P(None, None, None, model_axis))
    vector = NamedSharding(mesh, P(model_axis))

    def rule(x):
        shape = np.shape(x)
        if (len(shape) == 4 and shape[-1] >= min_size
                and shape[-1] % n == 0):
            return kernel
        if len(shape) == 1 and shape[0] >= min_size and shape[0] % n == 0:
            return vector
        return rep

    return jax.tree_util.tree_map(rule, tree)


def shard_batch_arrays(mesh: Mesh, *arrays, axis: str = "data"):
    """Device-put each array with its batch dim sharded over `axis`."""
    out = []
    for a in arrays:
        if a is None:
            out.append(None)
            continue
        out.append(
            jax.device_put(a, batch_sharding(mesh, np.ndim(a), axis))
        )
    return tuple(out)


def put_dataset_global(mesh: Mesh, *arrays):
    """Place host-resident dataset arrays on the mesh for training.

    Single-process: a plain replicated device_put.  Multi-process (one
    process per host on a pod slice): each process holds the FULL dataset
    copy (the OSCD cache is tiny — tens of MB) and contributes its local
    shard via ``jax.make_array_from_process_local_data`` so the result is a
    valid replicated global array without any cross-host gather (SURVEY.md
    §5.8's per-host sharded-loading requirement, trivially satisfiable here
    because the dataset replicates)."""
    rep = replicate_sharding(mesh)
    out = []
    for a in arrays:
        if a is None:
            out.append(None)
        elif jax.process_count() > 1:
            out.append(jax.make_array_from_process_local_data(rep, a))
        else:
            out.append(jax.device_put(a, rep))
    return tuple(out)


def maybe_distributed_init() -> None:
    """Initialize the multi-host runtime when launched under one (no-op
    otherwise).  TPU-native replacement for the reference's absent
    NCCL/MPI layer (SURVEY.md §5.8).

    Two launch contracts:
      * managed clusters (TPU pods, Slurm, GKE): set JAX_COORDINATOR_ADDRESS
        or MEGASCALE_COORDINATOR_ADDRESS and jax auto-detects the rest;
      * explicit (scripts/run_multiprocess_dp.py, bare-metal hosts): also
        set JAX_NUM_PROCESSES and JAX_PROCESS_ID and they are passed
        through verbatim.
    Exercised cross-process by tests/test_multiprocess.py."""
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    )
    if not addr:
        return
    num = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if num is not None and pid is not None:
        jax.distributed.initialize(
            coordinator_address=addr, num_processes=int(num),
            process_id=int(pid),
        )
    else:
        jax.distributed.initialize()
