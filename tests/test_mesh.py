"""Tests for the mesh/sharding helpers (parallel/mesh.py) on the 8-virtual-
device CPU platform."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_aug_pfa_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    put_dataset_global,
    replicate_sharding,
    shard_batch_arrays,
)


def test_make_mesh_shapes():
    m1 = make_mesh(8, axis_names=("data",))
    assert dict(m1.shape) == {"data": 8}
    m2 = make_mesh(8, axis_names=("data", "spatial"), shape=(4, 2))
    assert dict(m2.shape) == {"data": 4, "spatial": 2}
    m3 = make_mesh(4)
    assert dict(m3.shape) == {"data": 4}


def test_batch_sharding_distributes_batch_dim():
    mesh = make_mesh(8)
    x = np.zeros((16, 4, 4, 3), np.float32)
    arr = jax.device_put(x, batch_sharding(mesh, x.ndim))
    assert len(arr.sharding.device_set) == 8
    # Each device holds 1/8 of the batch dim.
    shard = arr.addressable_shards[0]
    assert shard.data.shape == (2, 4, 4, 3)


def test_replicate_and_put_dataset_global():
    mesh = make_mesh(4)
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    (g,) = put_dataset_global(mesh, a)
    assert g.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(g), a)
    (g2, none) = put_dataset_global(mesh, a, None)
    assert none is None
    np.testing.assert_array_equal(np.asarray(g2), a)


def test_shard_batch_arrays_none_passthrough():
    mesh = make_mesh(4)
    a = np.zeros((8, 2), np.float32)
    out_a, out_none = shard_batch_arrays(mesh, a, None)
    assert out_none is None
    assert out_a.shape == (8, 2)


def test_sharded_computation_psum_equivalence():
    """A jitted mean over a batch sharded on 'data' equals the unsharded
    mean (XLA inserts the cross-device reduction)."""
    mesh = make_mesh(8)
    x = np.random.RandomState(0).rand(16, 32).astype(np.float32)
    xs = jax.device_put(x, batch_sharding(mesh, 2))
    got = float(jax.jit(jnp.mean)(xs))
    # Cross-device reduction order differs from the flat numpy mean.
    np.testing.assert_allclose(got, x.mean(), rtol=1e-6)
