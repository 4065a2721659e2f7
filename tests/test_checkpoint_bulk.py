"""bulk_device_get: the concurrent per-leaf device_get used by
save_checkpoint (checkpoint.py — a thread pool overlapping the per-leaf
transfer round trips) must be value- and structure-identical to
jax.device_get and must return HOST numpy arrays."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_aug_pfa_tpu.checkpoint import bulk_device_get


def test_bulk_device_get_matches_device_get():
    tree = {
        "a": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
        "b": {
            "w": jnp.ones((2, 2, 3), jnp.float32) * 2.5,
            "mu": jnp.full((5,), 0.25, jnp.bfloat16),
            "count": jnp.asarray(7, jnp.int32),  # scalar leaf
        },
        "empty": jnp.zeros((0, 3), jnp.float32),
        "host": np.array([1.0, 2.0]),  # numpy passes through untouched
        "scalar_py": 3,
    }
    got = bulk_device_get(tree)
    want = jax.device_get(tree)
    assert jax.tree.structure(got) == jax.tree.structure(want)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        ga, wa = np.asarray(g), np.asarray(w)
        assert ga.dtype == wa.dtype
        assert ga.shape == wa.shape
        np.testing.assert_array_equal(ga, wa)
    # Outputs are HOST numpy arrays — the whole point of the pull.  (On
    # the CPU test platform `leaf.device.platform == "cpu"` would be
    # vacuously true for device arrays, so assert the type.)
    for leaf in jax.tree.leaves(got):
        assert not isinstance(leaf, jax.Array)


def test_bulk_device_get_single_leaf():
    tree = {"x": jnp.ones((4,), jnp.int32)}
    got = bulk_device_get(tree)
    assert not isinstance(got["x"], jax.Array)
    np.testing.assert_array_equal(np.asarray(got["x"]), np.ones(4, np.int32))
