"""Tests for the mesh/sharding helpers (parallel/mesh.py) on the 8-virtual-
device CPU platform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_aug_pfa_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
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


def test_make_mesh_default_shape_multi_axis():
    # shape=None with 2 axis names: all devices on the first axis.
    m = make_mesh(8, axis_names=("data", "spatial"))
    assert dict(m.shape) == {"data": 8, "spatial": 1}


def test_make_mesh_too_few_devices_errors():
    import pytest

    with pytest.raises(ValueError, match="wanted 16 devices.*has 8"):
        make_mesh(16)
    with pytest.raises(
        ValueError, match="xla_force_host_platform_device_count=16"
    ):
        make_mesh(16)  # the error carries the provisioning hint


def test_make_mesh_bad_shape_errors():
    import pytest

    with pytest.raises(ValueError, match="needs 6 devices but 8"):
        make_mesh(8, axis_names=("data", "spatial"), shape=(3, 2))
    with pytest.raises(ValueError, match="has 1 dims.*2"):
        make_mesh(8, axis_names=("data", "spatial"), shape=(8,))


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


def test_spatial_sharded_conv_matches_unsharded():
    """A 3x3 'SAME' conv with input H sharded over the 'spatial' axis must
    equal the unsharded conv — XLA's SPMD partitioner inserts the halo
    exchanges (SURVEY.md §5.7's spatial-partitioning capability)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(8, axis_names=("data", "spatial"), shape=(2, 4))
    r = np.random.RandomState(0)
    x = r.rand(2, 16, 16, 8).astype(np.float32)
    k = r.rand(3, 3, 8, 8).astype(np.float32)

    def conv(v):
        return jax.lax.conv_general_dilated(
            v, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    ref = np.asarray(conv(jnp.asarray(x)))
    s = NamedSharding(mesh, P("data", "spatial", None, None))
    xs = jax.device_put(jnp.asarray(x), s)

    @jax.jit
    def sharded(v):
        v = jax.lax.with_sharding_constraint(v, s)
        return conv(v)

    np.testing.assert_allclose(np.asarray(sharded(xs)), ref, atol=1e-5)


def test_param_shardings_rules():
    """Wide conv kernels and their channel vectors shard over 'model';
    small/odd leaves replicate; no 'model' axis -> everything replicates."""
    from jax.sharding import PartitionSpec as P

    tree = {
        "wide_kernel": np.zeros((3, 3, 256, 512), np.float32),
        "narrow_kernel": np.zeros((3, 3, 3, 64), np.float32),
        "indivisible": np.zeros((3, 3, 64, 257), np.float32),
        "bn_scale": np.zeros((512,), np.float32),
        "small_bias": np.zeros((64,), np.float32),
        "scalar_count": np.zeros((), np.int32),
    }
    mesh = make_mesh(8, axis_names=("data", "model"), shape=(4, 2))
    s = param_shardings(mesh, tree)
    assert s["wide_kernel"].spec == P(None, None, None, "model")
    assert s["bn_scale"].spec == P("model")
    for k in ("narrow_kernel", "indivisible", "small_bias", "scalar_count"):
        assert s[k].spec == P()

    no_tp = make_mesh(8, axis_names=("data",))
    s2 = param_shardings(no_tp, tree)
    assert all(v.spec == P() for v in s2.values())


@pytest.mark.slow
def test_siamese_tensor_parallel_matches_single_device():
    """A train step with params sharded over a ('data','model') mesh is the
    SAME math as single-device — XLA SPMD inserts the tensor-parallel
    collectives for the channel-sharded convs."""
    from gan_aug_pfa_tpu.config import SiameseTrainConfig
    from gan_aug_pfa_tpu.train import SiameseTrainer

    r = np.random.RandomState(0)
    n = 4
    ds = (
        r.rand(n, 16, 16, 3).astype(np.float32),
        r.rand(n, 16, 16, 3).astype(np.float32),
        (r.rand(n, 16, 16) > 0.8).astype(np.int32),
    )
    cfg = SiameseTrainConfig(batch_size=2, compute_dtype="float32")

    def one_epoch(mesh):
        tr = SiameseTrainer(cfg, mesh=mesh, augment=False)
        state = tr.init_state(jax.random.PRNGKey(0), (16, 16))
        if mesh is not None:
            dev = put_dataset_global(mesh, *ds)
        else:
            dev = tuple(jax.device_put(a) for a in ds)
        state, loss = tr.train_epoch(
            state, dev, n, jax.random.PRNGKey(1), np.random.RandomState(5)
        )
        return loss, tr.validate(state, dev, n)

    ref_loss, ref_val = one_epoch(None)
    mesh = make_mesh(8, axis_names=("data", "model"), shape=(2, 4))
    # min_size=256 with 1024-channel bottleneck kernels: the 4-way 'model'
    # axis really shards them (sanity-check one leaf below).
    tr = SiameseTrainer(cfg, mesh=mesh, augment=False)
    state = tr.init_state(jax.random.PRNGKey(0), (16, 16))
    sharded_leaves = [
        x for x in jax.tree_util.tree_leaves(state.params)
        if x.ndim == 4 and not x.sharding.is_fully_replicated
    ]
    assert sharded_leaves, "no conv kernel actually sharded over 'model'"
    assert sharded_leaves[0].addressable_shards[0].data.shape[-1] == (
        sharded_leaves[0].shape[-1] // 4
    )

    tp_loss, tp_val = one_epoch(mesh)
    assert tp_loss == pytest.approx(ref_loss, rel=2e-3)
    assert tp_val == pytest.approx(ref_val, rel=2e-3)


def _assert_trees_bitwise_equal(a, b, what: str):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for (path, xa), xb in zip(la, lb):
        na, nb = np.asarray(xa), np.asarray(xb)
        assert na.dtype == nb.dtype and na.shape == nb.shape, (what, path)
        assert np.array_equal(na, nb), (
            f"{what} leaf {jax.tree_util.keystr(path)} not bitwise equal "
            f"after round-trip (max|d|="
            f"{np.max(np.abs(na.astype(np.float64) - nb.astype(np.float64)))})"
        )


@pytest.mark.slow
def test_sharded_siamese_checkpoint_portable_across_topologies(tmp_path):
    """Save a Siamese train state under a ('data','spatial','model')=(2,2,2)
    mesh, restore it (a) on a single device and (b) under a different
    (4,1,1) topology: params/batch_stats/opt_state/step must be BITWISE
    equal, and the restored state must be usable (validate() under the new
    topology matches the saving topology's value).  On real multi-chip
    hardware this save-here-restore-there path is the first thing that
    breaks (VERDICT r3 item 7)."""
    from gan_aug_pfa_tpu import checkpoint as ckpt
    from gan_aug_pfa_tpu.config import SiameseTrainConfig
    from gan_aug_pfa_tpu.parallel.mesh import param_shardings
    from gan_aug_pfa_tpu.train import SiameseTrainer

    r = np.random.RandomState(0)
    n = 4
    ds = (
        r.rand(n, 16, 16, 3).astype(np.float32),
        r.rand(n, 16, 16, 3).astype(np.float32),
        (r.rand(n, 16, 16) > 0.8).astype(np.int32),
    )
    cfg = SiameseTrainConfig(batch_size=2, compute_dtype="float32")

    mesh_a = make_mesh(8, axis_names=("data", "spatial", "model"),
                       shape=(2, 2, 2))
    tr_a = SiameseTrainer(cfg, mesh=mesh_a, augment=False)
    state_a = tr_a.init_state(jax.random.PRNGKey(0), (16, 16))
    dev_a = put_dataset_global(mesh_a, *ds)
    # One real step so opt_state moments and step count are non-trivial.
    state_a, _ = tr_a.train_epoch(
        state_a, dev_a, n, jax.random.PRNGKey(1), np.random.RandomState(5)
    )
    val_a = tr_a.validate(state_a, dev_a, n)
    path = str(tmp_path / "sharded.msgpack")
    ckpt.save_checkpoint(path, state_a)
    saved = ckpt.bulk_device_get(
        {"params": state_a.params, "batch_stats": state_a.batch_stats,
         "opt_state": state_a.opt_state, "step": state_a.step}
    )

    # (a) single-device restore.
    tr_1 = SiameseTrainer(cfg, augment=False)
    state_1 = ckpt.restore_checkpoint(
        path, tr_1.init_state(jax.random.PRNGKey(7), (16, 16))
    )
    for key in ("params", "batch_stats", "opt_state", "step"):
        _assert_trees_bitwise_equal(
            getattr(state_1, key), saved[key], f"single-device {key}")
    dev_1 = tuple(jax.device_put(a) for a in ds)
    assert tr_1.validate(state_1, dev_1, n) == pytest.approx(val_a, rel=2e-3)

    # (b) restore under a DIFFERENT (4,1,1) topology (4 of the 8 devices).
    mesh_b = make_mesh(4, axis_names=("data", "spatial", "model"),
                       shape=(4, 1, 1))
    tr_b = SiameseTrainer(cfg, mesh=mesh_b, augment=False)
    state_b = ckpt.restore_checkpoint(
        path, tr_b.init_state(jax.random.PRNGKey(9), (16, 16))
    )
    for key in ("params", "batch_stats", "opt_state", "step"):
        _assert_trees_bitwise_equal(
            getattr(state_b, key), saved[key], f"(4,1,1) {key}")
    # Re-place like init_state does and prove the state is live under the
    # new topology.
    state_b = jax.device_put(state_b, param_shardings(mesh_b, state_b))
    dev_b = put_dataset_global(mesh_b, *ds)
    assert tr_b.validate(state_b, dev_b, n) == pytest.approx(val_a, rel=2e-3)


@pytest.mark.slow
def test_sharded_gan_checkpoint_portable_to_single_device(tmp_path):
    """Same portability contract for the GAN pair: generator+discriminator
    states saved under a (2,2,2) mesh restore bitwise-identically into
    single-device templates."""
    from gan_aug_pfa_tpu import checkpoint as ckpt
    from gan_aug_pfa_tpu.config import GANTrainConfig
    from gan_aug_pfa_tpu.train import GANTrainer

    cfg = GANTrainConfig(batch_size=2, compute_dtype="float32",
                         target_size=(128, 128))
    mesh = make_mesh(8, axis_names=("data", "spatial", "model"),
                     shape=(2, 2, 2))
    gan_a = GANTrainer(cfg, mesh=mesh)
    sg_a, sd_a = gan_a.init_states(jax.random.PRNGKey(2))
    r = np.random.RandomState(3)
    g1 = jnp.asarray(r.rand(2, 128, 128, 3).astype(np.float32))
    g2 = jnp.asarray(r.rand(2, 128, 128, 3).astype(np.float32))
    rep = replicate_sharding(mesh)
    sg_a, sd_a, _, _ = gan_a._gan_step(
        sg_a, sd_a, jax.device_put(g1, rep), jax.device_put(g2, rep),
        gan_a._put_idx(np.arange(2)),
    )
    pg, pd = str(tmp_path / "g.msgpack"), str(tmp_path / "d.msgpack")
    ckpt.save_checkpoint(pg, sg_a)
    ckpt.save_checkpoint(pd, sd_a)
    saved_g = ckpt.bulk_device_get(
        {"params": sg_a.params, "opt_state": sg_a.opt_state,
         "step": sg_a.step})
    saved_d = ckpt.bulk_device_get(
        {"params": sd_a.params, "opt_state": sd_a.opt_state,
         "step": sd_a.step})

    gan_1 = GANTrainer(cfg)
    sg_1, sd_1 = gan_1.init_states(jax.random.PRNGKey(11))
    sg_1 = ckpt.restore_checkpoint(pg, sg_1)
    sd_1 = ckpt.restore_checkpoint(pd, sd_1)
    for key in ("params", "opt_state", "step"):
        _assert_trees_bitwise_equal(
            getattr(sg_1, key), saved_g[key], f"generator {key}")
        _assert_trees_bitwise_equal(
            getattr(sd_1, key), saved_d[key], f"discriminator {key}")


@pytest.mark.slow
def test_siamese_eval_loss_spatial_mesh_equivalence():
    """The trainer's eval loss under a ('data','spatial') mesh (batch AND
    feature-map-H sharded) matches the single-device value."""
    from gan_aug_pfa_tpu.config import SiameseTrainConfig
    from gan_aug_pfa_tpu.train import SiameseTrainer

    r = np.random.RandomState(0)
    n = 4
    ds = (
        r.rand(n, 16, 16, 3).astype(np.float32),
        r.rand(n, 16, 16, 3).astype(np.float32),
        (r.rand(n, 16, 16) > 0.8).astype(np.int32),
    )
    cfg = SiameseTrainConfig(batch_size=2, compute_dtype="float32")

    tr_plain = SiameseTrainer(cfg, augment=False)
    state = tr_plain.init_state(jax.random.PRNGKey(0), (16, 16))
    dev_plain = tuple(jax.device_put(a) for a in ds)
    ref = tr_plain.validate(state, dev_plain, n)

    mesh = make_mesh(8, axis_names=("data", "spatial"), shape=(2, 4))
    tr_mesh = SiameseTrainer(cfg, mesh=mesh, augment=False)
    state_m = jax.device_put(state, replicate_sharding(mesh))
    dev_mesh = put_dataset_global(mesh, *ds)
    got = tr_mesh.validate(state_m, dev_mesh, n)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_native_aug_train_epoch_mesh_equivalence():
    """The DEFAULT `--tune` chain under a mesh (VERDICT r4 item 3): a
    native-resolution-augmented train epoch (PaddedNativeDataset +
    augment_batch_native with the fused Pallas photometric kernel forced
    on, interpret mode on CPU) over a 4-device 'data' mesh must compute
    the same losses as single-device.  _constrain_spatial runs BEFORE the
    native-extent warps (train/siamese.py) precisely so those warps run
    sharded — this asserts that layout choice is the same math."""
    from gan_aug_pfa_tpu.config import SiameseTrainConfig
    from gan_aug_pfa_tpu.data.loader import PaddedNativeDataset
    from gan_aug_pfa_tpu.train import SiameseTrainer

    r = np.random.RandomState(0)
    n, hmax, wmax = 8, 24, 24
    sizes = np.array([[24, 24], [16, 16], [24, 16], [16, 24]] * 2,
                     np.int32)
    img1 = np.zeros((n, hmax, wmax, 3), np.float32)
    img2 = np.zeros_like(img1)
    labels = np.zeros((n, hmax, wmax), np.int32)
    for i, (h, w) in enumerate(sizes):
        img1[i, :h, :w] = r.rand(h, w, 3)
        img2[i, :h, :w] = r.rand(h, w, 3)
        labels[i, :h, :w] = r.rand(h, w) > 0.8
    ds = PaddedNativeDataset(img1, img2, labels, sizes,
                             cities=["c%d" % i for i in range(n)])
    cfg = SiameseTrainConfig(batch_size=4, compute_dtype="float32",
                             pallas_augment=True)

    def one_epoch(mesh):
        tr = SiameseTrainer(cfg, mesh=mesh, augment=True,
                            native_out_size=(16, 16))
        assert tr._pallas_augment  # kernel forced on (interpret on CPU)
        state = tr.init_state(jax.random.PRNGKey(0), (16, 16))
        dev = tr._device_arrays(ds)
        state, loss = tr.train_epoch(
            state, dev, n, jax.random.PRNGKey(1), np.random.RandomState(5)
        )
        return loss, tr.validate(
            state,
            (dev[0][:, :16, :16], dev[1][:, :16, :16],
             dev[2][0][:, :16, :16]),
            n,
        )

    ref_loss, ref_val = one_epoch(None)
    dp_loss, dp_val = one_epoch(make_mesh(4, axis_names=("data",)))
    assert dp_loss == pytest.approx(ref_loss, rel=2e-3)
    assert dp_val == pytest.approx(ref_val, rel=2e-3)
