"""Streaming data path (data/stream.py): the host-staged batch steps must
match the HBM-resident gather steps exactly, the prefetcher must preserve
order, and both cache modes must produce the resident cache's values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_aug_pfa_tpu.config import SiameseTrainConfig
from gan_aug_pfa_tpu.data.loader import build_cached_dataset
from gan_aug_pfa_tpu.data.scanner import create_sample_lists
from gan_aug_pfa_tpu.data.stream import StreamingSource, prefetch_batches
from gan_aug_pfa_tpu.train import SiameseTrainer

SIZE = (16, 16)


@pytest.fixture(scope="module")
def samples(oscd_tree):
    return create_sample_lists(
        str(oscd_tree),
        "Onera Satellite Change Detection Dataset",
        "synthetic_data",
        mode="train",
        verbose=False,
    )


def test_source_modes_match_resident_cache(samples):
    """Both cache modes hand out exactly the resident cache's arrays."""
    ds = build_cached_dataset(samples, SIZE, verbose=False)
    idx = np.array([2, 0, 3])
    for mode in ("host", "decode"):
        src = StreamingSource(samples, SIZE, cache=mode, verbose=False)
        assert len(src) == len(ds)
        assert src.has_labels
        i1, i2, lb = src.batch(idx)
        np.testing.assert_array_equal(i1, ds.img1[idx])
        np.testing.assert_array_equal(i2, ds.img2[idx])
        np.testing.assert_array_equal(lb, ds.labels[idx])
        src.close()


def test_decode_mode_raises_on_unreadable(samples, tmp_path):
    """Streaming cannot skip samples mid-epoch (batch shapes would shift);
    an unreadable file names itself in a RuntimeError at batch time.  The
    pipeline never hits this: the scanner's readability pass already
    dropped such files."""
    import dataclasses

    bad = dataclasses.replace(
        samples[0], img1=str(tmp_path / "missing.png"), city="badcity"
    )
    src = StreamingSource(
        [bad] + samples, SIZE, cache="decode", verbose=False
    )
    assert len(src) == len(samples) + 1  # no decode pass at construction
    with pytest.raises(RuntimeError, match="badcity"):
        src.batch(np.array([0]))
    src.close()


def test_decode_mode_small_worker_pool_no_deadlock(samples):
    """Batch staging and per-sample decode use separate pools: workers=1
    with prefetch depth 2 must still make progress."""
    src = StreamingSource(
        samples, SIZE, cache="decode", workers=1, verbose=False
    )
    batches = [np.array([0, 1]), np.array([2]), np.array([3])]
    seen = list(prefetch_batches(src, batches, lambda b: b, depth=2))
    assert len(seen) == 3
    src.close()


def test_prefetch_preserves_order_and_batches(samples):
    src = StreamingSource(samples, SIZE, cache="host", verbose=False)
    batches = [np.array([0, 1]), np.array([2]), np.array([3, 0])]
    seen = list(prefetch_batches(src, batches, lambda b: b, depth=2))
    assert len(seen) == 3
    for want, (got_idx, batch) in zip(batches, seen):
        np.testing.assert_array_equal(want, got_idx)
        np.testing.assert_array_equal(batch[0], src.batch(want)[0])
    src.close()


def test_prefetch_depth_bounds_staged_batches(samples):
    """At most `depth` device batches may be staged ahead of the consumer
    — a slow consumer must not let the whole epoch pile up in HBM."""
    src = StreamingSource(samples, SIZE, cache="host", verbose=False)
    batches = [np.array([i % len(src)]) for i in range(12)]
    depth = 2
    puts = consumed = 0

    def put_fn(b):
        nonlocal puts
        puts += 1
        assert puts - consumed <= depth, "staged beyond the depth bound"
        return b

    for _ in prefetch_batches(src, batches, put_fn, depth=depth):
        consumed += 1
    assert consumed == 12 and puts == 12
    src.close()


def _make_trainer(augment=False):
    cfg = SiameseTrainConfig(batch_size=4, compute_dtype="float32")
    tr = SiameseTrainer(cfg, augment=augment)
    state = tr.init_state(jax.random.PRNGKey(0), SIZE)
    return tr, state


@pytest.mark.slow
def test_streaming_epoch_matches_resident(samples):
    """augment=False: the streaming epoch and the resident (scan) epoch are
    the same math over the same shuffle — identical losses and params."""
    ds = build_cached_dataset(samples, SIZE, verbose=False)

    tr_a, state_a = _make_trainer()
    dev = tr_a._device_arrays(ds)
    state_a, loss_a = tr_a.train_epoch(
        state_a, dev, len(ds), jax.random.PRNGKey(1),
        np.random.RandomState(7),
    )

    tr_b, state_b = _make_trainer()
    src = StreamingSource(samples, SIZE, cache="host", verbose=False)
    state_b, loss_b = tr_b.train_epoch_streaming(
        state_b, src, jax.random.PRNGKey(1), np.random.RandomState(7)
    )
    src.close()

    assert loss_a == pytest.approx(loss_b, rel=2e-3)
    # Tolerance covers XLA reassociation between the scan and per-step
    # programs (same bound as test_scan_epoch).
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


@pytest.mark.slow
def test_streaming_step_matches_gather_step_augmented(samples):
    """augment=True: _train_step_batch on a host-staged batch equals
    _train_step on the same gathered indices with the same key."""
    ds = build_cached_dataset(samples, SIZE, verbose=False)
    idx = np.array([0, 1, 2, 3])
    key = jax.random.PRNGKey(3)

    tr_a, state_a = _make_trainer(augment=True)
    dev = tr_a._device_arrays(ds)
    state_a, loss_a = tr_a._train_step(
        state_a, *dev, jnp.asarray(idx), key
    )

    tr_b, state_b = _make_trainer(augment=True)
    batch = tr_b._put_batch((ds.img1[idx], ds.img2[idx], ds.labels[idx]))
    state_b, loss_b = tr_b._train_step_batch(state_b, *batch, key)

    assert float(loss_a) == pytest.approx(float(loss_b), rel=1e-5)


@pytest.mark.slow
def test_streaming_on_mesh_matches_single_device(samples):
    """Data-parallel streaming: batches land sharded over 'data' and the
    psum-grad epoch matches the single-device epoch."""
    from gan_aug_pfa_tpu.parallel.mesh import make_mesh

    src = StreamingSource(samples, SIZE, cache="host", verbose=False)

    def run(mesh):
        cfg = SiameseTrainConfig(
            batch_size=4, compute_dtype="float32",
            data_parallel=mesh is not None,
        )
        tr = SiameseTrainer(cfg, mesh=mesh)
        state = tr.init_state(jax.random.PRNGKey(0), SIZE)
        state, loss = tr.train_epoch_streaming(
            state, src, jax.random.PRNGKey(1), np.random.RandomState(7)
        )
        return loss, state

    loss_1, state_1 = run(None)
    loss_m, state_m = run(make_mesh(4, axis_names=("data",)))
    src.close()
    assert loss_1 == pytest.approx(loss_m, rel=2e-3)
    # Params after 3 Adam steps: the psum's reduction order differs from
    # the single-device sum, and Adam's 1/sqrt(v)-normalized update can
    # flip direction entirely where gradients are near zero — so the
    # per-element bound is the accumulated step size (3 steps x lr=1e-4),
    # not a relative tolerance.
    for a, b in zip(
        jax.tree_util.tree_leaves(state_1.params),
        jax.tree_util.tree_leaves(state_m.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=3.5e-4)


@pytest.mark.slow
def test_gan_streaming_epoch_matches_resident(samples):
    """The GAN streaming epoch equals the resident scan epoch (drop_last
    batches, same shuffle, same compiled math).  Uses a num_downs=5/ngf=8
    architecture so the test compiles at 16x16."""
    import jax.numpy as jnp

    from gan_aug_pfa_tpu.config import GANTrainConfig
    from gan_aug_pfa_tpu.data.loader import build_cached_dataset
    from gan_aug_pfa_tpu.train import GANTrainer

    cfg = GANTrainConfig(
        batch_size=2, target_size=(32, 32), compute_dtype="float32",
        num_downs=5, ngf=8, ndf=8, n_layers=2,
    )
    size = (32, 32)
    ds = build_cached_dataset(samples, size, verbose=False)

    tr_a = GANTrainer(cfg)
    sg_a, sd_a = tr_a.init_states(jax.random.PRNGKey(0))
    dev = (jnp.asarray(ds.img1), jnp.asarray(ds.img2))
    sg_a, sd_a, ld_a, lg_a = tr_a.train_epoch(
        sg_a, sd_a, dev, len(ds), np.random.RandomState(3)
    )

    tr_b = GANTrainer(cfg)
    sg_b, sd_b = tr_b.init_states(jax.random.PRNGKey(0))
    src = StreamingSource(samples, size, cache="host", verbose=False)
    sg_b, sd_b, ld_b, lg_b = tr_b.train_epoch_streaming(
        sg_b, sd_b, src, np.random.RandomState(3)
    )
    src.close()

    assert ld_a == pytest.approx(ld_b, rel=2e-3)
    assert lg_a == pytest.approx(lg_b, rel=2e-3)
    for a, b in zip(
        jax.tree_util.tree_leaves(sg_a.params),
        jax.tree_util.tree_leaves(sg_b.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=3.5e-4)


@pytest.mark.slow
def test_evaluation_stream_matches_resident(oscd_tree, tmp_path):
    """evaluate with --stream decode reports exactly the resident path's
    metrics (same batches, same compiled predict)."""
    from gan_aug_pfa_tpu import checkpoint as ckpt
    from gan_aug_pfa_tpu.config import DataConfig, EvalConfig
    from gan_aug_pfa_tpu.pipelines import run_evaluation

    tr, state = _make_trainer()
    path = str(tmp_path / "best_model.msgpack")
    ckpt.save_checkpoint(path, state, model_only=True)

    results = {}
    for mode in ("hbm", "decode"):
        data_cfg = DataConfig(
            root_dir=str(oscd_tree), target_size=SIZE, stream=mode
        )
        eval_cfg = EvalConfig(
            target_size=SIZE, checkpoint_path=path,
            output_dir=f"eval_stream_{mode}", num_visualizations=1,
        )
        results[mode] = run_evaluation(data_cfg, eval_cfg, verbose=False)
    for key, v in results["hbm"]["overall"].items():
        assert results["decode"]["overall"][key] == pytest.approx(
            v, rel=1e-6
        )
    assert results["hbm"]["per_city_counts"] == (
        results["decode"]["per_city_counts"]
    )


@pytest.mark.slow
def test_generate_stream_bytes_identical(oscd_tree, tmp_path):
    """Synthetic PNGs from --stream decode are byte-identical to the
    resident path's (the bit-comparability contract must survive
    streaming)."""
    import jax

    from gan_aug_pfa_tpu import checkpoint as ckpt
    from gan_aug_pfa_tpu.config import (
        DataConfig, GANTrainConfig, GenerateConfig,
    )
    from gan_aug_pfa_tpu.pipelines import run_generate_synthetic
    from gan_aug_pfa_tpu.train import GANTrainer

    gan_cfg = GANTrainConfig(
        target_size=(32, 32), compute_dtype="float32",
        num_downs=5, ngf=8, ndf=8, n_layers=2,
    )
    tr = GANTrainer(gan_cfg)
    sg, _ = tr.init_states(jax.random.PRNGKey(0))
    ckpt_dir = oscd_tree / "gan_stream_test_ckpt"
    ckpt_dir.mkdir(exist_ok=True)
    ckpt.save_checkpoint(
        str(ckpt_dir / "generator_epoch_1.msgpack"), sg, model_only=True
    )

    outputs = {}
    for mode in ("hbm", "decode"):
        out_dir = f"synthetic_stream_{mode}"
        data_cfg = DataConfig(
            root_dir=str(oscd_tree), target_size=(32, 32), stream=mode
        )
        gen_cfg = GenerateConfig(
            batch_size=3, target_size=(32, 32),
            generator_checkpoint_name="generator_epoch_1.msgpack",
            gan_checkpoint_dir="gan_stream_test_ckpt",
            synthetic_data_dir=out_dir, num_downs=5, ngf=8,
        )
        n = run_generate_synthetic(data_cfg, gen_cfg, verbose=False)
        assert n == 5  # the 5 fixture cities
        files = {}
        base = oscd_tree / out_dir
        for p in sorted(base.rglob("*.png")):
            files[str(p.relative_to(base))] = p.read_bytes()
        outputs[mode] = files
    assert outputs["hbm"].keys() == outputs["decode"].keys()
    for name, data in outputs["hbm"].items():
        assert outputs["decode"][name] == data, f"{name} differs"


@pytest.mark.slow
def test_pipeline_stream_cli(oscd_tree):
    """End-to-end: run_siamese_training with stream='decode' trains and
    checkpoints like the resident path."""
    from gan_aug_pfa_tpu.config import DataConfig
    from gan_aug_pfa_tpu.pipelines import run_siamese_training

    data_cfg = DataConfig(
        root_dir=str(oscd_tree), target_size=SIZE, stream="decode"
    )
    train_cfg = SiameseTrainConfig(
        batch_size=2, num_epochs=1, compute_dtype="float32",
        checkpoint_dir="stream_ckpt",
    )
    history = run_siamese_training(data_cfg, train_cfg, verbose=False)
    assert history is not None
    assert len(history["train_loss"]) == 1
    assert np.isfinite(history["train_loss"][0])
    assert (oscd_tree / "stream_ckpt" / "best_model.msgpack").exists()
