"""End-to-end integration tests of the five pipeline drivers
(gan_aug_pfa_tpu/pipelines.py) on a tiny on-disk OSCD tree: the full
4-stage workflow of the reference (README dataflow, SURVEY.md §1) —
GAN train -> synthesize -> Siamese train (real+synthetic) -> evaluate —
plus resume-from-checkpoint, which the reference lacks.

Runs on the 8-virtual-device CPU platform (conftest.py)."""

import glob
import os
import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compile/pipeline tier
from PIL import Image

from gan_aug_pfa_tpu.config import (
    DataConfig,
    EvalConfig,
    GANTrainConfig,
    GenerateConfig,
    SiameseTrainConfig,
)
from gan_aug_pfa_tpu import pipelines


@pytest.fixture(scope="module")
def workdir(oscd_tree, tmp_path_factory):
    """A private copy of the fixture tree (pipelines write into root_dir)."""
    root = tmp_path_factory.mktemp("e2e")
    dst = root / "data"
    shutil.copytree(oscd_tree, dst)
    # Drop the fixture's pre-made synthetic corpus: this module generates
    # its own via the GAN pipeline.
    shutil.rmtree(dst / "synthetic_data")
    return str(dst)


# Fast-training configs (tiny sizes; GAN must be 128x128 — num_downs=7).
GAN_SIZE = (128, 128)
SIA_SIZE = (32, 32)


def _data_cfg(workdir, **kw):
    return DataConfig(root_dir=workdir, target_size=SIA_SIZE, **kw)


@pytest.fixture(scope="module")
def gan_run(workdir):
    cfg = GANTrainConfig(
        num_epochs=2, target_size=GAN_SIZE, compute_dtype="float32",
        save_every=2, sample_every=1, data_parallel=False, seed=0,
        log_jsonl=os.path.join(workdir, "gan_run.jsonl"),
    )
    hist = pipelines.run_gan_training(
        DataConfig(root_dir=workdir, target_size=GAN_SIZE), cfg,
        verbose=False,
    )
    return workdir, hist


def test_gan_training_artifacts(gan_run):
    workdir, hist = gan_run
    assert hist is not None
    assert len(hist["loss_d"]) == 2 and len(hist["loss_g"]) == 2
    assert all(np.isfinite(v) for v in hist["loss_d"] + hist["loss_g"])
    ck = os.path.join(workdir, "gan_checkpoints")
    # Reference naming contract: generator_epoch_N / discriminator_epoch_N
    # (train_gan.py:149-154) with .msgpack extension.
    assert os.path.exists(os.path.join(ck, "generator_epoch_2.msgpack"))
    assert os.path.exists(os.path.join(ck, "discriminator_epoch_2.msgpack"))
    # Sample strips (train_gan.py:78-92 analog).
    strips = glob.glob(os.path.join(workdir, "gan_samples", "*.png"))
    assert strips, "no GAN sample strips written"


def test_gan_training_log_jsonl(gan_run):
    """[extension] --log-jsonl: the GAN run's event stream matches the
    run's history and artifacts."""
    import json

    workdir, hist = gan_run
    with open(os.path.join(workdir, "gan_run.jsonl")) as f:
        events = [json.loads(line) for line in f]
    kinds = [e["event"] for e in events]
    assert kinds[0] == "run_start" and kinds[-1] == "run_end"
    assert events[0]["kind"] == "gan_train"
    assert events[0]["config"]["num_epochs"] == 2
    epochs = [e for e in events if e["event"] == "epoch"]
    assert [e["epoch"] for e in epochs] == [1, 2]
    assert epochs[0]["loss_d"] == pytest.approx(hist["loss_d"][0])
    assert epochs[1]["loss_g"] == pytest.approx(hist["loss_g"][1])
    samples = [e for e in events if e["event"] == "sample"]
    assert len(samples) == 2  # sample_every=1
    cks = [e for e in events if e["event"] == "checkpoint"]
    assert cks and all(os.path.exists(e["generator"]) for e in cks)


@pytest.fixture(scope="module")
def synthetic_corpus(gan_run):
    workdir, _ = gan_run
    n = pipelines.run_generate_synthetic(
        DataConfig(root_dir=workdir, target_size=GAN_SIZE),
        GenerateConfig(
            target_size=GAN_SIZE,
            generator_checkpoint_name="generator_epoch_2.msgpack",
        ),
        verbose=False,
    )
    return workdir, n


def test_synthetic_generation_contract(synthetic_corpus):
    """Directory/file contract of reference generate_synthetic_data.py:74-85:
    images/[city]/img{1,2}_synth_N.png + labels/[city]/cm_synth_N.png,
    RGB 256x256-equivalent (here 128) images, L-mode binary labels."""
    workdir, n = synthetic_corpus
    assert n == 5  # all 5 fixture cities
    base = os.path.join(workdir, "synthetic_data")
    img1s = sorted(glob.glob(os.path.join(base, "images", "*", "img1_synth_*.png")))
    img2s = sorted(glob.glob(os.path.join(base, "images", "*", "img2_synth_*.png")))
    labels = sorted(glob.glob(os.path.join(base, "labels", "*", "cm_synth_*.png")))
    assert len(img1s) == len(img2s) == len(labels) == 5
    with Image.open(img2s[0]) as im:
        assert im.mode == "RGB" and im.size == (128, 128)
    with Image.open(labels[0]) as im:
        assert im.mode == "L"
        vals = set(np.unique(np.asarray(im)))
        assert vals.issubset({0, 255})


@pytest.fixture(scope="module")
def siamese_run(synthetic_corpus):
    workdir, _ = synthetic_corpus
    cfg = SiameseTrainConfig(
        batch_size=2, num_epochs=2, compute_dtype="float32",
        save_every=2, data_parallel=False, seed=0,
        log_jsonl=os.path.join(workdir, "siamese_run.jsonl"),
    )
    hist = pipelines.run_siamese_training(
        _data_cfg(workdir, use_synthetic=True), cfg, verbose=False
    )
    return workdir, hist


def test_siamese_training_with_synthetic(siamese_run):
    workdir, hist = siamese_run
    assert hist is not None
    assert len(hist["train_loss"]) == 2
    assert all(np.isfinite(v) for v in hist["train_loss"])
    ck = os.path.join(workdir, "siamese_checkpoints")
    # Reference naming contract (train.py:307-321).
    assert os.path.exists(os.path.join(ck, "best_model.msgpack"))
    assert os.path.exists(os.path.join(ck, "model_epoch_2.msgpack"))
    assert os.path.exists(os.path.join(ck, "last_state.msgpack"))


def test_siamese_training_log_jsonl(siamese_run):
    """[extension] --log-jsonl: epoch losses in the event stream match the
    returned history; checkpoint events carry existing paths."""
    import json

    workdir, hist = siamese_run
    with open(os.path.join(workdir, "siamese_run.jsonl")) as f:
        events = [json.loads(line) for line in f]
    assert events[0]["event"] == "run_start"
    assert events[0]["kind"] == "siamese_train"
    assert events[-1]["event"] == "run_end"
    assert events[-1]["best_val_loss"] == pytest.approx(
        hist["best_val_loss"]
    )
    epochs = [e for e in events if e["event"] == "epoch"]
    assert [e["epoch"] for e in epochs] == [1, 2]
    for rec, tl, vl in zip(epochs, hist["train_loss"], hist["val_loss"]):
        assert rec["train_loss"] == pytest.approx(tl)
        assert rec["val_loss"] == pytest.approx(vl)
        assert rec["lr"] > 0 and rec["wall_s"] > 0
    kinds = {e.get("kind") for e in events if e["event"] == "checkpoint"}
    assert {"best_model", "model_epoch", "last_state"} <= kinds
    for e in events:
        if e["event"] == "checkpoint":
            assert os.path.exists(e["path"])


def test_siamese_resume_continues_epoch_count(siamese_run, capsys):
    """Resume (absent in the reference, SURVEY.md §5.3: every reference run
    restarts at epoch 1) picks up at the next epoch with optimizer +
    scheduler state restored."""
    workdir, _ = siamese_run
    cfg = SiameseTrainConfig(
        batch_size=2, num_epochs=3, compute_dtype="float32",
        save_every=5, data_parallel=False, seed=0, resume=True,
        log_jsonl=os.path.join(workdir, "siamese_run.jsonl"),
    )
    hist = pipelines.run_siamese_training(
        _data_cfg(workdir, use_synthetic=True), cfg, verbose=True
    )
    out = capsys.readouterr().out
    assert "Resumed from" in out and "at epoch 3" in out
    # Only epoch 3 runs (epochs 1-2 already done before resume).
    assert len(hist["train_loss"]) == 1
    # --log-jsonl + --resume appends to the first run's file: two
    # run_starts, and the resumed run's epochs continue at 3.
    import json

    with open(cfg.log_jsonl) as f:
        events = [json.loads(line) for line in f]
    starts = [e for e in events if e["event"] == "run_start"]
    assert len(starts) == 2 and starts[1]["start_epoch"] == 3
    assert [e["epoch"] for e in events if e["event"] == "epoch"] == [1, 2, 3]


def test_evaluation_pipeline(siamese_run):
    workdir, _ = siamese_run
    json_out = os.path.join(workdir, "eval_report.json")
    result = pipelines.run_evaluation(
        _data_cfg(workdir),
        EvalConfig(target_size=SIA_SIZE, num_visualizations=2,
                   json_out=json_out),
        verbose=False,
    )
    assert result is not None
    overall = result["overall"]
    for k in ("accuracy", "precision", "recall", "f1", "iou"):
        assert 0.0 <= overall[k] <= 1.0
    # All 5 cities evaluated (reference evaluates ALL cities, SURVEY quirk).
    assert len(result["per_city"]) == 5
    vis = glob.glob(
        os.path.join(workdir, "evaluation_results", "validation_sample_*.png")
    )
    assert len(vis) == 2
    # [extension] --json-out report mirrors the returned metrics.
    import json

    with open(json_out) as f:
        report = json.load(f)
    assert report["n_samples"] == sum(result["per_city_counts"].values())
    assert report["overall"] == pytest.approx(overall)
    for city, m in result["per_city"].items():
        c = result["per_city_counts"][city]
        for k, v in report["per_city"][city].items():
            assert v == pytest.approx(m[k] / c)


def test_evaluation_threshold_sweep(siamese_run):
    """[extension] --threshold-sweep reports a macro-F1/IoU grid whose 0.5
    entry matches the headline metrics, and a best operating point."""
    workdir, _ = siamese_run
    result = pipelines.run_evaluation(
        _data_cfg(workdir),
        EvalConfig(target_size=SIA_SIZE, num_visualizations=0,
                   threshold_sweep=True),
        verbose=False,
    )
    sweep = result["sweep"]
    assert sweep is not None
    assert len(sweep["thresholds"]) == len(sweep["f1"]) == len(sweep["iou"])
    i05 = sweep["thresholds"].index(0.5)
    assert sweep["f1"][i05] == pytest.approx(result["overall"]["f1"],
                                             rel=1e-5)
    assert sweep["best_f1"] == pytest.approx(max(sweep["f1"]), rel=1e-9)
    assert sweep["best_threshold"] in sweep["thresholds"]
    import json

    saved = json.load(open(os.path.join(
        workdir, "evaluation_results", "threshold_sweep.json"
    )))
    assert saved == sweep


def test_single_pair_evaluation(siamese_run):
    workdir, _ = siamese_run
    img_base = os.path.join(
        workdir, "Onera Satellite Change Detection Dataset", "images",
        "Onera Satellite Change Detection dataset - Images",
    )
    lbl_base = os.path.join(
        workdir, "Onera Satellite Change Detection Dataset", "train_labels",
        "Onera Satellite Change Detection dataset - Train Labels",
    )
    result = pipelines.evaluate_single_pair(
        _data_cfg(workdir),
        EvalConfig(target_size=SIA_SIZE),
        os.path.join(img_base, "pisa", "pair", "img1.png"),
        os.path.join(img_base, "pisa", "pair", "img2.png"),
        "pisa",
        label_path=os.path.join(lbl_base, "pisa", "cm", "cm.png"),
        verbose=False,
    )
    assert result is not None
    assert result["pred"].shape == (1, *SIA_SIZE)
    assert set(result["metrics"]) == {
        "accuracy", "precision", "recall", "f1", "iou"
    }


def test_evaluation_ensemble_and_postprocess(siamese_run):
    """Ensembling + morphological post-processing: the reference README's
    Steps 6-7 (README.md:145-153), which its code never implements."""
    workdir, _ = siamese_run
    ck = os.path.join(workdir, "siamese_checkpoints")
    result = pipelines.run_evaluation(
        _data_cfg(workdir),
        EvalConfig(
            target_size=SIA_SIZE, num_visualizations=0,
            post_process=True, post_process_kernel=3,
            ensemble_paths=(
                os.path.join(ck, "best_model.msgpack"),
                os.path.join(ck, "model_epoch_2.msgpack"),
            ),
        ),
        verbose=False,
    )
    assert result is not None
    for k in ("accuracy", "precision", "recall", "f1", "iou"):
        assert 0.0 <= result["overall"][k] <= 1.0


def test_evaluation_missing_checkpoint_graceful(workdir, tmp_path):
    """Mirrors the reference's graceful error path (evaluate.py:343-351)."""
    empty = tmp_path / "empty_root"
    empty.mkdir()
    result = pipelines.run_evaluation(
        DataConfig(root_dir=str(empty)), EvalConfig(), verbose=False
    )
    assert result is None


def test_model_only_checkpoint_roundtrip(tmp_path):
    """best_model/model_epoch_N are model-only (the reference's bare
    state_dict contract); restore tolerates the missing optimizer state."""
    import jax
    import jax.numpy as jnp

    from gan_aug_pfa_tpu import checkpoint as ckpt
    from gan_aug_pfa_tpu.train import SiameseTrainer

    cfg = SiameseTrainConfig(
        batch_size=2, compute_dtype="float32", data_parallel=False
    )
    tr = SiameseTrainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0), (16, 16))
    p = str(tmp_path / "best_model.msgpack")
    ckpt.save_checkpoint(p, state, extra={"epoch": 3}, model_only=True)
    full = str(tmp_path / "last_state.msgpack")
    ckpt.save_checkpoint(full, state, extra={"epoch": 3})
    import os

    assert os.path.getsize(p) < os.path.getsize(full) / 2
    restored, extra = ckpt.restore_checkpoint(p, state, with_extra=True)
    assert extra["epoch"] == 3
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    assert jnp.allclose(a, b)


def test_siamese_training_defer_best_ckpt(synthetic_corpus):
    """defer_best_ckpt=True: best_model.msgpack is written on the
    save_every cadence from the device-HBM snapshot and records the true
    best epoch's val loss (no per-improvement host pulls)."""
    from flax import serialization

    workdir, _ = synthetic_corpus
    cfg = SiameseTrainConfig(
        batch_size=2, num_epochs=3, compute_dtype="float32",
        save_every=2, data_parallel=False, seed=0,
        defer_best_ckpt=True, checkpoint_dir="siamese_defer_ckpt",
    )
    hist = pipelines.run_siamese_training(
        _data_cfg(workdir, use_synthetic=False), cfg, verbose=False
    )
    path = os.path.join(workdir, "siamese_defer_ckpt", "best_model.msgpack")
    assert os.path.exists(path)
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    # The deferred write preserves WHICH epoch was best, not just the last.
    assert payload["extra"]["val_loss"] == pytest.approx(
        min(hist["val_loss"]), rel=1e-6
    )
    assert "params" in payload and "batch_stats" in payload


def test_siamese_training_fast_path_flags(synthetic_corpus):
    """The perf opt-ins (batched_encoder + concat_free) run the full
    training pipeline end to end and produce finite losses and the same
    checkpoint contract."""
    workdir, _ = synthetic_corpus
    cfg = SiameseTrainConfig(
        batch_size=2, num_epochs=1, compute_dtype="float32",
        save_every=5, data_parallel=False, seed=0,
        batched_encoder=True, concat_free=True,
        checkpoint_dir="siamese_fast_ckpt",
    )
    hist = pipelines.run_siamese_training(
        _data_cfg(workdir, use_synthetic=False), cfg, verbose=False
    )
    assert hist is not None
    assert all(np.isfinite(v) for v in hist["train_loss"])
    assert os.path.exists(
        os.path.join(workdir, "siamese_fast_ckpt", "best_model.msgpack")
    )


def test_siamese_training_async_ckpt(synthetic_corpus, tmp_path):
    """async_ckpt=True: background writes produce byte-identical
    best_model/last_state checkpoints to the synchronous run (same seed),
    and resume works from them."""
    workdir, _ = synthetic_corpus
    outs = {}
    for name, flag in (("sync", False), ("async", True)):
        cfg = SiameseTrainConfig(
            batch_size=2, num_epochs=2, compute_dtype="float32",
            save_every=2, data_parallel=False, seed=0, async_ckpt=flag,
            checkpoint_dir=f"siamese_{name}_ckpt",
        )
        hist = pipelines.run_siamese_training(
            _data_cfg(workdir, use_synthetic=False), cfg, verbose=False
        )
        assert hist is not None
        outs[name] = os.path.join(workdir, f"siamese_{name}_ckpt")
    for stem in ("best_model.msgpack", "last_state.msgpack"):
        a = open(os.path.join(outs["sync"], stem), "rb").read()
        b = open(os.path.join(outs["async"], stem), "rb").read()
        assert a == b, f"{stem} differs between sync and async writes"
    # wait() is idempotent and the writer surfaces write errors.
    from gan_aug_pfa_tpu.checkpoint import AsyncCheckpointWriter

    w = AsyncCheckpointWriter()
    w.wait()  # no in-flight write: no-op
    import jax.numpy as jnp
    from types import SimpleNamespace

    bad = SimpleNamespace(
        params={"w": jnp.ones((2,))}, batch_stats={}, opt_state=(), step=0
    )
    blocker = tmp_path / "a_file"
    blocker.write_text("")
    w.save(str(blocker / "x.msgpack"), bad)  # dirname is a regular file
    with pytest.raises(OSError):
        w.wait()


def test_siamese_training_early_stop(synthetic_corpus):
    """[extension] --early-stop N halts a non-improving run before the
    epoch budget, still writes the resume state (with the stopper's
    count), and logs the early_stop event.  lr=1e6 overflows the params
    to inf/NaN on the first update, and a NaN val loss never counts as an
    improvement, so the stop is deterministic.  (A merely-large lr is not
    enough: at lr=5 the collapsed model's val loss still crept down
    strictly every epoch.)"""
    import json

    from flax import serialization

    workdir, _ = synthetic_corpus
    log = os.path.join(workdir, "early_stop.jsonl")
    cfg = SiameseTrainConfig(
        batch_size=2, num_epochs=8, compute_dtype="float32",
        save_every=10, data_parallel=False, seed=0, learning_rate=1e6,
        early_stop_patience=1, checkpoint_dir="siamese_estop_ckpt",
        log_jsonl=log,
    )
    hist = pipelines.run_siamese_training(
        _data_cfg(workdir, use_synthetic=False), cfg, verbose=False
    )
    assert hist is not None
    n_ran = len(hist["train_loss"])
    assert n_ran < 8, f"diverging run was not early-stopped ({n_ran} epochs)"
    with open(log) as f:
        events = [json.loads(line) for line in f]
    stops = [e for e in events if e["event"] == "early_stop"]
    assert len(stops) == 1 and stops[0]["patience"] == 1
    assert stops[0]["epoch"] == n_ran
    # The resume state was written off-cadence (save_every=10 > n_ran) and
    # carries the stopper state for --resume.
    path = os.path.join(workdir, "siamese_estop_ckpt", "last_state.msgpack")
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    assert int(payload["extra"]["epoch"]) == n_ran
    assert int(payload["extra"]["early_stop"]["num_bad_epochs"]) >= 1


def test_generate_synthetic_via_serving_artifact(synthetic_corpus, tmp_path):
    """[extension] generate_synthetic_data --serving-artifact: the
    pre-exported generator artifact path produces the same synthetic PNGs
    (≤1 uint8 LSB — separate XLA programs, same f32 math) as the
    checkpoint path, without restoring any checkpoint."""
    import jax

    from gan_aug_pfa_tpu import checkpoint as ckpt
    from gan_aug_pfa_tpu import serve

    workdir, _ = synthetic_corpus
    gen_path = os.path.join(
        workdir, "gan_checkpoints", "generator_epoch_2.msgpack"
    )
    model = serve._build_model("generator", 3, "float32")
    dummy = np.zeros((1, *GAN_SIZE, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
    variables = ckpt.restore_model_only(gen_path, variables)
    exported = serve.export_model(
        "generator", variables, *GAN_SIZE, compute_dtype="float32"
    )
    art = str(tmp_path / "generator.ghlo")
    serve.save_artifact(art, exported, {"arch": "generator"})

    n = pipelines.run_generate_synthetic(
        DataConfig(root_dir=workdir, target_size=GAN_SIZE),
        GenerateConfig(
            target_size=GAN_SIZE, serving_artifact=art,
            synthetic_data_dir="synthetic_data_served",
        ),
        verbose=False,
    )
    assert n == 5
    base_ckpt = os.path.join(workdir, "synthetic_data")
    base_art = os.path.join(workdir, "synthetic_data_served")
    img2s = sorted(glob.glob(
        os.path.join(base_ckpt, "images", "*", "img2_synth_*.png")
    ))
    assert len(img2s) == 5
    for p_ckpt in img2s:
        p_art = p_ckpt.replace(base_ckpt, base_art)
        a = np.asarray(Image.open(p_ckpt), np.int16)
        b = np.asarray(Image.open(p_art), np.int16)
        assert np.abs(a - b).max() <= 1
    # img1/labels don't go through the model at all: byte-identical.
    for pat in ("images/*/img1_synth_*.png", "labels/*/cm_synth_*.png"):
        for p_ckpt in sorted(glob.glob(os.path.join(base_ckpt, pat))):
            p_art = p_ckpt.replace(base_ckpt, base_art)
            with open(p_ckpt, "rb") as f1, open(p_art, "rb") as f2:
                assert f1.read() == f2.read()


def test_evaluation_via_serving_artifact(siamese_run, tmp_path):
    """[extension] evaluate --serving-artifact: metrics match the
    checkpoint path on the same data (the exported fn is
    sigmoid(model(normalize(img1), normalize(img2)))."""
    import jax

    from gan_aug_pfa_tpu import checkpoint as ckpt
    from gan_aug_pfa_tpu import serve

    workdir, _ = siamese_run
    ckpt_path = os.path.join(
        workdir, "siamese_checkpoints", "best_model.msgpack"
    )
    model = serve._build_model("siamese", 3, "float32")
    dummy = np.zeros((1, *SIA_SIZE, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy, train=False)
    variables = ckpt.restore_model_only(ckpt_path, variables)
    exported = serve.export_model(
        "siamese", variables, *SIA_SIZE, compute_dtype="float32"
    )
    art = str(tmp_path / "siamese.ghlo")
    serve.save_artifact(art, exported, {"arch": "siamese"})

    ref = pipelines.run_evaluation(
        _data_cfg(workdir),
        EvalConfig(target_size=SIA_SIZE, num_visualizations=0,
                   checkpoint_path=ckpt_path, compute_dtype="float32"),
        verbose=False,
    )
    json_out = str(tmp_path / "served_report.json")
    got = pipelines.run_evaluation(
        _data_cfg(workdir),
        EvalConfig(target_size=SIA_SIZE, num_visualizations=0,
                   serving_artifact=art, compute_dtype="float32",
                   output_dir="evaluation_results_served",
                   json_out=json_out),
        verbose=False,
    )
    assert got is not None and ref is not None
    for k in ("accuracy", "precision", "recall", "f1", "iou"):
        assert got["overall"][k] == pytest.approx(ref["overall"][k],
                                                  rel=1e-4)
    # The json report must work without checkpoints (regression: it
    # referenced the checkpoint list, unbound on the serving path).
    import json

    with open(json_out) as f:
        assert json.load(f)["checkpoints"] == [art]


def test_evaluation_serving_artifact_excludes_ensemble(siamese_run,
                                                       tmp_path):
    workdir, _ = siamese_run
    res = pipelines.run_evaluation(
        _data_cfg(workdir),
        EvalConfig(target_size=SIA_SIZE,
                   serving_artifact=str(tmp_path / "nope.ghlo"),
                   ensemble_paths=("a", "b")),
        verbose=False,
    )
    assert res is None
