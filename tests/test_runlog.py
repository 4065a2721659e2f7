"""Unit tests for utils/runlog.py — the [extension] machine-readable JSONL
run-event stream behind --log-jsonl (the reference's only observability is
print()/tqdm, SURVEY.md §5.5).  Pipeline-level integration is covered in
tests/test_pipelines.py (slow tier)."""

import json
import os

import numpy as np

from gan_aug_pfa_tpu.utils.runlog import JsonlRunLog, open_run_log


def _read(path):
    with open(path) as f:
        return [json.loads(line) for line in f]


def test_events_one_json_object_per_line(tmp_path):
    path = str(tmp_path / "run.jsonl")
    with JsonlRunLog(path) as log:
        log.log("run_start", kind="test", config={"lr": 1e-3, "bs": 4})
        log.log("epoch", epoch=1, train_loss=0.5)
    events = _read(path)
    assert [e["event"] for e in events] == ["run_start", "epoch"]
    assert events[0]["config"] == {"lr": 1e-3, "bs": 4}
    assert events[1]["epoch"] == 1
    assert all(e["ts"] > 0 for e in events)


def test_numpy_and_jax_scalars_coerced(tmp_path):
    import jax.numpy as jnp

    path = str(tmp_path / "run.jsonl")
    with JsonlRunLog(path) as log:
        log.log(
            "epoch",
            f32=np.float32(0.25),
            i64=np.int64(7),
            arr=np.arange(3),
            jax_scalar=jnp.float32(1.5),
        )
    (e,) = _read(path)
    assert e["f32"] == 0.25 and e["i64"] == 7
    assert e["arr"] == [0, 1, 2] and e["jax_scalar"] == 1.5


def test_append_mode_preserves_previous_run(tmp_path):
    path = str(tmp_path / "run.jsonl")
    with JsonlRunLog(path) as log:
        log.log("run_start")
    with JsonlRunLog(path, append=True) as log:
        log.log("run_start", resumed=True)
    events = _read(path)
    assert len(events) == 2 and events[1]["resumed"] is True
    # Without append the file is truncated (a fresh run).
    with JsonlRunLog(path) as log:
        log.log("run_start", fresh=True)
    events = _read(path)
    assert len(events) == 1 and events[0]["fresh"] is True


def test_flushed_per_event_and_creates_parent_dirs(tmp_path):
    path = str(tmp_path / "nested" / "dir" / "run.jsonl")
    log = JsonlRunLog(path)
    log.log("epoch", epoch=1)
    # Readable BEFORE close: each event is flushed so `tail -f` (or a
    # crash) sees every completed line.
    assert _read(path)[0]["epoch"] == 1
    log.close()
    log.close()  # idempotent


def test_open_run_log_disabled_when_path_none(tmp_path):
    assert open_run_log(None) is None
    log = open_run_log(str(tmp_path / "x.jsonl"))
    assert isinstance(log, JsonlRunLog)
    log.close()
    assert os.path.exists(tmp_path / "x.jsonl")


def test_summarize_runlog_script(tmp_path):
    """scripts/summarize_runlog.py renders both log kinds and survives a
    truncated in-flight last line."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "summarize_runlog",
        pathlib.Path(__file__).resolve().parent.parent
        / "scripts" / "summarize_runlog.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    path = str(tmp_path / "run.jsonl")
    with JsonlRunLog(path) as log:
        log.log("run_start", kind="siamese_train", start_epoch=1)
        log.log("epoch", epoch=1, train_loss=0.9, val_loss=0.8,
                lr=1e-4, wall_s=2.0)
        log.log("epoch", epoch=2, train_loss=0.7, val_loss=0.6,
                lr=1e-4, wall_s=1.5)
        log.log("checkpoint", kind="best_model", path="/ck/best.msgpack",
                epoch=2, val_loss=0.6)
        log.log("run_end", best_val_loss=0.6)
    with open(path, "a") as f:
        f.write('{"ts": 1, "event": "epo')  # crash-truncated line
    text = mod.summarize(mod.load_events(path))
    assert "siamese_train" in text
    assert "best val loss: 0.6000 (epoch 2)" in text
    assert "best.msgpack" in text

    path2 = str(tmp_path / "gan.jsonl")
    with JsonlRunLog(path2) as log:
        log.log("run_start", kind="gan_train", start_epoch=1)
        log.log("epoch", epoch=1, loss_d=0.5, loss_g=40.0, wall_s=1.0)
        log.log("preemption", epoch=1)
    text2 = mod.summarize(mod.load_events(path2))
    assert "gan_train" in text2
    assert "loss_g 40.0000" in text2
    assert "preempted at epoch 1" in text2
    assert "no run_end" in text2
