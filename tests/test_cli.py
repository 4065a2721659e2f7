"""CLI contract tests: the reference's exact flag names must parse
(reference train.py:325-337, evaluate.py:358-362 — BASELINE.json requires
keeping CLI contracts), plus defaults mirroring the reference constants."""

import importlib.util
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"cli_{name}", os.path.join(ROOT, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_train_cli_reference_flags():
    p = _load("train").build_parser()
    args = p.parse_args([
        "--root-dir", "/data", "--dataset-subdir", "D",
        "--synthetic-data-dir", "S", "--checkpoint-dir", "C",
        "--batch-size", "8", "--num-epochs", "3", "--learning-rate", "1e-3",
        "--target-size", "64x64", "--save-every", "2", "--use-synthetic",
        "--tune",
    ])
    assert args.batch_size == 8 and args.use_synthetic and args.tune
    # Reference defaults (train.py:24-31, 325-337).
    d = p.parse_args([])
    assert d.batch_size == 4
    assert d.num_epochs == 50
    assert d.target_size == "128x128"
    assert d.save_every == 5
    assert abs(d.learning_rate - 0.00010152447097322304) < 1e-18
    assert d.checkpoint_dir == "siamese_checkpoints"


def test_evaluate_cli_reference_flags():
    p = _load("evaluate").build_parser()
    args = p.parse_args([
        "--image1-path", "a.png", "--image2-path", "b.png",
        "--label-path", "c.png", "--city-name", "pisa",
    ])
    assert args.image1_path == "a.png" and args.city_name == "pisa"
    # Extension flags (reference README Steps 6-7, implemented here).
    args = p.parse_args([
        "--post-process", "--post-process-kernel", "5",
        "--ensemble", "m1.msgpack", "m2.msgpack",
    ])
    assert args.post_process and args.post_process_kernel == 5
    assert args.ensemble == ["m1.msgpack", "m2.msgpack"]


def test_gan_cli_defaults_match_reference_constants():
    p = _load("train_gan").build_parser()
    d = p.parse_args([])
    # Reference train_gan.py:26-35 module constants.
    assert d.batch_size == 1
    assert d.num_epochs == 200
    assert d.learning_rate_g == 1e-4 and d.learning_rate_d == 1e-4
    assert d.beta1 == 0.5
    assert d.lambda_l1 == 100.0
    assert d.target_size == "256x256"
    assert d.save_every == 10 and d.sample_every == 5


def test_generate_cli_defaults():
    p = _load("generate_synthetic_data").build_parser()
    d = p.parse_args([])
    # Reference generate_synthetic_data.py:13-24 constants.
    assert d.batch_size == 4
    assert d.target_size == "256x256"
    assert "generator_epoch_200" in d.generator_checkpoint_name


def test_extension_flags_parse():
    """New [extension] flags: --concat-free, --no-compile-cache on every
    JAX CLI."""
    p = _load("train").build_parser()
    a = p.parse_args(["--concat-free", "--no-compile-cache"])
    assert a.concat_free and a.no_compile_cache
    assert not p.parse_args([]).concat_free
    for cli in ("train_gan", "generate_synthetic_data", "evaluate"):
        pp = _load(cli).build_parser()
        assert pp.parse_args(["--no-compile-cache"]).no_compile_cache
        assert not pp.parse_args([]).no_compile_cache


def test_early_stop_flag_parse():
    """[extension] --early-stop N on train.py; default 0 = off."""
    p = _load("train").build_parser()
    assert p.parse_args([]).early_stop == 0
    assert p.parse_args(["--early-stop", "5"]).early_stop == 5


def test_runlog_flags_parse():
    """[extension] --log-jsonl on both training CLIs; --json-out on
    evaluate.  Default off."""
    for cli in ("train", "train_gan"):
        p = _load(cli).build_parser()
        assert p.parse_args([]).log_jsonl is None
        assert p.parse_args(["--log-jsonl", "r.jsonl"]).log_jsonl == "r.jsonl"
    p = _load("evaluate").build_parser()
    assert p.parse_args([]).json_out is None
    assert p.parse_args(["--json-out", "m.json"]).json_out == "m.json"
