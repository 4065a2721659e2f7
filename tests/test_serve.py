"""Serving-export tests: artifact round trip, dynamic batch, output parity
with the live model, platform checking, and the CLI.

The reference has no serving path (SURVEY.md §5 — inference scripts
rebuild the model per run); these tests cover the [extension]
jax.export-based artifact subsystem (gan_aug_pfa_tpu/serve.py)."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_aug_pfa_tpu import serve
from gan_aug_pfa_tpu.models.pix2pix import NLayerDiscriminator
from gan_aug_pfa_tpu.models.siamese_unet import SiameseUNet


def test_arch_from_stem():
    assert serve.arch_from_stem("x/best_model.msgpack") == "siamese"
    assert serve.arch_from_stem("model_epoch_50.pth") == "siamese"
    assert serve.arch_from_stem("c/generator_epoch_200.pth") == "generator"
    assert serve.arch_from_stem("discriminator_epoch_10.msgpack") == (
        "discriminator"
    )
    assert serve.arch_from_stem("weights.bin") is None


@pytest.mark.slow
@pytest.mark.medium
def test_discriminator_export_roundtrip_dynamic_batch(tmp_path):
    model = NLayerDiscriminator(input_nc=6)
    rng = jax.random.PRNGKey(0)
    h = w = 64
    variables = model.init(rng, jnp.zeros((1, h, w, 6)), train=False)

    exported = serve.export_model("discriminator", variables, h, w)
    path = str(tmp_path / "disc.ghlo")
    serve.save_artifact(path, exported, {"arch": "discriminator"})

    header, fn = serve.load_serving_fn(path)
    assert header["arch"] == "discriminator"
    assert "cpu" in header["platforms"]

    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    for bs in (1, 3):  # dynamic batch: one artifact, several batch sizes
        a = jax.random.uniform(k1, (bs, h, w, 3), minval=-1, maxval=1)
        b = jax.random.uniform(k2, (bs, h, w, 3), minval=-1, maxval=1)
        got = np.asarray(fn(a, b))
        want = np.asarray(model.apply(
            variables, jnp.concatenate([a, b], axis=-1), train=False
        ))
        assert got.shape == want.shape  # (bs, 6, 6, 1) patch map at 64px
        np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_siamese_export_matches_eval_path(tmp_path):
    # 32px keeps the CPU compile cheap (~40 s on the 1-core host — slow
    # tier); the model is fully convolutional so the artifact machinery is
    # identical to the 128px deployment.
    model = SiameseUNet(batched_encoder=True)
    h = w = 32
    dummy = jnp.zeros((1, h, w, 3))
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy, train=False)

    exported = serve.export_model("siamese", variables, h, w)
    path = str(tmp_path / "siamese.ghlo")
    serve.save_artifact(path, exported, {"arch": "siamese"})
    header, fn = serve.load_serving_fn(path)
    assert header["arch"] == "siamese"

    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x1 = jax.random.uniform(k1, (2, h, w, 3), minval=-1, maxval=1)
    x2 = jax.random.uniform(k2, (2, h, w, 3), minval=-1, maxval=1)
    got = np.asarray(fn(x1, x2))
    want = np.asarray(jax.nn.sigmoid(
        model.apply(variables, x1, x2, train=False)
    ))
    assert got.shape == (2, h, w, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.min() >= 0.0 and got.max() <= 1.0


def test_export_non_default_architecture(tmp_path):
    """arch_kwargs plumbs the GAN architecture knobs into the export path
    (a --num-downs 5 / --ngf 8 checkpoint must export and serve)."""
    from gan_aug_pfa_tpu.models.pix2pix import UNetGenerator

    model = UNetGenerator(input_nc=3, output_nc=3, num_downs=5, ngf=8)
    rng = jax.random.PRNGKey(0)
    h = w = 32
    variables = model.init(rng, jnp.zeros((1, h, w, 3)), train=False)

    exported = serve.export_model(
        "generator", variables, h, w,
        arch_kwargs={"num_downs": 5, "ngf": 8},
    )
    path = str(tmp_path / "gen_small.ghlo")
    serve.save_artifact(
        path, exported,
        {"arch": "generator", "arch_kwargs": {"num_downs": 5, "ngf": 8}},
    )
    header, fn = serve.load_serving_fn(path)
    assert header["arch_kwargs"] == {"num_downs": 5, "ngf": 8}
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (2, h, w, 3), minval=0, maxval=1
    )
    got = np.asarray(fn(x))
    assert got.shape == (2, h, w, 3)


def test_generator_num_downs_validated():
    from gan_aug_pfa_tpu.models.pix2pix import UNetGenerator

    with pytest.raises(ValueError, match="num_downs >= 5"):
        UNetGenerator(input_nc=3, output_nc=3, num_downs=4).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), train=False
        )


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "junk.ghlo"
    p.write_bytes(b"NOTMAGIC" + b"\x00" * 16)
    with pytest.raises(ValueError, match="bad magic"):
        serve.load_artifact(str(p))


def test_platform_mismatch_rejected(tmp_path):
    model = NLayerDiscriminator(input_nc=6)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 6)), train=False
    )
    exported = serve.export_model(
        "discriminator", variables, 32, 32, platforms=["tpu"]
    )
    path = str(tmp_path / "tpu_only.ghlo")
    serve.save_artifact(path, exported, {"arch": "discriminator"})
    with pytest.raises(ValueError, match="exported for platforms"):
        serve.load_artifact(path)  # tests run on the cpu backend
    header, _ = serve.load_artifact(path, check_platform=False)
    assert header["platforms"] == ["tpu"]


@pytest.mark.slow
def test_export_cli_end_to_end(tmp_path, repo_root=None):
    """Train-free CLI check: init a discriminator checkpoint, export via
    the CLI, load and run the artifact."""
    from gan_aug_pfa_tpu import checkpoint as ckpt
    from gan_aug_pfa_tpu.config import GANTrainConfig
    from gan_aug_pfa_tpu.train.gan import GANTrainer

    cfg = GANTrainConfig(target_size=(64, 64))
    trainer = GANTrainer(cfg)
    _, sd = trainer.init_states(jax.random.PRNGKey(0))
    ckpt_path = str(tmp_path / "discriminator_epoch_1.msgpack")
    ckpt.save_checkpoint(ckpt_path, sd, model_only=True)

    out = str(tmp_path / "disc_serve.ghlo")
    r = subprocess.run(
        [sys.executable, "export_model.py",
         "--checkpoint-path", ckpt_path, "--output", out,
         "--target-size", "64x64", "--platform", "cpu",
         # The image's TPU plugin overrides an env JAX_PLATFORMS=cpu;
         # --backend forces the platform after import (see export_model.py).
         "--backend", "cpu"],
        capture_output=True, text=True, cwd=".",
        timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert "Exporting discriminator at 64x64" in r.stdout
    header, fn = serve.load_serving_fn(out)
    assert header["target_size"] == [64, 64]
    a = jnp.zeros((1, 64, 64, 3))
    assert np.asarray(fn(a, a)).shape == (1, 6, 6, 1)


# ---------------------------------------------------------------------------
# AOT executable sidecar (serve.compile_artifact / load_serving_fn aot=...)


def _disc_artifact(tmp_path, h=64, w=64):
    model = NLayerDiscriminator(input_nc=6)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 6)), train=False
    )
    exported = serve.export_model("discriminator", variables, h, w)
    path = str(tmp_path / "disc.ghlo")
    serve.save_artifact(path, exported, {"arch": "discriminator",
                                         "target_size": [h, w]})
    return model, variables, path


@pytest.mark.slow
@pytest.mark.medium
def test_aot_sidecar_roundtrip(tmp_path):
    """compile_artifact writes a sidecar whose deserialized executables
    produce the same outputs; uncached batch sizes fall back to the
    portable path (VERDICT r2 item 8: serving cold starts without
    per-shape XLA compiles)."""
    model, variables, path = _disc_artifact(tmp_path)

    meta = serve.compile_artifact(path, [1, 3], verbose=False)
    assert sorted(int(b) for b in meta["shapes"]) == [1, 3]
    assert os.path.exists(serve.aot_sidecar_path(path))

    header, fn = serve.load_serving_fn(path, aot="require")
    assert header["aot_batch_sizes"] == [1, 3]
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    for bs in (1, 3, 2):  # 2 = uncached -> portable-path fallback
        a = jax.random.uniform(k1, (bs, 64, 64, 3), minval=-1, maxval=1)
        b = jax.random.uniform(k2, (bs, 64, 64, 3), minval=-1, maxval=1)
        got = np.asarray(fn(a, b))
        want = np.asarray(model.apply(
            variables, jnp.concatenate([a, b], axis=-1), train=False
        ))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_aot_sidecar_executes_without_xla(tmp_path):
    """The cached path truly bypasses tracing/compiling the Exported: the
    deserialized executable runs even though exported.call was never
    invoked (unit-level check on _load_aot_sidecar)."""
    model, variables, path = _disc_artifact(tmp_path)
    serve.compile_artifact(path, [2], verbose=False)
    entries, why = serve._load_aot_sidecar(path)
    assert why == "ok" and set(entries) == {2}
    a = jnp.zeros((2, 64, 64, 3))
    out = np.asarray(entries[2](a, a))
    want = np.asarray(model.apply(
        variables, jnp.concatenate([a, a], axis=-1), train=False
    ))
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_aot_sidecar_never_ignores_valid_sidecar(tmp_path):
    """aot='never' must skip a perfectly valid sidecar (escape hatch for
    links where the executable upload costs more than the compile it
    skips — serve._load_aot_sidecar docstring) and still serve correct
    outputs through the portable path."""
    model, variables, path = _disc_artifact(tmp_path)
    serve.compile_artifact(path, [1], verbose=False)
    header, fn = serve.load_serving_fn(path, aot="never")
    assert "aot_batch_sizes" not in header  # sidecar not even consulted
    a = jnp.zeros((1, 64, 64, 3))
    want = np.asarray(model.apply(
        variables, jnp.concatenate([a, a], axis=-1), train=False
    ))
    np.testing.assert_allclose(np.asarray(fn(a, a)), want, atol=1e-5)


def test_aot_sidecar_invalidation(tmp_path):
    """A stale sidecar (artifact re-exported after compilation) must be
    rejected — silently for aot='auto', loudly for aot='require'."""
    model, variables, path = _disc_artifact(tmp_path)

    with pytest.raises(ValueError, match="no usable executable sidecar"):
        serve.load_serving_fn(path, aot="require")

    serve.compile_artifact(path, [1], verbose=False)
    serve.load_serving_fn(path, aot="require")  # valid now

    # Re-export with different weights -> fingerprint mismatch.
    variables2 = NLayerDiscriminator(input_nc=6).init(
        jax.random.PRNGKey(9), jnp.zeros((1, 64, 64, 6)), train=False
    )
    exported2 = serve.export_model("discriminator", variables2, 64, 64)
    serve.save_artifact(path, exported2, {"arch": "discriminator",
                                          "target_size": [64, 64]})
    entries, why = serve._load_aot_sidecar(path)
    assert entries is None and "artifact changed" in why
    with pytest.raises(ValueError, match="artifact changed"):
        serve.load_serving_fn(path, aot="require")
    header, fn = serve.load_serving_fn(path)  # auto: silent fallback
    assert "aot_batch_sizes" not in header
    a = jnp.zeros((1, 64, 64, 3))
    assert np.asarray(fn(a, a)).shape == (1, 6, 6, 1)


def test_aot_sidecar_quantized_artifact(tmp_path):
    """int8 artifacts (weights as runtime args) AOT-compile and serve
    through the sidecar with the same caller-facing signature."""
    model = NLayerDiscriminator(input_nc=6)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6)), train=False
    )
    exported, qtree, _ = serve.export_model_quantized(
        "discriminator", variables, 64, 64
    )
    path = str(tmp_path / "disc_int8.ghlo")
    serve.save_artifact(path, exported, {"arch": "discriminator",
                                         "target_size": [64, 64]},
                        weights=qtree)
    serve.compile_artifact(path, [2], verbose=False)
    header, fn = serve.load_serving_fn(path, aot="require")
    a = jnp.zeros((2, 64, 64, 3))
    got = np.asarray(fn(a, a))
    want = np.asarray(model.apply(
        variables, jnp.concatenate([a, a], axis=-1), train=False
    ))
    # int8 weight quantization error only.
    np.testing.assert_allclose(got, want, atol=0.1)


def test_aot_sidecar_v2_per_shape_lazy_files(tmp_path):
    """Round-5 sidecar format (VERDICT r4 weak #4): the .aotc is a small
    index; each shape's executable lives zlib-compressed in its own
    .bs<k> file and is read only when that batch size is first invoked —
    a bs=1 consumer no longer reads the other shapes' hundreds of MB."""
    model, variables, path = _disc_artifact(tmp_path)
    meta = serve.compile_artifact(path, [1, 3], verbose=False)
    side = serve.aot_sidecar_path(path)
    # Index is metadata-only (the executables are ~MBs even for this
    # small model; the index stays tiny).
    assert os.path.getsize(side) < 64 * 1024
    for bs in (1, 3):
        f = f"{side}.bs{bs}"
        assert os.path.exists(f)
        assert meta["shapes"][str(bs)]["compressed_bytes"] == (
            os.path.getsize(f)
        )
        assert meta["shapes"][str(bs)]["compressed_bytes"] < (
            meta["shapes"][str(bs)]["bytes"]
        )

    entries, why = serve._load_aot_sidecar(path)
    assert why == "ok" and set(entries) == {1, 3}
    # Corrupt bs=3's file AFTER the index load: bs=1 must still execute
    # (proving its sibling file was never read), bs=3 must now fail.
    with open(f"{side}.bs3", "wb") as f:
        f.write(b"garbage")
    a = jnp.zeros((1, 64, 64, 3))
    out = np.asarray(entries[1](a, a))
    assert out.shape == (1, 6, 6, 1)
    with pytest.raises(Exception):
        entries[3](jnp.zeros((3, 64, 64, 3)), jnp.zeros((3, 64, 64, 3)))


def test_aot_sidecar_v1_monolithic_backcompat(tmp_path):
    """Pre-round-5 monolithic sidecars (entries pickled inline in the
    .aotc) still load and execute."""
    import pickle
    import zlib

    model, variables, path = _disc_artifact(tmp_path)
    serve.compile_artifact(path, [2], verbose=False)
    side = serve.aot_sidecar_path(path)
    with open(side, "rb") as f:
        raw = f.read()
    data = pickle.loads(raw[len(serve.AOT_MAGIC):])
    meta = dict(data["meta"])
    blobs = {}
    for bs, info in meta["shapes"].items():
        with open(os.path.join(os.path.dirname(side), info["file"]),
                  "rb") as f:
            blobs[bs] = zlib.decompress(f.read())
        os.remove(os.path.join(os.path.dirname(side), info["file"]))
    meta.pop("format")
    with open(side, "wb") as f:
        f.write(serve.AOT_MAGIC)
        f.write(pickle.dumps({"meta": meta, "entries": blobs}))

    entries, why = serve._load_aot_sidecar(path)
    assert why == "ok" and set(entries) == {2}
    a = jnp.zeros((2, 64, 64, 3))
    want = np.asarray(model.apply(
        variables, jnp.concatenate([a, a], axis=-1), train=False
    ))
    np.testing.assert_allclose(np.asarray(entries[2](a, a)), want,
                               atol=1e-5)
