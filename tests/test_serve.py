"""Serving-export tests: artifact round trip, dynamic batch, output parity
with the live model, platform checking, and the CLI.

The reference has no serving path (SURVEY.md §5 — inference scripts
rebuild the model per run); these tests cover the [extension]
jax.export-based artifact subsystem (gan_aug_pfa_tpu/serve.py)."""

import json
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
