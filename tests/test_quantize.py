"""Weight-only int8 quantization tests (gan_aug_pfa_tpu/quantize.py and
the quantized serving-export path in serve.py).

The reference has no quantization or deployment subsystem (SURVEY.md §5);
this is an [extension].  Covered: the per-channel error bound, tree
walking / leaf selection, artifact round trip (format v2 with a weights
section), output parity of a quantized artifact against the local
dequantized model, and that plain format-v1 artifacts still load."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_aug_pfa_tpu import quantize as qz
from gan_aug_pfa_tpu import serve
from gan_aug_pfa_tpu.models.pix2pix import NLayerDiscriminator


def test_quantize_array_error_bound():
    rng = np.random.RandomState(0)
    w = (rng.randn(3, 3, 64, 128) * rng.rand() * 5).astype(np.float32)
    node = qz.quantize_array(w)
    assert node[qz.QKEY].dtype == np.int8
    assert node[qz.SKEY].shape == (128,)
    back = np.asarray(qz.dequantize_array(node))
    # symmetric rounding guarantees |err| <= scale/2 per element
    assert np.all(np.abs(back - w) <= node[qz.SKEY] * 0.5 + 1e-7)
    # relative RMS error of int8 per-channel quantization on gaussian
    # weights: step = max|w|/127 ~ 3.2 sigma/127, rms = step/sqrt(12)
    # ~ 0.73% of sigma
    rel = np.linalg.norm(back - w) / np.linalg.norm(w)
    assert rel < 0.01


def test_dequantize_bf16_rounds_once():
    """bfloat16 dequant must equal round_to_bf16(fp32 dequant) — the
    multiply runs in fp32 and only the result is cast, so the scales are
    never themselves rounded to bf16 (which would double the error)."""
    rng = np.random.RandomState(3)
    w = rng.randn(3, 3, 16, 32).astype(np.float32)
    node = qz.quantize_array(w)
    f32 = np.asarray(qz.dequantize_array(node, np.float32))
    bf16 = np.asarray(
        qz.dequantize_array(
            jax.tree_util.tree_map(jnp.asarray, node), jnp.bfloat16
        )
    )
    assert bf16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        bf16, jnp.asarray(f32).astype(jnp.bfloat16)
    )


def test_quantize_array_zero_channel():
    w = np.zeros((3, 3, 8, 4), np.float32)
    w[..., 1] = 1.0
    node = qz.quantize_array(w)
    assert np.all(np.isfinite(node[qz.SKEY]))
    np.testing.assert_array_equal(np.asarray(qz.dequantize_array(node)), w)


def test_quantize_tree_leaf_selection():
    tree = {
        "params": {
            "conv": {"kernel": np.ones((3, 3, 32, 64), np.float32),
                     "bias": np.ones((64,), np.float32)},
            "tiny": {"kernel": np.ones((1, 1, 4, 4), np.float32)},
        },
        "batch_stats": {"mean": np.zeros((64,), np.float32)},
    }
    qtree, report = qz.quantize_tree(tree, min_elems=4096)
    assert qz.is_qleaf(qtree["params"]["conv"]["kernel"])
    # bias (1-D), tiny kernel (< min_elems), batch stats: kept fp
    assert isinstance(qtree["params"]["conv"]["bias"], np.ndarray)
    assert isinstance(qtree["params"]["tiny"]["kernel"], np.ndarray)
    assert isinstance(qtree["batch_stats"]["mean"], np.ndarray)
    assert report["quantized"] == 1 and report["kept_fp"] == 3
    assert report["bytes_q"] < report["bytes_fp"]
    assert qz.max_reconstruction_error(tree, qtree) <= 0.5 + 1e-6
    back = qz.dequantize_tree(qtree)
    assert jax.tree_util.tree_structure(back) == (
        jax.tree_util.tree_structure(tree)
    )


def test_quantized_discriminator_close_to_fp():
    """End-to-end numeric impact: quantized-weights forward stays close to
    the fp forward on a real model (5 conv layers, BN)."""
    model = NLayerDiscriminator(input_nc=6)
    h = w = 64
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 6)), train=False
    )
    qtree, report = qz.quantize_tree(
        jax.tree_util.tree_map(np.asarray, variables)
    )
    assert report["quantized"] >= 4  # the big conv kernels
    deq = qz.dequantize_tree(qtree, jnp.float32)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (2, h, w, 6), minval=-1, maxval=1
    )
    want = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(model.apply(deq, x, train=False))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.05, f"int8 relative output error {rel:.4f}"
    # ranking/sign structure preserved
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.995


def test_quantized_artifact_roundtrip(tmp_path):
    """Format-v2 artifact: export quantized, save, load in the plain
    loader API, outputs must be bit-identical to applying the locally
    dequantized tree (the artifact runs the same dequant + conv program)."""
    model = NLayerDiscriminator(input_nc=6)
    h = w = 64
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 6)), train=False
    )
    exported, qtree, report = serve.export_model_quantized(
        "discriminator", variables, h, w
    )
    path = str(tmp_path / "disc_int8.ghlo")
    serve.save_artifact(
        path, exported,
        {"arch": "discriminator", "quantize": "int8",
         "quantize_report": report},
        weights=qtree,
    )
    header, fn = serve.load_serving_fn(path)
    assert header["format_version"] == 2
    assert header["quantize"] == "int8"
    assert "_weights" not in header  # consumed by the closure

    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    for bs in (1, 3):  # dynamic batch preserved under quantization
        a = jax.random.uniform(k1, (bs, h, w, 3), minval=-1, maxval=1)
        b = jax.random.uniform(k2, (bs, h, w, 3), minval=-1, maxval=1)
        got = np.asarray(fn(a, b))
        deq = qz.dequantize_tree(qtree, jnp.float32)
        want = np.asarray(model.apply(
            deq, jnp.concatenate([a, b], axis=-1), train=False
        ))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_quantized_artifact_smaller_on_disk(tmp_path):
    model = NLayerDiscriminator(input_nc=6)
    h = w = 64
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 6)), train=False
    )
    import os

    fp = serve.export_model("discriminator", variables, h, w)
    p1 = str(tmp_path / "fp.ghlo")
    serve.save_artifact(p1, fp, {"arch": "discriminator"})

    exported, qtree, _ = serve.export_model_quantized(
        "discriminator", variables, h, w
    )
    p2 = str(tmp_path / "q.ghlo")
    serve.save_artifact(p2, exported, {"arch": "discriminator"},
                        weights=qtree)
    # 2.77M params: 11.1 MB fp32 baked vs ~2.8 MB int8 + small program
    assert os.path.getsize(p2) < 0.45 * os.path.getsize(p1)

    # format v1 artifacts still load fine through the same API
    header, fn = serve.load_serving_fn(p1)
    assert header["format_version"] == 1
    a = jnp.zeros((1, h, w, 3))
    assert np.asarray(fn(a, a)).shape == (1, 6, 6, 1)


@pytest.mark.slow
def test_export_cli_quantized(tmp_path):
    """CLI path: --quantize int8 writes a v2 artifact that loads and runs."""
    import subprocess
    import sys

    from gan_aug_pfa_tpu import checkpoint as ckpt
    from gan_aug_pfa_tpu.config import GANTrainConfig
    from gan_aug_pfa_tpu.train.gan import GANTrainer

    cfg = GANTrainConfig(target_size=(64, 64))
    trainer = GANTrainer(cfg)
    _, sd = trainer.init_states(jax.random.PRNGKey(0))
    ckpt_path = str(tmp_path / "discriminator_epoch_1.msgpack")
    ckpt.save_checkpoint(ckpt_path, sd, model_only=True)

    out = str(tmp_path / "disc_int8.ghlo")
    r = subprocess.run(
        [sys.executable, "export_model.py",
         "--checkpoint-path", ckpt_path, "--output", out,
         "--target-size", "64x64", "--platform", "cpu",
         "--quantize", "int8", "--backend", "cpu"],
        capture_output=True, text=True, cwd=".", timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert "int8 weight-only" in r.stdout
    header, fn = serve.load_serving_fn(out)
    assert header["quantize"] == "int8"
    assert header["quantize_report"]["quantized"] >= 4
    a = jnp.zeros((1, 64, 64, 3))
    assert np.asarray(fn(a, a)).shape == (1, 6, 6, 1)
