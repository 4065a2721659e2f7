"""Torch .pth checkpoint interop (gan_aug_pfa_tpu/interop.py).

Fast tier: flax -> torch-state-dict -> flax round trips are bitwise, and
arch auto-detection works from key structure alone.  Reference-gated tier
(slow, needs /root/reference): a real torch state_dict produced by the
reference models loads strict=True from our export, and imported weights
give logit parity."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_aug_pfa_tpu import interop
from gan_aug_pfa_tpu.models import (
    NLayerDiscriminator,
    SiameseUNet,
    UNetGenerator,
)

HAS_REFERENCE = os.path.isdir("/root/reference")


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(la) == len(lb)
    for path, leaf in la:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(lb[path]), err_msg=str(path))


def _init_vars(model, *shapes):
    xs = [jnp.zeros(s, jnp.float32) for s in shapes]
    v = model.init(jax.random.PRNGKey(0), *xs, train=False)
    # Randomize so round-trip equality is meaningful (init has many zeros).
    flat, treedef = jax.tree_util.tree_flatten(v)
    rngs = jax.random.split(jax.random.PRNGKey(1), len(flat))
    flat = [jax.random.normal(k, l.shape, l.dtype) if l.dtype == jnp.float32
            else l for k, l in zip(rngs, flat)]
    return jax.tree_util.tree_unflatten(treedef, flat)


@pytest.mark.slow
def test_siamese_round_trip_bitwise():
    v = _init_vars(SiameseUNet(n_channels=3, n_classes=1),
                   (1, 32, 32, 3), (1, 32, 32, 3))
    sd = interop.siamese_to_torch(v)
    assert interop.detect_arch(sd) == "siamese"
    back = interop.siamese_from_torch(sd)
    _tree_equal({"params": v["params"], "batch_stats": v["batch_stats"]},
                back)


@pytest.mark.slow
def test_generator_round_trip_bitwise():
    v = _init_vars(UNetGenerator(3, 3), (1, 128, 128, 3))
    sd = interop.generator_to_torch(v)
    assert interop.detect_arch(sd) == "generator"
    back = interop.generator_from_torch(sd)
    _tree_equal({"params": v["params"], "batch_stats": v["batch_stats"]},
                back)


def test_discriminator_round_trip_bitwise():
    v = _init_vars(NLayerDiscriminator(6), (1, 64, 64, 6))
    sd = interop.discriminator_to_torch(v)
    assert interop.detect_arch(sd) == "discriminator"
    back = interop.discriminator_from_torch(sd)
    _tree_equal({"params": v["params"], "batch_stats": v["batch_stats"]},
                back)


def test_detect_arch_rejects_unknown():
    with pytest.raises(ValueError, match="unrecognized"):
        interop.detect_arch({"foo.weight": np.zeros((1,))})


def test_pth_file_round_trip_and_checkpoint_restore(tmp_path):
    """save_torch_state_dict -> restore via checkpoint.restore_model_only
    (the eval/generate load path) recovers the exact variables."""
    from gan_aug_pfa_tpu import checkpoint as ckpt

    model = NLayerDiscriminator(6)
    v = _init_vars(model, (1, 64, 64, 6))
    p = str(tmp_path / "discriminator_epoch_1.pth")
    interop.save_torch_state_dict(p, interop.discriminator_to_torch(v))
    got = ckpt.restore_model_only(p, v)
    _tree_equal({"params": v["params"], "batch_stats": v["batch_stats"]},
                got)
    # find_checkpoint falls back to the .pth when no .msgpack exists.
    assert ckpt.find_checkpoint(str(tmp_path),
                                "discriminator_epoch_1") == p


@pytest.mark.slow
@pytest.mark.skipif(not HAS_REFERENCE, reason="needs /root/reference")
def test_reference_strict_load_and_logit_parity(tmp_path):
    """Export loads into the actual reference models with strict=True, and
    a reference-trained state dict imports with logit parity (generator +
    discriminator; the Siamese path is covered by
    scripts/check_forward_parity.py)."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    import models as ref_models

    torch.manual_seed(0)
    tgen = ref_models.UNetGenerator(3, 3, num_downs=7, ngf=64)
    tdisc = ref_models.NLayerDiscriminator(6, ndf=64, n_layers=3)
    with torch.no_grad():
        for m in list(tgen.modules()) + list(tdisc.modules()):
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    tgen.eval()
    tdisc.eval()

    # Import: reference .pth -> flax, logits must match.
    gp = str(tmp_path / "generator_epoch_9.pth")
    torch.save(tgen.state_dict(), gp)
    gvars = interop.variables_from_torch_file(gp)
    x = np.random.RandomState(0).rand(1, 128, 128, 3).astype(np.float32)
    jg = np.asarray(UNetGenerator(3, 3).apply(
        jax.tree.map(jnp.asarray, gvars), jnp.asarray(x), train=False))
    with torch.no_grad():
        tg = tgen(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    assert np.abs(np.transpose(jg, (0, 3, 1, 2)) - tg).max() < 5e-3

    dpth = str(tmp_path / "discriminator_epoch_9.pth")
    torch.save(tdisc.state_dict(), dpth)
    dvars = interop.variables_from_torch_file(dpth)
    xx = np.concatenate([x, x], axis=-1)
    jd = np.asarray(NLayerDiscriminator(6).apply(
        jax.tree.map(jnp.asarray, dvars), jnp.asarray(xx), train=False))
    with torch.no_grad():
        td = tdisc(torch.from_numpy(
            np.transpose(xx, (0, 3, 1, 2)))).numpy()
    assert np.abs(np.transpose(jd, (0, 3, 1, 2)) - td).max() < 5e-3

    # Export: flax -> .pth loads strict=True into the reference modules.
    tgen.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
         interop.generator_to_torch(gvars).items()}, strict=True)
    tdisc.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
         interop.discriminator_to_torch(dvars).items()}, strict=True)

    # Siamese export strict-load too.
    tsia = ref_models.SiameseUNet(n_channels=3, n_classes=1)
    sp = str(tmp_path / "best_model.pth")
    torch.save(tsia.state_dict(), sp)
    svars = interop.variables_from_torch_file(sp)
    tsia.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
         interop.siamese_to_torch(svars).items()}, strict=True)
