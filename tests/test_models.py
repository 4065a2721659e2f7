"""Model golden tests: exact parameter counts and I/O shapes from BASELINE.md
(SiameseUNet 41,160,525; UNetGenerator 41,828,995; NLayerDiscriminator
2,768,705; D output 30x30 patch map)."""

import jax
import jax.numpy as jnp
import pytest

from gan_aug_pfa_tpu.models import (
    NLayerDiscriminator,
    SiameseUNet,
    UNetGenerator,
)


def n_params(variables):
    return sum(x.size for x in jax.tree.leaves(variables["params"]))


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


def test_param_counts_abstract(rng):
    """All three golden parameter counts via jax.eval_shape (abstract
    tracing only — no XLA compile), so the quick tier always asserts param
    parity even with the concrete full-model tests re-tiered to medium.
    Reference counts measured from /root/reference/models.py:47,149,212."""
    x = jnp.zeros((1, 32, 32, 3))
    s = jax.eval_shape(
        lambda: SiameseUNet(3, 1).init(rng, x, x, train=False)
    )
    assert n_params(s) == 41_160_525
    g = jax.eval_shape(
        lambda: UNetGenerator(3, 3).init(
            rng, jnp.zeros((1, 128, 128, 3)), train=False
        )
    )
    assert n_params(g) == 41_828_995
    d = jax.eval_shape(
        lambda: NLayerDiscriminator(input_nc=6).init(
            rng, jnp.zeros((1, 256, 256, 6)), train=False
        )
    )
    assert n_params(d) == 2_768_705


@pytest.mark.slow
@pytest.mark.medium
def test_siamese_unet_param_count_and_shape(rng):
    m = SiameseUNet(n_channels=3, n_classes=1)
    x = jnp.zeros((2, 32, 32, 3))
    v = m.init(rng, x, x, train=False)
    assert n_params(v) == 41_160_525
    out = m.apply(v, x, x, train=False)
    assert out.shape == (2, 32, 32, 1)
    assert out.dtype == jnp.float32


def test_siamese_unet_train_mode_updates_batch_stats(rng):
    m = SiameseUNet(3, 1)
    x = jax.random.normal(rng, (2, 32, 32, 3))
    v = m.init(rng, x, x, train=False)
    out, mutated = m.apply(v, x, x, train=True, mutable=["batch_stats"])
    # Running stats must move away from init (two encoder passes both count).
    before = jax.tree.leaves(v["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(
        not jnp.allclose(a, b) for a, b in zip(before, after)
    )


def test_generator_param_count_and_range(rng):
    g = UNetGenerator(input_nc=3, output_nc=3)
    x = jax.random.normal(rng, (1, 128, 128, 3))
    v = g.init(rng, x, train=False)
    assert n_params(v) == 41_828_995
    out = g.apply(v, x, train=False)
    assert out.shape == (1, 128, 128, 3)
    # tanh output in [-1, 1]
    assert jnp.all(out >= -1.0) and jnp.all(out <= 1.0)


def test_small_architecture_knobs(rng):
    """num_downs/ngf/ndf/n_layers (the reference's constructor params,
    models.py:149,212) scale the models down: a num_downs=5 generator
    runs at 32x32, and an n_layers=2 discriminator's patch map follows
    the PatchGAN receptive-field arithmetic."""
    g = UNetGenerator(input_nc=3, output_nc=3, num_downs=5, ngf=16)
    x = jax.random.normal(rng, (1, 32, 32, 3))
    v = g.init(rng, x, train=False)
    out = g.apply(v, x, train=False)
    assert out.shape == (1, 32, 32, 3)

    d = NLayerDiscriminator(input_nc=6, ndf=16, n_layers=2)
    vd = d.init(rng, jnp.zeros((1, 64, 64, 6)), train=False)
    out = d.apply(vd, jnp.zeros((1, 64, 64, 6)), train=False)
    # 64 -> 32 -> 16 (strided) -> 15 (s1 k4 p1) -> 14 (s1 k4 p1)
    assert out.shape == (1, 14, 14, 1)


def test_gan_trainer_small_architecture_step(rng):
    """GANTrainer honors the architecture knobs end to end: one compiled
    D+G step on a num_downs=5 / 32x32 configuration."""
    import numpy as np

    from gan_aug_pfa_tpu.config import GANTrainConfig
    from gan_aug_pfa_tpu.train import GANTrainer

    cfg = GANTrainConfig(
        batch_size=2, target_size=(32, 32), compute_dtype="float32",
        num_downs=5, ngf=8, ndf=8, n_layers=2,
    )
    tr = GANTrainer(cfg)
    sg, sd = tr.init_states(jax.random.PRNGKey(0))
    r = np.random.RandomState(0)
    a = jnp.asarray(r.rand(4, 32, 32, 3).astype(np.float32))
    b = jnp.asarray(r.rand(4, 32, 32, 3).astype(np.float32))
    sg, sd, ld, lg = tr._gan_step(
        sg, sd, a, b, jnp.asarray([0, 1], dtype=jnp.int32)
    )
    assert jnp.isfinite(ld) and jnp.isfinite(lg)


def test_shared_gen_fwd_step_equivalence(rng):
    """--shared-gen-fwd (one jax.vjp generator forward reused by both
    sub-steps) must match the two-forward reference path: identical
    losses, G/D params equal after one step, and the algebraically
    reconstructed second BN running-stat update within float noise of
    the direct double update (train/gan.py)."""
    import numpy as np

    from gan_aug_pfa_tpu.config import GANTrainConfig
    from gan_aug_pfa_tpu.train import GANTrainer

    base = dict(
        batch_size=2, target_size=(32, 32), compute_dtype="float32",
        num_downs=5, ngf=8, ndf=8, n_layers=2,
    )
    r = np.random.RandomState(0)
    a = jnp.asarray(r.rand(4, 32, 32, 3).astype(np.float32))
    b = jnp.asarray(r.rand(4, 32, 32, 3).astype(np.float32))
    idx = jnp.asarray([0, 1], dtype=jnp.int32)

    results = {}
    for shared in (False, True):
        tr = GANTrainer(GANTrainConfig(shared_gen_fwd=shared, **base))
        sg, sd = tr.init_states(jax.random.PRNGKey(0))
        for _ in range(2):  # two steps so step 2 consumes step 1's stats
            sg, sd, ld, lg = tr._gan_step(sg, sd, a, b, idx)
        results[shared] = (sg, sd, float(ld), float(lg))

    (sg0, sd0, ld0, lg0), (sg1, sd1, ld1, lg1) = results[False], results[True]
    assert abs(ld0 - ld1) < 1e-6 and abs(lg0 - lg1) < 1e-5
    for t0, t1 in ((sg0.params, sg1.params), (sd0.params, sd1.params)):
        for x0, x1 in zip(jax.tree.leaves(t0), jax.tree.leaves(t1)):
            np.testing.assert_allclose(
                np.asarray(x0), np.asarray(x1), rtol=2e-4, atol=2e-6
            )
    for x0, x1 in zip(
        jax.tree.leaves(sg0.batch_stats), jax.tree.leaves(sg1.batch_stats)
    ):
        np.testing.assert_allclose(
            np.asarray(x0), np.asarray(x1), rtol=1e-4, atol=1e-6
        )


def test_discriminator_param_count_and_patch_shape(rng):
    d = NLayerDiscriminator(input_nc=6)
    # 256x256 input -> the golden 30x30 patch-logit map (BASELINE.md).
    v = d.init(rng, jnp.zeros((1, 256, 256, 6)), train=False)
    assert n_params(v) == 2_768_705
    out = d.apply(v, jnp.zeros((1, 256, 256, 6)), train=False)
    assert out.shape == (1, 30, 30, 1)


def test_discriminator_pair_input_equivalence(rng):
    """Concat-free pair input (A, B): identical param tree to the concat
    path, and patch logits match to fp reassociation noise (the first conv
    runs as a split-kernel sum — models/pix2pix.py)."""
    import numpy as np

    d = NLayerDiscriminator(input_nc=6)
    r = np.random.RandomState(0)
    a = jnp.asarray(r.rand(2, 64, 64, 3).astype(np.float32))
    b = jnp.asarray(r.rand(2, 64, 64, 3).astype(np.float32))
    x = jnp.concatenate([a, b], axis=-1)
    v = d.init(rng, x, train=False)
    v_pair = d.init(rng, (a, b), train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        v_pair
    )
    for p, q in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(v_pair)):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(q))

    out = d.apply(v, x, train=False)
    out_pair = d.apply(v, (a, b), train=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_pair), atol=2e-5
    )
    ot, _ = d.apply(v, x, train=True, mutable=["batch_stats"])
    opt_, _ = d.apply(v, (a, b), train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ot), np.asarray(opt_), atol=2e-4)


def test_siamese_shared_encoder_is_symmetric(rng):
    """Swapping inputs must swap which branch sees what, with identical
    encoder weights (weight sharing is structural)."""
    m = SiameseUNet(3, 1)
    a = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    v = m.init(rng, a, a, train=False)
    out_same = m.apply(v, a, a, train=False)
    assert out_same.shape == (1, 32, 32, 1)
    # One parameter set only (no _2 copies): encoder param tree has exactly
    # the 5 down blocks.
    enc_keys = [k for k in v["params"] if k.startswith("dconv_down")]
    assert len(enc_keys) == 4


def test_siamese_unet_multispectral_13band(rng):
    """n_channels is configurable (the reference fixes 3 and carries a dead
    Sentinel-2 13-band branch, evaluate.py:73-75; here it's live)."""
    import jax.numpy as jnp

    from gan_aug_pfa_tpu.models import SiameseUNet

    model = SiameseUNet(n_channels=13, n_classes=1)
    x = jnp.zeros((1, 32, 32, 13), jnp.float32)
    variables = model.init(rng, x, x, train=False)
    out = model.apply(variables, x, x, train=False)
    assert out.shape == (1, 32, 32, 1)


def test_batched_encoder_eval_equivalence(rng):
    """batched_encoder=True: identical param tree, identical eval-mode
    forward (running-stat BN) — only train-mode batch statistics differ."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gan_aug_pfa_tpu.models import SiameseUNet

    two = SiameseUNet(n_channels=3, n_classes=1)
    one = SiameseUNet(n_channels=3, n_classes=1, batched_encoder=True)
    r = np.random.RandomState(0)
    x1 = jnp.asarray(r.rand(2, 16, 16, 3).astype(np.float32))
    x2 = jnp.asarray(r.rand(2, 16, 16, 3).astype(np.float32))
    v = two.init(rng, x1, x2, train=False)
    # Same tree structure -> same variables work for both.
    a = two.apply(v, x1, x2, train=False)
    b = one.apply(v, x1, x2, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # Train mode runs and updates batch stats (values differ by design).
    out, mut = one.apply(v, x1, x2, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 16, 16, 1)
    leaves_before = jax.tree_util.tree_leaves(v["batch_stats"])
    leaves_after = jax.tree_util.tree_leaves(mut["batch_stats"])
    assert any(
        not np.allclose(x, y) for x, y in zip(leaves_before, leaves_after)
    )


@pytest.mark.slow
def test_concat_free_forward_and_grad_equivalence(rng):
    """concat_free=True: identical param tree; forward (train and eval
    modes) and parameter gradients match the concat path to fp
    reassociation noise (SlicedConv: conv(concat(xs), W) == summed
    per-slice convs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gan_aug_pfa_tpu.models import SiameseUNet

    base = SiameseUNet(n_channels=3, n_classes=1)
    # batched_encoder deliberately OFF: its train-mode BN is joint over
    # both images (different grads by design); concat_free alone must be
    # gradient-equivalent.
    fast = SiameseUNet(n_channels=3, n_classes=1, concat_free=True)
    r = np.random.RandomState(1)
    x1 = jnp.asarray(r.rand(2, 16, 16, 3).astype(np.float32))
    x2 = jnp.asarray(r.rand(2, 16, 16, 3).astype(np.float32))
    v = base.init(rng, x1, x2, train=False)
    v_fast = fast.init(rng, x1, x2, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        v_fast
    )
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(v_fast)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    a = base.apply(v, x1, x2, train=False)
    b = fast.apply(v, x1, x2, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    at, _ = base.apply(v, x1, x2, train=True, mutable=["batch_stats"])
    bt, _ = fast.apply(v, x1, x2, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(at), np.asarray(bt), atol=2e-4)

    # Gradient equivalence is asserted in f64, where fp reassociation
    # cannot flip knife-edge ReLU/pool masks: the two paths are then
    # identical to ~1e-12 relative (in f32 isolated mask flips produce
    # sparse discrete grad diffs — a compilation-level artifact, the same
    # kind XLA fusion changes cause).
    base64 = SiameseUNet(n_channels=3, n_classes=1, dtype=jnp.float64)
    fast64 = SiameseUNet(n_channels=3, n_classes=1, dtype=jnp.float64,
                         concat_free=True)
    with jax.enable_x64(True):
        x1d, x2d = x1.astype(jnp.float64), x2.astype(jnp.float64)
        vd = jax.tree_util.tree_map(
            lambda t: jnp.asarray(np.asarray(t), jnp.float64), v
        )

        def loss(params, model):
            out, _ = model.apply(
                {"params": params, "batch_stats": vd["batch_stats"]},
                x1d, x2d, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out ** 2)

        g_base = jax.grad(loss)(vd["params"], base64)
        g_fast = jax.grad(loss)(vd["params"], fast64)
        d2 = n2 = 0.0
        for ga, gb in zip(jax.tree_util.tree_leaves(g_base),
                          jax.tree_util.tree_leaves(g_fast)):
            d2 += float(jnp.sum((ga - gb) ** 2))
            n2 += float(jnp.sum(gb ** 2))
        assert (d2 / n2) ** 0.5 < 1e-9


@pytest.mark.slow
@pytest.mark.medium
def test_remat_forward_and_grad_equivalence(rng):
    """remat=True (jax.checkpoint on each DoubleConv): identical param
    tree, identical eval/train forwards, and parameter gradients equal to
    the non-remat model (remat recomputes, it does not change math)."""
    import numpy as np

    base = SiameseUNet(n_channels=3, n_classes=1)
    rem = SiameseUNet(n_channels=3, n_classes=1, remat=True)
    r = np.random.RandomState(2)
    x1 = jnp.asarray(r.rand(2, 16, 16, 3).astype(np.float32))
    x2 = jnp.asarray(r.rand(2, 16, 16, 3).astype(np.float32))
    v = base.init(rng, x1, x2, train=False)
    v_r = rem.init(rng, x1, x2, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        v_r
    )
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v_r)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    np.testing.assert_allclose(
        np.asarray(base.apply(v, x1, x2, train=False)),
        np.asarray(rem.apply(v, x1, x2, train=False)),
        atol=1e-6,
    )
    at, sa = base.apply(v, x1, x2, train=True, mutable=["batch_stats"])
    bt, sb = rem.apply(v, x1, x2, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(at), np.asarray(bt), atol=1e-6)
    for a, b in zip(jax.tree.leaves(sa), jax.tree.leaves(sb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def loss(variables, model):
        out, _ = model.apply(variables, x1, x2, train=True,
                             mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    g_base = jax.grad(loss)(v, base)["params"]
    g_rem = jax.grad(loss)(v, rem)["params"]
    for a, b in zip(jax.tree.leaves(g_base), jax.tree.leaves(g_rem)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
