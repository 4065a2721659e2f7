"""Pix2Pix GAN training: the alternating D/G optimization as ONE compiled
step (reference train_gan.py:41-75).

Semantics preserved from the reference's torch loop, in order:
  D-step: fake_B = stop_gradient(G(A));
          loss_D = 0.5 * (BCE(D(A,B),1) + BCE(D(A,fake),0)); update D.
          (G's forward in the D-step still updates G's BatchNorm running
          stats, as torch's gen(A).detach() does.)
  G-step: uses the UPDATED discriminator (torch applied opt_d.step() first);
          loss_G = BCE(D(A,G(A)),1) + lambda_L1 * L1(G(A), B); update G.

BatchNorm running stats are threaded through every apply in the same order
as torch executes the forwards (G, D, D in the D-step; G, D in the G-step).

The whole thing — both gradients, both optimizer updates, five forwards —
is a single XLA program with donated states; at the reference's 256x256
batch-1 workload this is entirely compute-bound on the MXU.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax.training import train_state

from ..config import GANTrainConfig
from ..data.transforms import normalize
from ..losses import gan_bce_loss, l1_loss
from ..models import NLayerDiscriminator, UNetGenerator
from ..parallel.mesh import batch_sharding, replicate_sharding
from .optim import make_optimizer


class GANState(train_state.TrainState):
    batch_stats: Any = None
    # EMA of params (generator only, config.ema_decay) — None when disabled
    # so existing checkpoints/programs are unchanged.
    ema_params: Any = None


class GANTrainer:
    def __init__(self, config: GANTrainConfig, mesh=None):
        self.config = config
        self.mesh = mesh
        # Optional per-step profiler (utils/profiling.StepTimer), attached
        # by the pipeline when config.profile_dir is set.
        self.step_timer = None
        dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else (
            jnp.float32
        )
        nc = config.n_channels
        self.generator = UNetGenerator(
            input_nc=nc, output_nc=nc, num_downs=config.num_downs,
            ngf=config.ngf, dtype=dtype,
        )
        self.discriminator = NLayerDiscriminator(
            input_nc=nc * 2, ndf=config.ndf, n_layers=config.n_layers,
            dtype=dtype,
        )
        self.tx_g = make_optimizer(
            "adam", config.learning_rate_g, b1=config.beta1,
            mu_dtype=config.opt_momentum_dtype,
            flat_state=config.opt_flat_state,
        )
        self.tx_d = make_optimizer(
            "adam", config.learning_rate_d, b1=config.beta1,
            mu_dtype=config.opt_momentum_dtype,
            flat_state=config.opt_flat_state,
        )

    def init_states(self, rng: jax.Array) -> Tuple[GANState, GANState]:
        h, w = self.config.target_size
        kg, kd = jax.random.split(rng)
        dummy = jnp.zeros((1, h, w, self.config.n_channels), jnp.float32)
        vg = self.generator.init(kg, dummy, train=False)
        vd = self.discriminator.init(
            kd, jnp.concatenate([dummy, dummy], axis=-1), train=False
        )
        ema = None
        if self.config.ema_decay is not None:
            # Distinct buffers: params are donated into the step programs,
            # so the EMA tree must never alias them.
            ema = jax.tree.map(jnp.copy, vg["params"])
        sg = GANState.create(
            apply_fn=self.generator.apply, params=vg["params"], tx=self.tx_g,
            batch_stats=vg["batch_stats"], ema_params=ema,
        )
        sd = GANState.create(
            apply_fn=self.discriminator.apply, params=vd["params"],
            tx=self.tx_d, batch_stats=vd["batch_stats"],
        )
        if self.mesh is not None:
            if self.mesh.shape.get("model", 1) > 1:
                # Tensor parallelism over 'model' (see parallel/mesh.py).
                from ..parallel.mesh import param_shardings

                sg = jax.device_put(sg, param_shardings(self.mesh, sg))
                sd = jax.device_put(sd, param_shardings(self.mesh, sd))
            else:
                sg = jax.device_put(sg, replicate_sharding(self.mesh))
                sd = jax.device_put(sd, replicate_sharding(self.mesh))
        return sg, sd

    # ------------------------------------------------------------------

    def _gen_apply(self, params, batch_stats, x, train: bool):
        if train:
            out, mut = self.generator.apply(
                {"params": params, "batch_stats": batch_stats}, x,
                train=True, mutable=["batch_stats"],
            )
            return out, mut["batch_stats"]
        out = self.generator.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        return out, batch_stats

    def _disc_apply(self, params, batch_stats, a, b, train: bool):
        if self.config.concat_free_disc:
            # Pair input: D's first conv runs as a split-kernel sum, no
            # 6-channel concat materialized in HBM (models/pix2pix.py).
            x = (a, b)
        else:
            x = jnp.concatenate([a, b], axis=-1)
        if train:
            out, mut = self.discriminator.apply(
                {"params": params, "batch_stats": batch_stats}, x,
                train=True, mutable=["batch_stats"],
            )
            return out, mut["batch_stats"]
        out = self.discriminator.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        return out, batch_stats

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def _gan_step(self, state_g: GANState, state_d: GANState, ds1, ds2, idx):
        """Single fused step (one host dispatch) — used under per-step
        profiling; epochs normally run via _gan_epoch_scan."""
        return self._gan_step_impl(state_g, state_d, ds1, ds2, idx)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def _gan_epoch_scan(self, state_g: GANState, state_d: GANState, ds1, ds2,
                        idx_mat):
        """A whole GAN epoch as ONE compiled lax.scan over the (n_steps, B)
        index matrix — at the reference's bs=1, 14-samples-per-epoch
        workload, per-step dispatch would dominate wall clock."""

        def body(carry, idx):
            sg, sd = carry
            sg, sd, ld, lg = self._gan_step_impl(sg, sd, ds1, ds2, idx)
            return (sg, sd), (ld, lg)

        (state_g, state_d), (ld, lg) = jax.lax.scan(
            body, (state_g, state_d), idx_mat
        )
        return state_g, state_d, ld, lg

    def _gan_step_impl(self, state_g: GANState, state_d: GANState, ds1, ds2,
                       idx):
        """Fused gather + D-step + G-step (traced body).  ds1/ds2: full
        dataset arrays in [0,1]; idx: (B,) batch indices."""
        return self._gan_batch_impl(
            state_g, state_d,
            jnp.take(ds1, idx, axis=0), jnp.take(ds2, idx, axis=0),
        )

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def _gan_step_batch(self, state_g: GANState, state_d: GANState,
                        img1, img2):
        """One D+G step on a host-staged [0,1] batch (streaming path)."""
        return self._gan_batch_impl(state_g, state_d, img1, img2)

    def _gan_batch_impl(self, state_g: GANState, state_d: GANState,
                        a01, b01):
        """D-step + G-step on an already-materialized [0,1] batch — shared
        by the gather-from-HBM steps and the streaming path, so both are
        the same compiled math."""
        real_a = normalize(a01)
        real_b = normalize(b01)
        real_a, real_b = self._constrain_spatial(real_a, real_b)

        # --- D step -----------------------------------------------------
        # G forward (train mode: BN stats update; gradients stopped).
        gvjp = None
        if self.config.shared_gen_fwd:
            # [extension --shared-gen-fwd] ONE generator forward serves
            # both sub-steps.  The reference computes G(A) twice with
            # identical params/input (train_gan.py:57, 66) — the outputs
            # are identical because train-mode BN normalizes with batch
            # statistics, never the running stats.  jax.vjp keeps the
            # forward's residuals so the G-step only needs the backward.
            fake_b_live, gvjp, g_bs = jax.vjp(
                lambda p: self._gen_apply(
                    p, state_g.batch_stats, real_a, train=True
                ),
                state_g.params, has_aux=True,
            )
            fake_b = jax.lax.stop_gradient(fake_b_live)
        else:
            fake_b, g_bs = self._gen_apply(
                state_g.params, state_g.batch_stats, real_a, train=True
            )
            fake_b = jax.lax.stop_gradient(fake_b)

        if self.config.batched_disc:
            # One 2B discriminator pass over [real | fake] (~8% faster
            # step).  Deviation from the reference: D's BatchNorm batch
            # statistics mix real and fake activations — a known GAN
            # behavior change, hence opt-in.
            def d_loss_fn(d_params):
                a2 = jnp.concatenate([real_a, real_a], axis=0)
                b2 = jnp.concatenate([real_b, fake_b], axis=0)
                pred, d_bs = self._disc_apply(
                    d_params, state_d.batch_stats, a2, b2, train=True
                )
                nb = real_a.shape[0]
                loss_real = gan_bce_loss(pred[:nb], True)
                loss_fake = gan_bce_loss(pred[nb:], False)
                return (loss_real + loss_fake) * 0.5, d_bs
        else:
            # Reference semantics: two sequential D passes
            # (train_gan.py:57-60), BN stats updated per pass.
            def d_loss_fn(d_params):
                pred_real, d_bs = self._disc_apply(
                    d_params, state_d.batch_stats, real_a, real_b, train=True
                )
                pred_fake, d_bs = self._disc_apply(
                    d_params, d_bs, real_a, fake_b, train=True
                )
                loss_real = gan_bce_loss(pred_real, True)
                loss_fake = gan_bce_loss(pred_fake, False)
                return (loss_real + loss_fake) * 0.5, d_bs

        (loss_d, d_bs), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state_d.params)
        state_d = state_d.apply_gradients(grads=d_grads, batch_stats=d_bs)

        # --- G step (against the UPDATED discriminator) -------------------
        if self.config.shared_gen_fwd:
            # Downstream loss as a function of the shared primal; its
            # cotangent pulls back through the saved G residuals.  Same
            # chain rule as value_and_grad over g_params (identical
            # residuals and cotangents), minus one full G forward.
            def g_out_loss(fake):
                pred_fake, d_bs2 = self._disc_apply(
                    state_d.params, state_d.batch_stats, real_a, fake,
                    train=True,
                )
                loss_gan = gan_bce_loss(pred_fake, True)
                loss_l1 = l1_loss(fake, real_b) * self.config.lambda_l1
                return loss_gan + loss_l1, d_bs2

            (loss_g, d_bs2), dfake = jax.value_and_grad(
                g_out_loss, has_aux=True
            )(fake_b_live)
            (g_grads,) = gvjp(dfake)
            # The reference's second train-mode G forward applies the BN
            # EMA again with the SAME batch moments (same input, same
            # params).  With s1 = m*s0 + (1-m)*bm (flax momentum m=0.9),
            # the second update is s2 = m*s1 + (1-m)*bm = (1+m)*s1 - m*s0
            # — exact in reals, ~1e-7 relative float deviation.
            m = 0.9
            g_bs2 = jax.tree.map(
                lambda s1, s0: (1.0 + m) * s1 - m * s0,
                g_bs, state_g.batch_stats,
            )
        else:
            def g_loss_fn(g_params):
                fake, g_bs2 = self._gen_apply(
                    g_params, g_bs, real_a, train=True
                )
                pred_fake, d_bs2 = self._disc_apply(
                    state_d.params, state_d.batch_stats, real_a, fake,
                    train=True,
                )
                loss_gan = gan_bce_loss(pred_fake, True)
                loss_l1 = l1_loss(fake, real_b) * self.config.lambda_l1
                return loss_gan + loss_l1, (g_bs2, d_bs2)

            (loss_g, (g_bs2, d_bs2)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(state_g.params)
        state_g = state_g.apply_gradients(grads=g_grads, batch_stats=g_bs2)
        if self.config.ema_decay is not None:
            d = self.config.ema_decay
            state_g = state_g.replace(ema_params=jax.tree.map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                state_g.ema_params, state_g.params,
            ))
        state_d = state_d.replace(batch_stats=d_bs2)
        return state_g, state_d, loss_d, loss_g

    @functools.partial(jax.jit, static_argnums=0)
    def generate(self, state_g: GANState, img1):
        """Inference: [0,1] input -> [0,1] output (the x*0.5+0.5 denormalize
        of reference generate_synthetic_data.py:70-71 folded in)."""
        fake, _ = self._gen_apply(
            state_g.params, state_g.batch_stats, normalize(img1), train=False
        )
        return fake * 0.5 + 0.5

    # ------------------------------------------------------------------

    def _constrain_spatial(self, a, b):
        """Constrain the gathered batch's shardings: batch over 'data'
        (works inside lax.scan too) and feature-map H over an optional
        'spatial' axis (XLA inserts the conv halo exchanges) — same scheme
        as the Siamese trainer; relevant at 256x256 and beyond."""
        if self.mesh is None:
            return a, b
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = (
            "data" if a.shape[0] % self.mesh.shape.get("data", 1) == 0
            else None
        )
        spatial = "spatial" if "spatial" in self.mesh.shape else None
        if data is None and spatial is None:
            return a, b
        s = NamedSharding(self.mesh, P(data, spatial, None, None))
        return (
            jax.lax.with_sharding_constraint(a, s),
            jax.lax.with_sharding_constraint(b, s),
        )

    def _put_idx(self, idx: np.ndarray):
        idx = jnp.asarray(idx, dtype=jnp.int32)
        if self.mesh is None:
            return idx
        n_data = self.mesh.shape.get("data", 1)
        if idx.shape[0] % n_data == 0:
            return jax.device_put(idx, batch_sharding(self.mesh, 1))
        return jax.device_put(idx, replicate_sharding(self.mesh))

    def train_epoch(
        self,
        state_g: GANState,
        state_d: GANState,
        dev_ds,
        n_samples: int,
        epoch_rng: np.random.RandomState,
    ):
        """One epoch with drop_last=True shuffled batches (reference
        train_gan.py:135).  Runs as a single compiled lax.scan program
        (per-step jit under profiling)."""
        bs = self.config.batch_size
        ds1, ds2 = dev_ds
        perm = epoch_rng.permutation(n_samples)
        n_full = (n_samples // bs) * bs
        if n_full == 0:
            return state_g, state_d, 0.0, 0.0

        if self.step_timer is None:
            idx_mat = jnp.asarray(
                perm[:n_full].reshape(-1, bs), dtype=jnp.int32
            )
            state_g, state_d, ld, lg = self._gan_epoch_scan(
                state_g, state_d, ds1, ds2, idx_mat
            )
            return (
                state_g, state_d,
                float(jnp.mean(ld)), float(jnp.mean(lg)),
            )

        losses_d, losses_g = [], []
        for start in range(0, n_full, bs):
            idx = self._put_idx(perm[start:start + bs])
            with self.step_timer.step():
                state_g, state_d, ld, lg = self._gan_step(
                    state_g, state_d, ds1, ds2, idx
                )
                lg.block_until_ready()
            losses_d.append(ld)
            losses_g.append(lg)
        return (
            state_g,
            state_d,
            float(jnp.mean(jnp.stack(losses_d))),
            float(jnp.mean(jnp.stack(losses_g))),
        )

    def _put_batch(self, batch):
        """Device-put a host-staged (img1, img2, _) batch (labels, if any,
        are not shipped — the GAN step never reads them), sharding the
        batch dim over 'data' when it divides evenly."""
        img1, img2 = batch[0], batch[1]
        if self.mesh is not None and img1.shape[0] % self.mesh.shape.get(
            "data", 1
        ) == 0:
            from ..parallel.mesh import shard_batch_arrays

            return shard_batch_arrays(self.mesh, img1, img2)
        return jax.device_put(img1), jax.device_put(img2)

    def train_epoch_streaming(
        self,
        state_g: GANState,
        state_d: GANState,
        source,
        epoch_rng: np.random.RandomState,
        depth: int = 2,
    ):
        """One GAN epoch fed from a data/stream.StreamingSource: shuffled
        drop_last=True batches (reference train_gan.py:135), per-batch
        loss means — the same accounting as train_epoch.  Batch assembly
        and H2D staging run `depth` batches ahead (data/stream.py)."""
        from ..data.stream import prefetch_batches

        bs = self.config.batch_size
        n = len(source)
        n_full = (n // bs) * bs
        if n_full == 0:
            return state_g, state_d, 0.0, 0.0
        perm = epoch_rng.permutation(n)
        batches = [perm[s:s + bs] for s in range(0, n_full, bs)]
        losses_d, losses_g = [], []
        for _, (img1, img2) in prefetch_batches(
            source, batches, self._put_batch, depth=depth
        ):
            if self.step_timer is not None:
                with self.step_timer.step():
                    state_g, state_d, ld, lg = self._gan_step_batch(
                        state_g, state_d, img1, img2
                    )
                    lg.block_until_ready()
            else:
                state_g, state_d, ld, lg = self._gan_step_batch(
                    state_g, state_d, img1, img2
                )
            losses_d.append(ld)
            losses_g.append(lg)
        return (
            state_g,
            state_d,
            float(jnp.mean(jnp.stack(losses_d))),
            float(jnp.mean(jnp.stack(losses_g))),
        )
