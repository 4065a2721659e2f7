"""Siamese U-Net training: jitted fused train/eval steps + epoch driver.

TPU-first counterpart of reference train.py:131-164, 258-322.  Differences in
HOW (the WHAT — loss, optimizer, scheduling, checkpoint cadence — is
identical):

  * The whole step is ONE compiled XLA program: batch gather from the
    HBM-resident dataset cache (jnp.take on device), optional augmentation
    (data/transforms.py), [-1,1] normalize, forward, backward, AdamW update.
    The host only feeds a (B,) index vector and an RNG key per step.
  * Params/opt-state buffers are donated — updates happen in place in HBM.
  * bfloat16 compute / fp32 params via the model's dtype (MXU-friendly).
  * Data parallelism: batch index vector and gathered batch sharded over the
    mesh 'data' axis, params replicated; XLA inserts the psum over ICI.

Loss-epoch accounting matches the reference: mean of per-batch losses
(train.py:147,164), with a partial final batch compiled as a second shape.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax.training import train_state

from ..config import SiameseTrainConfig
from ..data.loader import CachedDataset, PaddedNativeDataset
from ..data.transforms import (
    AugmentConfig,
    augment_batch,
    augment_batch_native,
    normalize,
)
from ..losses import focal_dice_loss
from ..models import SiameseUNet
from ..parallel.mesh import batch_sharding, replicate_sharding
from .optim import make_optimizer


class TrainState(train_state.TrainState):
    batch_stats: Any = None


class SiameseTrainer:
    def __init__(
        self,
        config: SiameseTrainConfig,
        mesh=None,
        augment: bool = False,
        aug_config: AugmentConfig = AugmentConfig(),
        native_out_size=None,
    ):
        """native_out_size=(H, W) switches the TRAIN path to
        native-resolution augmentation: the train dataset must then be a
        PaddedNativeDataset, and the step augments each sample at its
        native size and resizes to (H, W) on device as chain step 5 (the
        reference's augment-then-resize order, dataset.py:172-193).
        Validation/eval always use the target-size cache."""
        self.config = config
        self.mesh = mesh
        self.augment = augment
        self.aug_config = aug_config
        self.native_out_size = (
            tuple(native_out_size) if native_out_size and augment else None
        )
        # pallas_augment=None -> auto: the fused native-extent photometric
        # kernel on by default for the native chain on a real TPU (2.2x
        # measured full-step win, scripts/bench_native_aug.py — see
        # SiameseTrainConfig.pallas_augment); the fixed-size chain and CPU
        # stay on XLA unless forced.
        if config.pallas_augment is None:
            self._pallas_augment = (
                self.native_out_size is not None
                and jax.default_backend() == "tpu"
            )
        else:
            self._pallas_augment = bool(config.pallas_augment)
        # Optional per-step profiler (utils/profiling.StepTimer), attached
        # by the pipeline when config.profile_dir is set.
        self.step_timer = None
        dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else (
            jnp.float32
        )
        self.model = SiameseUNet(
            n_channels=config.n_channels, n_classes=config.n_classes,
            dtype=dtype, batched_encoder=config.batched_encoder,
            concat_free=config.concat_free, remat=config.remat,
        )
        self.tx = make_optimizer(
            config.optimizer, config.learning_rate, config.weight_decay,
            mu_dtype=config.opt_momentum_dtype,
            flat_state=config.opt_flat_state,
            grad_accum=config.grad_accum,
        )
        self._loss_kwargs = dict(
            beta=config.loss_beta,
            focal_gamma=config.focal_gamma,
            focal_alpha=config.focal_alpha,
            dice_smooth=config.dice_smooth,
        )

    def _loss(self, logits, labels_f):
        """FocalDice via the opt-in fused Pallas kernel (single-pass fwd +
        analytic single-pass bwd) or the default XLA path — numerically
        identical (tests/test_pallas.py)."""
        if self.config.fused_loss:
            from ..ops.pallas_kernels import fused_loss as fl

            # Gridded kernel: any input size runs (round-3 change — the
            # former single-block VMEM cap and its silent XLA fallback
            # are gone).
            return fl.focal_dice_loss_fused(
                logits, labels_f, **self._loss_kwargs
            )
        return focal_dice_loss(logits, labels_f, **self._loss_kwargs)

    # -- state ---------------------------------------------------------

    def init_state(self, rng: jax.Array, image_size: Tuple[int, int]
                   ) -> TrainState:
        h, w = image_size
        dummy = jnp.zeros((1, h, w, self.config.n_channels), jnp.float32)
        variables = self.model.init(rng, dummy, dummy, train=False)
        state = TrainState.create(
            apply_fn=self.model.apply,
            params=variables["params"],
            tx=self.tx,
            batch_stats=variables["batch_stats"],
        )
        if self.mesh is not None:
            if self.mesh.shape.get("model", 1) > 1:
                # Tensor parallelism: wide conv kernels (and their aligned
                # channel vectors / optimizer moments) shard over 'model';
                # XLA SPMD inserts the collectives (parallel/mesh.py).
                from ..parallel.mesh import param_shardings

                state = jax.device_put(
                    state, param_shardings(self.mesh, state)
                )
            else:
                state = jax.device_put(state, replicate_sharding(self.mesh))
        return state

    # -- compiled steps --------------------------------------------------

    def _step_impl(self, state: TrainState, ds1, ds2, dsl, idx, rng):
        """One optimization step (traced body, shared by the per-step jit
        and the whole-epoch lax.scan): gather from the HBM-resident dataset
        arrays by the (B,) index vector, augment/normalize, fwd/bwd,
        optimizer update."""
        img1 = jnp.take(ds1, idx, axis=0)
        img2 = jnp.take(ds2, idx, axis=0)
        if self.native_out_size is not None:
            # dsl is (labels, sizes) from a PaddedNativeDataset: augment at
            # native extent, resize to target on device.
            dsl, dsz = dsl
            labels = jnp.take(dsl, idx, axis=0)
            sizes = jnp.take(dsz, idx, axis=0)
            # Constrain BEFORE the augmentation (like the fixed-size
            # branch) so the expensive native-extent warps run sharded
            # across the data axis rather than replicated per device.
            img1, img2, labels = self._constrain_spatial(img1, img2, labels)
            img1, img2, labels = augment_batch_native(
                rng, img1, img2, labels, sizes, self.native_out_size,
                self.aug_config, use_pallas=self._pallas_augment,
            )
        else:
            labels = jnp.take(dsl, idx, axis=0)
            return self._batch_step_impl(state, img1, img2, labels, rng)
        return self._update(state, img1, img2, labels)

    def _batch_step_impl(self, state: TrainState, img1, img2, labels, rng):
        """Fixed-size step body on an already-materialized batch — shared
        by the gather-from-HBM-cache steps above and the streaming path
        (data/stream.py), so both are the same compiled math."""
        img1, img2, labels = self._constrain_spatial(img1, img2, labels)
        if self.augment:
            img1, img2, labels = augment_batch(
                rng, img1, img2, labels, self.aug_config,
                use_pallas=self._pallas_augment,
            )
        else:
            img1, img2 = normalize(img1), normalize(img2)
        return self._update(state, img1, img2, labels)

    def _update(self, state: TrainState, img1, img2, labels):
        """Forward + backward + optimizer update on a prepared (augmented/
        normalized) batch — the shared tail of every train-step variant."""
        labels_f = labels.astype(jnp.float32)[..., None]

        def loss_fn(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                img1, img2, train=True, mutable=["batch_stats"],
            )
            loss = self._loss(logits, labels_f)
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads, batch_stats=new_bs)
        return state, loss

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _train_step_batch(self, state: TrainState, img1, img2, labels, rng):
        """One optimization step on a host-staged batch (streaming path)."""
        return self._batch_step_impl(state, img1, img2, labels, rng)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _train_step(self, state: TrainState, ds1, ds2, dsl, idx, rng):
        """Single fused step: ONE host->device dispatch per optimization
        step (used for partial batches and when per-step timing is on)."""
        return self._step_impl(state, ds1, ds2, dsl, idx, rng)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _train_epoch_scan(self, state: TrainState, ds1, ds2, dsl, idx_mat,
                          keys):
        """A whole epoch of full-size batches as ONE compiled program:
        lax.scan over the (n_steps, B) index matrix.  Removes the
        per-step host dispatch entirely — on the reference's ~3-step
        epochs, dispatch latency dominates the actual compute."""

        def body(state, x):
            idx, key = x
            return self._step_impl(state, ds1, ds2, dsl, idx, key)

        state, losses = jax.lax.scan(body, state, (idx_mat, keys))
        return state, losses

    @functools.partial(jax.jit, static_argnums=0)
    def _eval_epoch_scan(self, state: TrainState, ds1, ds2, dsl, idx_mat):
        def body(_, idx):
            return None, self._eval_impl(state, ds1, ds2, dsl, idx)

        _, losses = jax.lax.scan(body, None, idx_mat)
        return losses

    def _eval_impl(self, state: TrainState, ds1, ds2, dsl, idx):
        img1 = jnp.take(ds1, idx, axis=0)
        img2 = jnp.take(ds2, idx, axis=0)
        labels = jnp.take(dsl, idx, axis=0)
        img1, img2 = normalize(img1), normalize(img2)
        labels_f = labels.astype(jnp.float32)[..., None]
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            img1, img2, train=False,
        )
        return self._loss(logits, labels_f)

    @functools.partial(jax.jit, static_argnums=0)
    def _eval_step(self, state: TrainState, ds1, ds2, dsl, idx):
        return self._eval_impl(state, ds1, ds2, dsl, idx)

    @functools.partial(jax.jit, static_argnums=0)
    def predict(self, state: TrainState, img1, img2):
        """Sigmoid probabilities for [0,1]-range input images."""
        img1, img2 = normalize(img1), normalize(img2)
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            img1, img2, train=False,
        )
        return jax.nn.sigmoid(logits)

    def _constrain_spatial(self, img1, img2, labels):
        """Constrain the gathered batch's shardings: batch dim over 'data'
        (so the step runs data-parallel with a psum grad all-reduce even
        inside lax.scan, where indices can't be device_put-sharded) and,
        when the mesh has a 'spatial' axis, feature-map H over it — XLA's
        SPMD partitioner inserts the conv halo exchanges (spatial
        partitioning for resolutions beyond per-core HBM, SURVEY.md §5.7)."""
        if self.mesh is None:
            return img1, img2, labels
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = (
            "data" if img1.shape[0] % self.mesh.shape.get("data", 1) == 0
            else None
        )
        spatial = "spatial" if "spatial" in self.mesh.shape else None
        if data is None and spatial is None:
            return img1, img2, labels
        s_img = NamedSharding(self.mesh, P(data, spatial, None, None))
        s_lbl = NamedSharding(self.mesh, P(data, spatial, None))
        return (
            jax.lax.with_sharding_constraint(img1, s_img),
            jax.lax.with_sharding_constraint(img2, s_img),
            jax.lax.with_sharding_constraint(labels, s_lbl),
        )

    # -- epoch drivers ---------------------------------------------------

    def _device_arrays(self, ds):
        """Push the cached dataset to device HBM once (replicated; on a
        multi-host slice each process contributes its local copy — see
        parallel/mesh.put_dataset_global).  A PaddedNativeDataset rides
        its (labels, sizes) pair in the third slot."""
        if isinstance(ds, PaddedNativeDataset):
            if self.mesh is not None:
                from ..parallel.mesh import put_dataset_global

                i1, i2, lb, sz = put_dataset_global(
                    self.mesh, ds.img1, ds.img2, ds.labels, ds.sizes
                )
            else:
                i1, i2, lb, sz = (
                    jax.device_put(ds.img1), jax.device_put(ds.img2),
                    jax.device_put(ds.labels), jax.device_put(ds.sizes),
                )
            return (i1, i2, (lb, sz))
        if self.mesh is not None:
            from ..parallel.mesh import put_dataset_global

            return put_dataset_global(
                self.mesh, ds.img1, ds.img2, ds.labels
            )
        return (
            jax.device_put(ds.img1),
            jax.device_put(ds.img2),
            jax.device_put(ds.labels),
        )

    def _put_idx(self, idx: np.ndarray):
        """Batch index vector, sharded over 'data' when it divides evenly
        (the sharded gather yields a batch sharded over 'data' without any
        resharding; XLA then runs the step data-parallel with a psum grad
        all-reduce)."""
        idx = jnp.asarray(idx, dtype=jnp.int32)
        if self.mesh is None:
            return idx
        n_data = self.mesh.shape.get("data", 1)
        if idx.shape[0] % n_data == 0:
            return jax.device_put(
                idx, batch_sharding(self.mesh, 1)
            )
        return jax.device_put(idx, replicate_sharding(self.mesh))

    def train_epoch(
        self,
        state: TrainState,
        dev_ds,
        n_samples: int,
        rng: jax.Array,
        epoch_rng: np.random.RandomState,
    ) -> Tuple[TrainState, float]:
        """One epoch: shuffled full pass, batch_size from config, partial
        final batch included (reference DataLoader drop_last=False).  Epoch
        loss = mean of per-batch losses (reference train.py:147).

        Full-size batches run as ONE compiled lax.scan program (zero
        per-step dispatch); the trailing partial batch (and the per-step
        profiling path, which needs step granularity) use the per-step jit.
        """
        bs = self.config.batch_size
        ds1, ds2, dsl = dev_ds
        perm = epoch_rng.permutation(n_samples)
        n_full = (n_samples // bs) * bs
        losses = []

        if self.step_timer is None and n_full >= bs:
            idx_mat = jnp.asarray(
                perm[:n_full].reshape(-1, bs), dtype=jnp.int32
            )
            rng, scan_rng = jax.random.split(rng)
            keys = jax.random.split(scan_rng, idx_mat.shape[0])
            state, scan_losses = self._train_epoch_scan(
                state, ds1, ds2, dsl, idx_mat, keys
            )
            losses.append(scan_losses)
            start_rest = n_full
        else:
            start_rest = 0

        for start in range(start_rest, n_samples, bs):
            idx = self._put_idx(perm[start:start + bs])
            rng, step_rng = jax.random.split(rng)
            if self.step_timer is not None:
                with self.step_timer.step():
                    state, loss = self._train_step(
                        state, ds1, ds2, dsl, idx, step_rng
                    )
                    loss.block_until_ready()
            else:
                state, loss = self._train_step(
                    state, ds1, ds2, dsl, idx, step_rng
                )
            losses.append(loss[None] if loss.ndim == 0 else loss)
        if not losses:
            return state, 0.0
        return state, float(jnp.mean(jnp.concatenate(
            [jnp.atleast_1d(l) for l in losses]
        )))

    def _put_batch(self, batch):
        """Device-put a host-staged (img1, img2, labels) batch, sharding
        the batch dim over 'data' when it divides evenly."""
        img1, img2, labels = batch
        if self.mesh is not None and img1.shape[0] % self.mesh.shape.get(
            "data", 1
        ) == 0:
            from ..parallel.mesh import shard_batch_arrays

            return shard_batch_arrays(self.mesh, img1, img2, labels)
        return (
            jax.device_put(img1),
            jax.device_put(img2),
            jax.device_put(labels) if labels is not None else None,
        )

    def train_epoch_streaming(
        self,
        state: TrainState,
        source,
        rng: jax.Array,
        epoch_rng: np.random.RandomState,
        depth: int = 2,
    ) -> Tuple[TrainState, float]:
        """One epoch fed from a data/stream.StreamingSource: shuffled full
        pass, partial final batch included, epoch loss = mean of per-batch
        losses — the same accounting as train_epoch.  Host batch assembly
        and the H2D copies run `depth` batches ahead of the compiled step
        (data/stream.prefetch_batches), so the chip never waits on decode."""
        from ..data.stream import prefetch_batches

        bs = self.config.batch_size
        n = len(source)
        perm = epoch_rng.permutation(n)
        batches = [perm[s:s + bs] for s in range(0, n, bs)]
        losses = []
        for idx, dev_batch in prefetch_batches(
            source, batches, self._put_batch, depth=depth
        ):
            img1, img2, labels = dev_batch
            rng, step_rng = jax.random.split(rng)
            if self.step_timer is not None:
                with self.step_timer.step():
                    state, loss = self._train_step_batch(
                        state, img1, img2, labels, step_rng
                    )
                    loss.block_until_ready()
            else:
                state, loss = self._train_step_batch(
                    state, img1, img2, labels, step_rng
                )
            losses.append(loss)
        if not losses:
            return state, 0.0
        return state, float(jnp.mean(jnp.stack(losses)))

    def validate(self, state: TrainState, dev_ds, n_samples: int) -> float:
        bs = self.config.batch_size
        ds1, ds2, dsl = dev_ds
        n_full = (n_samples // bs) * bs
        losses = []
        if n_full >= bs:
            idx_mat = jnp.asarray(
                np.arange(n_full).reshape(-1, bs), dtype=jnp.int32
            )
            losses.append(self._eval_epoch_scan(state, ds1, ds2, dsl, idx_mat))
        for start in range(n_full, n_samples, bs):
            idx = self._put_idx(
                np.arange(start, min(start + bs, n_samples))
            )
            losses.append(
                jnp.atleast_1d(self._eval_step(state, ds1, ds2, dsl, idx))
            )
        if not losses:
            return 0.0
        return float(jnp.mean(jnp.concatenate(losses)))
