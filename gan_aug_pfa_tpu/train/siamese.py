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
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax.training import train_state

from ..config import SiameseTrainConfig
from ..data.loader import CachedDataset
from ..data.transforms import AugmentConfig, augment_batch, normalize
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
    ):
        self.config = config
        self.mesh = mesh
        self.augment = augment
        self.aug_config = aug_config
        dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else (
            jnp.float32
        )
        self.model = SiameseUNet(
            n_channels=config.n_channels, n_classes=config.n_classes,
            dtype=dtype,
        )
        self.tx = make_optimizer(
            config.optimizer, config.learning_rate, config.weight_decay
        )
        self._loss_kwargs = dict(
            beta=config.loss_beta,
            focal_gamma=config.focal_gamma,
            focal_alpha=config.focal_alpha,
            dice_smooth=config.dice_smooth,
        )

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
            state = jax.device_put(state, replicate_sharding(self.mesh))
        return state

    # -- compiled steps --------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _train_step(self, state: TrainState, ds1, ds2, dsl, idx, rng):
        """Fused gather + augment + fwd/bwd + update: ds* are the full
        HBM-resident dataset arrays, idx is the (B,) batch index vector.
        ONE host->device dispatch per optimization step."""
        img1 = jnp.take(ds1, idx, axis=0)
        img2 = jnp.take(ds2, idx, axis=0)
        labels = jnp.take(dsl, idx, axis=0)
        img1, img2, labels = self._constrain_spatial(img1, img2, labels)
        if self.augment:
            img1, img2, labels = augment_batch(
                rng, img1, img2, labels, self.aug_config
            )
        else:
            img1, img2 = normalize(img1), normalize(img2)
        labels_f = labels.astype(jnp.float32)[..., None]

        def loss_fn(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                img1, img2, train=True, mutable=["batch_stats"],
            )
            loss = focal_dice_loss(logits, labels_f, **self._loss_kwargs)
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads, batch_stats=new_bs)
        return state, loss

    @functools.partial(jax.jit, static_argnums=0)
    def _eval_step(self, state: TrainState, ds1, ds2, dsl, idx):
        img1 = jnp.take(ds1, idx, axis=0)
        img2 = jnp.take(ds2, idx, axis=0)
        labels = jnp.take(dsl, idx, axis=0)
        img1, img2 = normalize(img1), normalize(img2)
        labels_f = labels.astype(jnp.float32)[..., None]
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            img1, img2, train=False,
        )
        return focal_dice_loss(logits, labels_f, **self._loss_kwargs)

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
        """When the mesh has a 'spatial' axis, additionally shard the batch's
        H dimension over it — XLA's SPMD partitioner inserts the conv halo
        exchanges (spatial partitioning for resolutions beyond per-core HBM,
        SURVEY.md §5.7)."""
        if self.mesh is None or "spatial" not in self.mesh.shape:
            return img1, img2, labels
        from jax.sharding import NamedSharding, PartitionSpec as P

        s_img = NamedSharding(self.mesh, P("data", "spatial", None, None))
        s_lbl = NamedSharding(self.mesh, P("data", "spatial", None))
        return (
            jax.lax.with_sharding_constraint(img1, s_img),
            jax.lax.with_sharding_constraint(img2, s_img),
            jax.lax.with_sharding_constraint(labels, s_lbl),
        )

    # -- epoch drivers ---------------------------------------------------

    def _device_arrays(self, ds: CachedDataset):
        """Push the cached dataset to device HBM once (replicated)."""
        put = (
            (lambda a: jax.device_put(a, replicate_sharding(self.mesh)))
            if self.mesh is not None
            else jax.device_put
        )
        return put(ds.img1), put(ds.img2), put(ds.labels)

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
        loss = mean of per-batch losses (reference train.py:147)."""
        bs = self.config.batch_size
        ds1, ds2, dsl = dev_ds
        perm = epoch_rng.permutation(n_samples)
        losses = []
        for start in range(0, n_samples, bs):
            idx = self._put_idx(perm[start:start + bs])
            rng, step_rng = jax.random.split(rng)
            state, loss = self._train_step(
                state, ds1, ds2, dsl, idx, step_rng
            )
            losses.append(loss)
        if not losses:
            return state, 0.0
        return state, float(jnp.mean(jnp.stack(losses)))

    def validate(self, state: TrainState, dev_ds, n_samples: int) -> float:
        bs = self.config.batch_size
        ds1, ds2, dsl = dev_ds
        losses = []
        for start in range(0, n_samples, bs):
            idx = self._put_idx(
                np.arange(start, min(start + bs, n_samples))
            )
            losses.append(self._eval_step(state, ds1, ds2, dsl, idx))
        if not losses:
            return 0.0
        return float(jnp.mean(jnp.stack(losses)))
