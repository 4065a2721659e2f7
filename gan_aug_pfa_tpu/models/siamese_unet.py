"""Siamese Attention U-Net change-detection model (reference models.py:47-145).

Architecture (NHWC, TPU-native):
  * shared-weight encoder 64 -> 128 -> 256 -> 512 (+ bottleneck 1024) applied
    to both images (one module, two calls — weight sharing is structural);
  * per-level feature concatenation of the two branches (2048-ch bottleneck,
    1024/512/256/128-ch skips);
  * four additive attention gates on the concatenated skips;
  * decoder via 2x bilinear upsample (align_corners=True, see
    ops/resize.upsample2x_align_corners) + DoubleConv;
  * 1x1 conv head producing n_classes logits (no sigmoid — losses are
    with-logits, reference models.py:141-143).

Parameter count matches the reference exactly: 41,160,525 (BASELINE.md).

TPU notes: max-pool is reduce_window (fused by XLA); both encoder passes are
batched into the same conv kernels by sharing weights; with a batch sharded
over a mesh 'data' axis, BatchNorm statistics are computed over the global
batch (XLA inserts the cross-replica reductions over ICI automatically).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import upsample2x_align_corners
from .blocks import AttentionGate, DoubleConv, conv

Dtype = Any


def max_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class SiameseUNet(nn.Module):
    """batched_encoder=True runs BOTH images through the shared encoder as
    one 2B-batch pass (one set of conv dispatches at twice the batch —
    ~15% faster per train step on v5e at bs4/128px, measured 2026-08-16).
    The parameter tree and eval-mode forward (running-stat BN) are
    IDENTICAL to the two-pass form; only train-mode BatchNorm changes:
    batch statistics are computed jointly over both images' activations
    instead of per-pass sequentially (the reference's two sequential
    forward_encoder calls, models.py:106-107).  Default False for
    reference parity."""

    n_channels: int = 3
    n_classes: int = 1
    dtype: Dtype = jnp.float32
    batched_encoder: bool = False
    concat_free: bool = False
    # Rematerialize each DoubleConv's activations in the backward pass
    # (jax.checkpoint via nn.remat): trades one recompute of the block's
    # convs for not keeping its intermediate activations alive through
    # the backward — HBM relief for resolutions/batches beyond capacity.
    # Identical math and param tree; opt-in (costs ~1/3 more conv FLOPs).
    remat: bool = False

    def setup(self):
        dt = self.dtype
        # nn.remat is a lifted transform: the wrapped class has the same
        # param/variable structure, so checkpoints are interchangeable
        # between remat and non-remat models (tests/test_models.py).
        # `train` (a Python bool) must stay static under jax.checkpoint;
        # in flax's lifted remat, static_argnums counts the module itself
        # as argument 0, so __call__(self, x, train) -> train is arg 2.
        DC = (
            nn.remat(DoubleConv, static_argnums=(2,))
            if self.remat else DoubleConv
        )
        self.dconv_down1 = DC(64, dtype=dt)
        self.dconv_down2 = DC(128, dtype=dt)
        self.dconv_down3 = DC(256, dtype=dt)
        self.dconv_down4 = DC(512, dtype=dt)
        self.bottleneck = DC(1024, dtype=dt)

        # Combined (two-branch concatenated) channel sizes.
        ch_bott, ch_s4, ch_s3, ch_s2, ch_s1 = 2048, 1024, 512, 256, 128
        self.att3 = AttentionGate(ch_bott, ch_s4, ch_s4 // 2, dtype=dt)
        self.att2 = AttentionGate(512, ch_s3, ch_s3 // 2, dtype=dt)
        self.att1 = AttentionGate(256, ch_s2, ch_s2 // 2, dtype=dt)
        self.att_last = AttentionGate(128, ch_s1, ch_s1 // 2, dtype=dt)

        self.dconv_up3 = DC(512, dtype=dt)
        self.dconv_up2 = DC(256, dtype=dt)
        self.dconv_up1 = DC(128, dtype=dt)
        self.dconv_last = DC(64, dtype=dt)
        self.conv_last = conv(
            self.n_classes, (1, 1), use_bias=True, in_features=64, dtype=dt,
            name="conv_head",
        )

    def encode(self, x: jnp.ndarray, train: bool):
        c1 = self.dconv_down1(x, train)
        c2 = self.dconv_down2(max_pool_2x(c1), train)
        c3 = self.dconv_down3(max_pool_2x(c2), train)
        c4 = self.dconv_down4(max_pool_2x(c3), train)
        b = self.bottleneck(max_pool_2x(c4), train)
        return c1, c2, c3, c4, b

    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """x1, x2: (B, H, W, C) in [-1, 1]. Returns (B, H, W, n_classes) logits.

        The two encoder passes run through the SAME modules (shared weights);
        BatchNorm running stats update twice per step, matching the reference's
        two sequential forward_encoder calls (reference models.py:106-107).
        """
        x1 = x1.astype(self.dtype)
        x2 = x2.astype(self.dtype)
        if self.batched_encoder:
            b = x1.shape[0]
            feats = self.encode(jnp.concatenate([x1, x2], axis=0), train)
            (c1a, c1b), (c2a, c2b), (c3a, c3b), (c4a, c4b), (ba, bb) = (
                (t[:b], t[b:]) for t in feats
            )
        else:
            c1a, c2a, c3a, c4a, ba = self.encode(x1, train)
            c1b, c2b, c3b, c4b, bb = self.encode(x2, train)

        if self.concat_free:
            # Same math with channel concats kept as slice tuples: the
            # attention gates and each decoder conv0 consume the slices
            # directly (SlicedConv — identical params, conv(concat(xs), W)
            # == sum of per-slice convs), so no concatenate is ever
            # materialized in HBM.  Slice order == the concat channel
            # order of the default path.
            up = (upsample2x_align_corners(ba), upsample2x_align_corners(bb))
            x = self.dconv_up3(up + self.att3(up, (c4a, c4b), train), train)

            up = (upsample2x_align_corners(x),)
            x = self.dconv_up2(up + self.att2(up, (c3a, c3b), train), train)

            up = (upsample2x_align_corners(x),)
            x = self.dconv_up1(up + self.att1(up, (c2a, c2b), train), train)

            up = (upsample2x_align_corners(x),)
            x = self.dconv_last(
                up + self.att_last(up, (c1a, c1b), train), train
            )

            out = self.conv_last(x)
            return out.astype(jnp.float32)

        bott = jnp.concatenate([ba, bb], axis=-1)
        up = upsample2x_align_corners(bott)

        s4 = jnp.concatenate([c4a, c4b], axis=-1)
        x = jnp.concatenate([up, self.att3(up, s4, train)], axis=-1)
        x = self.dconv_up3(x, train)

        up = upsample2x_align_corners(x)
        s3 = jnp.concatenate([c3a, c3b], axis=-1)
        x = jnp.concatenate([up, self.att2(up, s3, train)], axis=-1)
        x = self.dconv_up2(x, train)

        up = upsample2x_align_corners(x)
        s2 = jnp.concatenate([c2a, c2b], axis=-1)
        x = jnp.concatenate([up, self.att1(up, s2, train)], axis=-1)
        x = self.dconv_up1(x, train)

        up = upsample2x_align_corners(x)
        s1 = jnp.concatenate([c1a, c1b], axis=-1)
        x = jnp.concatenate([up, self.att_last(up, s1, train)], axis=-1)
        x = self.dconv_last(x, train)

        out = self.conv_last(x)
        return out.astype(jnp.float32)
