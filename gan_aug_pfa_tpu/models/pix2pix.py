"""Pix2Pix components: recursive U-Net generator + 70x70 PatchGAN discriminator.

Flax/NHWC counterparts of reference models.py:149-247.  The generator is
built recursively from skip blocks (down: LeakyReLU0.2 -> Conv4x4/s2 -> BN;
up: ReLU -> ConvT4x4/s2 -> BN; skip = concat([x, block(x)])), outermost block
ends in tanh mapping to [-1,1].  Parameter counts match the reference exactly:
generator 41,828,995 / discriminator 2,768,705 (BASELINE.md).

Batch-norm semantics note: the reference trains the GAN at batch size 1
(train_gan.py:26) where BatchNorm behaves near-instance-norm; we keep
BatchNorm for parity.  Under data parallelism the stats become global-batch
stats (XLA cross-replica reduction) — documented deviation, see SURVEY.md §7.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import SlicedConv, batch_norm, conv, torch_kernel_init

Dtype = Any


def conv_transpose(
    features: int,
    use_bias: bool,
    in_features: int | None = None,
    dtype: Dtype = jnp.float32,
    name: str | None = None,
) -> nn.ConvTranspose:
    """ConvTranspose 4x4 stride 2 'SAME' == torch ConvTranspose2d(4, 2, p=1):
    output is exactly 2x the input spatial size."""
    if use_bias and in_features is not None:
        bound = 1.0 / math.sqrt(features * 16)  # torch fan_in for convT

        def bias_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

    else:
        bias_init = nn.initializers.zeros_init()
    return nn.ConvTranspose(
        features,
        kernel_size=(4, 4),
        strides=(2, 2),
        padding="SAME",
        use_bias=use_bias,
        kernel_init=torch_kernel_init,
        bias_init=bias_init,
        dtype=dtype,
        name=name,
    )


class UnetSkipBlock(nn.Module):
    """One recursive skip block (reference models.py:167-208).

    outermost: down=[conv]; up=[relu, convT(bias), tanh]; returns model(x).
    innermost: down=[lrelu, conv]; up=[relu, convT, bn]; returns cat(x, m(x)).
    middle:    down=[lrelu, conv, bn]; up=[relu, convT, bn] (+dropout);
               returns cat(x, m(x)).
    All downconvs are bias-free (BatchNorm norm layer), preserving the
    reference quirk that even the norm-less outermost downconv has no bias.
    """

    outer_nc: int
    inner_nc: int
    input_nc: Optional[int] = None
    submodule: Optional[nn.Module] = None
    outermost: bool = False
    innermost: bool = False
    use_dropout: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = x
        if not self.outermost:
            y = nn.leaky_relu(y, 0.2)
        y = conv(
            self.inner_nc, (4, 4), strides=(2, 2), padding=1, use_bias=False,
            dtype=self.dtype, name="downconv",
        )(y)
        if not (self.outermost or self.innermost):
            y = batch_norm(train, dtype=self.dtype, name="downnorm")(y)
        if self.submodule is not None:
            y = self.submodule(y, train)
        y = nn.relu(y)
        if self.outermost:
            y = conv_transpose(
                self.outer_nc, use_bias=True, in_features=self.inner_nc * 2,
                dtype=self.dtype, name="upconv",
            )(y)
            return jnp.tanh(y)
        y = conv_transpose(
            self.outer_nc, use_bias=False, dtype=self.dtype, name="upconv"
        )(y)
        y = batch_norm(train, dtype=self.dtype, name="upnorm")(y)
        if self.use_dropout:
            y = nn.Dropout(0.5)(y, deterministic=not train)
        return jnp.concatenate([x, y], axis=-1)


class UNetGenerator(nn.Module):
    """Pix2Pix U-Net generator (reference models.py:149-164): num_downs=7,
    ngf=64, tanh output in [-1,1]."""

    input_nc: int = 3
    output_nc: int = 3
    num_downs: int = 7
    ngf: int = 64
    use_dropout: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        if self.num_downs < 5:
            # The outer structure is 5 strided downs (innermost + 3 fixed
            # middles + outermost); smaller values would silently build a
            # 5-down model anyway (range below is empty), so reject them.
            raise ValueError(
                f"UNetGenerator needs num_downs >= 5, got {self.num_downs}"
            )
        ngf, dt = self.ngf, self.dtype
        block = UnetSkipBlock(ngf * 8, ngf * 8, innermost=True, dtype=dt)
        for _ in range(self.num_downs - 5):
            block = UnetSkipBlock(
                ngf * 8, ngf * 8, submodule=block,
                use_dropout=self.use_dropout, dtype=dt,
            )
        block = UnetSkipBlock(ngf * 4, ngf * 8, submodule=block, dtype=dt)
        block = UnetSkipBlock(ngf * 2, ngf * 4, submodule=block, dtype=dt)
        block = UnetSkipBlock(ngf, ngf * 2, submodule=block, dtype=dt)
        self.model = UnetSkipBlock(
            self.output_nc, ngf, input_nc=self.input_nc, submodule=block,
            outermost=True, dtype=dt,
        )

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (B, H, W, input_nc) in [-1,1] -> (B, H, W, output_nc) in [-1,1]."""
        return self.model(x.astype(self.dtype), train).astype(jnp.float32)


class NLayerDiscriminator(nn.Module):
    """70x70 PatchGAN (reference models.py:212-247): Conv4x4 stack with
    strides 2,2,2,1,1 and channels ndf,2ndf,4ndf,8ndf,1; input is
    concat(real_A, B) = 6 channels; 256x256 input -> (B,30,30,1) patch
    logits."""

    input_nc: int = 6
    ndf: int = 64
    n_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        if isinstance(x, (tuple, list)):
            # Concat-free pair input (A, B): the first conv runs as a
            # split-kernel sum instead of materializing concat([A, B],
            # channel) in HBM — exact up to fp reassociation, and the
            # param tree ('conv0': kernel (4,4,6,64) + bias) is identical
            # to the nn.Conv branch (SlicedConv docstring in blocks.py).
            x = SlicedConv(
                self.ndf, kernel=(4, 4), strides=(2, 2), padding=1,
                use_bias=True, bias_fan_in=self.input_nc,
                dtype=self.dtype, name="conv0",
            )(tuple(v.astype(self.dtype) for v in x))
        else:
            x = x.astype(self.dtype)
            x = conv(
                self.ndf, (4, 4), strides=(2, 2), padding=1, use_bias=True,
                in_features=self.input_nc, dtype=self.dtype, name="conv0",
            )(x)
        x = nn.leaky_relu(x, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            x = conv(
                self.ndf * nf, (4, 4), strides=(2, 2), padding=1,
                use_bias=False, dtype=self.dtype, name=f"conv{n}",
            )(x)
            x = batch_norm(train, dtype=self.dtype, name=f"bn{n}")(x)
            x = nn.leaky_relu(x, 0.2)
        nf = min(2 ** self.n_layers, 8)
        x = conv(
            self.ndf * nf, (4, 4), strides=(1, 1), padding=1, use_bias=False,
            dtype=self.dtype, name=f"conv{self.n_layers}",
        )(x)
        x = batch_norm(train, dtype=self.dtype, name=f"bn{self.n_layers}")(x)
        x = nn.leaky_relu(x, 0.2)
        x = conv(
            1, (4, 4), strides=(1, 1), padding=1, use_bias=True,
            in_features=self.ndf * nf, dtype=self.dtype, name="conv_out",
        )(x)
        return x.astype(jnp.float32)
