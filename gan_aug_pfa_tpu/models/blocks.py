"""Shared building blocks: DoubleConv and the additive AttentionGate.

Flax/NHWC counterparts of reference models.py:7-44.  Initialization follows
PyTorch's Conv2d defaults (kaiming-uniform with a=sqrt(5), i.e.
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both kernel and bias) so training
dynamics are comparable; parameters are fp32 with a configurable compute
dtype (bfloat16 by default in training configs) for the MXU.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# U(-1/sqrt(fan_in), 1/sqrt(fan_in)) == torch kaiming_uniform(a=sqrt(5)).
torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def conv(
    features: int,
    kernel: Sequence[int] = (3, 3),
    strides: Sequence[int] = (1, 1),
    padding: Any = "SAME",
    use_bias: bool = True,
    in_features: int | None = None,
    dtype: Dtype = jnp.float32,
    name: str | None = None,
) -> nn.Conv:
    """nn.Conv with torch-default init. ``in_features`` sizes the bias init."""
    bias_init = (
        torch_bias_init(in_features * kernel[0] * kernel[1])
        if (use_bias and in_features is not None)
        else nn.initializers.zeros_init()
    )
    return nn.Conv(
        features,
        kernel_size=tuple(kernel),
        strides=tuple(strides),
        padding=padding,
        use_bias=use_bias,
        kernel_init=torch_kernel_init,
        bias_init=bias_init,
        dtype=dtype,
        name=name,
    )


def batch_norm(train: bool, dtype: Dtype = jnp.float32,
               name: str | None = None) -> nn.BatchNorm:
    """BatchNorm matching torch defaults (momentum .1 -> flax .9, eps 1e-5)."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


class SlicedConv(nn.Module):
    """An nn.Conv whose input may arrive as channel slices (a tuple).

    The parameter tree — 'kernel' (kh, kw, in_features, features) and
    optional 'bias', with the same torch-default inits — is IDENTICAL to
    the nn.Conv over the concatenated input, so checkpoints and param
    counts are unaffected.  __call__ slices the kernel along the
    input-channel dim and sums per-slice convolutions:
    conv(concat(xs), W) == sum_i conv(x_i, W[:, :, off_i:off_i+c_i, :]),
    exact up to fp reassociation.  This lets the U-Net decoder skip
    materializing its channel concatenates in HBM (measured ~1.2 ms/step
    of pure concatenate time at the reference workload on v5e —
    scripts/profile_device_trace.py).
    """

    features: int
    kernel: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    bias_fan_in: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs) -> jnp.ndarray:
        if not isinstance(xs, (tuple, list)):
            xs = (xs,)
        kh, kw = self.kernel
        in_features = sum(int(x.shape[-1]) for x in xs)
        k = self.param(
            "kernel", torch_kernel_init, (kh, kw, in_features, self.features)
        )
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        out = None
        off = 0
        for x in xs:
            c = int(x.shape[-1])
            kk = jax.lax.slice_in_dim(k, off, off + c, axis=2).astype(
                self.dtype
            )
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kk, tuple(self.strides), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out = y if out is None else out + y
            off += c
        if self.use_bias:
            bias_init = (
                torch_bias_init(self.bias_fan_in * kh * kw)
                if self.bias_fan_in is not None
                else nn.initializers.zeros_init()
            )
            b = self.param("bias", bias_init, (self.features,))
            out = out + b.astype(self.dtype)
        return out


class DoubleConv(nn.Module):
    """(Conv3x3 no-bias -> BN -> ReLU) x2 (reference models.py:7-15).

    ``x`` may be a tuple of channel slices (the un-concatenated decoder
    inputs); the first conv then runs as a SlicedConv — identical params,
    no materialized concat.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        x = SlicedConv(
            self.features, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv0",
        )(x)
        x = batch_norm(train, dtype=self.dtype, name="bn0")(x)
        x = nn.relu(x)
        x = conv(
            self.features, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        x = batch_norm(train, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        return x


class AttentionGate(nn.Module):
    """Oktay-style additive attention gate (reference models.py:18-44):
    psi = sigmoid(BN(Conv1x1(relu(BN(Wg g) + BN(Wx x))))); returns x * psi.

    ``g`` and ``x`` may be tuples of channel slices (the un-concatenated
    two-branch Siamese features); Wg/Wx then run as SlicedConvs and the
    gated output is returned as a matching tuple of slices (x_i * psi) —
    the channel concats are never materialized.
    """

    f_g: int
    f_l: int
    f_int: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        g1 = SlicedConv(self.f_int, (1, 1), use_bias=True,
                        bias_fan_in=self.f_g, dtype=self.dtype, name="w_g")(g)
        g1 = batch_norm(train, dtype=self.dtype, name="bn_g")(g1)
        x1 = SlicedConv(self.f_int, (1, 1), use_bias=True,
                        bias_fan_in=self.f_l, dtype=self.dtype, name="w_x")(x)
        x1 = batch_norm(train, dtype=self.dtype, name="bn_x")(x1)
        psi = nn.relu(g1 + x1)
        psi = conv(1, (1, 1), use_bias=True, in_features=self.f_int,
                   dtype=self.dtype, name="psi")(psi)
        psi = batch_norm(train, dtype=self.dtype, name="bn_psi")(psi)
        psi = nn.sigmoid(psi)
        if isinstance(x, (tuple, list)):
            return tuple(xi * psi for xi in x)
        return x * psi
