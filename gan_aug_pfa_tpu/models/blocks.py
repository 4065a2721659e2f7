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


class DoubleConv(nn.Module):
    """(Conv3x3 no-bias -> BN -> ReLU) x2 (reference models.py:7-15)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(2):
            x = conv(
                self.features, (3, 3), padding=1, use_bias=False,
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = batch_norm(train, dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class AttentionGate(nn.Module):
    """Oktay-style additive attention gate (reference models.py:18-44):
    psi = sigmoid(BN(Conv1x1(relu(BN(Wg g) + BN(Wx x))))); returns x * psi.
    """

    f_g: int
    f_l: int
    f_int: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, g: jnp.ndarray, x: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        g1 = conv(self.f_int, (1, 1), use_bias=True, in_features=self.f_g,
                  dtype=self.dtype, name="w_g")(g)
        g1 = batch_norm(train, dtype=self.dtype, name="bn_g")(g1)
        x1 = conv(self.f_int, (1, 1), use_bias=True, in_features=self.f_l,
                  dtype=self.dtype, name="w_x")(x)
        x1 = batch_norm(train, dtype=self.dtype, name="bn_x")(x1)
        psi = nn.relu(g1 + x1)
        psi = conv(1, (1, 1), use_bias=True, in_features=self.f_int,
                   dtype=self.dtype, name="psi")(psi)
        psi = batch_norm(train, dtype=self.dtype, name="bn_psi")(psi)
        psi = nn.sigmoid(psi)
        return x * psi
