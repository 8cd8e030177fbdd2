"""Shared initializers and small layers.

The reference trains from torch-default inits for most layers plus explicit
N(0, 0.1) branch-conv inits in SGP blocks (ref: model/modules.py:147-157).
For from-scratch training parity we reproduce torch's default
kaiming_uniform(a=sqrt(5)) conv/linear init, which reduces to
U(±1/sqrt(fan_in)) for both kernel and bias.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """U(±1/sqrt(fan_in)) where fan_in = prod(shape[:-1]).

    Works for flax conv kernels (spatial..., in/groups, out) and dense (in, out):
    both have fan_in equal to the product of all but the last dim, matching
    torch's kaiming_uniform(a=sqrt(5)) default.
    """
    fan_in = max(1, int(np.prod(shape[:-1])))
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    """torch default bias init: U(±1/sqrt(fan_in)) with the *kernel's* fan_in."""
    bound = 1.0 / math.sqrt(max(1, fan_in))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def gelu_exact(x):
    """torch nn.GELU default is the exact erf form (flax default is tanh-approx)."""
    return nn.gelu(x, approximate=False)


class TorchConv(nn.Module):
    """Conv with torch-default init. Input (..., spatial..., C), NHWC-style."""

    features: int
    kernel_size: Sequence[int]
    strides: Any = 1
    padding: Any = "SAME"
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        fan_in = (in_features // self.feature_group_count) * int(
            np.prod(self.kernel_size)
        )
        return nn.Conv(
            features=self.features,
            kernel_size=tuple(self.kernel_size),
            strides=self.strides,
            padding=self.padding,
            feature_group_count=self.feature_group_count,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)


class TorchDense(nn.Module):
    """Dense with torch nn.Linear default init."""

    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            name="dense",
        )(x)
