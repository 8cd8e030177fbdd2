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


class SplitBatchNorm(nn.Module):
    """BatchNorm with fp32 statistics and compute-dtype application.

    flax's BatchNorm at dtype=fp32 materializes a full fp32 copy of the
    (N, H, W, C) activation before normalizing (and the result is cast back
    to bf16 right after) — measured at ~6.5% of backbone fwd+bwd
    (tools/profile_bn_variants.py). Here the mean/variance reductions run
    in fp32 (accuracy-critical) but the normalization is folded into one
    bf16 multiply-add: out = x * a + b with a = scale*rsqrt(var+eps),
    b = bias - mean*a. Parameter/stat tree matches flax BatchNorm
    (scale/bias params, mean/var batch_stats), so checkpoints and the timm
    importer are unaffected.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average=None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(c, jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if ura:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            # biased variance, same as flax BatchNorm
            var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        inv = scale * jax.lax.rsqrt(var + self.epsilon)
        a = inv.astype(x.dtype)
        b = (bias - mean * inv).astype(x.dtype)
        return x * a + b
