"""BatchNorm strategy ladder: is the backbone's fp32 BN casting a real cost?

Times backbone (no shift) fwd+bwd with:
  fp32-bn   — production ConvBN (cast to fp32, flax BN, cast back)
  bf16-bn   — flax BN entirely in bf16 (timing only; bf16 variance is not
              production-safe)
  split-bn  — custom: batch stats reduced in fp32, normalization applied
              in bf16 (production candidate)
"""

from __future__ import annotations

import os
import sys
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdeed_tpu.utils.profiling import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from flax import linen as nn  # noqa: E402

import tdeed_tpu.models.regnet as regnet_mod  # noqa: E402

B, T, S = 8, 100, 224


class SplitBN(nn.Module):
    """Batch stats in fp32, scale/shift applied in the compute dtype."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average=None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(c, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if ura:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
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


def make_convbn(variant: str):
    _conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

    class VariantConvBN(nn.Module):
        features: int
        kernel_size: int = 3
        strides: int = 1
        groups: int = 1
        act: bool = True
        dtype: Any = None

        @nn.compact
        def __call__(self, x, train: bool):
            x = nn.Conv(
                features=self.features,
                kernel_size=(self.kernel_size, self.kernel_size),
                strides=self.strides,
                padding="SAME",
                feature_group_count=self.groups,
                use_bias=False,
                kernel_init=_conv_init,
                dtype=self.dtype,
                name="conv",
            )(x)
            if variant == "fp32-bn":
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=jnp.float32, name="bn",
                )(x.astype(jnp.float32))
            elif variant == "bf16-bn":
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype, name="bn",
                )(x)
            else:  # split-bn
                x = SplitBN(use_running_average=not train, name="bn")(x)
            if self.act:
                x = nn.relu(x)
            return x.astype(self.dtype or x.dtype)

    return VariantConvBN


def timed(variant: str) -> float:
    orig = regnet_mod.ConvBN
    regnet_mod.ConvBN = make_convbn(variant)
    try:
        bb = regnet_mod.RegNetY(arch="rny002", shift_mode=None,
                                clip_len=T, dtype=jnp.bfloat16)
        r = np.random.default_rng(0)
        x = jnp.asarray(
            r.integers(0, 256, (B * T, S, S, 3)).astype(np.float32) / 255.0
        ).astype(jnp.bfloat16)
        variables = jax.jit(bb.init, static_argnums=(2,))(
            jax.random.PRNGKey(0), x, False
        )

        def loss(params, x):
            out, _ = bb.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, True, mutable=["batch_stats"],
            )
            return jnp.mean(out.astype(jnp.float32))

        @jax.jit
        def step(params, x):
            l, g = jax.value_and_grad(loss)(params, x)
            return jax.tree.map(lambda a, b: a - 1e-3 * b, params, g), l

        p = variables["params"]
        p, l0 = step(p, x)
        jax.block_until_ready(l0)
        t0 = time.perf_counter()
        for _ in range(10):
            p, l = step(p, x)
        jax.block_until_ready(l)
        assert float(l) != float(l0)
        return (time.perf_counter() - t0) / 10
    finally:
        regnet_mod.ConvBN = orig


def main():
    # first timed program in a fresh process measures wildly high (device
    # warmup artifact) — run a throwaway first, then the real ladder
    for variant in ("bf16-bn", "fp32-bn", "split-bn", "bf16-bn"):
        try:
            sec = timed(variant)
            print(f"backbone fwd+bwd [{variant}]: {sec*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"backbone fwd+bwd [{variant}]: FAILED {type(e).__name__}: "
                  f"{str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
