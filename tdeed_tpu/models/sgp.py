"""SGP temporal encoder-decoder (EDSGPMixer), TPU-native.

Re-design of the reference SGP / SGP-Mixer U-Net (ref: model/modules.py:58-318):
  * channels-last (B, T, C) so C maps to TPU lanes; depthwise temporal convs
    lower to XLA depthwise convolutions fused with the elementwise branch math;
  * decoder upsampling is an MXU matmul against a static interpolation matrix
    (ops/temporal.py) instead of a gather-based resize;
  * pooling uses static bin plans (no dynamic shapes under jit).

Math parity (same parameterization, verified against a torch oracle in
tests/test_sgp.py):
  SGPBlock:  out = ln(x); out = fc(out)*relu(gfc(mean_T(out)))
                   + (convw(out)+convkw(out))*psi(out) + out;
             out = x + out; out = out + mlp(gn(out))     (modules.py:159-188)
  SGPMixer:  dual-branch fusion of upsampled decoder state and skip, 6-way
             concat -> 1x1 conv -> GELU, + FFN           (modules.py:283-318)
"""

from __future__ import annotations

import math
from typing import Any, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from tdeed_tpu.models.common import TorchDense, gelu_exact, normal_init
from tdeed_tpu.ops.temporal import adaptive_max_pool1d, linear_upsample


def _up_size(kernel_size: int, k: float) -> int:
    """Window-branch kernel size: round((ks+1)*k), forced odd (modules.py:119-120)."""
    assert kernel_size % 2 == 1
    up = round((kernel_size + 1) * k)
    return up + 1 if up % 2 == 0 else up


class _DWConv(nn.Module):
    """Depthwise temporal conv on (B, T, C) with N(0, init_std) kernel, zero bias.

    Matches the reference branch convs (groups=n_embd Conv1d,
    ref: model/modules.py:122-126 init at :147-157).
    """

    kernel_size: int
    init_std: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        return nn.Conv(
            features=c,
            kernel_size=(self.kernel_size,),
            feature_group_count=c,
            padding="SAME",
            kernel_init=normal_init(self.init_std),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(x)


class _FFN(nn.Module):
    """GroupNorm(16) + 1x1-conv MLP with 4x hidden (modules.py:115,134-138)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.GroupNorm(num_groups=16, epsilon=1e-5, dtype=self.dtype, name="gn")(x)
        h = TorchDense(4 * c, dtype=self.dtype, name="mlp_fc1")(h)
        h = gelu_exact(h)
        h = TorchDense(c, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class SGPBlock(nn.Module):
    """Scalable-Granularity Perception block (ref: model/modules.py:89-188)."""

    kernel_size: int = 3
    k: float = 1.5
    init_conv_vars: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # x: (B, T, C)
        up = _up_size(self.kernel_size, self.k)
        std = self.init_conv_vars
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(x)

        psi = _DWConv(self.kernel_size, std, self.dtype, name="psi")(out)
        fc = _DWConv(1, std, self.dtype, name="fc")(out)
        convw = _DWConv(self.kernel_size, std, self.dtype, name="convw")(out)
        convkw = _DWConv(up, std, self.dtype, name="convkw")(out)
        # Instant-level gate: ReLU(1x1 dwconv of the temporal mean).
        phi = _DWConv(1, std, self.dtype, name="global_fc")(
            jnp.mean(out, axis=1, keepdims=True)
        )
        phi = nn.relu(phi)

        out = fc * phi + (convw + convkw) * psi + out  # 'normal' mode (modules.py:170)
        out = x + out
        return _FFN(dtype=self.dtype, name="ffn")(out)


class SGPMixer(nn.Module):
    """Decoder fusion block: skip z + upsampled x (ref: model/modules.py:190-318)."""

    t_size: int  # target length after upsample
    kernel_size: int = 3
    k: float = 1.5
    init_conv_vars: float = 0.1
    concat: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, z):
        # x: (B, T_small, C) decoder state; z: (B, t_size, C) encoder skip.
        up = _up_size(self.kernel_size, self.k)
        std = self.init_conv_vars

        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(z)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x)
        x = linear_upsample(x, self.t_size)  # MXU matmul (modules.py:236,288)

        psi1 = _DWConv(self.kernel_size, std, self.dtype, name="psi1")(z)
        psi2 = _DWConv(self.kernel_size, std, self.dtype, name="psi2")(x)
        convw1 = _DWConv(self.kernel_size, std, self.dtype, name="convw1")(z)
        convkw1 = _DWConv(up, std, self.dtype, name="convkw1")(z)
        convw2 = _DWConv(self.kernel_size, std, self.dtype, name="convw2")(x)
        convkw2 = _DWConv(up, std, self.dtype, name="convkw2")(x)
        fc1 = _DWConv(1, std, self.dtype, name="fc1")(z)
        fc2 = _DWConv(1, std, self.dtype, name="fc2")(x)
        phi1 = nn.relu(
            _DWConv(1, std, self.dtype, name="global_fc1")(
                jnp.mean(z, axis=1, keepdims=True)
            )
        )
        phi2 = nn.relu(
            _DWConv(1, std, self.dtype, name="global_fc2")(
                jnp.mean(x, axis=1, keepdims=True)
            )
        )

        out1 = (convw1 + convkw1) * psi1
        out2 = (convw2 + convkw2) * psi2
        out3 = fc1 * phi1
        out4 = fc2 * phi2

        if self.concat:
            cat = jnp.concatenate([out1, out2, out3, out4, z, x], axis=-1)
            c = z.shape[-1]
            out = nn.Conv(
                features=c,
                kernel_size=(1,),
                kernel_init=normal_init(std),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name="concat_fc",
            )(cat)
            out = gelu_exact(out)
        else:
            out = out1 + out2 + out3 + out4 + z + x

        return _FFN(dtype=self.dtype, name="ffn")(out)


class EDSGPMixer(nn.Module):
    """Temporal U-Net: L SGP encoder levels, bottleneck, L mixer+SGP decoder
    levels (ref: model/modules.py:58-87). Level i has length ceil(T / 2**i).
    """

    clip_len: int
    num_layers: int = 2
    kernel_size: int = 3
    k: float = 2.0
    k_factor: int = 2
    concat: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # x: (B, T, C)
        lens = [
            math.ceil(self.clip_len / (self.k_factor ** i))
            for i in range(self.num_layers + 1)
        ]
        blocks = [
            SGPBlock(
                kernel_size=self.kernel_size,
                k=self.k,
                dtype=self.dtype,
                name=f"sgp_{i}",
            )
            for i in range(2 * self.num_layers + 1)
        ]
        mixers = [
            SGPMixer(
                t_size=lens[i],
                kernel_size=self.kernel_size,
                k=self.k,
                concat=self.concat,
                dtype=self.dtype,
                name=f"mixer_{i}",
            )
            for i in range(self.num_layers)
        ]

        skips: List[jax.Array] = []
        for i in range(self.num_layers):
            x = blocks[i](x)
            skips.append(x)
            x = adaptive_max_pool1d(x, lens[i + 1])

        x = blocks[self.num_layers](x)

        for i in range(self.num_layers):
            j = self.num_layers - 1 - i  # reference indexes mixers back-to-front
            x = mixers[j](x, skips[j])
            x = blocks[self.num_layers + i + 1](x)
        return x
