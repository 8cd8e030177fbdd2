"""Gated temporal shift (GSM / GSF) in NHWC, plus the fold-dim wrapper.

The reference injects a GatedShift before conv1 of every block in backbone
stages s3/s4 (ref: model/shift.py:46-59), gating a temporal ±1 shift of the
first fold_dim channels (fold_dim = ceil(C//4 / 4) * 4, ref: model/shift.py:79).
GSM (ref: model/impl/gsm.py:69-116) learns tanh gates from a zero-init grouped
3D conv; GSF (ref: model/impl/gsf.py:9-93) adds a learned sigmoid fusion of
shifted vs residual parts from spatially pooled statistics.

TPU-native redesign:
  * channels-last (B, T, H, W, C) throughout — the 3D gate conv is an XLA
    conv_general_dilated over (T, H, W); gating/shift/fusion are elementwise
    VPU ops XLA fuses into neighbours;
  * the temporal shift is a pad+slice (no torch.cuda tensors,
    cf. gsm.py:67,84,87 which is CUDA-only in the reference);
  * the channel interleave-regroup (gsm.py:110-116) is a reshape/transpose
    pair that XLA folds into the surrounding layout assignment.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from tdeed_tpu.models.common import SplitBatchNorm
from tdeed_tpu.ops.temporal import lshift_zero, rshift_zero


def fold_dim_for(channels: int, n_div: int = 4) -> int:
    """fold_dim = ceil((channels // n_div) / 4) * 4 (ref: model/shift.py:79)."""
    return math.ceil(channels // n_div / 4) * 4


def _interleave_halves(y1: jax.Array, y2: jax.Array) -> jax.Array:
    """Reproduce the reference regroup (ref: gsm.py:110-116).

    Each half (C/2 channels) is viewed as (2, C/4), transposed to (C/4, 2) and
    re-flattened — i.e. channel c of the output half comes from
    (c % 2) * C/4 + c // 2 of the input half — then the halves are concatenated.
    """
    def regroup(y):
        *lead, c = y.shape
        y = y.reshape(*lead, 2, c // 2)
        y = jnp.swapaxes(y, -1, -2)
        return y.reshape(*lead, c)

    return jnp.concatenate([regroup(y1), regroup(y2)], axis=-1)


class _BareGateParams(nn.Module):
    """Zero-init grouped-3D-conv gate parameters in the tree position
    nn.Conv used (<parent>/{kernel, bias}) — the compute itself runs
    through the factored gate GEMM (kernels/gated_shift.gsf_gate)."""

    channels: int

    @nn.compact
    def __call__(self):
        shape = (3, 3, 3, self.channels // 2, 2)
        k = self.param("kernel", nn.initializers.zeros, shape, jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (2,), jnp.float32)
        return k, b


class GSM(nn.Module):
    """Gate-Shift Module (ref: model/impl/gsm.py:69-116).

    Input (B, T, H, W, C). Zero-init gate conv => identity at init.

    The 2-output-channel grouped gate conv lowers disastrously on the MXU
    (its output pads to the 128-lane tile; measured ~30 ms/step for the
    identical conv in GSF before the factored-gate rewrite) — so the gate
    runs through the same factored channel-GEMM + hierarchical tap-sum as
    GSF (kernels/gated_shift.gsf_gate, bit-exact vs the conv in fp32).
    Parameter tree is unchanged (gate_conv/{kernel, bias}).
    """

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        from tdeed_tpu.kernels.gated_shift import gsf_gate

        c = x.shape[-1]
        assert c % 2 == 0, c
        xn = SplitBatchNorm(use_running_average=not train, name="bn")(x)
        xn = nn.relu(xn)
        gate_w, gate_b = _BareGateParams(c, name="gate_conv")()
        dt = self.dtype or x.dtype
        gate = gsf_gate(
            xn.astype(dt), gate_w.astype(jnp.float32), gate_b.astype(jnp.float32)
        ).astype(dt)
        g1, g2 = gate[..., 0:1], gate[..., 1:2]

        x1, x2 = x[..., : c // 2], x[..., c // 2 :]
        y1, y2 = g1 * x1, g2 * x2
        r1, r2 = x1 - y1, x2 - y2
        y1 = lshift_zero(y1, axis=1) + r1
        y2 = rshift_zero(y2, axis=1) + r2
        return _interleave_halves(y1, y2)


class _ConvParams(nn.Module):
    """Bare conv parameters with torch-default init, in the same tree
    position nn.Conv would use (<parent>/conv/{kernel, bias})."""

    shape: tuple
    fan_in: int

    @nn.compact
    def __call__(self):
        from tdeed_tpu.models.common import torch_bias_init, torch_kernel_init

        class _Inner(nn.Module):
            shape: tuple
            fan_in: int

            @nn.compact
            def __call__(self):
                k = self.param("kernel", torch_kernel_init, self.shape)
                b = self.param(
                    "bias", torch_bias_init(self.fan_in), (self.shape[-1],)
                )
                return k, b

        return _Inner(self.shape, self.fan_in, name="conv")()


class GSF(nn.Module):
    """Gate-Shift-Fuse (ref: model/impl/gsf.py:9-93) — the shipped-config
    variant. Compute core in kernels/gated_shift.py (factored gate GEMM +
    fused post-gate chain; see that module for the measured ladder)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        from tdeed_tpu.kernels.gated_shift import gsf_core

        c = x.shape[-1]
        assert c % 4 == 0, c
        xn = SplitBatchNorm(use_running_average=not train, name="bn")(x)
        xn = nn.relu(xn)

        # Default-init (not zero) gate conv, unlike GSM (ref: gsf.py:17-18).
        gate_w, gate_b = _ConvParams(
            (3, 3, 3, c // 2, 2), fan_in=(c // 2) * 27, name="gate_conv"
        )()
        ch1_w, ch1_b = _ConvParams((3, 3, 2, 1), fan_in=18, name="channel_conv1")()
        ch2_w, ch2_b = _ConvParams((3, 3, 2, 1), fan_in=18, name="channel_conv2")()

        dt = self.dtype or x.dtype
        f32 = jnp.float32
        out = gsf_core(
            x.astype(dt), xn.astype(dt),
            gate_w.astype(f32), gate_b.astype(f32),
            ch1_w.astype(f32), ch1_b.astype(f32),
            ch2_w.astype(f32), ch2_b.astype(f32),
        )
        out = out.astype(dt)
        return _interleave_halves(out[..., : c // 2], out[..., c // 2 :])


class GatedShift(nn.Module):
    """Apply GSM/GSF to the first fold_dim channels, passthrough for the rest
    (ref: model/shift.py:64-93). Operates on backbone activations shaped
    (B*T, H, W, C); clip_len is static so the (B, T) reshape is free.
    """

    clip_len: int
    mode: str  # 'gsm' | 'gsf'
    n_div: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        n, h, w, c = x.shape
        fold = fold_dim_for(c, self.n_div)
        b = n // self.clip_len
        head = x[..., :fold].reshape(b, self.clip_len, h, w, fold)
        if self.mode == "gsm":
            head = GSM(dtype=self.dtype, name="gs")(head, train)
        elif self.mode == "gsf":
            head = GSF(dtype=self.dtype, name="gs")(head, train)
        else:
            raise NotImplementedError(self.mode)
        head = head.reshape(n, h, w, fold)
        return jnp.concatenate([head, x[..., fold:]], axis=-1)
