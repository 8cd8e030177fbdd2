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

from tdeed_tpu.models.common import TorchConv
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


class GSM(nn.Module):
    """Gate-Shift Module (ref: model/impl/gsm.py:69-116).

    Input (B, T, H, W, C). Zero-init gate conv => identity at init.
    """

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        c = x.shape[-1]
        xn = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn",
        )(x.astype(jnp.float32))
        xn = nn.relu(xn).astype(x.dtype)
        gate = nn.Conv(
            features=2,
            kernel_size=(3, 3, 3),
            feature_group_count=2,
            padding="SAME",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="gate_conv",
        )(xn)
        gate = jnp.tanh(gate)
        g1, g2 = gate[..., 0:1], gate[..., 1:2]

        x1, x2 = x[..., : c // 2], x[..., c // 2 :]
        y1, y2 = g1 * x1, g2 * x2
        r1, r2 = x1 - y1, x2 - y2
        y1 = lshift_zero(y1, axis=1) + r1
        y2 = rshift_zero(y2, axis=1) + r2
        return _interleave_halves(y1, y2)


class GSF(nn.Module):
    """Gate-Shift-Fuse (ref: model/impl/gsf.py:9-93) — the shipped-config variant."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        c = x.shape[-1]
        assert c % 4 == 0, c
        xn = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn",
        )(x.astype(jnp.float32))
        xn = nn.relu(xn).astype(x.dtype)
        # Default-init (not zero) gate conv, unlike GSM (ref: gsf.py:17-18).
        gate = TorchConv(
            features=2,
            kernel_size=(3, 3, 3),
            feature_group_count=2,
            padding="SAME",
            dtype=self.dtype,
            name="gate_conv",
        )(xn)
        gate = jnp.tanh(gate)
        g1, g2 = gate[..., 0:1], gate[..., 1:2]

        x1, x2 = x[..., : c // 2], x[..., c // 2 :]
        y1, y2 = g1 * x1, g2 * x2
        r1, r2 = x1 - y1, x2 - y2
        y1 = lshift_zero(y1, axis=1)  # shifted parts, zero-padded (gsf.py:58-59)
        y2 = rshift_zero(y2, axis=1)

        # Fusion weights from spatially pooled stats (gsf.py:61-81):
        # stack mean_HW(y), mean_HW(r) as a 2-channel (C/2, T) image, 3x3 conv,
        # sigmoid -> per (channel, frame) blend weight.
        def fuse(y, r, name):
            ym = jnp.swapaxes(jnp.mean(y, axis=(2, 3)), 1, 2)  # (B, C/2, T)
            rm = jnp.swapaxes(jnp.mean(r, axis=(2, 3)), 1, 2)
            stat = jnp.stack([ym, rm], axis=-1)  # (B, C/2, T, 2)
            w = TorchConv(
                features=1, kernel_size=(3, 3), padding="SAME",
                dtype=self.dtype, name=name,
            )(stat)
            w = jax.nn.sigmoid(w[..., 0])  # (B, C/2, T)
            w = jnp.swapaxes(w, 1, 2)[:, :, None, None, :]  # (B, T, 1, 1, C/2)
            return y * w + r * (1.0 - w)

        y1 = fuse(y1, r1, "channel_conv1")
        y2 = fuse(y2, r2, "channel_conv2")
        return _interleave_halves(y1, y2)


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
