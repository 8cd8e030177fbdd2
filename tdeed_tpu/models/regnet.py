"""RegNet-Y backbone in Flax/NHWC with temporal-shift injection points.

From-scratch implementation of the two backbones the reference builds via
timm ('regnety_002' ~3.2M params / feat 368, 'regnety_008' ~6.3M / feat 768;
ref: model/model.py:37-46), with a GatedShift inserted before conv1 of every
block in stages s3/s4 (ref: model/shift.py:46-59).

TPU-first choices: NHWC activations, bf16 compute with fp32 params and fp32
batch-norm statistics; all convs lower straight onto the MXU. Stage/width
generation follows the RegNet recipe (Radosavovic et al., 2020) with the
timm parameterization so timm checkpoints can be converted 1:1
(tools/import_timm_weights.py).

Naming mirrors timm (stem, s1..s4, b1..bN, conv1/conv2/conv3/se/downsample)
so the weight converter is a pure name map.
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tdeed_tpu.models.common import SplitBatchNorm
from tdeed_tpu.models.shift import GatedShift

ARCH_PARAMS = {
    # timm regnety_002 / regnety_008 generation parameters.
    "rny002": dict(w0=24, wa=36.44, wm=2.49, depth=13, group_size=8),
    "regnety_002": dict(w0=24, wa=36.44, wm=2.49, depth=13, group_size=8),
    "rny008": dict(w0=56, wa=38.84, wm=2.4, depth=14, group_size=16),
    "regnety_008": dict(w0=56, wa=38.84, wm=2.4, depth=14, group_size=16),
}

STEM_WIDTH = 32
SE_RATIO = 0.25


def generate_stages(
    w0: float, wa: float, wm: float, depth: int, group_size: int, q: int = 8
) -> Tuple[List[int], List[int], List[int]]:
    """RegNet width generation + group-compat adjustment (timm semantics).

    Returns (stage_widths, stage_depths, stage_groups).
    """
    widths_cont = w0 + wa * np.arange(depth)
    ks = np.round(np.log(widths_cont / w0) / np.log(wm))
    widths = w0 * np.power(wm, ks)
    widths = (np.round(widths / q) * q).astype(int)
    stage_widths, stage_depths = np.unique(widths, return_counts=True)
    groups = [min(group_size, int(w)) for w in stage_widths]
    # quantize widths to be divisible by their group size
    stage_widths = [int(round(w / g) * g) for w, g in zip(stage_widths, groups)]
    return stage_widths, list(int(d) for d in stage_depths), groups


def feature_dim(arch: str) -> int:
    p = ARCH_PARAMS[arch]
    widths, _, _ = generate_stages(p["w0"], p["wa"], p["wm"], p["depth"], p["group_size"])
    return widths[-1]


_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm + optional ReLU, NHWC."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        # Explicit symmetric padding, NOT "SAME": at stride 2 on even
        # inputs XLA's SAME pads (0,1) while torch/timm pad (1,1) — the
        # sampled grids differ (verified: max abs diff ~1.7 on random
        # weights) and imported timm checkpoints would be silently
        # misaligned. Symmetric k//2 matches torch exactly at both
        # strides with identical output shapes.
        k = self.kernel_size
        x = nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=self.strides,
            padding=((k // 2, k // 2), (k // 2, k // 2)),
            feature_group_count=self.groups,
            use_bias=False,
            kernel_init=_conv_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        # fp32 stats, bf16 apply (see SplitBatchNorm) — measured ~6.5%
        # faster backbone fwd+bwd than flax fp32 BatchNorm
        x = SplitBatchNorm(use_running_average=not train, name="bn")(x)
        if self.act:
            x = nn.relu(x)
        return x.astype(self.dtype or x.dtype)


class SEModule(nn.Module):
    """Squeeze-and-excitation; reduction channels from the *block input* width
    (timm regnet: rd = round(in_chs * 0.25))."""

    rd_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(
            self.rd_channels, (1, 1), use_bias=True,
            kernel_init=_conv_init, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="fc1",
        )(s)
        s = nn.relu(s)
        s = nn.Conv(
            c, (1, 1), use_bias=True,
            kernel_init=_conv_init, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="fc2",
        )(s)
        return x * nn.sigmoid(s)


def _mix_bn_stats(old_bn, mv):
    """Momentum-mixed running stats the plain SplitBatchNorm path writes."""
    mom = SplitBatchNorm.momentum
    m, v = mv
    return {"bn": {
        "mean": mom * old_bn["bn"]["mean"] + (1 - mom) * m,
        "var": mom * old_bn["bn"]["var"] + (1 - mom) * v,
    }}


class YBlock(nn.Module):
    """RegNet-Y bottleneck block (bottle_ratio=1) with optional temporal shift
    applied to the block input before conv1 (ref: model/shift.py:89-93).

    fuse: on the training path, route the post-shift block through the
    recompute-in-backward custom VJP (kernels/fused_block.py
    make_fused_shift_block) — only meaningful for stride-2 shift blocks
    (s3_b1/s4_b1). The shift itself (and its backward) stays in XLA; the
    param/batch_stats trees are unchanged."""

    width: int
    in_width: int
    stride: int
    group_size: int
    shift: Optional[str] = None  # None | 'gsm' | 'gsf'
    clip_len: int = 0
    fuse: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = x
        if self.shift is not None:
            xg = GatedShift(
                clip_len=self.clip_len, mode=self.shift, dtype=self.dtype,
                name="gs"
            )(x, train)
            if (self.fuse and self.stride == 2 and train
                    and not self.is_initializing()):
                fn = _fused_shift_fn(self.width // self.group_size)
                params = self.variables["params"]
                p = {"blk": {k: params[k] for k in
                             ("conv1", "conv2", "se", "conv3", "downsample")}}
                out, stats = fn(xg, x, p)
                old = self.variables["batch_stats"]
                for k in ("conv1", "conv2", "conv3", "downsample"):
                    self.put_variable(
                        "batch_stats", k, _mix_bn_stats(old[k], stats[k])
                    )
                return out
            x = xg
        w = self.width
        if (self.fuse and self.stride == 1 and train
                and not self.is_initializing()):
            # stride-1 blocks: fuse only the conv1+BN+relu backward (a
            # full-block fusion would re-run the tail at the same
            # resolution — see kernels/fused_block.py
            # make_fused_conv_bn_relu).
            fn = _fused_conv1_fn()
            out, mv = fn(x, self.variables["params"]["conv1"])
            self.put_variable(
                "batch_stats", "conv1",
                _mix_bn_stats(self.variables["batch_stats"]["conv1"], mv),
            )
        else:
            out = ConvBN(w, 1, dtype=self.dtype, name="conv1")(x, train)
        out = ConvBN(
            w, 3, strides=self.stride, groups=w // self.group_size,
            dtype=self.dtype, name="conv2",
        )(out, train)
        out = SEModule(
            rd_channels=int(round(self.in_width * SE_RATIO)),
            dtype=self.dtype, name="se",
        )(out)
        out = ConvBN(w, 1, act=False, dtype=self.dtype, name="conv3")(out, train)
        if self.stride != 1 or self.in_width != w:
            shortcut = ConvBN(
                w, 1, strides=self.stride, act=False,
                dtype=self.dtype, name="downsample",
            )(shortcut, train)
        return nn.relu(out + shortcut).astype(out.dtype)


@functools.lru_cache(maxsize=None)
def _fused_entry_fn(groups: int, with_stem: bool):
    from tdeed_tpu.kernels.fused_block import make_fused_block

    return make_fused_block(groups=groups, with_stem=with_stem)


@functools.lru_cache(maxsize=None)
def _fused_shift_fn(groups: int):
    from tdeed_tpu.kernels.fused_block import make_fused_shift_block

    return make_fused_shift_block(groups=groups)


@functools.lru_cache(maxsize=None)
def _fused_conv1_fn():
    from tdeed_tpu.kernels.fused_block import make_fused_conv_bn_relu

    return make_fused_conv_bn_relu()


class RegNetY(nn.Module):
    """RegNet-Y trunk -> global-average-pooled features (N, D).

    arch: 'rny002' | 'rny008' (timm regnety_002/regnety_008 topology).
    shift_mode/clip_len: inject GatedShift in all blocks of stages 3 and 4
    only (ref: model/shift.py:57-59).
    fuse_entry: route stem+s1_b1 and s2_b1 through the recompute-in-backward
    custom VJP (kernels/fused_block.py) on the training path. Param and
    batch_stats trees are unchanged (the fused path reads the same
    variables), so checkpoints, the timm importer, and eval are unaffected.
    """

    arch: str = "rny002"
    shift_mode: Optional[str] = None
    clip_len: int = 0
    fuse_entry: bool = False
    fuse_shift: bool = False  # fused stride-2 shift blocks (s3_b1/s4_b1)
    dtype: Any = None

    def _apply_fused(self, x, w: int, g: int, with_stem: bool, block: str):
        """Run [stem ->] entry block `block` via the fused custom VJP and
        write the momentum-mixed running stats the plain path would have."""
        fn = _fused_entry_fn(w // g, with_stem)
        params = self.variables["params"]
        old = self.variables["batch_stats"]
        p = {"blk": params[block]}
        if with_stem:
            p["stem"] = params["stem"]
        x, stats = fn(x, p)

        if with_stem:
            self.put_variable(
                "batch_stats", "stem", _mix_bn_stats(old["stem"], stats["stem"])
            )
        self.put_variable(
            "batch_stats", block,
            {k: _mix_bn_stats(old[block][k], stats[k])
             for k in ("conv1", "conv2", "conv3", "downsample")},
        )
        return x

    @nn.compact
    def __call__(self, x, train: bool):
        p = ARCH_PARAMS[self.arch]
        widths, depths, groups = generate_stages(
            p["w0"], p["wa"], p["wm"], p["depth"], p["group_size"]
        )
        fused = self.fuse_entry and train and not self.is_initializing()
        if not fused:
            x = ConvBN(STEM_WIDTH, 3, strides=2, dtype=self.dtype, name="stem")(
                x, train
            )
        in_w = STEM_WIDTH
        for si, (w, d, g) in enumerate(zip(widths, depths, groups)):
            use_shift = self.shift_mode is not None and si >= 2
            for bi in range(d):
                if fused and si == 0 and bi == 0:
                    x = self._apply_fused(x, w, g, True, "s1_b1")
                elif fused and si == 1 and bi == 0:
                    x = self._apply_fused(x, w, g, False, "s2_b1")
                else:
                    x = YBlock(
                        width=w,
                        in_width=in_w,
                        stride=2 if bi == 0 else 1,
                        group_size=g,
                        shift=self.shift_mode if use_shift else None,
                        clip_len=self.clip_len,
                        fuse=self.fuse_shift,
                        dtype=self.dtype,
                        name=f"s{si + 1}_b{bi + 1}",
                    )(x, train)
                in_w = w
        return jnp.mean(x, axis=(1, 2))  # (N, D)
