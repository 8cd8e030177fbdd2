"""Round-3 perf ladder: early-stage memory + s3/s4 grouped-conv attribution.

Targets the two ~2x-roofline gaps the round-2 ablation left open
(docs/DESIGN.md): stem+s1+s2 HBM traffic and the s3/s4 grouped convs.
All numbers are FULL train-step times with threaded state (the only
dedup-proof pattern on the axon tunnel).

Variants:
  base          anchor
  affine-bn     BN replaced by scale/bias only [timing-only] -> total cost
                of batch statistics (fwd reduces + their backward)
  bn-bf16stats  BN stats reduced in bf16 [timing-only] -> cost of the fp32
                stat pass staging
  tap-grouped   3x3 stride-1 grouped convs as 9 shifted per-tap group
                einsums (EXACT math; adoption candidate)
  conv2-1x1     3x3 grouped conv2 -> 1x1 dense [timing-only] -> isolates
                the grouped-conv lowering cost inside s3/s4
  trunc2/3      stage re-anchors at the current baseline
  cost          XLA cost_analysis of the compiled step (bytes/flops)

One process = one TPU claim:
  python tools/profile_r3.py [--iters 10] [--variants ...]
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

import tdeed_tpu.models.regnet as regnet_mod  # noqa: E402
import tdeed_tpu.models.shift as shift_mod  # noqa: E402
from tdeed_tpu.models.common import SplitBatchNorm  # noqa: E402
from tools.profile_roofline import (  # noqa: E402
    patched,
    report,
    rows,
    step_time,
    trunc_stages,
)

# Captured BEFORE any patching: delegating variants must reach the real
# ConvBN even while regnet_mod.ConvBN is patched to themselves.
_ORIG_CONVBN = regnet_mod.ConvBN


class AffineBN(nn.Module):
    """Scale/bias only — no statistics at all [timing variant]."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average=None):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class BF16StatsBN(nn.Module):
    """SplitBatchNorm with the stat reduces in the activation dtype
    [timing variant — quantifies the fp32 staging cost]."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average=None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if ura:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes).astype(jnp.float32)
            var = (
                jnp.mean(jnp.square(x), axis=axes).astype(jnp.float32)
                - jnp.square(mean)
            )
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        inv = scale * jax.lax.rsqrt(var + self.epsilon)
        a = inv.astype(x.dtype)
        b = (bias - mean * inv).astype(x.dtype)
        return x * a + b


def _shift_hw(a: jax.Array, dy: int, dx: int) -> jax.Array:
    """Zero-filled shift over axes (1, 2) of (N, H, W, ...): y[p] = a[p+d]."""
    for axis, off in ((1, dy), (2, dx)):
        if off == 0:
            continue
        pad = [(0, 0)] * a.ndim
        sl = [slice(None)] * a.ndim
        if off > 0:
            sl[axis] = slice(off, None)
            pad[axis] = (0, off)
        else:
            sl[axis] = slice(None, off)
            pad[axis] = (-off, 0)
        a = jnp.pad(a[tuple(sl)], pad)
    return a


class TapGroupedConvBN(nn.Module):
    """ConvBN with 3x3 stride-1 grouped convs computed as 9 shifted
    per-tap group-batched einsums (EXACT same math/rounding as the conv:
    bf16 products, one fp32 accumulation, one final round). Param tree
    matches ConvBN (conv/kernel + bn) so checkpoints are unaffected."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        k = self.kernel_size
        if self.groups == 1 or k != 3 or self.strides != 1:
            return _ORIG_CONVBN(
                self.features, k, strides=self.strides, groups=self.groups,
                act=self.act, dtype=self.dtype, name="inner",
            )(x, train)

        n, h, w, c = x.shape
        g = self.groups
        gw = c // g
        og = self.features // g
        kernel = self.param(
            "kernel_", regnet_mod._conv_init, (3, 3, gw, self.features)
        )
        kk = kernel.reshape(3, 3, gw, g, og).astype(x.dtype)
        xg = x.reshape(n, h, w, g, gw)
        acc = None
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                z = jnp.einsum(
                    "nhwgi,igo->nhwgo",
                    _shift_hw(xg, dy, dx),
                    kk[dy + 1, dx + 1],
                    preferred_element_type=jnp.float32,
                )
                acc = z if acc is None else acc + z
        out = acc.reshape(n, h, w, self.features).astype(self.dtype or x.dtype)
        out = SplitBatchNorm(use_running_average=not train, name="bn")(out)
        if self.act:
            out = nn.relu(out)
        return out.astype(self.dtype or out.dtype)


class Conv2As1x1(nn.Module):
    """Grouped 3x3 conv2 -> dense 1x1 [timing-only cost isolator]."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        k = self.kernel_size
        groups = self.groups
        if groups > 1 and k == 3:
            k, groups = 1, 1
        return _ORIG_CONVBN(
            self.features, k, strides=self.strides, groups=groups,
            act=self.act, dtype=self.dtype, name="inner",
        )(x, train)


class Einsum1x1ConvBN(nn.Module):
    """ConvBN with 1x1 convs lowered as channel einsums (EXACT math:
    stride-2 1x1 == slice-then-matmul, bf16 operands, f32 accumulation).

    Motivation (trace attribution, docs/DESIGN.md): the 1x1 conv BACKWARDS
    dominate the early stages — s1_b1/conv1 bwd alone is 7.0 ms, ~2.5x its
    ideal HBM traffic — XLA's conv-backward lowering pays layout copies
    that a plain dot avoids."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        if self.kernel_size != 1 or self.groups != 1:
            return _ORIG_CONVBN(
                self.features, self.kernel_size, strides=self.strides,
                groups=self.groups, act=self.act, dtype=self.dtype,
                name="inner",
            )(x, train)
        kernel = self.param(
            "kernel_", regnet_mod._conv_init, (x.shape[-1], self.features)
        )
        if self.strides != 1:
            x = x[:, :: self.strides, :: self.strides, :]
        out = jnp.einsum(
            "nhwc,co->nhwo", x, kernel.astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype or x.dtype)
        out = SplitBatchNorm(use_running_average=not train, name="bn")(out)
        if self.act:
            out = nn.relu(out)
        return out.astype(self.dtype or out.dtype)


def _mixup_batch_bf16(frames, labels, frames2, labels2, key, num_classes_bg,
                      label_d=None, label_d2=None):
    """mixup blend in bf16 (halves the blend+flip traffic; one extra
    ~1/256-relative rounding of blended pixels, same magnitude as the
    already-documented bf16 kernel staging)."""
    import tdeed_tpu.train.augment as aug

    lam = aug.sample_mixup_lam(key, labels.shape[0])
    lam_b = lam.astype(jnp.bfloat16)[:, None, None, None, None]
    mixed = (
        lam_b * frames.astype(jnp.bfloat16)
        + (1.0 - lam_b) * frames2.astype(jnp.bfloat16)
    )
    soft, mixed_d = aug.mixup_labels(
        labels, labels2, lam, num_classes_bg, label_d, label_d2
    )
    return mixed, soft, mixed_d


class KronConvBN(nn.Module):
    """1x1 convs on small-C early stages as kron-packed GEMMs (EXACT).

    A (N,H,W,C) @ (C,O) pointwise conv with C<=64 wastes most of the
    128-lane registers; packing P=16 pixels per row gives a fully-packed
    (M/P, P*C) x (P*C, P*O) GEMM against kron(I_P, W) — block-diagonal, so
    products/accumulations are identical (off-block zeros add exact f32
    zeros); the ~P x extra MXU FLOPs are free on this memory-bound step."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = None

    P = 16

    @nn.compact
    def __call__(self, x, train: bool):
        cin = x.shape[-1]
        if (self.kernel_size != 1 or self.groups != 1 or cin > 64):
            return _ORIG_CONVBN(
                self.features, self.kernel_size, strides=self.strides,
                groups=self.groups, act=self.act, dtype=self.dtype,
                name="inner",
            )(x, train)
        kernel = self.param(
            "kernel_", regnet_mod._conv_init, (cin, self.features)
        )
        if self.strides != 1:
            x = x[:, :: self.strides, :: self.strides, :]
        n, h, w, _ = x.shape
        P = self.P
        m = n * h * w
        assert m % P == 0, (n, h, w, P)
        kb = kernel.astype(x.dtype)
        eye = jnp.eye(P, dtype=x.dtype)
        wk = jnp.einsum("pq,co->pcqo", eye, kb).reshape(
            P * cin, P * self.features
        )
        out = jnp.dot(
            x.reshape(m // P, P * cin), wk,
            preferred_element_type=jnp.float32,
        )
        out = out.reshape(n, h, w, self.features).astype(self.dtype or x.dtype)
        out = SplitBatchNorm(use_running_average=not train, name="bn")(out)
        if self.act:
            out = nn.relu(out)
        return out.astype(self.dtype or out.dtype)


def run(name: str, iters: int) -> None:
    if name == "base":
        report("base (production)", step_time(iters=iters))
    elif name == "affine-bn":
        with patched(
            p=(regnet_mod, "SplitBatchNorm", AffineBN),
            q=(shift_mod, "SplitBatchNorm", AffineBN),
        ):
            report("BN -> affine only (timing)", step_time(iters=iters))
    elif name == "bn-bf16stats":
        with patched(
            p=(regnet_mod, "SplitBatchNorm", BF16StatsBN),
            q=(shift_mod, "SplitBatchNorm", BF16StatsBN),
        ):
            report("BN stats in bf16 (timing)", step_time(iters=iters))
    elif name == "tap-grouped":
        with patched(p=(regnet_mod, "ConvBN", TapGroupedConvBN)):
            report("grouped conv2 tap-factored", step_time(iters=iters))
    elif name == "kron-1x1":
        with patched(p=(regnet_mod, "ConvBN", KronConvBN)):
            report("small-C 1x1 as kron GEMM", step_time(iters=iters))
    elif name == "conv1x1-einsum":
        with patched(p=(regnet_mod, "ConvBN", Einsum1x1ConvBN)):
            report("1x1 convs as einsum", step_time(iters=iters))
    elif name == "blend-bf16":
        import tdeed_tpu.train.augment as aug_mod

        with patched(p=(aug_mod, "mixup_batch", _mixup_batch_bf16)):
            report("mixup blend in bf16", step_time(iters=iters))
    elif name == "combo-r3":
        import tdeed_tpu.train.augment as aug_mod

        with patched(
            p=(regnet_mod, "ConvBN", Einsum1x1ConvBN),
            q=(aug_mod, "mixup_batch", _mixup_batch_bf16),
        ):
            report("einsum 1x1 + bf16 blend", step_time(iters=iters))
    elif name == "conv2-1x1":
        with patched(p=(regnet_mod, "ConvBN", Conv2As1x1)):
            report("grouped conv2 -> 1x1 (timing)", step_time(iters=iters))
    elif name.startswith("trunc"):
        import tdeed_tpu.models.tdeed as tdeed_mod

        n_stages = int(name[len("trunc"):])

        class PaddedRegNetY(regnet_mod.RegNetY):
            @nn.compact
            def __call__(self, x, train: bool):
                out = regnet_mod.RegNetY.__call__(self, x, train)
                d = out.shape[-1]
                if d < 368:
                    out = jnp.pad(out, ((0, 0), (0, 368 - d)))
                return out

        with patched(
            p=(regnet_mod, "generate_stages", trunc_stages(n_stages)),
            q=(tdeed_mod, "RegNetY", PaddedRegNetY),
        ):
            report(f"stages 1..{n_stages} only", step_time(iters=iters))
    elif name == "cost":
        _cost_probe()
    else:
        raise SystemExit(f"unknown variant {name}")


def _cost_probe():
    """XLA cost_analysis of the compiled production step."""
    import numpy as np

    from tdeed_tpu.config import TDEEDConfig
    from tdeed_tpu.models.tdeed import build_model
    from tdeed_tpu.train.schedule import make_optimizer
    from tdeed_tpu.train.state import TrainState
    from tdeed_tpu.train.step import make_train_step
    from tools.profile_roofline import B, S, T

    cfg = TDEEDConfig(
        dataset="finediving", num_classes=4, clip_len=T, crop_dim=S,
        feature_arch="rny002_gsf", n_layers=2, sgp_ks=7, sgp_r=4,
        radi_displacement=2,
    )
    model = build_model(cfg)
    r = np.random.default_rng(0)
    batch = {
        "frame": jnp.asarray(r.integers(0, 256, (B, T, 256, 256, 3), np.uint8)),
        "label": jnp.asarray(r.integers(0, 5, (B, T)).astype(np.int32)),
        "labelD": jnp.asarray(r.integers(-2, 3, (B, T)).astype(np.float32)),
        "frame2": jnp.asarray(r.integers(0, 256, (B, T, 256, 256, 3), np.uint8)),
        "label2": jnp.asarray(r.integers(0, 5, (B, T)).astype(np.int32)),
        "labelD2": jnp.asarray(r.integers(-2, 3, (B, T)).astype(np.float32)),
    }
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, T, S, S, 3), jnp.float32), False
    )
    tx = make_optimizer(8e-4, 100, 10_000)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step = jax.jit(make_train_step(
        model, tx, crop_dim=S, num_classes_bg=5, mixup=True,
        radi_displacement=2,
    ), donate_argnums=(0,))
    ca = step.lower(state, batch, jax.random.PRNGKey(1)).compile().cost_analysis()
    keys = ["flops", "bytes accessed", "bytes accessed output",
            "bytes accessed operand 0 {}", "transcendentals"]
    for key in sorted(ca):
        if "bytes" in key or key in ("flops", "transcendentals"):
            v = ca[key]
            if isinstance(v, float) and v > 1e6:
                print(f"  {key}: {v / 1e9:.2f} G")
    bw = ca.get("bytes accessed", 0.0)
    fl = ca.get("flops", 0.0)
    print(f"cost_analysis: {fl/1e9:.1f} GFLOP, {bw/1e9:.2f} GB accessed")
    print(f"  roofline @819GB/s: {bw/819e9*1e3:.2f} ms; @197TF bf16: "
          f"{fl/197e12*1e3:.2f} ms")


DEFAULT = "base,affine-bn,bn-bf16stats,tap-grouped,conv2-1x1,trunc2,trunc3,cost"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--variants", default=DEFAULT)
    args = p.parse_args(argv)
    for v in args.variants.split(","):
        run(v.strip(), args.iters)
    print("\nname, ms, frames/s")
    for name, ms, fps in rows:
        print(f"{name}, {ms:.2f}, {fps:.0f}")


if __name__ == "__main__":
    main()
