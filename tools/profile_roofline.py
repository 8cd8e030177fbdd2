"""Backbone cost attribution via full-train-step ablation (VERDICT r1 item 3).

The axon runtime deduplicates dispatches aggressively (even varying small
args or chained small param updates measure wrong — see docs/DESIGN.md
measurement gotchas). The ONE pattern that measures honestly is the full
jitted train step with its TrainState threaded through. So: time the full
step for a ladder of model variants and attribute costs by delta.

Variants:
  base          production FineDiving_small step (anchor, ~117 ms r1)
  noshift       GSF modules removed               -> total GSF in-graph cost
  nointerleave  GSF without the channel regroup   -> interleave (layout) cost
  gate-vjp      gate conv with hand-written VJP   -> XLA gate-bwd pathology?
  gate-pad8     gate conv padded to 2x8 out ch    -> conv-bwd tiling ladder
  s2d-stem      space-to-depth stem               -> stem formulation
  nose          SE modules removed                -> SE (pool+2 convs) cost
  truncN        backbone stages 1..N only         -> per-stage attribution

One process = one TPU claim. Usage:
  python tools/profile_roofline.py [--iters 10] [--variants base,noshift,...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from contextlib import contextmanager
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdeed_tpu.utils.profiling import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from flax import linen as nn  # noqa: E402

import tdeed_tpu.kernels.gated_shift as gs_mod  # noqa: E402
import tdeed_tpu.models.regnet as regnet_mod  # noqa: E402
import tdeed_tpu.models.shift as shift_mod  # noqa: E402
from tdeed_tpu.config import TDEEDConfig  # noqa: E402
from tdeed_tpu.models.tdeed import build_model  # noqa: E402
from tdeed_tpu.train.schedule import make_optimizer  # noqa: E402
from tdeed_tpu.train.state import TrainState  # noqa: E402
from tdeed_tpu.train.step import make_train_step  # noqa: E402

B, T, S = 8, 100, 224
N = B * T

rows = []


def report(name: str, sec: float):
    rows.append((name, sec * 1e3, N / sec))
    print(f"{name:28s} {sec * 1e3:9.2f} ms  {N / sec:9.0f} frames/s",
          flush=True)


def step_time(feature_arch="rny002_gsf", iters=10, seed=0,
              checkpoint_backbone=False, acc_grad_iter=1) -> float:
    """Honest full-train-step seconds: state threaded through AND inputs
    cycled over two distinct batches (CLAUDE.md benchmark rule)."""
    cfg = TDEEDConfig(
        dataset="finediving", num_classes=4, clip_len=T, crop_dim=S,
        feature_arch=feature_arch, n_layers=2, sgp_ks=7, sgp_r=4,
        radi_displacement=2, checkpoint_backbone=checkpoint_backbone,
    )
    model = build_model(cfg)
    r = np.random.default_rng(seed)

    def make_batch():
        return {
            "frame": jnp.asarray(r.integers(0, 256, (B, T, 256, 256, 3), np.uint8)),
            "label": jnp.asarray(r.integers(0, 5, (B, T)).astype(np.int32)),
            "labelD": jnp.asarray(r.integers(-2, 3, (B, T)).astype(np.float32)),
            "frame2": jnp.asarray(r.integers(0, 256, (B, T, 256, 256, 3), np.uint8)),
            "label2": jnp.asarray(r.integers(0, 5, (B, T)).astype(np.int32)),
            "labelD2": jnp.asarray(r.integers(-2, 3, (B, T)).astype(np.float32)),
        }

    batches = [make_batch(), make_batch()]
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, T, S, S, 3), jnp.float32), False
    )
    tx = make_optimizer(8e-4, 100, 10_000)
    state = TrainState.create(variables["params"], variables.get("batch_stats", {}), tx)
    step = jax.jit(make_train_step(
        model, tx, crop_dim=S, num_classes_bg=5, mixup=True,
        radi_displacement=2, acc_grad_iter=acc_grad_iter,
    ), donate_argnums=(0,))
    k = jax.random.PRNGKey(1)
    st, m = step(state, batches[0], k)
    st, m = step(st, batches[1], k)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        st, m = step(st, batches[i % 2], k)
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / iters


# --- variant patches -------------------------------------------------------


@contextmanager
def patched(**attrs):
    """Temporarily swap module attributes: patched(mod1=(obj, name, value))."""
    saved = []
    try:
        for obj, name, value in attrs.values():
            saved.append((obj, name, getattr(obj, name)))
            setattr(obj, name, value)
        yield
    finally:
        for obj, name, old in reversed(saved):
            setattr(obj, name, old)


class S2DStem(nn.Module):
    """conv3x3/s2 rewritten as conv2x2/s1 over space-to-depth(2) input.

    Not numerically identical to SAME-padded 3x3/s2 (covers a 4x4 aligned
    window instead); used only to time the formulation."""

    features: int
    kernel_size: int = 3
    strides: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        n, h, w, c = x.shape
        x = x.reshape(n, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
        return regnet_mod.ConvBN(
            self.features, 2, strides=1, dtype=self.dtype, name="conv"
        )(x, train)


def trunc_stages(n_stages: int):
    """generate_stages patch keeping stages 1..n_stages."""
    orig = regnet_mod.generate_stages

    def gen(*a, **kw):
        w, d, g = orig(*a, **kw)
        return w[:n_stages], d[:n_stages], g[:n_stages]

    return gen


def run_variant(name: str, iters: int) -> None:
    if name == "base":
        report("base (production)", step_time(iters=iters))
    elif name == "plain":
        report("plain (no shift)", step_time("rny002", iters=iters))
    elif name == "nointerleave":
        ident = lambda y1, y2: jnp.concatenate([y1, y2], axis=-1)
        with patched(p=(shift_mod, "_interleave_halves", ident)):
            report("gsf, interleave OFF", step_time(iters=iters))
    elif name == "gate-pad8":
        def padded_gate(xn, gate_w, gate_b, _k=8):
            wp = jnp.zeros(gate_w.shape[:-1] + (2 * _k,), gate_w.dtype)
            wp = wp.at[..., 0].set(gate_w[..., 0])
            wp = wp.at[..., _k].set(gate_w[..., 1])
            g = jax.lax.conv_general_dilated(
                xn, wp.astype(xn.dtype), (1, 1, 1), "SAME",
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
                feature_group_count=2,
            )
            g = jnp.stack([g[..., 0], g[..., _k]], axis=-1) + gate_b
            return jnp.tanh(g)

        with patched(p=(gs_mod, "gsf_gate", padded_gate)):
            report("gsf, gate out-padded x8", step_time(iters=iters))
    elif name == "s2d-stem":
        class StemConvBN(regnet_mod.ConvBN):
            pass

        def stem_patch(features, kernel_size, strides=1, dtype=None, name=None,
                       **kw):
            if name == "stem":
                return S2DStem(features, kernel_size, strides, dtype=dtype,
                               name=name)
            return StemConvBN(features, kernel_size, strides=strides,
                              dtype=dtype, name=name, **kw)

        with patched(p=(regnet_mod, "ConvBN", stem_patch)):
            report("s2d stem", step_time(iters=iters))
    elif name == "nose":
        class NoSE(nn.Module):
            rd_channels: int = 0
            dtype: Any = None

            @nn.compact
            def __call__(self, x):
                return x

        with patched(p=(regnet_mod, "SEModule", NoSE)):
            report("no SE", step_time(iters=iters))
    elif name == "gate-factored":
        with patched(p=(gs_mod, "gsf_gate", gsf_gate_factored)):
            report("gsf, gate GEMM+shiftsum", step_time(iters=iters))
    elif name == "bd-conv2":
        with patched(p=(regnet_mod, "ConvBN", BDConvBN)):
            report("block-diag dense conv2", step_time(iters=iters))
    elif name == "combo":
        with patched(p=(gs_mod, "gsf_gate", gsf_gate_factored),
                     q=(regnet_mod, "ConvBN", BDConvBN)):
            report("combo (factored gate + BD conv2)",
                   step_time(iters=iters))
    elif name == "stats-factored":
        with patched(p=(gs_mod, "gsf_post_gate_ref",
                        post_gate_variant(stats_factored=True))):
            report("gsf, stats convs unrolled", step_time(iters=iters))
    elif name == "post-bf16":
        with patched(p=(gs_mod, "gsf_post_gate_ref",
                        post_gate_variant(bf16=True))):
            report("gsf, post-gate bf16", step_time(iters=iters))
    elif name == "post-both":
        with patched(p=(gs_mod, "gsf_post_gate_ref",
                        post_gate_variant(stats_factored=True, bf16=True))):
            report("gsf, stats unrolled + bf16", step_time(iters=iters))
    elif name == "remat":
        report("remat backbone (checkpoint)", step_time(
            iters=iters, checkpoint_backbone=True))
    elif name == "acc2":
        report("acc_grad_iter=2 (scan)", step_time(
            iters=iters, acc_grad_iter=2))
    elif name == "noaug":
        import tdeed_tpu.kernels.augment as aug_mod

        def no_aug(frames, key, crop, interpret=False):
            return frames.astype(jnp.float32) / 255.0

        with patched(p=(aug_mod, "train_preprocess_pallas", no_aug)):
            report("augment removed (timing)", step_time(iters=iters))
    elif name == "gsf-nobn":
        class IdBN(nn.Module):
            use_running_average: bool = True

            @nn.compact
            def __call__(self, x):
                return x

        with patched(p=(shift_mod, "SplitBatchNorm", IdBN)):
            report("gsf, BN3d removed (timing)", step_time(iters=iters))
    elif name == "gsf-nostats":
        def core_plain_blend(x, xn, gate_w, gate_b, *_stats):
            gate = gs_mod.gsf_gate(xn, gate_w, gate_b)
            c = x.shape[-1]
            x = x.astype(jnp.float32)
            g1, g2 = gate[..., 0:1].astype(jnp.float32), gate[..., 1:2].astype(jnp.float32)
            x1, x2 = x[..., : c // 2], x[..., c // 2:]
            y1, y2 = g1 * x1, g2 * x2
            r1, r2 = x1 - y1, x2 - y2
            y1 = jnp.pad(y1[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
            y2 = jnp.pad(y2[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
            return jnp.concatenate(
                [0.5 * y1 + 0.5 * r1, 0.5 * y2 + 0.5 * r2], axis=-1
            )

        with patched(p=(gs_mod, "gsf_core", core_plain_blend)):
            report("gsf, stats-fusion removed (timing)",
                   step_time(iters=iters))
    elif name.startswith("trunc"):
        import tdeed_tpu.models.tdeed as tdeed_mod

        n_stages = int(name[len("trunc"):])

        class PaddedRegNetY(regnet_mod.RegNetY):
            """Truncated trunk, features zero-padded to 368 so the SGP
            head keeps the production geometry."""

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
    else:
        raise SystemExit(f"unknown variant {name}")


def gsf_gate_factored(xn, gate_w, gate_b):
    """Gate conv re-expressed as one channel GEMM + 27 shifted adds.

    y_g[p] = sum_{d,c} w[d,c,g] * xn_g[p+d,c]  (SAME, zero pad)
           = sum_d shift_d( xn_g . w[d,:,g] )[p]
    The contraction (C -> 54 tap-planes) is a well-tiled matmul (vs XLA's
    2-output-channel conv + its transposed-conv backward); the shift-sum is
    27 cheap single-channel adds whose backward is 27 shifts."""
    b, t, h, w_, c = xn.shape
    ch = c // 2
    taps = gate_w.reshape(27, ch, 2)
    # (C, 54) block weight: first half -> cols 0..26, second -> 27..53
    W = jnp.zeros((c, 54), gate_w.dtype)
    W = W.at[:ch, :27].set(jnp.transpose(taps[..., 0], (1, 0)))
    W = W.at[ch:, 27:].set(jnp.transpose(taps[..., 1], (1, 0)))
    z = jnp.einsum("bthwc,cd->bthwd", xn, W.astype(xn.dtype))

    offs = [(dt_, dh, dw) for dt_ in (-1, 0, 1) for dh in (-1, 0, 1)
            for dw in (-1, 0, 1)]
    y1 = sum(gs_mod._shift3(z[..., i], d) for i, d in enumerate(offs))
    y2 = sum(gs_mod._shift3(z[..., 27 + i], d) for i, d in enumerate(offs))
    return jnp.tanh(jnp.stack([y1, y2], axis=-1) + gate_b)


class BDConvBN(nn.Module):
    """Grouped conv computed as a dense conv with a block-diagonal kernel
    built in-graph from the grouped parameters (same function & gradients;
    ~groups x more MXU FLOPs, but 128-lane aligned)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        from tdeed_tpu.models.common import SplitBatchNorm

        ks = self.kernel_size
        if self.groups == 1:
            x = nn.Conv(
                features=self.features, kernel_size=(ks, ks),
                strides=self.strides, padding="SAME", use_bias=False,
                kernel_init=regnet_mod._conv_init, dtype=self.dtype,
                name="conv",
            )(x)
        else:
            cin = x.shape[-1]
            gw = cin // self.groups
            og = self.features // self.groups
            k = self.param(
                "bd_kernel", regnet_mod._conv_init,
                (ks, ks, gw, self.features),
            )
            dense = jnp.zeros((ks, ks, cin, self.features), k.dtype)
            for g in range(self.groups):
                dense = dense.at[:, :, g * gw:(g + 1) * gw,
                                 g * og:(g + 1) * og].set(
                    k[:, :, :, g * og:(g + 1) * og]
                )
            x = jax.lax.conv_general_dilated(
                x, dense.astype(x.dtype),
                (self.strides, self.strides), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        x = SplitBatchNorm(use_running_average=not train, name="bn")(x)
        if self.act:
            x = nn.relu(x)
        return x.astype(self.dtype or x.dtype)


def _shift2(a, offs):
    """Zero-filled shift over axes (1, 2) of (B, C, T): y[p] = a[p + off]."""
    for axis, off in zip((1, 2), offs):
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


def post_gate_variant(stats_factored=False, bf16=False):
    """gsf_post_gate_ref variant: unrolled stats-fusion convs and/or bf16
    post-gate arithmetic. Identical math to the production reference."""

    def post(x, gate, ch1_w, ch1_b, ch2_w, ch2_b):
        c = x.shape[-1]
        dt_ = x.dtype if bf16 else jnp.float32
        x = x.astype(dt_)
        gate = gate.astype(dt_)
        g1, g2 = gate[..., 0:1], gate[..., 1:2]
        x1, x2 = x[..., : c // 2], x[..., c // 2:]
        y1, y2 = g1 * x1, g2 * x2
        r1, r2 = x1 - y1, x2 - y2
        y1 = jnp.pad(y1[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
        y2 = jnp.pad(y2[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))

        def fuse(y, r, w, b):
            ym = jnp.swapaxes(jnp.mean(y, axis=(2, 3)), 1, 2)  # (B, C/2, T)
            rm = jnp.swapaxes(jnp.mean(r, axis=(2, 3)), 1, 2)
            if stats_factored:
                w = w.astype(ym.dtype)
                acc = b.astype(ym.dtype)[0] * jnp.ones_like(ym)
                for dc in (-1, 0, 1):
                    for dt2 in (-1, 0, 1):
                        for s_idx, stat in ((0, ym), (1, rm)):
                            acc = acc + w[dc + 1, dt2 + 1, s_idx, 0] * _shift2(
                                stat, (dc, dt2)
                            )
                wmap = jax.nn.sigmoid(acc)  # (B, C/2, T)
            else:
                stat = jnp.stack([ym, rm], axis=-1)
                wmap = jax.lax.conv_general_dilated(
                    stat, w.astype(stat.dtype), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + b.astype(stat.dtype)
                wmap = jax.nn.sigmoid(wmap[..., 0])
            wm = jnp.swapaxes(wmap, 1, 2)[:, :, None, None, :]
            return y * wm + r * (1.0 - wm)

        return jnp.concatenate(
            [fuse(y1, r1, ch1_w, ch1_b), fuse(y2, r2, ch2_w, ch2_b)], axis=-1
        )

    return post


DEFAULT = "base,plain,nointerleave,gate-pad8,s2d-stem,nose,trunc3,trunc2"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--variants", default=DEFAULT)
    args = p.parse_args(argv)
    for v in args.variants.split(","):
        run_variant(v.strip(), args.iters)
    print("\nname, ms, frames/s")
    for name, ms, fps in rows:
        print(f"{name}, {ms:.2f}, {fps:.0f}")


if __name__ == "__main__":
    main()
