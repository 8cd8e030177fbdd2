"""Backbone roofline ladder: localize the fwd+bwd gap (VERDICT r1 item 3).

One process = one TPU claim. Times grad-of-sum fwd+bwd for:
  A. per-stage towers of the plain rny002 backbone (stem, s1..s4) at the
     FineDiving_small geometry (B*T=800 frames, 224^2, bf16);
  B. stem variants: conv3x3/s2 vs space-to-depth (exact rewrite);
  C. grouped-conv micro: s3/s4 conv2 geometry as grouped vs dense vs
     block-diagonal-128 formulations;
  D. GSF ladder: full backbone fwd+bwd with interleave on/off, gate conv
     XLA vs custom-VJP vs output-channel-padded.

Usage: python tools/profile_roofline.py [--iters 8] [--section A,B,C,D]
"""

from __future__ import annotations

import argparse
import functools
import itertools
import os
import sys
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdeed_tpu.utils.profiling import enable_compilation_cache, time_fn  # noqa: E402

enable_compilation_cache()

from flax import linen as nn  # noqa: E402

import tdeed_tpu.models.shift as shift_mod  # noqa: E402
from tdeed_tpu.models.regnet import ConvBN, RegNetY, YBlock  # noqa: E402

B, T, S = 8, 100, 224
N = B * T
DT = jnp.bfloat16

# rny002 topology (generate_stages output)
WIDTHS = [24, 56, 152, 368]
DEPTHS = [1, 1, 4, 7]
GROUP = 8
RES = {1: 56, 2: 28, 3: 14, 4: 7}  # output resolution per stage
RES_IN = {1: 112, 2: 56, 3: 28, 4: 14}

rows: List[tuple] = []


def report(name: str, sec: float):
    rows.append((name, sec * 1e3, N / sec))
    print(f"{name:42s} {sec * 1e3:9.2f} ms  {N / sec:9.0f} frames/s",
          flush=True)


def timed_grad(module, x, iters, train=True, seed=0):
    """mean fwd+bwd seconds of sum(module(x)) wrt params."""
    rng = jax.random.PRNGKey(seed)
    variables = jax.jit(module.init, static_argnums=(2,))(rng, x, True)
    has_stats = "batch_stats" in variables

    def loss(params, stats, xin):
        v = {"params": params}
        kw = {}
        if has_stats:
            v["batch_stats"] = stats
            kw = dict(mutable=["batch_stats"])
            out, _ = module.apply(v, xin, train, **kw)
        else:
            out = module.apply(v, xin, train)
        return jnp.sum(out.astype(jnp.float32))

    g = jax.jit(jax.grad(loss))
    stats = variables.get("batch_stats", {})
    xs = itertools.cycle([x, x + 1, x - 1, x + 2])
    return time_fn(lambda: g(variables["params"], stats, next(xs)),
                   iters=iters)


class StageTower(nn.Module):
    """One RegNet stage (blocks with first-stride-2) standalone."""

    width: int
    in_width: int
    depth: int
    shift: Optional[str] = None
    dtype: Any = DT

    @nn.compact
    def __call__(self, x, train: bool):
        in_w = self.in_width
        for bi in range(self.depth):
            x = YBlock(
                width=self.width, in_width=in_w,
                stride=2 if bi == 0 else 1, group_size=GROUP,
                shift=self.shift, clip_len=T, dtype=self.dtype,
                name=f"b{bi + 1}",
            )(x, train)
            in_w = self.width
        return x


def section_a(iters):
    print("== A. per-stage towers (plain, fwd+bwd, bf16) ==", flush=True)
    r = np.random.default_rng(0)
    stem_x = jnp.asarray(r.normal(size=(N, S, S, 3)), DT)
    report("stem (3->32, 224->112)",
           timed_grad(ConvBN(32, 3, strides=2, dtype=DT), stem_x, iters))
    in_w = 32
    for si, (w, d) in enumerate(zip(WIDTHS, DEPTHS), start=1):
        x = jnp.asarray(
            r.normal(size=(N, RES_IN[si], RES_IN[si], in_w)), DT
        )
        report(f"s{si} ({in_w}->{w} x{d}, {RES_IN[si]}->{RES[si]})",
               timed_grad(StageTower(w, in_w, d), x, iters))
        in_w = w


class S2DStem(nn.Module):
    """Exact rewrite of conv3x3/s2 as conv2x2/s1 on space-to-depth input."""

    dtype: Any = DT

    @nn.compact
    def __call__(self, x, train: bool):
        n, h, w, c = x.shape
        # pad left/top by 1 so the 3x3 SAME taps align, then s2d(2)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = x.reshape(n, (h + 2) // 2, 2, (w + 2) // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, (h + 2) // 2, (w + 2) // 2, 4 * c
        )
        return ConvBN(32, 2, strides=1, dtype=self.dtype, name="stem")(
            x[:, : h // 2 + 1, : w // 2 + 1], train
        )


def section_b(iters):
    print("== B. stem variants ==", flush=True)
    r = np.random.default_rng(0)
    stem_x = jnp.asarray(r.normal(size=(N, S, S, 3)), DT)
    report("stem conv3x3/s2",
           timed_grad(ConvBN(32, 3, strides=2, dtype=DT), stem_x, iters))
    report("stem s2d + conv2x2 (12ch in)",
           timed_grad(S2DStem(), stem_x, iters))


class MicroConv(nn.Module):
    """conv2-geometry 3x3 conv with configurable grouping."""

    width: int
    groups: int
    dtype: Any = DT

    @nn.compact
    def __call__(self, x, train: bool = True):
        return nn.Conv(
            self.width, (3, 3), feature_group_count=self.groups,
            padding="SAME", use_bias=False, dtype=self.dtype,
        )(x)


def section_c(iters):
    print("== C. grouped-conv micro (conv2 geometry, fwd+bwd) ==", flush=True)
    r = np.random.default_rng(0)
    for si, w in ((3, 152), (4, 368)):
        x = jnp.asarray(r.normal(size=(N, RES[si], RES[si], w)), DT)
        for groups, tag in (
            (w // GROUP, f"grouped gw{GROUP}"),
            (max(1, w // 128), "block-diag ~128"),
            (1, "dense"),
        ):
            report(f"s{si} conv2 {w}ch {tag} (g={groups})",
                   timed_grad(MicroConv(w, groups), x, iters))


def backbone_grad_time(iters, shift, interleave=True, gate_pad=0,
                       custom_gate_vjp=False, seed=0):
    import tdeed_tpu.kernels.gated_shift as gs_mod

    orig_inter = shift_mod._interleave_halves
    orig_gate = gs_mod.gsf_gate
    try:
        if not interleave:
            shift_mod._interleave_halves = lambda y1, y2: jnp.concatenate(
                [y1, y2], axis=-1
            )
        if gate_pad:
            def padded_gate(xn, gate_w, gate_b, _k=gate_pad):
                wp = jnp.zeros(
                    gate_w.shape[:-1] + (2 * _k,), gate_w.dtype
                ).at[..., 0].set(gate_w[..., 0]).at[..., _k].set(
                    gate_w[..., 1]
                )
                g = jax.lax.conv_general_dilated(
                    xn, wp.astype(xn.dtype), (1, 1, 1), "SAME",
                    dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
                    feature_group_count=2,
                )
                g = jnp.stack([g[..., 0], g[..., _k]], axis=-1) + gate_b
                return jnp.tanh(g)

            gs_mod.gsf_gate = padded_gate
        if custom_gate_vjp:
            def vjp_gate(xn, gate_w, gate_b):
                return jnp.tanh(gs_mod.gate_conv(xn, gate_w, gate_b))

            gs_mod.gsf_gate = vjp_gate

        r = np.random.default_rng(seed)
        x = jnp.asarray(r.normal(size=(N, S, S, 3)), DT)
        bb = RegNetY(arch="rny002", shift_mode=shift, clip_len=T, dtype=DT)
        return timed_grad(bb, x, iters, seed=seed)
    finally:
        shift_mod._interleave_halves = orig_inter
        gs_mod.gsf_gate = orig_gate


def section_d(iters):
    print("== D. GSF ladder (full backbone fwd+bwd) ==", flush=True)
    report("backbone plain (no shift)",
           backbone_grad_time(iters, None))
    report("backbone gsf (production)",
           backbone_grad_time(iters, "gsf"))
    report("backbone gsf, interleave OFF",
           backbone_grad_time(iters, "gsf", interleave=False))
    report("backbone gsf, gate out-padded x8",
           backbone_grad_time(iters, "gsf", gate_pad=8))
    report("backbone gsf, custom gate VJP",
           backbone_grad_time(iters, "gsf", custom_gate_vjp=True))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--sections", default="A,B,C,D")
    args = p.parse_args(argv)
    secs = args.sections.upper().split(",")
    if "A" in secs:
        section_a(args.iters)
    if "B" in secs:
        section_b(args.iters)
    if "C" in secs:
        section_c(args.iters)
    if "D" in secs:
        section_d(args.iters)
    print("\nname, ms, frames/s")
    for name, ms, fps in rows:
        print(f"{name}, {ms:.2f}, {fps:.0f}")


if __name__ == "__main__":
    main()
