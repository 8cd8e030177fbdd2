"""Fused early-RegNet-block training path (forward + custom backward).

The flagship step's remaining hot spots (device-trace attributed,
docs/DESIGN.md round-3 table) are the backwards of the stride-2 entry
blocks: s1_b1 ~14.3 ms and s2_b1 ~5.9 ms of a ~74 ms step, all HBM-bound
on the 112^2/56^2 activations (ref hot loop: model/model.py:133-135; the
blocks themselves: timm regnety bottleneck, re-derived in
models/regnet.py:YBlock). XLA's per-op lowering is already near the
measured streaming roofline (~630 GB/s) — the win left is *structural*:
recompute-in-backward so each big tensor is read once per phase instead
of once per consuming op.

This module implements a ``jax.custom_vjp`` over

    [stem ConvBN ->] YBlock(stride=2, no temporal shift)

with a hand-derived backward split into:

  * a cheap 56^2-sized tail (BN2 + relu + SE + conv3 + BN3 + BNd + add +
    relu) differentiated by ``jax.vjp`` re-run — XLA handles it well;
  * the 112^2-heavy middle, written so the big tensors (v1, v_stem, dv2,
    dx) stream through exactly two passes (P1: global BN1 sums + conv2
    dW; P2: everything else). A Pallas formulation of P1/P2 can slot in
    behind ``use_pallas`` (the jnp formulation is the reference and the
    CPU path).

Numerics mirror the production modules exactly: bf16 convs with fp32
params, SplitBatchNorm's fp32 ``E[x^2]-E[x]^2`` stats and bf16 fold
(models/common.py:106), relu'(0)=0, and gradients that flow through the
batch statistics (standard training BN backward). Batch mean/var for the
running-average updates are returned as auxiliary outputs; their
cotangents are treated as zero (running stats are never differentiated —
same as the flax mutable-collection semantics).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # public since jax 0.6; the experimental alias for older trees
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

BN_EPS = 1e-5


# ---------------------------------------------------------------------------
# Forward building blocks (exact mirrors of models/regnet.py + common.py)
# ---------------------------------------------------------------------------


def _conv(x, w, stride: int = 1, pad: int = 0, groups: int = 1):
    """nn.Conv equivalent: NHWC, HWIO kernel, symmetric pad, no bias."""
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def _stats(v) -> Tuple[jax.Array, jax.Array]:
    """SplitBatchNorm batch stats: fp32 mean and biased E[x^2]-E[x]^2."""
    vf = v.astype(jnp.float32)
    axes = tuple(range(v.ndim - 1))
    m = jnp.mean(vf, axis=axes)
    var = jnp.mean(jnp.square(vf), axis=axes) - jnp.square(m)
    return m, var


def _fold(m, var, scale, bias, dtype):
    """(inv, a, b): bn apply is x*a + b in compute dtype."""
    inv = scale * jax.lax.rsqrt(var + BN_EPS)
    return inv, inv.astype(dtype), (bias - m * inv).astype(dtype)


def _bn_apply(v, p_bn):
    m, var = _stats(v)
    _, a, b = _fold(m, var, p_bn["scale"], p_bn["bias"], v.dtype)
    return v * a + b, (m, var)


def _tail(v2, vd, blk):
    """56^2-sized remainder of the block: BN2+relu, SE, conv3+BN3, BNd,
    residual add + relu. Differentiated by jax.vjp in the backward."""
    z2, s2 = _bn_apply(v2, blk["conv2"]["bn"])
    y2 = jax.nn.relu(z2)
    # SE (models/regnet.py:SEModule): bf16 pooling, biased 1x1 convs.
    s = jnp.mean(y2, axis=(1, 2), keepdims=True)
    fc1, fc2 = blk["se"]["fc1"], blk["se"]["fc2"]
    u = jax.nn.relu(_conv(s, fc1["kernel"]) + fc1["bias"].astype(s.dtype))
    t = _conv(u, fc2["kernel"]) + fc2["bias"].astype(s.dtype)
    se = y2 * jax.nn.sigmoid(t)
    v3 = _conv(se, blk["conv3"]["conv"]["kernel"])
    z3, s3 = _bn_apply(v3, blk["conv3"]["bn"])
    zd, sd = _bn_apply(vd, blk["downsample"]["bn"])
    out = jax.nn.relu(z3 + zd).astype(z3.dtype)
    return out, {"conv2": s2, "conv3": s3, "downsample": sd}


def _front_shift(xs, x, blk, groups: int):
    """Shift-block front: conv1 reads the SHIFTED input ``xs`` while the
    downsample shortcut reads the pre-shift block input ``x``
    (models/regnet.py:YBlock — the temporal shift applies before conv1
    only, ref: model/shift.py:89-93)."""
    v1 = _conv(xs, blk["conv1"]["conv"]["kernel"])
    m1, var1 = _stats(v1)
    _, a1, b1 = _fold(
        m1, var1, blk["conv1"]["bn"]["scale"], blk["conv1"]["bn"]["bias"], v1.dtype
    )
    y1 = jax.nn.relu(v1 * a1 + b1)
    v2 = _conv(y1, blk["conv2"]["conv"]["kernel"], stride=2, pad=1, groups=groups)
    vd = _conv(x, blk["downsample"]["conv"]["kernel"], stride=2, pad=0)
    return v1, (m1, var1), v2, vd


def _front(x, p, groups: int, with_stem: bool):
    """Everything up to (v2, vd) plus the stats needed downstream."""
    if with_stem:
        vs = _conv(x, p["stem"]["conv"]["kernel"], stride=2, pad=1)
        ms, vars_ = _stats(vs)
        _, a_s, b_s = _fold(
            ms, vars_, p["stem"]["bn"]["scale"], p["stem"]["bn"]["bias"], vs.dtype
        )
        xin = jax.nn.relu(vs * a_s + b_s)
        stem_stats = (ms, vars_)
    else:
        vs, stem_stats = None, None
        xin = x
    blk = p["blk"]
    v1 = _conv(xin, blk["conv1"]["conv"]["kernel"])
    m1, var1 = _stats(v1)
    _, a1, b1 = _fold(m1, var1, blk["conv1"]["bn"]["scale"], blk["conv1"]["bn"]["bias"], v1.dtype)
    y1 = jax.nn.relu(v1 * a1 + b1)
    v2 = _conv(y1, blk["conv2"]["conv"]["kernel"], stride=2, pad=1, groups=groups)
    vd = _conv(xin, blk["downsample"]["conv"]["kernel"], stride=2, pad=0)
    return vs, stem_stats, v1, (m1, var1), v2, vd


# ---------------------------------------------------------------------------
# Backward helpers
# ---------------------------------------------------------------------------


def _bn_bwd_coeffs(S0, S1, m, var, scale, n_rows):
    """From the two global sums of the post-relu cotangent dz —
    S0 = sum(dz), S1 = sum(dz * v) (fp32) — derive everything the BN
    training backward needs:

      dv = dz * a + cast(v * k1 + k0),  dscale, dbias.

    This is the exact chain of SplitBatchNorm's forward
    (inv = scale*rsqrt(var+eps); a = inv.bf16; b = (bias - m*inv).bf16;
    z = v*a + b) with gradients through mean/var; dv is linear in v
    because var = E[v^2] - E[v]^2.
    """
    r = jax.lax.rsqrt(var + BN_EPS)
    inv = scale * r
    d_inv = S1 - m * S0
    d_scale = d_inv * r
    d_bias = S0
    d_var = scale * d_inv * (-0.5) * r * r * r
    d_mean = -inv * S0 - 2.0 * m * d_var
    k1 = 2.0 * d_var / n_rows
    k0 = d_mean / n_rows
    return k0, k1, d_scale, d_bias


def _conv_dw(xin, dv, w_shape, stride=1, pad=0, groups=1):
    """Weight gradient of _conv via jax.vjp (exact XLA conv-transpose)."""
    _, vjp = jax.vjp(
        lambda w: _conv(xin, w, stride=stride, pad=pad, groups=groups),
        jnp.zeros(w_shape, jnp.float32),
    )
    return vjp(dv)[0]


def _conv_dx(dv, w, x_shape, dtype, stride=1, pad=0, groups=1):
    """Input gradient of _conv via jax.vjp (conv is linear: the zeros
    primal is ignored by the transpose rule and DCE'd)."""
    _, vjp = jax.vjp(
        lambda xi: _conv(xi, w, stride=stride, pad=pad, groups=groups),
        jnp.zeros(x_shape, dtype),
    )
    return vjp(dv)[0]


def _snap_bf16(x):
    """f32 -> f32 snapped to the nearest-even bf16 value.

    Bit-twiddled so no compiler can elide it: Mosaic carries bf16-typed
    vectors as unrounded f32 in registers, so both plain bf16 arithmetic
    and ``x.astype(bf16).astype(f32)`` silently skip XLA's per-op bf16
    rounding inside a kernel. The resulting 0.4%-level summand drift is
    amplified by cancellation in the dW accumulations to O(1) entry
    errors (measured via tools/probe_fused_miscompile.py), so the fused
    backward forces the rounding explicitly at every point the jnp/XLA
    formulation rounds.
    """
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    lsb = jax.lax.shift_right_logical(u, jnp.uint32(16)) & jnp.uint32(1)
    r = (u + jnp.uint32(0x7FFF) + lsb) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(r, jnp.float32)


def _dv1_chain(v, g_row, okc, a1f, k1, k0, snap, per_op, cdt):
    """In-kernel dv1 = dz1*a1 + (v*k1 + k0) with backend-matched rounding.

    The single source for all three P2 kernels (entry/shift/conv1-unit):
    rounding='single' mirrors XLA:TPU, whose bf16 propagation keeps whole
    elementwise chains in f32 and rounds ONCE at each materialization
    (measured: tools/probe_fused_miscompile.py semantics() — 0/1M mismatch
    vs single-round, 277k/1M vs per-op); 'per-op' mirrors XLA:CPU / eager,
    the mode the CPU-oracle tests compare against. Returns (dv1, dzf)."""
    f32 = jnp.float32
    dzf = jnp.where(okc, g_row, jnp.zeros((), cdt)).astype(f32)
    if per_op:
        dv1f = snap(snap(dzf * a1f) + snap(v.astype(f32) * k1 + k0))
    else:
        dv1f = snap(dzf * a1f + (v.astype(f32) * k1 + k0))
    return jnp.where(okc, dv1f, jnp.zeros((), f32)).astype(cdt), dzf


# ---------------------------------------------------------------------------
# Pallas P2: the single-pass heavy backward
# ---------------------------------------------------------------------------
#
# The early activations are laid out batch-minor by XLA:TPU ({0,3,2,1}:
# physical H, W, C, N — probed from the compiled step HLO), so the kernel
# works on the free bitcast-transpose (H, W, C, N) with N riding the
# 128-lane dim. Device-trace microbenchmarks (tools/profile_pallas_probe.py)
# show this streams at ~586 GB/s with the per-pixel (Cin,C)@(C,N) MXU dots
# and the (.,N)@(N,.) outer-product dW accumulation hiding almost entirely
# behind the DMA (+0.1/+0.2 ms per full pass).
#
# One pass over (v1, g1, xin|vs, dvd) produces, per entry block:
#   dx   = conv1_dx(dv1) + upsample(downsample_dx(dvd))   [written once]
#   dW1  = xin^T dv1,  dWd = xin_even^T dvd               [VMEM accums]
# (The stem-BN backward sums S0s/S1s are NOT computed here: they gate dx
# by the stem relu mask, and a Mosaic-recomputed mask flips at sub-ulp
# kink points — measured O(1) errors in 1/8 stem-BN-scale and 4/216
# stem-dW entries on device. XLA recomputes dzs for dWs anyway in
# fused_bwd, so the sums fuse into that existing pass for free.)
# dv1 = relu'(z1)*g1*a1 + (v1*k1 + k0) is computed in-register —
# eliminating XLA's duplicate operand-fusion materializations of dv1 (2x)
# and relu(stem) (4x) that the trace attributed ~7 ms of the step to.


def _p2_pallas_call(v1t, dz1t, xt, dvdt, ab1, kk, asbs, w1, wd,
                    *, with_stem: bool, interpret: bool,
                    rounding: str = "single",
                    _debug: Optional[str] = None):
    """The raw pallas_call in the transposed (H, W, C, N) view.

    v1t: (H, W, C, N) bf16; dz1t: (H, W, C, N) bf16 — the relu-MASKED
    conv2 input-gradient, masked by P1 in XLA. The conv1 mask must NOT be
    recomputed here: Mosaic's f32 FMA scheduling of ``v*a + b`` differs
    from XLA's by sub-ulp amounts, so a recomputed ``pre > 0`` flips at
    elements sitting within an ulp of the relu kink (measured by
    tools/probe_fused_miscompile.py) and each flip costs an O(1) error in
    dx / a dW1 column. Single-sourcing the mask makes the kernel
    deterministic vs the jnp formulation.
    xt: (H, W, Cin, N) bf16 (stem conv output when with_stem — xin is
    recomputed in-register with XLA:TPU's measured single-rounding
    semantics, see the in-kernel comment; residual stem-kink flips change
    xin by sub-ulp VALUES only (relu(~0) ≈ 0), which is why xin may be
    recomputed while the stem MASK must not be (see module comment) —
    else the block input);
    dvdt: (H/2, W/2, C, N) bf16; ab1: (2, C, 1) bf16 (a1, b1); kk: (2, C, 1)
    f32 (k1, k0); asbs: (2, Cin, 1) bf16 (stem fold) or None; w1/wd:
    (Cin, C) bf16.

    _debug (tools/probe_fused_miscompile.py only) reroutes an intermediate
    to the dx output to localize Mosaic lowering bugs: 'dv1' | 'xin' |
    'dot1' (conv1-dx term only) | 'dotd' (downsample term only).
    """
    H_, W_, C, Nn = v1t.shape
    Cin = xt.shape[2]
    wb = W_ // 2
    assert W_ % 2 == 0 and H_ % 2 == 0, (H_, W_)
    nb = min(256, Nn)
    n_steps = -(-Nn // nb)
    grid = (2, n_steps, H_)  # h minor: consecutive h pairs share the dvd row
    f32 = jnp.float32
    cdt = v1t.dtype  # compute dtype (bf16 in production, f32 in fp32 tests)

    def kernel(*refs):
        if with_stem:
            (ab1_ref, kk_ref, asbs_ref, w1_ref, wd_ref,
             v_ref, g_ref, x_ref, dvd_ref,
             dx_ref, dw1_ref, dwd_ref) = refs
        else:
            (ab1_ref, kk_ref, w1_ref, wd_ref,
             v_ref, g_ref, x_ref, dvd_ref,
             dx_ref, dw1_ref, dwd_ref) = refs
        j, nbi, h = pl.program_id(0), pl.program_id(1), pl.program_id(2)

        @pl.when((j == 0) & (nbi == 0) & (h == 0))
        def _():
            dw1_ref[...] = jnp.zeros_like(dw1_ref)
            dwd_ref[...] = jnp.zeros_like(dwd_ref)

        a1 = ab1_ref[0]  # (C, 1) compute dtype
        k1 = kk_ref[0]   # (C, 1) f32
        k0 = kk_ref[1]
        w1v = w1_ref[...]
        wdv = wd_ref[...]
        # lane validity (N tail of the last n-block)
        okc = jax.lax.broadcasted_iota(jnp.int32, (C, nb), 1) + nbi * nb < Nn
        okcin = jax.lax.broadcasted_iota(jnp.int32, (Cin, nb), 1) + nbi * nb < Nn
        h_even = h % 2 == 0
        zb = jnp.zeros((), cdt)
        zf = jnp.zeros((), f32)
        snap = _snap_bf16 if cdt == jnp.bfloat16 else (lambda t: t)
        per_op = rounding == "per-op"
        a1f = a1.astype(f32)
        if with_stem:
            asf = asbs_ref[0].astype(f32)
            bsf = asbs_ref[1].astype(f32)

        def body(i, carry):
            dw1_acc, dwd_acc = carry
            v = v_ref[0, i]   # (C, nb) bf16
            # g_ref holds dz1 = relu'(z1) * g1, masked by P1 in XLA (see
            # module docstring); only the lane-validity mask applies here.
            dv1, dzf = _dv1_chain(
                v, g_ref[0, i], okc, a1f, k1, k0, snap, per_op, cdt
            )
            if with_stem:
                vs = x_ref[0, i]  # (Cin, nb) stem conv out
                # presf: the relu/mask operand exactly as the backend's
                # jnp path computes it (unrounded f32 chain on TPU,
                # per-op bf16 on CPU)
                if per_op:
                    presf = snap(snap(vs.astype(f32) * asf) + bsf)
                else:
                    presf = vs.astype(f32) * asf + bsf
                xin = jnp.where(
                    okcin, snap(jnp.maximum(presf, zf)), zf
                ).astype(cdt)
            else:
                xin = jnp.where(okcin, x_ref[0, i], zb)

            dot1 = jax.lax.dot(w1v, dv1, preferred_element_type=f32)
            dw1_acc = dw1_acc + jax.lax.dot_general(
                xin, dv1, (((1,), (1,)), ((), ())), preferred_element_type=f32
            )

            # downsample (1x1 stride-2): contributes at even (h, w) only.
            # The dot always runs (measured free behind the DMA stream); the
            # result is gated to zero elsewhere. Parity and the dvd column
            # are in GLOBAL w (j*wb + i): with odd wb (W = 2 mod 4, e.g.
            # 14^2 rows) the j=1 half starts on an odd column, so local-i
            # parity would be phase-inverted there — the dvd block is the
            # full row for the same reason.
            gw = j * wb + i
            dvd_i = jnp.where(okc, dvd_ref[0, gw // 2], zb)
            gate = jnp.where(h_even & (gw % 2 == 0), jnp.float32(1), jnp.float32(0))
            dotd = gate * jax.lax.dot(wdv, dvd_i, preferred_element_type=f32)
            dwd_acc = dwd_acc + gate * jax.lax.dot_general(
                xin, dvd_i, (((1,), (1,)), ((), ())), preferred_element_type=f32
            )
            def fitC(val):
                return val[:Cin] if Cin <= C else jnp.concatenate(
                    [val, jnp.zeros((Cin - C, nb), val.dtype)], axis=0
                )

            if _debug == "dv1":
                dx_b = fitC(dv1)
            elif _debug == "v":
                dx_b = fitC(v)
            elif _debug == "a1b":
                dx_b = fitC(a1 + jnp.zeros((C, nb), cdt))
            elif _debug == "okc":
                dx_b = fitC(okc.astype(cdt))
            elif _debug == "dz":
                dx_b = fitC(dzf.astype(cdt))
            elif _debug == "xin":
                dx_b = xin
            elif _debug == "dot1":
                dx_b = dot1.astype(cdt)
            elif _debug == "dotd":
                dx_b = dotd.astype(cdt)
            else:
                # Mirror the jnp path's TWO materializations: each conv_dx
                # emits a bf16 buffer, then the add rounds again. A single
                # snap of (dot1 + dotd) differs at entries whose exact sum
                # sits within an f32-ulp of a bf16 rounding boundary —
                # harmless per entry (half a bf16 ulp), but the stem-BN
                # backward sums downstream are cancellation-dominated and
                # amplify those isolated flips to O(1) grad-entry errors
                # (measured on device: 1/8 stem-BN-scale, 4/216 stem-dW).
                dx_b = snap(snap(dot1) + snap(dotd)).astype(cdt)
            dx_ref[0, i] = dx_b
            return dw1_acc, dwd_acc

        z_cc = jnp.zeros((Cin, C), f32)
        dw1_acc, dwd_acc = jax.lax.fori_loop(0, wb, body, (z_cc, z_cc))
        dw1_ref[...] += dw1_acc
        dwd_ref[...] += dwd_acc

    const = lambda shape: pl.BlockSpec(shape, lambda j, nbi, h: (0,) * len(shape))
    big = lambda cdim: pl.BlockSpec(
        (1, wb, cdim, nb), lambda j, nbi, h: (h, j, 0, nbi)
    )
    # full dvd row (it is half-width already): a per-j half would need a
    # ragged split when wb is odd (W = 2 mod 4)
    dvd_spec = pl.BlockSpec(
        (1, W_ // 2, C, nb), lambda j, nbi, h: (h // 2, 0, 0, nbi)
    )
    in_specs = [const((2, C, 1)), const((2, C, 1))]
    args = [ab1, kk]
    if with_stem:
        in_specs.append(const((2, Cin, 1)))
        args.append(asbs)
    in_specs += [const((Cin, C)), const((Cin, C)), big(C), big(C), big(Cin),
                 dvd_spec]
    args += [w1, wd, v1t, dz1t, xt, dvdt]

    out_shape = [
        jax.ShapeDtypeStruct((H_, W_, Cin, Nn), cdt),
        jax.ShapeDtypeStruct((Cin, C), f32),
        jax.ShapeDtypeStruct((Cin, C), f32),
    ]
    out_specs = [big(Cin), const((Cin, C)), const((Cin, C))]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)


def p2_backward(v1, dz1, x_or_vs, dvd, blk, m1, var1, stem=None,
                *, interpret: bool = False, rounding: str = "single"):
    """Single-pass heavy backward (see module docstring).

    ``dz1`` is the relu-masked conv2 input-gradient (P1 applies the mask
    in XLA — the kernel must not recompute it, see _p2_pallas_call).
    All activations NHWC. ``blk``/``stem`` are the parameter trees;
    (m1, var1) the conv1 batch stats needed for the fold. Returns
    (dx, dW1, dWd). The stem BN backward sums are NOT produced here —
    they need the stem relu mask, which must stay single-sourced in XLA
    (fused_bwd computes them from its dzs pass).

    The k0/k1 BN-through-stats coefficients must be computed by the caller
    (they depend on the P1 global sums) and are passed via ``blk['_k']``.
    """
    k0, k1 = blk["_k"]
    dtype = v1.dtype
    _, a1, b1 = _fold(m1, var1, blk["conv1"]["bn"]["scale"],
                      blk["conv1"]["bn"]["bias"], dtype)
    t = lambda a: jnp.transpose(a, (1, 2, 3, 0))
    w1 = blk["conv1"]["conv"]["kernel"][0, 0].astype(dtype)   # (Cin, C)
    wd = blk["downsample"]["conv"]["kernel"][0, 0].astype(dtype)
    C = w1.shape[1]
    Cin = w1.shape[0]
    ab1 = jnp.stack([a1, b1]).reshape(2, C, 1)
    kk = jnp.stack([k1.astype(jnp.float32),
                    k0.astype(jnp.float32)]).reshape(2, C, 1)
    if stem is not None:
        a_s, b_s = stem["_fold"]
        asbs = jnp.stack([a_s, b_s]).reshape(2, Cin, 1)
    else:
        asbs = None
    outs = _p2_pallas_call(
        t(v1), t(dz1), t(x_or_vs), t(dvd), ab1, kk, asbs, w1, wd,
        with_stem=stem is not None, interpret=interpret, rounding=rounding,
    )
    dx = jnp.transpose(outs[0], (3, 0, 1, 2))
    dW1 = outs[1].reshape(1, 1, Cin, C)
    dWd = outs[2].reshape(1, 1, Cin, C)
    return dx, dW1, dWd


def _p2_shift_pallas_call(v1t, dz1t, xst, xdt, dvdt, ab1, kk, w1, wd,
                          *, interpret: bool, rounding: str = "single"):
    """Shift-variant P2 in the transposed (H, W, C, N) view.

    Same single-pass structure as ``_p2_pallas_call`` with two input
    tensors instead of one shared ``xin``: ``xst`` (shifted, feeds conv1's
    dW and receives dxs) and ``xdt`` (pre-shift, feeds the downsample dW
    and receives dxd). ``xdt`` rows are only needed at even h — its
    BlockSpec maps consecutive h pairs to the even row, so odd rows are
    never DMA'd. Outputs: dxs, dxd (both (H, W, Cin, N)), dW1, dWd.
    """
    H_, W_, C, Nn = v1t.shape
    Cin = xst.shape[2]
    wb = W_ // 2
    assert W_ % 2 == 0 and H_ % 2 == 0, (H_, W_)
    nb = min(256, Nn)
    n_steps = -(-Nn // nb)
    grid = (2, n_steps, H_)
    f32 = jnp.float32
    cdt = v1t.dtype

    def kernel(ab1_ref, kk_ref, w1_ref, wd_ref,
               v_ref, g_ref, xs_ref, xd_ref, dvd_ref,
               dxs_ref, dxd_ref, dw1_ref, dwd_ref):
        j, nbi, h = pl.program_id(0), pl.program_id(1), pl.program_id(2)

        @pl.when((j == 0) & (nbi == 0) & (h == 0))
        def _():
            dw1_ref[...] = jnp.zeros_like(dw1_ref)
            dwd_ref[...] = jnp.zeros_like(dwd_ref)

        a1 = ab1_ref[0]
        k1 = kk_ref[0]
        k0 = kk_ref[1]
        w1v = w1_ref[...]
        wdv = wd_ref[...]
        okc = jax.lax.broadcasted_iota(jnp.int32, (C, nb), 1) + nbi * nb < Nn
        okcin = jax.lax.broadcasted_iota(jnp.int32, (Cin, nb), 1) + nbi * nb < Nn
        h_even = h % 2 == 0
        zb = jnp.zeros((), cdt)
        zf = jnp.zeros((), f32)
        snap = _snap_bf16 if cdt == jnp.bfloat16 else (lambda t: t)
        per_op = rounding == "per-op"
        a1f = a1.astype(f32)

        def body(i, carry):
            dw1_acc, dwd_acc = carry
            v = v_ref[0, i]
            dv1, _ = _dv1_chain(
                v, g_ref[0, i], okc, a1f, k1, k0, snap, per_op, cdt
            )
            xs_i = jnp.where(okcin, xs_ref[0, i], zb)

            dxs_ref[0, i] = snap(
                jax.lax.dot(w1v, dv1, preferred_element_type=f32)
            ).astype(cdt)
            dw1_acc = dw1_acc + jax.lax.dot_general(
                xs_i, dv1, (((1,), (1,)), ((), ())), preferred_element_type=f32
            )

            # downsample path: contributes at even (h, w) only; xd_ref holds
            # the even-h row for this h pair (BlockSpec h//2*2), gated to
            # zero on the odd row / odd columns. Parity and the dvd column
            # use GLOBAL w (j*wb + i) — see _p2_pallas_call (odd-wb rows).
            gw = j * wb + i
            dvd_i = jnp.where(okc, dvd_ref[0, gw // 2], zb)
            gate = jnp.where(h_even & (gw % 2 == 0), jnp.float32(1), jnp.float32(0))
            dotd = gate * jax.lax.dot(wdv, dvd_i, preferred_element_type=f32)
            dxd_ref[0, i] = snap(dotd).astype(cdt)
            xd_i = jnp.where(okcin, xd_ref[0, i], zb)
            dwd_acc = dwd_acc + gate * jax.lax.dot_general(
                xd_i, dvd_i, (((1,), (1,)), ((), ())), preferred_element_type=f32
            )
            return dw1_acc, dwd_acc

        z_cc = jnp.zeros((Cin, C), f32)
        dw1_acc, dwd_acc = jax.lax.fori_loop(0, wb, body, (z_cc, z_cc))
        dw1_ref[...] += dw1_acc
        dwd_ref[...] += dwd_acc

    const = lambda shape: pl.BlockSpec(shape, lambda j, nbi, h: (0,) * len(shape))
    big = lambda cdim: pl.BlockSpec(
        (1, wb, cdim, nb), lambda j, nbi, h: (h, j, 0, nbi)
    )
    xd_spec = pl.BlockSpec(
        (1, wb, Cin, nb), lambda j, nbi, h: (h // 2 * 2, j, 0, nbi)
    )
    # full dvd row: a per-j half would need a ragged split when wb is odd
    dvd_spec = pl.BlockSpec(
        (1, W_ // 2, C, nb), lambda j, nbi, h: (h // 2, 0, 0, nbi)
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[const((2, C, 1)), const((2, C, 1)), const((Cin, C)),
                  const((Cin, C)), big(C), big(C), big(Cin), xd_spec,
                  dvd_spec],
        out_specs=[big(Cin), big(Cin), const((Cin, C)), const((Cin, C))],
        out_shape=[
            jax.ShapeDtypeStruct((H_, W_, Cin, Nn), cdt),
            jax.ShapeDtypeStruct((H_, W_, Cin, Nn), cdt),
            jax.ShapeDtypeStruct((Cin, C), jnp.float32),
            jax.ShapeDtypeStruct((Cin, C), jnp.float32),
        ],
        interpret=interpret,
    )(ab1, kk, w1, wd, v1t, dz1t, xst, xdt, dvdt)


def p2_shift_backward(v1, dz1, xs, x, dvd, blk, m1, var1,
                      *, interpret: bool = False, rounding: str = "single"):
    """Shift-variant single-pass heavy backward. All activations NHWC;
    ``blk['_k']`` carries the P1-derived BN coefficients (see
    ``p2_backward``). Returns (dxs, dxd, dW1, dWd)."""
    k0, k1 = blk["_k"]
    dtype = v1.dtype
    _, a1, b1 = _fold(m1, var1, blk["conv1"]["bn"]["scale"],
                      blk["conv1"]["bn"]["bias"], dtype)
    t = lambda a: jnp.transpose(a, (1, 2, 3, 0))
    w1 = blk["conv1"]["conv"]["kernel"][0, 0].astype(dtype)
    wd = blk["downsample"]["conv"]["kernel"][0, 0].astype(dtype)
    C = w1.shape[1]
    Cin = w1.shape[0]
    ab1 = jnp.stack([a1, b1]).reshape(2, C, 1)
    kk = jnp.stack([k1.astype(jnp.float32),
                    k0.astype(jnp.float32)]).reshape(2, C, 1)
    dxs, dxd, dW1, dWd = _p2_shift_pallas_call(
        t(v1), t(dz1), t(xs), t(x), t(dvd), ab1, kk, w1, wd,
        interpret=interpret, rounding=rounding,
    )
    back = lambda a: jnp.transpose(a, (3, 0, 1, 2))
    return (back(dxs), back(dxd),
            dW1.reshape(1, 1, Cin, C), dWd.reshape(1, 1, Cin, C))


def _p2_conv1_pallas_call(v1t, dz1t, xt, ab1, kk, w1,
                          *, interpret: bool, rounding: str = "single"):
    """Reduced P2 for the standalone conv1x1+BN+relu unit: one pass over
    (v1, dz1, x) -> (dx, dW1). Same transposed (H, W, C, N) view, grid and
    rounding semantics as ``_p2_pallas_call`` without the downsample/stem
    machinery. Used by ``make_fused_conv_bn_relu`` for the stride-1
    blocks, where a full-block fusion would pay a same-resolution tail
    recompute that cancels the win."""
    H_, W_, C, Nn = v1t.shape
    Cin = xt.shape[2]
    # split W in half at the big geometries; odd W (the 7x7 s4 rows at
    # 224^2 crops) runs the whole row as one block
    j_steps = 2 if W_ % 2 == 0 else 1
    wb = W_ // j_steps
    nb = min(256, Nn)
    n_steps = -(-Nn // nb)
    grid = (j_steps, n_steps, H_)
    f32 = jnp.float32
    cdt = v1t.dtype

    def kernel(ab1_ref, kk_ref, w1_ref, v_ref, g_ref, x_ref,
               dx_ref, dw1_ref):
        j, nbi, h = pl.program_id(0), pl.program_id(1), pl.program_id(2)

        @pl.when((j == 0) & (nbi == 0) & (h == 0))
        def _():
            dw1_ref[...] = jnp.zeros_like(dw1_ref)

        a1 = ab1_ref[0]
        k1 = kk_ref[0]
        k0 = kk_ref[1]
        w1v = w1_ref[...]
        okc = jax.lax.broadcasted_iota(jnp.int32, (C, nb), 1) + nbi * nb < Nn
        okcin = jax.lax.broadcasted_iota(jnp.int32, (Cin, nb), 1) + nbi * nb < Nn
        zb = jnp.zeros((), cdt)
        zf = jnp.zeros((), f32)
        snap = _snap_bf16 if cdt == jnp.bfloat16 else (lambda t: t)
        per_op = rounding == "per-op"
        a1f = a1.astype(f32)

        def body(i, dw1_acc):
            v = v_ref[0, i]
            dv1, _ = _dv1_chain(
                v, g_ref[0, i], okc, a1f, k1, k0, snap, per_op, cdt
            )
            x_i = jnp.where(okcin, x_ref[0, i], zb)
            dx_ref[0, i] = snap(
                jax.lax.dot(w1v, dv1, preferred_element_type=f32)
            ).astype(cdt)
            return dw1_acc + jax.lax.dot_general(
                x_i, dv1, (((1,), (1,)), ((), ())), preferred_element_type=f32
            )

        dw1_ref[...] += jax.lax.fori_loop(
            0, wb, body, jnp.zeros((Cin, C), f32)
        )

    const = lambda shape: pl.BlockSpec(shape, lambda j, nbi, h: (0,) * len(shape))
    big = lambda cdim: pl.BlockSpec(
        (1, wb, cdim, nb), lambda j, nbi, h: (h, j, 0, nbi)
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[const((2, C, 1)), const((2, C, 1)), const((Cin, C)),
                  big(C), big(C), big(Cin)],
        out_specs=[big(Cin), const((Cin, C))],
        out_shape=[
            jax.ShapeDtypeStruct((H_, W_, Cin, Nn), cdt),
            jax.ShapeDtypeStruct((Cin, C), jnp.float32),
        ],
        interpret=interpret,
    )(ab1, kk, w1, v1t, dz1t, xt)


def make_fused_conv_bn_relu(
    *,
    use_pallas: bool = False,
    interpret: bool = False,
    rounding: Optional[str] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    data_axis: str = "data",
):
    """Standalone fused conv1x1 + SplitBatchNorm + relu:
    ``fn(x, p) -> (y, (m, var))`` with a single-pass backward.

    ``p`` is a ConvBN subtree ({'conv': {'kernel'}, 'bn': {'scale','bias'}}).
    This is the conv1 of the stride-1 YBlocks (models/regnet.py) — the
    rest of those blocks stays on flax autodiff (a full-block fusion would
    re-run the tail forward at the SAME resolution in the backward,
    cancelling the P2 win that made the stride-2 units profitable). The
    backward eliminates XLA's dv1 materializations: P1 (XLA) masks the
    cotangent and takes the two BN sums; P2 streams (v1, dz1, x) once for
    dx + dW."""
    if rounding is None:
        rounding = "per-op" if interpret else "single"
    shard_p2 = (
        mesh is not None and use_pallas and mesh.shape.get(data_axis, 1) > 1
    )

    def fwd_only(x, p):
        v1 = _conv(x, p["conv"]["kernel"])
        m1, var1 = _stats(v1)
        _, a1, b1 = _fold(m1, var1, p["bn"]["scale"], p["bn"]["bias"], v1.dtype)
        return jax.nn.relu(v1 * a1 + b1), (m1, var1)

    @jax.custom_vjp
    def fused(x, p):
        return fwd_only(x, p)

    def fused_fwd(x, p):
        v1 = _conv(x, p["conv"]["kernel"])
        m1, var1 = _stats(v1)
        _, a1, b1 = _fold(m1, var1, p["bn"]["scale"], p["bn"]["bias"], v1.dtype)
        y1 = jax.nn.relu(v1 * a1 + b1)
        return (y1, (m1, var1)), (x, v1, m1, var1, p)

    def fused_bwd(res, ct):
        x, v1, m1, var1, p = res
        g1, _ = ct  # stat cotangents are zero by construction
        dtype = v1.dtype
        n1 = float(np.prod(v1.shape[:-1]))
        _, a1, b1 = _fold(m1, var1, p["bn"]["scale"], p["bn"]["bias"], dtype)
        w1 = p["conv"]["kernel"]

        dz1 = jnp.where(v1 * a1 + b1 > 0, g1, jnp.zeros_like(g1))
        dz1f = dz1.astype(jnp.float32)
        S0 = jnp.sum(dz1f, axis=tuple(range(dz1.ndim - 1)))
        S1 = jnp.sum(dz1f * v1.astype(jnp.float32), axis=tuple(range(dz1.ndim - 1)))
        k0, k1, d_scale, d_bias = _bn_bwd_coeffs(
            S0, S1, m1, var1, p["bn"]["scale"], n1
        )

        if use_pallas:

            def _p2_local(v1_, dz1_, x_, w1_, a1_, k0_, k1_):
                t = lambda a: jnp.transpose(a, (1, 2, 3, 0))
                C = w1_.shape[-1]
                ab1 = jnp.stack(
                    [a1_, jnp.zeros_like(a1_)]
                ).reshape(2, C, 1)
                kk = jnp.stack([k1_.astype(jnp.float32),
                                k0_.astype(jnp.float32)]).reshape(2, C, 1)
                dx_, dW_ = _p2_conv1_pallas_call(
                    t(v1_), t(dz1_), t(x_), ab1, kk,
                    w1_[0, 0].astype(v1_.dtype),
                    interpret=interpret, rounding=rounding,
                )
                return (jnp.transpose(dx_, (3, 0, 1, 2)),
                        dW_.reshape(w1_.shape))

            if shard_p2:
                P = jax.sharding.PartitionSpec

                def _p2_shard(*a):
                    dx_, dW_ = _p2_local(*a)
                    return dx_, jax.lax.psum(dW_, data_axis)

                run_p2 = _shard_map(
                    _p2_shard,
                    mesh=mesh,
                    in_specs=(P(data_axis),) * 3 + (P(),) * 4,
                    out_specs=(P(data_axis), P()),
                    check_vma=False,
                )
            else:
                run_p2 = _p2_local

            dx, dW1 = run_p2(v1, dz1, x, w1, a1, k0, k1)
        else:
            dv1 = dz1 * a1 + (v1.astype(jnp.float32) * k1 + k0).astype(dtype)
            dW1 = _conv_dw(x, dv1, w1.shape)
            dx = _conv_dx(dv1, w1, x.shape, dtype)

        return dx, {
            "conv": {"kernel": dW1},
            "bn": {"scale": d_scale, "bias": d_bias},
        }

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


# ---------------------------------------------------------------------------
# The fused op factory
# ---------------------------------------------------------------------------


def make_fused_block(
    *,
    groups: int,
    with_stem: bool,
    use_pallas: bool = False,
    interpret: bool = False,
    rounding: Optional[str] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    data_axis: str = "data",
):
    """Build the custom-vjp fused block.

    Returns ``fn(x, p) -> (out, stats)`` where

      * ``with_stem=True``: x = pre-stem frames (N, H, W, 3); ``p`` has
        keys ``stem`` (ConvBN tree) and ``blk`` (YBlock tree). Mirrors
        models/regnet.py stem + s1_b1.
      * ``with_stem=False``: x = block input; ``p`` has key ``blk``.
      * stats = {'stem'?, 'conv1', 'conv2', 'conv3', 'downsample'}
        mapping to fp32 (batch_mean, batch_var) for running updates.

    The forward equals the plain flax composition bit-for-bit (same op
    sequence); the backward is the two-pass restructure described in the
    module docstring.

    ``rounding`` selects the Pallas kernel's bf16 materialization
    semantics: 'single' matches XLA:TPU (production), 'per-op' matches
    XLA:CPU / eager (the CPU-oracle tests). Defaults to 'per-op' when
    ``interpret`` (the kernel is being run as a CPU oracle) else 'single'.

    ``mesh``/``data_axis``: when given (and the axis is >1 devices), the
    Pallas P2 runs under ``shard_map`` with the batch dim sharded over
    ``data_axis`` — per-shard dx, psum'd dW/stem-BN sums. This is the DP
    semantics GSPMD gives the jnp formulation automatically (per-shard
    dot_general partials + cross-replica reduce); pallas_call is opaque
    to GSPMD so the sharding must be hand-written here.
    """
    if rounding is None:
        rounding = "per-op" if interpret else "single"
    shard_p2 = (
        mesh is not None and use_pallas and mesh.shape.get(data_axis, 1) > 1
    )

    def fwd_only(x, p):
        vs, stem_stats, v1, s1, v2, vd = _front(x, p, groups, with_stem)
        out, tail_stats = _tail(v2, vd, p["blk"])
        stats = {"conv1": s1, **tail_stats}
        if with_stem:
            stats["stem"] = stem_stats
        return out, stats

    @jax.custom_vjp
    def fused(x, p):
        return fwd_only(x, p)

    def fused_fwd(x, p):
        vs, stem_stats, v1, s1, v2, vd = _front(x, p, groups, with_stem)
        out, tail_stats = _tail(v2, vd, p["blk"])
        stats = {"conv1": s1, **tail_stats}
        if with_stem:
            stats["stem"] = stem_stats
        res = (x, vs, stem_stats, v1, s1, v2, vd, p)
        return (out, stats), res

    def fused_bwd(res, ct):
        x, vs, stem_stats, v1, (m1, var1), v2, vd, p = res
        d_out, _d_stats = ct  # stat cotangents are zero by construction
        blk = p["blk"]
        dtype = v1.dtype

        # ---- tail backward (56^2): jax.vjp re-run ---------------------
        # (The vjp closure cannot be a custom_vjp residual, so the tail
        # forward is re-run here; it is all 56^2-sized and cheap.)
        _, tail_vjp = jax.vjp(_tail, v2, vd, blk)
        tail_ct = {k: _d_stats[k] for k in ("conv2", "conv3", "downsample")}
        dv2, dvd, d_blk_tail = tail_vjp((d_out, tail_ct))

        # ---- heavy middle ---------------------------------------------
        n1 = float(np.prod(v1.shape[:-1]))
        inv1, a1, b1 = _fold(
            m1, var1, blk["conv1"]["bn"]["scale"], blk["conv1"]["bn"]["bias"], dtype
        )
        w1 = blk["conv1"]["conv"]["kernel"]
        w2 = blk["conv2"]["conv"]["kernel"]
        wd = blk["downsample"]["conv"]["kernel"]

        if with_stem:
            ms, vars_ = stem_stats
            invs, a_s, b_s = _fold(
                ms, vars_, p["stem"]["bn"]["scale"], p["stem"]["bn"]["bias"], dtype
            )
            xin = jax.nn.relu(vs * a_s + b_s)
        else:
            xin = x

        # P1: one pass over (v1, dv2) -> BN1 global sums + conv2 dW.
        y1 = jax.nn.relu(v1 * a1 + b1)
        g1 = _conv_dx(dv2, w2, v1.shape, dtype, stride=2, pad=1, groups=groups)
        dz1 = jnp.where(v1 * a1 + b1 > 0, g1, jnp.zeros_like(g1))
        dz1f = dz1.astype(jnp.float32)
        S0 = jnp.sum(dz1f, axis=tuple(range(dz1.ndim - 1)))
        S1 = jnp.sum(dz1f * v1.astype(jnp.float32), axis=tuple(range(dz1.ndim - 1)))
        dW2 = _conv_dw(y1, dv2, w2.shape, stride=2, pad=1, groups=groups)

        k0, k1, d_g1s, d_b1s = _bn_bwd_coeffs(
            S0, S1, m1, var1, blk["conv1"]["bn"]["scale"], n1
        )

        # P2: one pass over (v1, g1, xin|vs, dvd) -> dv1, dW1, dWd, dx.
        # (The stem BN backward sums are always taken in XLA below, off
        # the dzs pass fused_bwd needs for dWs anyway: the stem relu MASK
        # must be single-sourced — a Mosaic-recomputed mask flips at
        # sub-ulp kink points and each flip is an O(1) error in a sum.)
        if use_pallas:
            blk_k = {**blk, "_k": (k0, k1)}
            stem_arg = {"_fold": (a_s, b_s)} if with_stem else None
            xv = vs if with_stem else xin

            def _p2_local(v1_, dz1_, xv_, dvd_, blk_, m1_, var1_, stem_):
                return p2_backward(
                    v1_, dz1_, xv_, dvd_, blk_, m1_, var1_, stem_,
                    interpret=interpret, rounding=rounding,
                )

            if shard_p2:
                P = jax.sharding.PartitionSpec

                def _p2_shard(*a):
                    outs = _p2_local(*a)
                    # dx stays batch-sharded; the weight/stat sums are
                    # per-shard partials -> cross-replica reduce, the same
                    # contraction GSPMD emits for the jnp dot_generals.
                    return (outs[0],) + tuple(
                        jax.lax.psum(o, data_axis) for o in outs[1:]
                    )

                run_p2 = _shard_map(
                    _p2_shard,
                    mesh=mesh,
                    in_specs=(P(data_axis),) * 4 + (P(),) * 4,
                    out_specs=(P(data_axis),) + (P(),) * 2,
                    # pallas_call's out_shape carries no vma; the manual
                    # psums above establish the replication the specs claim
                    check_vma=False,
                )
            else:
                run_p2 = _p2_local

            dx, dW1, dWd = run_p2(v1, dz1, xv, dvd, blk_k, m1, var1, stem_arg)
        else:
            dv1 = dz1 * a1 + (v1.astype(jnp.float32) * k1 + k0).astype(dtype)
            dW1 = _conv_dw(xin, dv1, w1.shape)
            dWd = _conv_dw(xin, dvd, wd.shape, stride=2, pad=0)
            dx = _conv_dx(dv1, w1, xin.shape, dtype) + _conv_dx(
                dvd, wd, xin.shape, dtype, stride=2, pad=0
            )

        d_blk = dict(d_blk_tail)
        d_blk["conv1"] = {
            "conv": {"kernel": dW1},
            "bn": {"scale": d_g1s, "bias": d_b1s},
        }
        d_blk["conv2"] = {
            "conv": {"kernel": dW2},
            "bn": d_blk_tail["conv2"]["bn"],
        }
        d_blk["downsample"] = {
            "conv": {"kernel": dWd},
            "bn": d_blk_tail["downsample"]["bn"],
        }

        if with_stem:
            ns = float(np.prod(vs.shape[:-1]))
            dzs = jnp.where(vs * a_s + b_s > 0, dx, jnp.zeros_like(dx))
            dzsf = dzs.astype(jnp.float32)
            S0s = jnp.sum(dzsf, axis=tuple(range(dzs.ndim - 1)))
            S1s = jnp.sum(
                dzsf * vs.astype(jnp.float32), axis=tuple(range(dzs.ndim - 1))
            )
            k0s, k1s, d_gss, d_bss = _bn_bwd_coeffs(
                S0s, S1s, ms, vars_, p["stem"]["bn"]["scale"], ns
            )
            dvs = dzs * a_s + (vs.astype(jnp.float32) * k1s + k0s).astype(dtype)
            ws = p["stem"]["conv"]["kernel"]
            dWs = _conv_dw(x, dvs, ws.shape, stride=2, pad=1)
            # grad w.r.t. the frames: dead in training (inputs are data);
            # computed honestly, DCE'd by XLA when unused.
            dx0 = _conv_dx(dvs, ws, x.shape, dtype, stride=2, pad=1)
            d_p = {
                "stem": {
                    "conv": {"kernel": dWs},
                    "bn": {"scale": d_gss, "bias": d_bss},
                },
                "blk": d_blk,
            }
            return dx0, d_p
        return dx, {"blk": d_blk}

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def make_fused_shift_block(
    *,
    groups: int,
    use_pallas: bool = False,
    interpret: bool = False,
    rounding: Optional[str] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    data_axis: str = "data",
):
    """Fused stride-2 YBlock whose conv1 input went through a temporal
    shift: ``fn(xs, x, p) -> (out, stats)``.

    ``xs`` is the shifted block input (GatedShift output, computed and
    differentiated in XLA outside this unit), ``x`` the pre-shift input
    feeding the downsample shortcut, ``p = {'blk': YBlock tree minus gs}``.
    Returning separate cotangents for ``xs`` and ``x`` lets JAX chain the
    shift backward and the shortcut fan-out automatically.

    Targets s3_b1/s4_b1 (models/regnet.py YBlock with shift, stride 2;
    ref block: model/shift.py:89-93 + timm regnety bottleneck): the same
    P1/P2 backward restructure as ``make_fused_block``, with the P2
    single-pass producing dxs (conv1 path) and dxd (downsample path) from
    one read of (v1, dz1, xs, x_even, dvd).
    """
    if rounding is None:
        rounding = "per-op" if interpret else "single"
    shard_p2 = (
        mesh is not None and use_pallas and mesh.shape.get(data_axis, 1) > 1
    )

    def fwd_only(xs, x, p):
        v1, s1, v2, vd = _front_shift(xs, x, p["blk"], groups)
        out, tail_stats = _tail(v2, vd, p["blk"])
        return out, {"conv1": s1, **tail_stats}

    @jax.custom_vjp
    def fused(xs, x, p):
        return fwd_only(xs, x, p)

    def fused_fwd(xs, x, p):
        v1, s1, v2, vd = _front_shift(xs, x, p["blk"], groups)
        out, tail_stats = _tail(v2, vd, p["blk"])
        return (out, {"conv1": s1, **tail_stats}), (xs, x, v1, s1, v2, vd, p)

    def fused_bwd(res, ct):
        xs, x, v1, (m1, var1), v2, vd, p = res
        d_out, _d_stats = ct
        blk = p["blk"]
        dtype = v1.dtype

        _, tail_vjp = jax.vjp(_tail, v2, vd, blk)
        tail_ct = {k: _d_stats[k] for k in ("conv2", "conv3", "downsample")}
        dv2, dvd, d_blk_tail = tail_vjp((d_out, tail_ct))

        n1 = float(np.prod(v1.shape[:-1]))
        _, a1, b1 = _fold(
            m1, var1, blk["conv1"]["bn"]["scale"], blk["conv1"]["bn"]["bias"], dtype
        )
        w1 = blk["conv1"]["conv"]["kernel"]
        w2 = blk["conv2"]["conv"]["kernel"]
        wd = blk["downsample"]["conv"]["kernel"]

        # P1 (identical to the entry unit): BN1 sums + conv2 dW + dz1.
        y1 = jax.nn.relu(v1 * a1 + b1)
        g1 = _conv_dx(dv2, w2, v1.shape, dtype, stride=2, pad=1, groups=groups)
        dz1 = jnp.where(v1 * a1 + b1 > 0, g1, jnp.zeros_like(g1))
        dz1f = dz1.astype(jnp.float32)
        S0 = jnp.sum(dz1f, axis=tuple(range(dz1.ndim - 1)))
        S1 = jnp.sum(dz1f * v1.astype(jnp.float32), axis=tuple(range(dz1.ndim - 1)))
        dW2 = _conv_dw(y1, dv2, w2.shape, stride=2, pad=1, groups=groups)
        k0, k1, d_g1s, d_b1s = _bn_bwd_coeffs(
            S0, S1, m1, var1, blk["conv1"]["bn"]["scale"], n1
        )

        if use_pallas:
            blk_k = {**blk, "_k": (k0, k1)}

            def _p2_local(v1_, dz1_, xs_, x_, dvd_, blk_, m1_, var1_):
                return p2_shift_backward(
                    v1_, dz1_, xs_, x_, dvd_, blk_, m1_, var1_,
                    interpret=interpret, rounding=rounding,
                )

            if shard_p2:
                P = jax.sharding.PartitionSpec

                def _p2_shard(*a):
                    outs = _p2_local(*a)
                    return outs[:2] + tuple(
                        jax.lax.psum(o, data_axis) for o in outs[2:]
                    )

                run_p2 = _shard_map(
                    _p2_shard,
                    mesh=mesh,
                    in_specs=(P(data_axis),) * 5 + (P(),) * 3,
                    out_specs=(P(data_axis),) * 2 + (P(),) * 2,
                    check_vma=False,
                )
            else:
                run_p2 = _p2_local

            dxs, dxd, dW1, dWd = run_p2(v1, dz1, xs, x, dvd, blk_k, m1, var1)
        else:
            dv1 = dz1 * a1 + (v1.astype(jnp.float32) * k1 + k0).astype(dtype)
            dW1 = _conv_dw(xs, dv1, w1.shape)
            dWd = _conv_dw(x, dvd, wd.shape, stride=2, pad=0)
            dxs = _conv_dx(dv1, w1, xs.shape, dtype)
            dxd = _conv_dx(dvd, wd, x.shape, dtype, stride=2, pad=0)

        d_blk = dict(d_blk_tail)
        d_blk["conv1"] = {
            "conv": {"kernel": dW1},
            "bn": {"scale": d_g1s, "bias": d_b1s},
        }
        d_blk["conv2"] = {
            "conv": {"kernel": dW2},
            "bn": d_blk_tail["conv2"]["bn"],
        }
        d_blk["downsample"] = {
            "conv": {"kernel": dWd},
            "bn": d_blk_tail["downsample"]["bn"],
        }
        return dxs, dxd, {"blk": d_blk}

    fused.defvjp(fused_fwd, fused_bwd)
    return fused
