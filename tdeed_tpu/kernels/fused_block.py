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
    dW; P2: everything else).

A single-pass Pallas P2 family (entry / shift / conv1-unit kernels) was
built for this module, parity-gated and A/B-measured over rounds 3-4 —
and PRUNED: on device it measured NEGATIVE on the full step (fused-jnp
76.0 vs fused-pallas 82.7 vs all-pallas 83.9 ms; XLA overlaps the per-op
backward too well), and the stem variant kept O(1) grad-entry mismatches
from Mosaic/XLA bf16 materialization differences even after an exact-RNE
double-snap fix (re-measured round 4: 1/8 stem-BN-scale, 7/216 stem-dW
entries). Per the project's r1-GSF precedent, negative-measuring kernels
are deleted and the findings kept: see docs/DESIGN.md "fused entry/shift
blocks" for the three measured Mosaic/XLA bf16 semantics facts and the
full A/B ladder (the probes lived in tools/probe_fused_miscompile.py,
removed with the kernels; tools/profile_pallas_probe.py retains the
standalone streaming/roofline microbenches).

Numerics mirror the production modules exactly: bf16 convs with fp32
params, SplitBatchNorm's fp32 ``E[x^2]-E[x]^2`` stats and bf16 fold
(models/common.py:106), relu'(0)=0, and gradients that flow through the
batch statistics (standard training BN backward). Batch mean/var for the
running-average updates are returned as auxiliary outputs; their
cotangents are treated as zero (running stats are never differentiated —
same as the flax mutable-collection semantics). Under a DP mesh the jnp
formulation needs no special handling: GSPMD partitions the dot_generals
into per-shard partials + cross-replica reduces automatically.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

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


# ---------------------------------------------------------------------------
# The fused op factories
# ---------------------------------------------------------------------------


def make_fused_conv_bn_relu():
    """Standalone fused conv1x1 + SplitBatchNorm + relu:
    ``fn(x, p) -> (y, (m, var))`` with a two-pass backward.

    ``p`` is a ConvBN subtree ({'conv': {'kernel'}, 'bn': {'scale','bias'}}).
    This is the conv1 of the stride-1 YBlocks (models/regnet.py) — the
    rest of those blocks stays on flax autodiff (a full-block fusion would
    re-run the tail forward at the SAME resolution in the backward,
    cancelling the P2 win that made the stride-2 units profitable). The
    backward eliminates XLA's dv1 materializations: P1 masks the
    cotangent and takes the two BN sums; P2 streams (v1, dz1, x) once for
    dx + dW."""

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

        dv1 = dz1 * a1 + (v1.astype(jnp.float32) * k1 + k0).astype(dtype)
        dW1 = _conv_dw(x, dv1, w1.shape)
        dx = _conv_dx(dv1, w1, x.shape, dtype)

        return dx, {
            "conv": {"kernel": dW1},
            "bn": {"scale": d_scale, "bias": d_bias},
        }

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def make_fused_block(*, groups: int, with_stem: bool):
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
    module docstring. Under a DP mesh GSPMD partitions the backward's
    dot_generals into per-shard partials + cross-replica reduces — no
    special handling needed.
    """

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

        # P2: one pass over (v1, g1, xin, dvd) -> dv1, dW1, dWd, dx.
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


def make_fused_shift_block(*, groups: int):
    """Fused stride-2 YBlock whose conv1 input went through a temporal
    shift: ``fn(xs, x, p) -> (out, stats)``.

    ``xs`` is the shifted block input (GatedShift output, computed and
    differentiated in XLA outside this unit), ``x`` the pre-shift input
    feeding the downsample shortcut, ``p = {'blk': YBlock tree minus gs}``.
    Returning separate cotangents for ``xs`` and ``x`` lets JAX chain the
    shift backward and the shortcut fan-out automatically.

    Targets s3_b1/s4_b1 (models/regnet.py YBlock with shift, stride 2;
    ref block: model/shift.py:89-93 + timm regnety bottleneck): the same
    P1/P2 backward restructure as ``make_fused_block``.
    """

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

        # P2: dxs (conv1 path) and dxd (downsample path) + the two dWs.
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
