"""Fused GSF (Gate-Shift-Fuse) Pallas kernel.

The XLA path (models/shift.py GSF) is a chain of small ops over
(B, T, H, W, fold) activations: 3D gate conv (fold -> 2, groups 2), tanh,
gated ±1-frame shift with zero pad, spatially-pooled stats, two tiny 3x3
fusion convs, sigmoid blends (ref: model/impl/gsf.py:9-93). Measured, the
11 GatedShift instances add ~19 ms to a 30 ms backbone forward — dominated
by many small-op dispatches and layout changes, not FLOPs.

Split of labour:
  * the gate conv (27-tap 3D, 2 output channels) stays in XLA — it is one
    well-lowered convolution, and unrolling it inside a kernel blew up the
    Mosaic compiler at full shapes;
  * everything after it — gating, ±1 temporal shift, HW-means, the two 3x3
    fusion convs on the tiny (T, C/2) stats image, sigmoid blends — fuses
    into ONE Pallas pass per batch element (``gsf_post_gate``): one HBM
    read of x/gate + one write, instead of ~8 separate elementwise/layout
    ops.

BatchNorm (training-mode batch stats are a cross-batch reduction) and the
channel interleave regroup (a lane shuffle XLA folds into the following
1x1 conv) stay outside.

Backward: jax.custom_vjp with the functional jnp reference supplying the
cotangents — forward traffic is the win; backward stays XLA.

STATUS — EXPERIMENTAL, NOT FOR HARDWARE USE. Interpret-mode parity and
gradient tests pass; on the current TPU toolchain the lowering is BOTH
fragile (s3 geometry and bf16 internals crash the Mosaic remote compiler)
and, where it does compile, numerically WRONG (tools/check_tpu_parity.py:
normalized error ~13 at a small shape — suspected roll/mask or 2-lane
broadcast miscompile). gsf_post_gate therefore raises on a real TPU unless
TDEED_EXPERIMENTAL_GSF=1 is set. The production path is gsf_core (XLA);
isolated timings showed the kernel would at best match XLA anyway — the
in-graph GSF cost is layout transitions, not this op's arithmetic.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Functional references (jnp) — mirror models/shift.py GSF after the BN.
# ---------------------------------------------------------------------------

def gsf_gate(xn, gate_w, gate_b):
    """tanh(3D grouped gate conv) (ref: gsf.py:17-18,38-44).

    xn: (B, T, H, W, C) post BN+ReLU; gate_w: (3, 3, 3, C//2, 2) flax
    grouped kernel; returns (B, T, H, W, 2).

    The conv runs in the ACTIVATION dtype (bf16 in training — the weights
    are downcast), not fp32: a tanh-gated signal does not need fp32 conv
    accumulation beyond what the TPU's fp32 conv accumulators already give,
    and the fp32 formulation doubled the gate conv's fwd+bwd traffic.

    Note: a custom-backward variant exists (gate_conv, bottom of module)
    but measured SLOWER in-graph (134 vs 120 ms/step) — the 27-tap shift
    chains in its VJP do not fuse as well as XLA's native conv gradients
    here; kept for reference."""
    gate = jax.lax.conv_general_dilated(
        xn, gate_w.astype(xn.dtype), (1, 1, 1), "SAME",
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        feature_group_count=2,
    ) + gate_b
    return jnp.tanh(gate)


def gsf_post_gate_ref(x, gate, ch1_w, ch1_b, ch2_w, ch2_b):
    """Gating + shift + pooled-stat fusion blend (ref: gsf.py:46-93),
    given the tanh'd gate. Returns the blended head pre-interleave."""
    c = x.shape[-1]
    x = x.astype(jnp.float32)
    gate = gate.astype(jnp.float32)
    g1, g2 = gate[..., 0:1], gate[..., 1:2]

    x1, x2 = x[..., : c // 2], x[..., c // 2:]
    y1, y2 = g1 * x1, g2 * x2
    r1, r2 = x1 - y1, x2 - y2
    y1 = jnp.pad(y1[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
    y2 = jnp.pad(y2[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))

    def fuse(y, r, w, b):
        ym = jnp.swapaxes(jnp.mean(y, axis=(2, 3)), 1, 2)  # (B, C/2, T)
        rm = jnp.swapaxes(jnp.mean(r, axis=(2, 3)), 1, 2)
        stat = jnp.stack([ym, rm], axis=-1)  # (B, C/2, T, 2)
        wmap = jax.lax.conv_general_dilated(
            stat, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        wmap = jax.nn.sigmoid(wmap[..., 0])  # (B, C/2, T)
        wmap = jnp.swapaxes(wmap, 1, 2)[:, :, None, None, :]
        return y * wmap + r * (1.0 - wmap)

    return jnp.concatenate(
        [fuse(y1, r1, ch1_w, ch1_b), fuse(y2, r2, ch2_w, ch2_b)], axis=-1
    )


def gsf_core(x, xn, gate_w, gate_b, ch1_w, ch1_b, ch2_w, ch2_b):
    """Full post-BN GSF math on (B, T, H, W, C), C even (XLA path)."""
    gate = gsf_gate(xn, gate_w, gate_b)
    return gsf_post_gate_ref(x, gate, ch1_w, ch1_b, ch2_w, ch2_b)


# ---------------------------------------------------------------------------
# Pallas kernel (post-gate part)
# ---------------------------------------------------------------------------


def _shift_dim(a: jax.Array, off: int, axis: int) -> jax.Array:
    """y[i] = a[i + off] along `axis`, zero-filled at the edges.

    Roll + iota mask: Mosaic lowers rolls natively, while pad+slice becomes
    a concatenate it cannot tile on non-128-aligned minor dims."""
    if off == 0:
        return a
    rolled = pltpu.roll(a, (-off) % a.shape[axis], axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)
    n = a.shape[axis]
    mask = idx < n - off if off > 0 else idx >= -off
    return jnp.where(mask, rolled, jnp.zeros_like(a))


def _post_kernel(x_ref, gate_ref, c1w_ref, c1b_ref, c2w_ref, c2b_ref,
                 out_ref, *, t: int, hw: int, c: int):
    ch = c // 2
    f32 = jnp.float32
    # fp32 internals: bf16 rolls/selects at these shapes crash the Mosaic
    # compiler outright, fp32 compiles for the s4 geometry (the s3 geometry
    # still overflows — see module docstring for status).
    x = x_ref[0].astype(f32)            # (T, HW, C)
    gate = gate_ref[0].astype(f32)      # (T, HW, 2)
    c1w = c1w_ref[...].astype(f32)  # (3, 3, 2, 1)
    c1b = c1b_ref[...].astype(f32)  # (1, 1)
    c2w = c2w_ref[...].astype(f32)
    c2b = c2b_ref[...].astype(f32)

    g1, g2 = gate[..., 0:1], gate[..., 1:2]
    x1, x2 = x[..., :ch], x[..., ch:]
    y1, y2 = g1 * x1, g2 * x2
    r1, r2 = x1 - y1, x2 - y2
    y1 = _shift_dim(y1, 1, 0)   # left shift, zero pad (gsf.py:58)
    y2 = _shift_dim(y2, -1, 0)  # right shift

    def fuse(y, r, cw, cb):
        ym = jnp.mean(y, axis=1)  # (T, C/2)
        rm = jnp.mean(r, axis=1)
        # 3x3 conv over the (C/2, T) stats image, expressed on (T, C/2):
        # out[t, ci] = sum_{dc, dt, s} W[dc, dt, s] * stat_s[t+dt, ci+dc]
        acc = jnp.zeros((t, ch), f32)
        for dc in (-1, 0, 1):
            for dt in (-1, 0, 1):
                for s_idx, stat in ((0, ym), (1, rm)):
                    wv = cw[dc + 1, dt + 1, s_idx, 0]
                    acc = acc + wv * _shift_dim(
                        _shift_dim(stat, dt, 0), dc, 1
                    )
        wmap = jax.nn.sigmoid(acc + cb[0, 0])  # (T, C/2)
        wmap = wmap[:, None, :]
        return y * wmap + r * (1.0 - wmap)

    out1 = fuse(y1, r1, c1w, c1b)
    out2 = fuse(y2, r2, c2w, c2b)
    out_ref[0] = jnp.concatenate([out1, out2], axis=-1).astype(out_ref.dtype)


def _post_pallas_impl(x, gate, ch1_w, ch1_b, ch2_w, ch2_b, interpret: bool):
    b, t, h, w, c = x.shape
    hw = h * w
    # Post-gate math is per-pixel + HW-means: collapse the spatial dims so
    # the kernel tiles (HW sublanes, C lanes) instead of a rank-5 block.
    x4 = x.reshape(b, t, hw, c)
    gate4 = gate.reshape(b, t, hw, 2)
    kernel = functools.partial(_post_kernel, t=t, hw=hw, c=c)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    xspec = pl.BlockSpec(
        (1, t, hw, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    gspec = pl.BlockSpec(
        (1, t, hw, 2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            xspec, gspec,
            full((3, 3, 2, 1)),
            full((1, 1)),
            full((3, 3, 2, 1)),
            full((1, 1)),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, t, hw, c), x.dtype),
        interpret=interpret,
    )(x4, gate4, ch1_w, ch1_b.reshape(1, 1), ch2_w, ch2_b.reshape(1, 1))
    return out.reshape(b, t, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def gsf_post_gate(x, gate, ch1_w, ch1_b, ch2_w, ch2_b,
                  interpret: bool = False):
    """Fused post-gate GSF (blend result, pre-interleave). Differentiable:
    forward = Pallas kernel, backward = VJP of the jnp reference."""
    return _post_pallas_impl(x, gate, ch1_w, ch1_b, ch2_w, ch2_b, interpret)


def _post_fwd(x, gate, ch1_w, ch1_b, ch2_w, ch2_b, interpret):
    out = _post_pallas_impl(x, gate, ch1_w, ch1_b, ch2_w, ch2_b, interpret)
    return out, (x, gate, ch1_w, ch1_b, ch2_w, ch2_b)


def _post_bwd(interpret, res, g):
    ref_fn = lambda *a: gsf_post_gate_ref(*a).astype(res[0].dtype)
    _, vjp = jax.vjp(ref_fn, *res)
    return vjp(g)


gsf_post_gate.defvjp(_post_fwd, _post_bwd)


def gsf_fused(x, xn, gate_w, gate_b, ch1_w, ch1_b, ch2_w, ch2_b,
              interpret: bool = False):
    """GSF with the gate conv in XLA and the post-gate chain fused."""
    import os

    if not interpret and os.environ.get("TDEED_EXPERIMENTAL_GSF") != "1":
        raise NotImplementedError(
            "gsf_fused is numerically incorrect on the current TPU "
            "toolchain (see module docstring); use the XLA path "
            "(pallas_shift=False) or set TDEED_EXPERIMENTAL_GSF=1."
        )
    gate = gsf_gate(xn, gate_w, gate_b)
    return gsf_post_gate(x, gate, ch1_w, ch1_b, ch2_w, ch2_b, interpret)


# ---------------------------------------------------------------------------
# Gate conv with a hand-written backward.
#
# The forward (3x3x3 grouped conv, fold -> 2 channels) lowers fine, but
# XLA's BACKWARD for a 2-output-channel conv is pathological: the variant
# ladder (tools/profile_gsf_variants.py) measured the gate convs adding
# ~30 ms fwd+bwd across 11 GSF instances. With one output channel per
# group the gradients have closed forms made of cheap shifts:
#   d_xn[q, c] = sum_d  w[d, c] * shifted_{-d}(g_cot)      (outer product)
#   d_w[d, c]  = sum_p  shifted_{+d}(xn)[p, c] * g_cot[p]  (reduction)
# both of which XLA fuses into a handful of elementwise passes.
# ---------------------------------------------------------------------------


def _shift3(a: jax.Array, d: Tuple[int, int, int]) -> jax.Array:
    """Zero-filled shift of (B, T, H, W, ...) by d over (T, H, W):
    y[p] = a[p + d]."""
    out = a
    for axis, off in zip((1, 2, 3), d):
        if off == 0:
            continue
        n = out.shape[axis]
        pad = [(0, 0)] * out.ndim
        sl = [slice(None)] * out.ndim
        if off > 0:
            sl[axis] = slice(off, None)
            pad[axis] = (0, off)
        else:
            sl[axis] = slice(None, off)
            pad[axis] = (-off, 0)
        out = jnp.pad(out[tuple(sl)], pad)
    return out


_TAPS = [(dt, dh, dw) for dt in (-1, 0, 1) for dh in (-1, 0, 1)
         for dw in (-1, 0, 1)]


@jax.custom_vjp
def gate_conv(xn, gate_w, gate_b):
    """3x3x3 grouped (2-group, 2-output) gate conv, pre-tanh.

    Same math as the conv inside gsf_gate; custom backward avoids XLA's
    slow transposed-conv lowering for 2 output channels."""
    out = jax.lax.conv_general_dilated(
        xn.astype(gate_w.dtype), gate_w, (1, 1, 1), "SAME",
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        feature_group_count=2,
    )
    return out + gate_b


def _gate_conv_fwd(xn, gate_w, gate_b):
    return gate_conv(xn, gate_w, gate_b), (xn, gate_w)


def _gate_conv_bwd(res, g):
    xn, gate_w = res
    c = xn.shape[-1]
    ch = c // 2
    f32 = jnp.float32
    g = g.astype(f32)
    g0, g1 = g[..., 0:1], g[..., 1:2]  # cotangents per group

    # d_xn: sum over taps of shifted cotangent x per-channel weight
    d_halves = []
    for half, gc in ((0, g0), (1, g1)):
        acc = jnp.zeros(xn.shape[:-1] + (ch,), f32)
        for i, d in enumerate(_TAPS):
            w_tap = gate_w[d[0] + 1, d[1] + 1, d[2] + 1, :, half].astype(f32)
            acc = acc + _shift3(gc, (-d[0], -d[1], -d[2])) * w_tap
        d_halves.append(acc)
    d_xn = jnp.concatenate(d_halves, axis=-1).astype(xn.dtype)

    # d_w[d, c, o] = sum_pixels shifted_{+d}(xn_half_o)[., c] * g_o[.]
    xn32 = xn.astype(f32)
    rows = []
    for d in _TAPS:
        sh = _shift3(xn32, d)
        r0 = jnp.sum(sh[..., :ch] * g0, axis=(0, 1, 2, 3))  # (C/2,)
        r1 = jnp.sum(sh[..., ch:] * g1, axis=(0, 1, 2, 3))
        rows.append(jnp.stack([r0, r1], axis=-1))  # (C/2, 2)
    d_w = jnp.stack(rows, axis=0).reshape(3, 3, 3, ch, 2).astype(gate_w.dtype)

    d_b = jnp.sum(g, axis=(0, 1, 2, 3)).astype(gate_w.dtype)
    return d_xn, d_w, d_b


gate_conv.defvjp(_gate_conv_fwd, _gate_conv_bwd)
