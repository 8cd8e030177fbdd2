"""Fused GSF (Gate-Shift-Fuse) Pallas kernel.

The XLA path (models/shift.py GSF) is a chain of small ops over
(B, T, H, W, fold) activations: 3D gate conv (fold -> 2, groups 2), tanh,
gated ±1-frame shift with zero pad, spatially-pooled stats, two tiny 3x3
fusion convs, sigmoid blends (ref: model/impl/gsf.py:9-93). Measured, the
11 GatedShift instances add ~19 ms to a 30 ms backbone forward — dominated
by many small-op dispatches and layout changes, not FLOPs.

This kernel computes the whole chain after BatchNorm in ONE pass per batch
element: the gate conv as 27 shifted (C -> 2) matvecs (block-diagonal
weight, MXU), the gated shift, the HW-means, the 3x3 fusion convs as 18
shifted multiply-adds on the tiny (C/2, T) stats image, and the final
blend — one HBM read of x/xn + one write.

BatchNorm (training-mode batch stats are a cross-batch reduction) and the
channel interleave regroup (a lane shuffle XLA folds into the following
1x1 conv) stay outside.

Backward: jax.custom_vjp with the functional jnp reference (`gsf_core`)
supplying the cotangents — forward traffic is the win; backward stays XLA.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Functional reference (jnp) — mirrors models/shift.py GSF after the BN.
# ---------------------------------------------------------------------------

def gsf_core(x, xn, gate_w, gate_b, ch1_w, ch1_b, ch2_w, ch2_b):
    """Post-BN GSF math on (B, T, H, W, C), C even.

    gate_w: (3, 3, 3, C//2, 2) flax grouped-conv kernel; gate_b: (2,)
    ch{1,2}_w: (3, 3, 2, 1) fusion conv kernels; ch{1,2}_b: (1,)
    Returns the blended head BEFORE the interleave regroup.
    """
    c = x.shape[-1]
    # fp32 throughout (weights arrive fp32; activations may be bf16) — the
    # Pallas kernel computes in fp32 too, so both paths agree bit-wise in
    # structure. The caller casts the result back to the compute dtype.
    x = x.astype(jnp.float32)
    xn = xn.astype(jnp.float32)
    gate = jax.lax.conv_general_dilated(
        xn, gate_w, (1, 1, 1), "SAME",
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        feature_group_count=2,
    ) + gate_b
    gate = jnp.tanh(gate)
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


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _shift_dim(a: jax.Array, off: int, axis: int) -> jax.Array:
    """y[i] = a[i + off] along `axis`, zero-filled at the edges.

    Implemented as circular roll + iota mask: Mosaic lowers rolls natively,
    while pad+slice becomes a concatenate it cannot tile on non-128-aligned
    minor dims ("result/input offset mismatch on non-concat dimension").
    """
    if off == 0:
        return a
    rolled = pltpu.roll(a, (-off) % a.shape[axis], axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)
    n = a.shape[axis]
    mask = idx < n - off if off > 0 else idx >= -off
    return jnp.where(mask, rolled, jnp.zeros_like(a))


def _gsf_kernel(x_ref, xn_ref, gw_ref, gb_ref, c1w_ref, c1b_ref,
                c2w_ref, c2b_ref, out_ref, *, t: int, h: int, w: int, c: int):
    ch = c // 2
    f32 = jnp.float32
    x = x_ref[0].astype(f32)    # (T, H, W, C)
    xn = xn_ref[0].astype(f32)
    # Load the small parameter tensors wholesale and cast to f32 up front:
    # Mosaic only supports 32-bit scalar extracts.
    gw = gw_ref[...].astype(f32)      # (3, 3, 3, C//2, 2)
    gb = gb_ref[...].astype(f32)      # (1, 2)
    c1w = c1w_ref[...].astype(f32)    # (3, 3, 2, 1)
    c1b = c1b_ref[...].astype(f32)    # (1, 1)
    c2w = c2w_ref[...].astype(f32)
    c2b = c2b_ref[...].astype(f32)

    # --- gate conv: 27 shifted (THW, C) x (C, 2) matvecs ----------------
    xn_flat_shape = (t * h * w, c)
    gate = jnp.zeros((t * h * w, 2), f32)
    for dt in (-1, 0, 1):
        for dh in (-1, 0, 1):
            for dw in (-1, 0, 1):
                shifted = _shift_dim(
                    _shift_dim(_shift_dim(xn, dt, 0), dh, 1), dw, 2
                )
                # block-diagonal (C, 2): first half -> out 0, second -> out 1
                wtap = gw[dt + 1, dh + 1, dw + 1]  # (C//2, 2)
                wblock = jnp.concatenate(
                    [
                        jnp.concatenate(
                            [wtap[:, 0:1], jnp.zeros((ch, 1), f32)], axis=1
                        ),
                        jnp.concatenate(
                            [jnp.zeros((ch, 1), f32), wtap[:, 1:2]], axis=1
                        ),
                    ],
                    axis=0,
                )  # (C, 2)
                gate = gate + jnp.dot(
                    shifted.reshape(xn_flat_shape), wblock,
                    preferred_element_type=f32,
                )
    gate = jnp.tanh(gate + gb[0, :])
    gate = gate.reshape(t, h, w, 2)
    g1, g2 = gate[..., 0:1], gate[..., 1:2]

    x1, x2 = x[..., :ch], x[..., ch:]
    y1, y2 = g1 * x1, g2 * x2
    r1, r2 = x1 - y1, x2 - y2
    # temporal shift with zero pad: y1 left (t+1), y2 right (t-1)
    y1 = _shift_dim(y1, 1, 0)
    y2 = _shift_dim(y2, -1, 0)

    def fuse(y, r, cw, cb):
        # stats (T, C/2): mean over H, W
        ym = jnp.mean(y, axis=(1, 2))
        rm = jnp.mean(r, axis=(1, 2))
        # 3x3 conv over the (C/2, T) image == over (T, C/2) with transposed
        # taps: out[t, c] = sum_{dc, dt} W[dc, dt] . stat[t+dt, c+dc]
        acc = jnp.zeros((t, ch), f32)
        for dc in (-1, 0, 1):
            for dt in (-1, 0, 1):
                for s_idx, stat in ((0, ym), (1, rm)):
                    wv = cw[dc + 1, dt + 1, s_idx, 0]
                    sh = _shift_dim(_shift_dim(stat, dt, 0), dc, 1)
                    acc = acc + wv * sh
        wmap = jax.nn.sigmoid(acc + cb[0, 0])  # (T, C/2)
        wmap = wmap[:, None, None, :]
        return y * wmap + r * (1.0 - wmap)

    out1 = fuse(y1, r1, c1w, c1b)
    out2 = fuse(y2, r2, c2w, c2b)
    out_ref[0] = jnp.concatenate([out1, out2], axis=-1).astype(out_ref.dtype)


def _gsf_pallas_fwd_impl(x, xn, gate_w, gate_b, ch1_w, ch1_b, ch2_w, ch2_b,
                         interpret: bool):
    b, t, h, w, c = x.shape
    kernel = functools.partial(_gsf_kernel, t=t, h=h, w=w, c=c)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    xspec = pl.BlockSpec(
        (1, t, h, w, c), lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            xspec, xspec,
            full((3, 3, 3, c // 2, 2)),
            full((1, 2)),
            full((3, 3, 2, 1)),
            full((1, 1)),
            full((3, 3, 2, 1)),
            full((1, 1)),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, t, h, w, c), x.dtype),
        interpret=interpret,
    )(x, xn, gate_w, gate_b.reshape(1, 2), ch1_w, ch1_b.reshape(1, 1),
      ch2_w, ch2_b.reshape(1, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def gsf_fused(x, xn, gate_w, gate_b, ch1_w, ch1_b, ch2_w, ch2_b,
              interpret: bool = False):
    """Fused post-BN GSF (blend result, pre-interleave). Differentiable:
    forward = Pallas kernel, backward = VJP of the jnp reference."""
    return _gsf_pallas_fwd_impl(
        x, xn, gate_w, gate_b, ch1_w, ch1_b, ch2_w, ch2_b, interpret
    )


def _gsf_fwd(x, xn, gate_w, gate_b, ch1_w, ch1_b, ch2_w, ch2_b, interpret):
    out = _gsf_pallas_fwd_impl(
        x, xn, gate_w, gate_b, ch1_w, ch1_b, ch2_w, ch2_b, interpret
    )
    return out, (x, xn, gate_w, gate_b, ch1_w, ch1_b, ch2_w, ch2_b)


def _gsf_bwd(interpret, res, g):
    out_ref_fn = lambda *a: gsf_core(*a).astype(res[0].dtype)
    _, vjp = jax.vjp(out_ref_fn, *res)
    return vjp(g)


gsf_fused.defvjp(_gsf_fwd, _gsf_bwd)
