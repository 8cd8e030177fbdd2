"""Fused SGP branch kernel: four depthwise temporal convs + gating in one
VMEM pass.

The SGP block's branch math (ref: model/modules.py:159-188) is

    out = fc(x) * phi + (convw(x) + convkw(x)) * psi(x) + x

where fc is a 1x1 depthwise conv, convw/convkw/psi are depthwise temporal
convs (kernel ks / up / ks) and phi is a per-channel gate from the temporal
mean. As XLA ops this is four separate grouped convolutions, each streaming
x from HBM. Depthwise convs can't use the MXU (no contraction dimension),
so each lowers to VPU shifted multiply-adds anyway — the separate ops just
multiply HBM traffic.

This kernel reads x once into VMEM, computes every tap of all four convs as
in-register shifted multiply-adds (zero-padded SAME semantics), then the
gating combine — one HBM read + one write total.

Layout: (B, T, C) with C on lanes, T on sublanes. The whole (T, C) tile of
one batch element fits VMEM comfortably (100 x 768 x 4B = 300 KB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shifted(x: jax.Array, off: int) -> jax.Array:
    """x advanced by `off` frames with zero fill: y[t] = x[t + off].

    Roll + iota mask (Mosaic lowers rolls natively; pad+slice concats fail
    to tile on non-128-aligned minor dims)."""
    if off == 0:
        return x
    rolled = pltpu.roll(x, (-off) % x.shape[0], 0)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    n = x.shape[0]
    mask = idx < n - off if off > 0 else idx >= -off
    return jnp.where(mask, rolled, jnp.zeros_like(x))


def _branch_kernel(x_ref, phi_ref, wfc_ref, bfc_ref, wpsi_ref, bpsi_ref,
                   wcw_ref, bcw_ref, wckw_ref, bckw_ref, out_ref,
                   *, ks: int, up: int):
    """One batch element. Block shapes: x/out (1, T, C); phi/biases (1, C)
    [phi block (1, 1, C)]; weights (k, C)."""
    x = x_ref[0].astype(jnp.float32)  # (T, C)

    def dwconv(w_ref, b_ref, k):
        pad = k // 2
        acc = jnp.broadcast_to(b_ref[0, :].astype(jnp.float32), x.shape)
        for j in range(k):
            acc = acc + w_ref[j, :].astype(jnp.float32) * _shifted(x, j - pad)
        return acc

    fc = wfc_ref[0, :].astype(jnp.float32) * x + bfc_ref[0, :].astype(jnp.float32)
    psi = dwconv(wpsi_ref, bpsi_ref, ks)
    convw = dwconv(wcw_ref, bcw_ref, ks)
    convkw = dwconv(wckw_ref, bckw_ref, up)
    phi = phi_ref[0, 0, :].astype(jnp.float32)

    out = fc * phi + (convw + convkw) * psi + x
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("ks", "up", "interpret")
)
def sgp_branches(
    x: jax.Array,       # (B, T, C) LayerNormed input
    phi: jax.Array,     # (B, 1, C) ReLU'd instant gate (bias included)
    w_fc: jax.Array,    # (1, C) depthwise 1x1 weight
    b_fc: jax.Array,    # (1, C)
    w_psi: jax.Array,   # (ks, C)
    b_psi: jax.Array,   # (1, C)
    w_cw: jax.Array,    # (ks, C)
    b_cw: jax.Array,    # (1, C)
    w_ckw: jax.Array,   # (up, C)
    b_ckw: jax.Array,   # (1, C)
    *,
    ks: int,
    up: int,
    interpret: bool = False,
) -> jax.Array:
    """out = fc(x)*phi + (convw(x)+convkw(x))*psi(x) + x, biases included
    (exact math of ref: model/modules.py:170)."""
    b, t, c = x.shape
    kernel = functools.partial(_branch_kernel, ks=ks, up=up)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full((1, c)),
            full((1, c)),
            full((ks, c)),
            full((1, c)),
            full((ks, c)),
            full((1, c)),
            full((up, c)),
            full((1, c)),
        ],
        out_specs=pl.BlockSpec(
            (1, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interpret,
    )(x, phi, w_fc, b_fc, w_psi, b_psi, w_cw, b_cw, w_ckw, b_ckw)
