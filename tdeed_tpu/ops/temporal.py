"""Static-shape temporal primitives for the SGP encoder-decoder.

TPU-first design notes:
  * Sequences are laid out (B, T, C) channels-last so C rides the 128-wide
    lane dimension of the VPU/MXU.
  * Linear upsampling (reference: nn.Upsample(mode='linear',
    align_corners=True), ref: model/modules.py:236,288) is expressed as a
    precomputed (T_out, T_in) interpolation matrix contracted on the MXU —
    all sizes are static under jit, so the matrix is a compile-time constant.
  * Adaptive max pooling (reference: nn.AdaptiveMaxPool1d,
    ref: model/modules.py:64,73-76) uses statically precomputed bin gathers;
    no dynamic shapes ever reach XLA.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _adaptive_pool_plan(t_in: int, t_out: int) -> Tuple[np.ndarray, np.ndarray]:
    """Bin gather indices + validity mask for torch AdaptiveMaxPool1d semantics.

    torch bin j covers [floor(j*T/out), ceil((j+1)*T/out)).
    """
    starts = [(j * t_in) // t_out for j in range(t_out)]
    ends = [math.ceil((j + 1) * t_in / t_out) for j in range(t_out)]
    kmax = max(e - s for s, e in zip(starts, ends))
    idx = np.zeros((t_out, kmax), np.int32)
    mask = np.zeros((t_out, kmax), bool)
    for j, (s, e) in enumerate(zip(starts, ends)):
        n = e - s
        idx[j, :n] = np.arange(s, e)
        mask[j, :n] = True
    return idx, mask


def adaptive_max_pool1d(x: jax.Array, t_out: int) -> jax.Array:
    """Adaptive max pool over the T axis of (B, T, C).

    Matches torch.nn.AdaptiveMaxPool1d(t_out) on (B, C, T)
    (ref: model/modules.py:64).
    """
    t_in = x.shape[1]
    if t_in == t_out:
        return x
    idx, mask = _adaptive_pool_plan(t_in, t_out)
    if np.all(mask) and idx.shape[1] * t_out == t_in:
        # Uniform bins (e.g. 100 -> 50): plain reshape-max, cheapest form.
        k = idx.shape[1]
        return jnp.max(x.reshape(x.shape[0], t_out, k, x.shape[2]), axis=2)
    g = x[:, jnp.asarray(idx), :]  # (B, t_out, kmax, C)
    neg = jnp.asarray(-jnp.inf, dtype=x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    g = jnp.where(jnp.asarray(mask)[None, :, :, None], g, neg)
    return jnp.max(g, axis=2)


@functools.lru_cache(maxsize=None)
def _upsample_matrix_np(t_in: int, t_out: int) -> np.ndarray:
    w = np.zeros((t_out, t_in), np.float32)
    if t_in == 1:
        w[:, 0] = 1.0
        return w
    if t_out == 1:
        w[0, 0] = 1.0
        return w
    pos = np.arange(t_out) * (t_in - 1) / (t_out - 1)  # align_corners=True
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, t_in - 1)
    frac = (pos - lo).astype(np.float32)
    w[np.arange(t_out), lo] += 1.0 - frac
    w[np.arange(t_out), hi] += frac
    return w


def linear_upsample_matrix(t_in: int, t_out: int) -> np.ndarray:
    """(T_out, T_in) matrix reproducing nn.Upsample(linear, align_corners=True)."""
    return _upsample_matrix_np(t_in, t_out)


def linear_upsample(x: jax.Array, t_out: int) -> jax.Array:
    """Linear align-corners resize of (B, T, C) to (B, t_out, C) via matmul.

    Exact match of the reference decoder upsample (ref: model/modules.py:236).
    Runs as a tiny GEMM on the MXU instead of a gather+lerp.
    """
    w = jnp.asarray(linear_upsample_matrix(x.shape[1], t_out), dtype=x.dtype)
    # 'highest' keeps the interpolation exact in fp32 (and on TPU avoids the
    # 3-pass bf16 emulation being lossy for these tiny, latency-bound GEMMs).
    return jnp.einsum("oi,bic->boc", w, x, precision=jax.lax.Precision.HIGHEST)


def lshift_zero(x: jax.Array, axis: int = 1) -> jax.Array:
    """Shift left by one along `axis` with zero fill (ref: model/impl/gsm.py:83-84)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, 1)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(1, None)
    return jnp.pad(x[tuple(sl)], pad)


def rshift_zero(x: jax.Array, axis: int = 1) -> jax.Array:
    """Shift right by one along `axis` with zero fill (ref: model/impl/gsm.py:86-87)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(None, -1)
    return jnp.pad(x[tuple(sl)], pad)
