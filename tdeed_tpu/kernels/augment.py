"""Fused photometric-augmentation Pallas kernel.

The XLA path (tdeed_tpu/train/augment.py) computes every augmentation for
every clip and selects with `where` — branchless but ~10 full passes over a
(B, T, H, W, 3) fp32 tensor (hsv round-trip, 4 photometric ops, separable
blur, standardize). Measured at ~40 ms of a 151 ms train step (26%).

This kernel performs the whole chain in ONE pass: each grid program loads
one uint8 frame into VMEM, applies /255, gated hue/saturation/brightness/
contrast, gated 5-tap separable Gaussian blur (reflect padding), and
ImageNet standardization, then writes bf16 — one HBM read (u8) + one write
(bf16) total. Augmentation is input preprocessing, so no VJP is needed.

Layout: planar (3, H, W) per frame — W rides the 128-lane dimension (224 →
2 lanes tiles), channels are 3 sublane planes so channel-wise math (luma
dot, per-channel standardize) is plain sublane indexing. The (B, T, H, W, 3)
<-> planar transposes around the kernel are cheap u8/bf16 passes.

Per-clip parameters (gates, factors, blur taps, seeded exactly like the XLA
path's distributions — ref: model/model.py:77-84) arrive as a packed (B, 16)
fp32 array read from SMEM.

Parity: hue/sat/brightness/contrast math identical to the XLA path;
clamping to [0,1] after each op; blur uses true reflect padding built from
static edge-row concats.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# packed param layout (per clip):
#  0: hue gate        1: hue shift
#  2: sat gate        3: sat factor
#  4: bright gate     5: bright factor
#  6: contrast gate   7: contrast factor
#  8: blur gate       9..13: blur taps k0..k4
# 14: hflip gate (lane reversal in VMEM — measured cheaper than the
#     standalone XLA reverse+select pass it replaces)  15: pad
N_PARAMS = 16


def sample_params(key: jax.Array, batch: int) -> jax.Array:
    """Draw per-clip augmentation parameters, same distributions as the XLA
    path (gates p=.25; hue U(-.2,.2); sat/bri/con U(.7,1.2); blur sigma
    U(.1,2) -> normalized 5-tap kernel). Returns (B, 16) fp32."""
    ks = jax.random.split(key, 10)
    u = lambda i, lo, hi: jax.random.uniform(
        ks[i], (batch,), minval=lo, maxval=hi
    )
    gate = lambda i: (jax.random.uniform(ks[i], (batch,)) < 0.25).astype(
        jnp.float32
    )
    sigma = u(9, 0.1, 2.0)
    offs = jnp.arange(-2, 3, dtype=jnp.float32)
    taps = jnp.exp(-0.5 * jnp.square(offs[None, :] / sigma[:, None]))
    taps = taps / jnp.sum(taps, axis=1, keepdims=True)  # (B, 5)
    params = jnp.stack(
        [
            gate(0), u(5, -0.2, 0.2),
            gate(1), u(6, 0.7, 1.2),
            gate(2), u(7, 0.7, 1.2),
            gate(3), u(8, 0.7, 1.2),
            gate(4),
        ],
        axis=1,
    )
    pad = jnp.zeros((batch, 2), jnp.float32)
    return jnp.concatenate([params, taps, pad], axis=1)  # (B, 16)


def _shift_dim(a: jax.Array, off: int, axis: int) -> jax.Array:
    """y[i] = a[i + off] along axis, zero-filled (roll + iota mask; Mosaic
    lowers rolls natively, concats on odd offsets it cannot tile)."""
    if off == 0:
        return a
    rolled = pltpu.roll(a, (-off) % a.shape[axis], axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)
    n = a.shape[axis]
    mask = idx < n - off if off > 0 else idx >= -off
    return jnp.where(mask, rolled, jnp.zeros_like(a))


def _row_mask(shape, row: int, axis: int):
    return jax.lax.broadcasted_iota(jnp.int32, shape, axis) == row


def _blur1d_reflect(x: jax.Array, taps, axis: int) -> jax.Array:
    """5-tap blur along axis with width-2 reflect padding, concat-free.

    Base pass uses zero-padded shifts; the four border rows then get the
    reflect contributions added explicitly (reflect pad of [x0..] is
    [x2, x1 | x0 ... | x_{n-2}, x_{n-3}])."""
    n = x.shape[axis]
    y = sum(taps[j] * _shift_dim(x, j - 2, axis) for j in range(5))
    sh = lambda o: _shift_dim(x, o, axis)
    m = lambda r: _row_mask(x.shape, r, axis)
    zero = jnp.zeros_like(x)
    y = y + jnp.where(m(0), taps[0] * sh(2) + taps[1] * sh(1), zero)
    y = y + jnp.where(m(1), taps[0] * x, zero)
    y = y + jnp.where(m(n - 1), taps[4] * sh(-2) + taps[3] * sh(-1), zero)
    y = y + jnp.where(m(n - 2), taps[4] * x, zero)
    return y


def _hue_shift(r, g, b, shift):
    """rgb->hsv, shift h, hsv->rgb (torchvision adjust_hue math)."""
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    delta = maxc - minc
    safe = jnp.where(delta > 0, delta, 1.0)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, h, 0.0)
    h = (h / 6.0) % 1.0
    s = jnp.where(maxc > 0, delta / jnp.where(maxc > 0, maxc, 1.0), 0.0)
    v = maxc

    h = (h + shift) % 1.0
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    pp = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i6 = i.astype(jnp.int32) % 6

    def sel(c0, c1, c2, c3, c4, c5):
        # nested where instead of jnp.select: select_n lowers through an
        # argmax helper Mosaic only implements for f32
        out = c5
        for idx, cv in ((4, c4), (3, c3), (2, c2), (1, c1), (0, c0)):
            out = jnp.where(i6 == idx, cv, out)
        return out

    return (sel(v, q, pp, pp, t, v),
            sel(t, v, v, q, pp, pp),
            sel(pp, pp, t, v, v, q))


def _photometric_chain(x, p, out_dtype, gated: bool = False):
    """The shared post-blend chain: x (3, H, W) fp32 in [0,1], p(i) scalar
    accessor. Returns (3, H, W) in out_dtype.

    gated: skip the hue round-trip and the blur with lax.cond on the
    per-clip gate scalars instead of computing them for every frame and
    selecting. Gates fire at p=.25, so the expected VPU work drops by the
    cost of ~0.75x(hue+blur); values are bit-identical either way (the
    taken branch computes the same expressions). ON by default since the
    round-4 device A/B: -5.6 ms/step on the flagship envelope with a
    bit-identical 20-step loss (Mosaic's scf.if lowering of lax.cond was
    the risk, not the math; it measured clean)."""
    r, g, b = x[0], x[1], x[2]

    # --- hue (gated): rgb->hsv, shift h, hsv->rgb ----------------------
    use_hue = p(0) > 0.5
    if gated:
        r, g, b = jax.lax.cond(
            use_hue,
            lambda rgb: _hue_shift(*rgb, p(1)),
            lambda rgb: rgb,
            (r, g, b),
        )
    else:
        hr, hg, hb = _hue_shift(r, g, b, p(1))
        r = jnp.where(use_hue, hr, r)
        g = jnp.where(use_hue, hg, g)
        b = jnp.where(use_hue, hb, b)

    # --- saturation / brightness / contrast (gated, in XLA-path order) --
    luma_w = (0.299, 0.587, 0.114)

    def gray():
        return luma_w[0] * r + luma_w[1] * g + luma_w[2] * b

    sat = jnp.where(p(2) > 0.5, p(3), 1.0)
    gy = gray()
    r = jnp.clip(sat * r + (1.0 - sat) * gy, 0.0, 1.0)
    g = jnp.clip(sat * g + (1.0 - sat) * gy, 0.0, 1.0)
    b = jnp.clip(sat * b + (1.0 - sat) * gy, 0.0, 1.0)

    bri = jnp.where(p(4) > 0.5, p(5), 1.0)
    r = jnp.clip(r * bri, 0.0, 1.0)
    g = jnp.clip(g * bri, 0.0, 1.0)
    b = jnp.clip(b * bri, 0.0, 1.0)

    con = jnp.where(p(6) > 0.5, p(7), 1.0)
    mean_gray = jnp.mean(gray())
    r = jnp.clip(con * r + (1.0 - con) * mean_gray, 0.0, 1.0)
    g = jnp.clip(con * g + (1.0 - con) * mean_gray, 0.0, 1.0)
    b = jnp.clip(con * b + (1.0 - con) * mean_gray, 0.0, 1.0)

    # --- gated separable 5-tap blur with reflect padding ----------------
    use_blur = p(8) > 0.5
    taps = [p(9), p(10), p(11), p(12), p(13)]

    def blur(c):
        return _blur1d_reflect(_blur1d_reflect(c, taps, 0), taps, 1)

    if gated:
        r, g, b = jax.lax.cond(
            use_blur,
            lambda rgb: (blur(rgb[0]), blur(rgb[1]), blur(rgb[2])),
            lambda rgb: rgb,
            (r, g, b),
        )
    else:
        r = jnp.where(use_blur, blur(r), r)
        g = jnp.where(use_blur, blur(g), g)
        b = jnp.where(use_blur, blur(b), b)

    # --- ImageNet standardize ------------------------------------------
    mean = (0.485, 0.456, 0.406)  # == augment.IMAGENET_MEAN
    std = (0.229, 0.224, 0.225)
    out = jnp.stack(
        [(r - mean[0]) / std[0], (g - mean[1]) / std[1], (b - mean[2]) / std[2]],
        axis=0,
    )
    return out.astype(out_dtype)


def _to_f32(ref):
    """Load a (1, 1, 3, H, W) block as fp32 0..255. Direct u8->f32 casts are
    unsupported by Mosaic, but u8 -> i32 -> f32 lowers fine — so the kernels
    read uint8 straight from HBM (half the input traffic of the round-1
    bf16 staging)."""
    x = ref[0, 0]
    if jnp.issubdtype(x.dtype, jnp.integer):
        return x.astype(jnp.int32).astype(jnp.float32)
    return x.astype(jnp.float32)


def _flip_matmul(x):
    """Reverse the lane (W) axis of (3, H, W) via the W x W exchange matrix.
    Mosaic has no `rev` lowering, so the reversal is a multiply on the idle
    MXU — a permutation matrix, hence bit-exact in fp32."""
    c, h, w = x.shape
    rowi = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    # (select over i1 vectors fails to legalize in Mosaic: cast first)
    ex = (rowi + coli == w - 1).astype(jnp.float32)
    return jnp.dot(
        x.reshape(c * h, w), ex, preferred_element_type=jnp.float32
    ).reshape(c, h, w)


def _kernel(p_ref, x_ref, out_ref, *, gated: bool = False,
            flip_mode: str = "matmul"):
    # x_ref: (1, 1, 3, H, W) uint8 (or float 0..255);
    # p_ref: (B, N_PARAMS) SMEM fp32 (full array — SMEM blocks must cover
    # whole dims), row selected by program id.
    x = _to_f32(x_ref) / 255.0  # (3, H, W)
    clip_idx = pl.program_id(0)

    def p(i):
        return p_ref[clip_idx, i]

    # Gated horizontal flip, VMEM-local. The photometric chain commutes
    # with flipping (per-pixel ops; frame-mean contrast and the symmetric
    # reflect-padded blur are mirror-invariant), so flipping the INPUT here
    # equals the reference's flip at the end of the chain
    # (ref: model/model.py:84). Modes (bit-identical outputs, different
    # schedules — see train_preprocess_pallas):
    #   matmul: always multiply by a select-built permutation (exchange or
    #           identity). ~2*W*W*3*H FLOP/frame regardless of the gate —
    #           negligible at W=224, ~1.7 GFLOP/frame at SNB's W=796.
    #   cond:   lax.cond on the flip gate; the exchange matmul only runs
    #           for flipped clips (p=.5), the rest are a no-op.
    #   xla:    flip happens OUTSIDE the kernel (u8 reverse+select in XLA,
    #           one byte-wide pass); param 14 arrives 0 here.
    if flip_mode == "matmul":
        c, h, w = x.shape
        rowi = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
        coli = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
        perm = jnp.where(
            p(14) > 0.5,
            (rowi + coli == w - 1).astype(jnp.float32),
            (rowi == coli).astype(jnp.float32),
        )
        x = jnp.dot(
            x.reshape(c * h, w), perm, preferred_element_type=jnp.float32
        ).reshape(c, h, w)
    elif flip_mode == "cond":
        x = jax.lax.cond(p(14) > 0.5, _flip_matmul, lambda v: v, x)
    else:
        assert flip_mode == "xla", flip_mode

    out_ref[0, 0] = _photometric_chain(x, p, out_ref.dtype, gated=gated)


@functools.partial(jax.jit, static_argnames=("interpret", "gated", "flip_mode"))
def photometric_planar(
    frames_planar: jax.Array,  # (B, T, 3, H, W) uint8/float 0..255 (cropped, flipped)
    params: jax.Array,         # (B, N_PARAMS) fp32 from sample_params
    *,
    interpret: bool = False,
    gated: bool = False,
    flip_mode: str = "matmul",
) -> jax.Array:
    """Fused /255 + photometric + standardize. Returns (B, T, 3, H, W) bf16."""
    bsz, t, c, h, w = frames_planar.shape
    assert c == 3
    # Scoped-VMEM budget scales with the frame: the chain keeps ~20 fp32
    # (H, W) temporaries live (hue round-trip + clips), ~90 B/pixel
    # measured at 448x796 (31.4 MB — past Mosaic's 16 MB default, which is
    # how the SNB geometry surfaced this as a compile OOM while 224/256
    # crops fit). 160 B/px headroom, floored at the default, capped under
    # the v5e's 128 MB physical VMEM.
    vmem_limit = max(16 * 2**20, min(160 * h * w, 110 * 2**20))
    return pl.pallas_call(
        functools.partial(_kernel, gated=gated, flip_mode=flip_mode),
        grid=(bsz, t),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        in_specs=[
            pl.BlockSpec(
                (bsz, N_PARAMS), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1, 3, h, w), lambda i, j: (i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 3, h, w), lambda i, j: (i, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, t, 3, h, w), jnp.bfloat16),
        interpret=interpret,
    )(params, frames_planar)


def train_preprocess_pallas(
    frames: jax.Array, key: jax.Array, crop_dim, *, interpret: bool = False
) -> jax.Array:
    """Drop-in replacement for augment.train_preprocess using the fused
    kernel. frames: (B, T, H, W, 3) float-or-uint8 0..255. Returns
    standardized bf16 (B, T, crop, crop, 3). The lax.cond-gated chain is
    the default up to 2^18 px/frame (device A/B at 224²: -5.6 ms/step,
    bit-identical loss) and the compute-always+select chain beyond it
    (device A/B at SNB's 448x796: gating is +5.3 ms — the cond branches
    break fusion for more than the skipped hue/blur saves at 7x the
    pixels; loss still bit-identical). Env PHOTO_GATED=0/1 overrides
    either way. Env FLIP_MODE
    in {matmul, cond, xla} selects the hflip schedule (see _kernel; all
    three are bit-identical — 'matmul' is the measured flagship default,
    'cond'/'xla' avoid the always-on W x W exchange matmul that grows
    quadratically toward SNB's W=796). Both env knobs are read at trace
    time — build a fresh jit per setting, as the A/B tools do."""
    from tdeed_tpu.train.augment import random_crop_batch

    bsz = frames.shape[0]
    kc, kf, kp = jax.random.split(key, 3)
    flip_mode = os.environ.get("FLIP_MODE", "matmul")

    x = random_crop_batch(frames, crop_dim, kc)
    flip = (jax.random.uniform(kf, (bsz,)) < 0.5).astype(jnp.float32)
    if flip_mode == "xla":
        # One reverse+select pass at the input width (u8: byte-wide —
        # 4x less traffic than the old post-chain fp32 flip this kernel
        # originally replaced).
        x = jnp.where(
            (flip > 0.5)[:, None, None, None, None], x[:, :, :, ::-1, :], x
        )
    planar = jnp.transpose(x, (0, 1, 4, 2, 3))
    if not jnp.issubdtype(planar.dtype, jnp.integer):
        # mixup blends are fractional: stage as bf16 (integers pass as u8 —
        # Mosaic reads them via the u8->i32->f32 chain, half the traffic)
        planar = planar.astype(jnp.bfloat16)
    params = sample_params(kp, bsz)
    # per-clip horizontal flip rides param slot 14 into the kernel (the
    # old standalone XLA reverse+select cost ~2.9 ms/step, trace-measured)
    if flip_mode != "xla":
        params = params.at[:, 14].set(flip)
    gated_env = os.environ.get("PHOTO_GATED")
    if gated_env is None:  # geometry-aware default (measured crossover)
        gated = planar.shape[3] * planar.shape[4] <= 2**18
    else:
        gated = gated_env == "1"
    out = photometric_planar(
        planar, params, interpret=interpret, gated=gated,
        flip_mode=flip_mode,
    )
    return jnp.transpose(out, (0, 1, 3, 4, 2))  # (B, T, H, W, 3) bf16
