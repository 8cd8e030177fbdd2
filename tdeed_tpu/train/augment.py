"""Device-side preprocessing & augmentation, fully inside jit.

The reference runs torchvision transforms in a Python loop over clips on GPU
(ref: model/model.py:77-103,151-167) — one transform draw per clip, one
RandomCrop per batch. Here the same semantics are pure jax functions: gated
ops are always computed and selected with `where` (branchless, batch-uniform,
shape-static), which XLA fuses into the surrounding elementwise pipeline; the
cost is negligible next to the backbone and removes all host round-trips.

Pipeline parity (train): /255 -> RandomCrop shared across the batch ->
per-clip [hue p.25, saturation p.25, brightness p.25, contrast p.25,
gaussian-blur(5) p.25, hflip p.5] -> ImageNet standardize.
Eval: /255 -> CenterCrop -> (optional forced hflip TTA) -> standardize.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


def standardize(x: jax.Array) -> jax.Array:
    """ImageNet mean/std (ref: model/model.py:87-89)."""
    return (x - IMAGENET_MEAN.astype(x.dtype)) / IMAGENET_STD.astype(x.dtype)


def center_crop(x: jax.Array, crop: Optional[int]) -> jax.Array:
    if crop is None:
        return x
    h, w = x.shape[-3], x.shape[-2]
    i, j = (h - crop) // 2, (w - crop) // 2
    return x[..., i : i + crop, j : j + crop, :]


def random_crop_batch(x: jax.Array, crop: Optional[int], key: jax.Array) -> jax.Array:
    """One crop offset shared by the whole batch (ref: model/model.py:110-116)."""
    if crop is None:
        return x
    b, t, h, w, c = x.shape
    ki, kj = jax.random.split(key)
    i = jax.random.randint(ki, (), 0, h - crop + 1)
    j = jax.random.randint(kj, (), 0, w - crop + 1)
    return jax.lax.dynamic_slice(x, (0, 0, i, j, 0), (b, t, crop, crop, c))


# --- torchvision-compatible photometric ops (float images in [0, 1]) -------

def _rgb_to_gray(x: jax.Array) -> jax.Array:
    """ITU-R 601-2 luma, torchvision rgb_to_grayscale weights."""
    w = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    return jnp.sum(x * w, axis=-1, keepdims=True)


def adjust_brightness(x, factor):
    return jnp.clip(x * factor, 0.0, 1.0)


def adjust_contrast(x, factor):
    # torchvision: blend with the per-frame mean of the grayscale image.
    mean = jnp.mean(_rgb_to_gray(x), axis=(-3, -2), keepdims=True)
    return jnp.clip(factor * x + (1.0 - factor) * mean, 0.0, 1.0)


def adjust_saturation(x, factor):
    gray = _rgb_to_gray(x)
    return jnp.clip(factor * x + (1.0 - factor) * gray, 0.0, 1.0)


def _rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.where(maxc > 0, maxc, 1.0), 0.0)
    safe = jnp.where(delta > 0, delta, 1.0)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, h, 0.0)
    h = (h / 6.0) % 1.0
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(x, hue_shift):
    h, s, v = _rgb_to_hsv(x)
    h = (h + hue_shift) % 1.0
    return _hsv_to_rgb(h, s, v)


def gaussian_blur5(x, sigma):
    """Separable 5-tap gaussian blur, reflect padding (torchvision
    GaussianBlur(5) with traced sigma)."""
    offs = jnp.arange(-2, 3, dtype=x.dtype)
    k = jnp.exp(-0.5 * jnp.square(offs / sigma))
    k = k / jnp.sum(k)
    # x: (T, H, W, C). Blur H then W with reflect padding.
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)), mode="reflect")
    x = sum(xp[:, i : i + x.shape[1]] * k[i] for i in range(5))
    xp = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (0, 0)), mode="reflect")
    x = sum(xp[:, :, i : i + x.shape[2]] * k[i] for i in range(5))
    return x


def _photometric_one_clip(x: jax.Array, key: jax.Array) -> jax.Array:
    """Apply the reference per-clip augmentation chain to one clip (T,H,W,3).

    Order and probabilities per ref: model/model.py:77-84.
    """
    keys = jax.random.split(key, 12)
    gate = lambda i: jax.random.uniform(keys[i]) < 0.25

    hue = jax.random.uniform(keys[6], minval=-0.2, maxval=0.2)
    x = jnp.where(gate(0), adjust_hue(x, hue), x)

    sat = jax.random.uniform(keys[7], minval=0.7, maxval=1.2)
    x = jnp.where(gate(1), adjust_saturation(x, sat), x)

    bri = jax.random.uniform(keys[8], minval=0.7, maxval=1.2)
    x = jnp.where(gate(2), adjust_brightness(x, bri), x)

    con = jax.random.uniform(keys[9], minval=0.7, maxval=1.2)
    x = jnp.where(gate(3), adjust_contrast(x, con), x)

    sigma = jax.random.uniform(keys[10], minval=0.1, maxval=2.0)
    x = jnp.where(gate(4), gaussian_blur5(x, sigma), x)

    flip = jax.random.uniform(keys[11]) < 0.5
    x = jnp.where(flip, x[:, :, ::-1, :], x)
    return x


def train_preprocess(
    frames: jax.Array, key: jax.Array, crop_dim: Optional[int]
) -> jax.Array:
    """frames: (B, T, H, W, 3) float (0..255, possibly mixup-blended).
    Returns standardized float32 (B, T, crop, crop, 3)."""
    x = frames.astype(jnp.float32) / 255.0
    kc, ka = jax.random.split(key)
    x = random_crop_batch(x, crop_dim, kc)
    clip_keys = jax.random.split(ka, x.shape[0])
    x = jax.vmap(_photometric_one_clip)(x, clip_keys)
    return standardize(x)


def eval_preprocess(
    frames: jax.Array, crop_dim: Optional[int], hflip: bool = False
) -> jax.Array:
    """(B, T, H, W, 3) uint8/float -> standardized float32, center-cropped,
    optionally flipped (TTA pass; ref: model/model.py:120-129)."""
    x = frames.astype(jnp.float32) / 255.0
    x = center_crop(x, crop_dim)
    if hflip:
        x = x[:, :, :, ::-1, :]
    return standardize(x)


def mixup_labels(
    labels: jax.Array,
    labels2: jax.Array,
    lam: jax.Array,  # (B,)
    num_classes_bg: int,
    label_d: Optional[jax.Array] = None,
    label_d2: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Soft label distributions + mixed displacement targets for given
    per-sample mixup weights (ref: model/model.py:236-254)."""
    lam_t = lam.astype(jnp.float32)[:, None]  # (B, 1)
    soft = jax.nn.one_hot(labels, num_classes_bg) * lam_t[..., None] + jax.nn.one_hot(
        labels2, num_classes_bg
    ) * (1.0 - lam_t[..., None])
    mixed_d = None
    if label_d is not None:
        mixed_d = lam_t * label_d.astype(jnp.float32) + (1.0 - lam_t) * label_d2.astype(
            jnp.float32
        )
    return soft, mixed_d


def mixup_batch(
    frames: jax.Array,
    labels: jax.Array,
    frames2: jax.Array,
    labels2: jax.Array,
    key: jax.Array,
    num_classes_bg: int,
    label_d: Optional[jax.Array] = None,
    label_d2: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """Batch mixup with per-sample Beta(0.2, 0.2) weights
    (ref: model/model.py:228-254). Returns (mixed_frames, soft_labels
    (B,T,C), mixed_label_d)."""
    b, t = labels.shape
    lam = sample_mixup_lam(key, b)
    mixed = lam[:, None, None, None, None] * frames.astype(jnp.float32) + (
        1.0 - lam[:, None, None, None, None]
    ) * frames2.astype(jnp.float32)
    # One bf16 rounding of the blended pixels — the SAME rounding the
    # augment kernel's bf16 staging already applied downstream (kernels/
    # augment.py); taking it here keeps every later pass (flip, transpose)
    # at half the HBM traffic. Final values are unchanged vs round 2.
    mixed = mixed.astype(jnp.bfloat16)
    soft, mixed_d = mixup_labels(
        labels, labels2, lam, num_classes_bg, label_d, label_d2
    )
    return mixed, soft, mixed_d


def sample_mixup_lam(key: jax.Array, batch: int) -> jax.Array:
    """Per-sample Beta(0.2, 0.2) mixup weights (ref: model/model.py:237)."""
    return jax.random.beta(key, 0.2, 0.2, (batch,)).astype(jnp.float32)
