"""Displacement-head decode as vectorized device ops.

The reference decodes the displacement head with a Python double loop over
(batch, time) doing clamp + element-wise max scatter
(ref: model/modules.py:406-414). Here it is a single XLA scatter-max, which
vmaps/shards cleanly and stays on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def decode_displacement(probs: jax.Array, displ: jax.Array) -> jax.Array:
    """Max-aggregate per-frame class scores at their displaced positions.

    probs: (B, T, C) softmaxed scores; displ: (B, T) predicted signed offsets.
    For each t, target = clip(t - round(displ[t]), 0, T-1) and
    out[target] = max(out[target], probs[t]). Positions never targeted stay 0
    — that zero-support property is load-bearing for eval aggregation
    (ref: util/eval.py:317).

    Matches process_prediction (ref: model/modules.py:406-414); jnp.round is
    round-half-to-even like torch.round.
    """
    b, t, _ = probs.shape
    tgt = jnp.clip(
        jnp.arange(t)[None, :] - jnp.round(displ).astype(jnp.int32), 0, t - 1
    )  # (B, T)
    out = jnp.zeros_like(probs)
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, t))
    return out.at[bidx, tgt].max(probs)


def decode_displacement_double_head(
    probs_head1: jax.Array, displ: jax.Array
) -> jax.Array:
    """Double-head variant: decode only head-1 scores (ref: model/modules.py:416-426)."""
    return decode_displacement(probs_head1, displ)


def soft_labels_from_displacement(
    label: np.ndarray, label_d: np.ndarray, num_classes: int
) -> np.ndarray:
    """Rasterize dilated labels back to exact event frames as one-hots.

    Host-side equivalent of process_labels (ref: model/modules.py:428-438),
    used to build SoccerNet val-mAP targets. label: (B, T) int class ids
    (dilated), label_d: (B, T) signed displacement of each dilated position to
    the true event frame. Returns (B, T, num_classes) with background=1 rows.
    """
    b, t = label.shape
    out = np.zeros((b, t, num_classes), np.float32)
    out[:, :, 0] = 1.0
    bs, ts = np.nonzero(label)
    for i, j in zip(bs, ts):
        tgt = j - int(label_d[i, j])
        if 0 <= tgt < t:
            out[i, tgt, label[i, j]] = 1.0
            out[i, tgt, 0] = 0.0
    return out
