"""Losses: foreground-weighted cross-entropy (hard and soft targets),
displacement MSE, and double-head routing.

torch.nn.functional.cross_entropy semantics are reproduced exactly:
  * hard (class-index) targets with class weights -> weighted mean:
        sum_i w[y_i] * nll_i / sum_i w[y_i]
  * soft (probability) targets with class weights -> plain mean over items of
        -sum_c w_c * t_c * log p_c
(ref: model/model.py:208-211,276-319; fg class weight 5 at model.py:194)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def class_weights(num_classes_bg: int, fg_weight: float = 5.0) -> jnp.ndarray:
    """[1, fg, fg, ...] (ref: model/model.py:208-211)."""
    return jnp.concatenate(
        [jnp.ones((1,)), jnp.full((num_classes_bg - 1,), fg_weight)]
    ).astype(jnp.float32)


def weighted_ce_hard(
    logits: jax.Array, labels: jax.Array, weights: jax.Array
) -> jax.Array:
    """logits (N, C) fp32, labels (N,) int, weights (C,). torch weighted mean."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    w = weights[labels]
    return jnp.sum(w * nll) / jnp.sum(w)


def weighted_ce_soft(
    logits: jax.Array, target: jax.Array, weights: jax.Array
) -> jax.Array:
    """logits (N, C), target (N, C) probabilities. torch: plain mean over N."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_item = -jnp.sum(weights[None, :] * target * logp, axis=-1)
    return jnp.mean(per_item)


def displacement_mse(pred_d: jax.Array, label_d: jax.Array) -> jax.Array:
    """Mean squared error over all (B, T) positions (ref: model/model.py:316-319)."""
    return jnp.mean(jnp.square(pred_d.astype(jnp.float32) - label_d.astype(jnp.float32)))


def double_head_ce(
    logits: jax.Array,
    target: jax.Array,
    dataset_id: jax.Array,
    num_classes1_bg: int,
    weights1: jax.Array,
    weights2: jax.Array,
    soft: bool,
) -> jax.Array:
    """Per-sample routing of the two concatenated heads
    (ref: model/model.py:278-306).

    logits: (B, T, C1+C2); target: (B, T, C1+C2) soft dist (already in
    two-head label space) or (B, T) hard ids offset for head 2; dataset_id:
    (B,) in {1, 2}. Each sample contributes its head's CE / B.
    """
    b = logits.shape[0]
    c1 = num_classes1_bg

    def one_sample(lg, tg, ds):
        lg1, lg2 = lg[:, :c1], lg[:, c1:]
        if soft:
            tg1, tg2 = tg[:, :c1], tg[:, c1:]
            l1 = _soft_ce_one(lg1, tg1, weights1)
            l2 = _soft_ce_one(lg2, tg2, weights2)
        else:
            l1 = _hard_ce_one(lg1, tg, weights1)
            l2 = _hard_ce_one(lg2, tg - c1, weights2)
        return jnp.where(ds == 1, l1, l2)

    losses = jax.vmap(one_sample)(logits, target, dataset_id)
    return jnp.sum(losses) / b


def _hard_ce_one(logits, labels, weights):
    # labels may sit in the OTHER head's range for this sample (masked out
    # by the where in double_head_ce): clip keeps the gather in-bounds,
    # then defer to the single public implementation of the CE math.
    labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    return weighted_ce_hard(logits, labels, weights)


def _soft_ce_one(logits, target, weights):
    return weighted_ce_soft(logits, target, weights)
