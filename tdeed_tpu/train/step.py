"""Jitted train / val / predict steps.

One XLA program per step: mixup, crop, photometric augmentation, backbone,
temporal stack, losses, backward, and the optimizer update all fuse into a
single launch (the reference splits these across Python, torchvision and the
autograd engine — ref: model/model.py:193-332). Gradient accumulation is a
lax.scan over microbatches with BN-stat threading, reproducing the
reference's per-microbatch BN updates + mean-gradient semantics
(ref: model/modules.py:390-404).

Under a data mesh, batches arrive with the leading axis sharded; since the
math here is global, GSPMD inserts the gradient/batch-stat all-reduces over
ICI automatically — single-device and N-device execution compute the same
numbers (tested on an 8-way fake mesh).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from tdeed_tpu.ops.displacement import decode_displacement
from tdeed_tpu.train import augment
from tdeed_tpu.train.losses import (
    class_weights,
    displacement_mse,
    double_head_ce,
    weighted_ce_hard,
    weighted_ce_soft,
)
from tdeed_tpu.train.state import TrainState


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    *,
    crop_dim: Optional[int],
    num_classes_bg: int,
    mixup: bool,
    radi_displacement: int,
    acc_grad_iter: int = 1,
    fg_weight: float = 5.0,
    two_heads: Optional[Tuple[int, int]] = None,
    pretrain_classes_bg: int = 0,
    pallas_augment: Optional[bool] = None,
) -> Callable:
    """Build the jittable train step.

    Batch layout: dict with 'frame' (B,T,H,W,3) uint8, 'label' (B,T) int32,
    plus optional 'labelD', 'frame2'/'label2'/'labelD2' (mixup) and 'dataset'
    (B,) in {1,2} (joint training). B must be divisible by acc_grad_iter.

    pallas_augment: use the fused photometric Pallas kernel
    (kernels/augment.py) instead of the XLA chain; None = auto (TPU only).
    With mixup=True the XLA blend runs before the kernel (XLA fuses
    blend+flip+transpose into one pass; a kernel-side fused blend was
    measured WORSE — it doubles the kernel's input reads, see
    docs/DESIGN.md). The blend is bf16-staged into the kernel, a documented
    ~1/256 relative rounding of blended pixels.
    """
    if pallas_augment is None:
        pallas_augment = jax.default_backend() == "tpu"

    def preprocess(frames, key):
        # crop_dim=None: loss_fn already applied the shared RandomCrop
        if pallas_augment:
            from tdeed_tpu.kernels.augment import train_preprocess_pallas

            return train_preprocess_pallas(
                frames, key, None,
                interpret=jax.default_backend() != "tpu",
            )
        return augment.train_preprocess(frames, key, None)

    weights = class_weights(num_classes_bg, fg_weight)
    weights2 = (
        class_weights(pretrain_classes_bg, fg_weight) if two_heads else None
    )
    total_bg = num_classes_bg + (pretrain_classes_bg if two_heads else 0)

    def loss_fn(params, batch_stats, mb: Dict[str, jax.Array], key: jax.Array):
        k_mix, k_crop, k_aug, k_drop = jax.random.split(key, 4)

        label = mb["label"].astype(jnp.int32)
        label_d = mb.get("labelD")
        dataset_id = mb.get("dataset")

        # The RandomCrop is one offset shared by the whole batch
        # (ref: model/model.py:110-116) and the mixup blend is pointwise, so
        # crop-then-blend == blend-then-crop exactly — cropping first avoids
        # blending at full pre-crop resolution.
        mb = dict(mb)
        mb["frame"] = augment.random_crop_batch(mb["frame"], crop_dim, k_crop)
        if "frame2" in mb:
            mb["frame2"] = augment.random_crop_batch(
                mb["frame2"], crop_dim, k_crop
            )

        if two_heads is not None and dataset_id is not None:
            # Head-2 labels shift past head-1's classes (ref: model/model.py:371-376)
            label = jnp.where(
                dataset_id[:, None] == 2, label + num_classes_bg, label
            )

        if mixup:
            label2 = mb["label2"].astype(jnp.int32)
            if two_heads is not None and dataset_id is not None:
                label2 = jnp.where(
                    dataset_id[:, None] == 2, label2 + num_classes_bg, label2
                )
            frames, soft, label_d = augment.mixup_batch(
                mb["frame"],
                label,
                mb["frame2"],
                label2,
                k_mix,
                total_bg,
                mb.get("labelD"),
                mb.get("labelD2"),
            )
            x = preprocess(frames, k_aug)
        else:
            soft = None
            x = preprocess(mb["frame"], k_aug)
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            True,
            mutable=["batch_stats"],
            rngs={"dropout": k_drop},
        )
        logits = out["logits"]
        b, t, c = logits.shape

        if two_heads is not None and dataset_id is not None:
            loss = double_head_ce(
                logits,
                soft if soft is not None else label,
                dataset_id,
                num_classes_bg,
                weights,
                weights2,
                soft=soft is not None,
            )
        elif soft is not None:
            loss = weighted_ce_soft(
                logits.reshape(-1, c), soft.reshape(-1, c), weights
            )
        else:
            loss = weighted_ce_hard(logits.reshape(-1, c), label.reshape(-1), weights)

        if radi_displacement > 0 and label_d is not None:
            loss = loss + displacement_mse(out["displ"], label_d)

        return loss, updates["batch_stats"]

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)

        if acc_grad_iter == 1:
            (loss, new_stats), grads = grad_fn(
                state.params, state.batch_stats, batch, rng
            )
        else:
            # (B, ...) -> (acc, B/acc, ...): scan microbatches, per-micro BN
            # updates, mean gradients (ref: model/modules.py:390-404).
            micro = jax.tree.map(
                lambda x: x.reshape(acc_grad_iter, -1, *x.shape[1:]), batch
            )
            keys = jax.random.split(rng, acc_grad_iter)

            def body(carry, xs):
                stats, gacc, lacc = carry
                mb, key = xs
                (l, new_stats), g = grad_fn(state.params, stats, mb, key)
                gacc = jax.tree.map(jnp.add, gacc, g)
                return (new_stats, gacc, lacc + l), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (new_stats, gsum, lsum), _ = jax.lax.scan(
                body, (state.batch_stats, zeros, 0.0), (micro, keys)
            )
            grads = jax.tree.map(lambda g: g / acc_grad_iter, gsum)
            loss = lsum / acc_grad_iter

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, {"loss": loss}

    return train_step


def make_val_step(
    model,
    *,
    crop_dim: Optional[int],
    num_classes_bg: int,
    radi_displacement: int,
    fg_weight: float = 5.0,
    two_heads: Optional[Tuple[int, int]] = None,
    pretrain_classes_bg: int = 0,
) -> Callable:
    """Validation loss step: eval preprocessing (center crop, no augment),
    running BN stats, no dropout (ref: model/model.py:196-198 + forward
    inference=True path)."""
    weights = class_weights(num_classes_bg, fg_weight)
    weights2 = (
        class_weights(pretrain_classes_bg, fg_weight) if two_heads else None
    )

    def val_step(state: TrainState, batch: Dict[str, jax.Array]):
        label = batch["label"].astype(jnp.int32)
        dataset_id = batch.get("dataset")
        if two_heads is not None and dataset_id is not None:
            label = jnp.where(dataset_id[:, None] == 2, label + num_classes_bg, label)
        x = augment.eval_preprocess(batch["frame"], crop_dim)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, x, False
        )
        logits = out["logits"]
        b, t, c = logits.shape
        if two_heads is not None and dataset_id is not None:
            loss = double_head_ce(
                logits, label, dataset_id, num_classes_bg, weights, weights2, soft=False
            )
        else:
            loss = weighted_ce_hard(logits.reshape(-1, c), label.reshape(-1), weights)
        if radi_displacement > 0 and "labelD" in batch:
            loss = loss + displacement_mse(out["displ"], batch["labelD"])
        aux = {"loss": loss, "logits": logits}
        if radi_displacement > 0:
            aux["displ"] = out["displ"]
        return aux

    return val_step


def make_predict_step(
    model,
    *,
    crop_dim: Optional[int],
    radi_displacement: int,
    two_heads: Optional[Tuple[int, int]] = None,
) -> Callable:
    """Inference step: softmax scores, displacement-decoded when the head
    exists (ref: model/model.py:334-369). hflip selects the TTA pass."""

    def predict(params, batch_stats, frames, hflip: bool = False):
        x = augment.eval_preprocess(frames, crop_dim, hflip=hflip)
        out = model.apply({"params": params, "batch_stats": batch_stats}, x, False)
        logits = out["logits"]
        if two_heads is not None:
            # Double head: decode head 1 only (ref: model/modules.py:416-426)
            probs = jax.nn.softmax(logits[..., : two_heads[0]], axis=-1)
        else:
            probs = jax.nn.softmax(logits, axis=-1)
        if radi_displacement > 0:
            probs = decode_displacement(probs, out["displ"])
        return jnp.argmax(probs, axis=-1), probs

    return predict
