"""LR schedule: torch ChainedScheduler(LinearLR warmup, CosineAnnealingLR).

The reference chains both schedulers stepping every optimizer step
(ref: train_tdeed.py:79-87), which multiplies their factors:
    lr(t) = base * linear(t) * cosine(t)
    linear(t) = 0.01 + 0.99 * min(t, W) / W          (start_factor=0.01)
    cosine(t) = (1 + cos(pi * t / C)) / 2            (T_max = C, eta_min = 0)
with W = warmup_epochs * steps_per_epoch and C = cosine_epochs *
steps_per_epoch. Note the reference quirk: total steps exceed C by W, so the
cosine factor passes its minimum and rises again over the final W steps; we
reproduce it verbatim for parity.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def chained_warmup_cosine(
    base_lr: float, warmup_steps: int, cosine_steps: int
) -> optax.Schedule:
    w = max(1, int(warmup_steps))
    c = max(1, int(cosine_steps))

    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        linear = 0.01 + 0.99 * jnp.minimum(t, w) / w
        cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * t / c))
        return base_lr * linear * cosine

    return schedule


def make_optimizer(
    base_lr: float,
    warmup_steps: int,
    cosine_steps: int,
    weight_decay: float = 0.01,
) -> optax.GradientTransformation:
    """AdamW with torch defaults (betas .9/.999, eps 1e-8, wd 0.01 applied to
    all params, matching torch.optim.AdamW with no param groups;
    ref: model/modules.py:37-39)."""
    sched = chained_warmup_cosine(base_lr, warmup_steps, cosine_steps)
    return optax.adamw(
        learning_rate=sched,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=weight_decay,
    )
