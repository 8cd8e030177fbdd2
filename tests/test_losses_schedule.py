"""Loss / LR-schedule parity vs torch."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tdeed_tpu.train.losses import (
    class_weights,
    displacement_mse,
    weighted_ce_hard,
    weighted_ce_soft,
)
from tdeed_tpu.train.schedule import chained_warmup_cosine


def test_weighted_ce_hard_matches_torch(rng):
    n, c = 64, 5
    logits = rng.standard_normal((n, c)).astype(np.float32)
    labels = rng.integers(0, c, n)
    w = class_weights(c, 5.0)
    got = float(weighted_ce_hard(jnp.asarray(logits), jnp.asarray(labels), w))
    want = float(
        F.cross_entropy(
            torch.from_numpy(logits),
            torch.from_numpy(labels),
            weight=torch.tensor([1.0] + [5.0] * (c - 1)),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_weighted_ce_soft_matches_torch(rng):
    n, c = 64, 5
    logits = rng.standard_normal((n, c)).astype(np.float32)
    target = rng.random((n, c)).astype(np.float32)
    target /= target.sum(-1, keepdims=True)
    w = class_weights(c, 5.0)
    got = float(weighted_ce_soft(jnp.asarray(logits), jnp.asarray(target), w))
    want = float(
        F.cross_entropy(
            torch.from_numpy(logits),
            torch.from_numpy(target),
            weight=torch.tensor([1.0] + [5.0] * (c - 1)),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_displacement_mse(rng):
    p = rng.standard_normal((4, 10)).astype(np.float32)
    t = rng.standard_normal((4, 10)).astype(np.float32)
    got = float(displacement_mse(jnp.asarray(p), jnp.asarray(t)))
    want = float(F.mse_loss(torch.from_numpy(p), torch.from_numpy(t)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_schedule_matches_torch_chained():
    """lr(t) must match ChainedScheduler([LinearLR, CosineAnnealingLR])
    stepping per optimizer step (ref: train_tdeed.py:79-87)."""
    base = 8e-4
    warm, cos = 30, 470
    total = 500

    params = [torch.zeros(1, requires_grad=True)]
    opt = torch.optim.SGD(params, lr=base)
    sched = torch.optim.lr_scheduler.ChainedScheduler(
        [
            torch.optim.lr_scheduler.LinearLR(
                opt, start_factor=0.01, end_factor=1.0, total_iters=warm
            ),
            torch.optim.lr_scheduler.CosineAnnealingLR(opt, cos),
        ]
    )
    ours = chained_warmup_cosine(base, warm, cos)
    for t in range(total):
        torch_lr = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(float(ours(t)), torch_lr, rtol=1e-5, atol=1e-9)
        opt.step()
        sched.step()
