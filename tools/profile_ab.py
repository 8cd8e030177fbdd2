"""A/B: XLA-chain vs fused-Pallas augmentation in the full train step, plus
a micro-breakdown of the GSF gated shift's internals. One process = one TPU
claim."""

from __future__ import annotations

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdeed_tpu.utils.profiling import enable_compilation_cache, time_fn  # noqa: E402

enable_compilation_cache()

from tdeed_tpu.config import TDEEDConfig  # noqa: E402
from tdeed_tpu.models.tdeed import build_model  # noqa: E402
from tdeed_tpu.train.schedule import make_optimizer  # noqa: E402
from tdeed_tpu.train.state import TrainState  # noqa: E402
from tdeed_tpu.train.step import make_train_step  # noqa: E402

B, T, S = 8, 100, 224


def main():
    cfg = TDEEDConfig(
        dataset="finediving", num_classes=4, clip_len=T, crop_dim=S,
        feature_arch="rny002_gsf", n_layers=2, sgp_ks=7, sgp_r=4,
        radi_displacement=2,
    )
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)
    frames_u8 = jnp.asarray(r.integers(0, 256, (B, T, 256, 256, 3), np.uint8))
    batch = {
        "frame": frames_u8,
        "label": jnp.asarray(r.integers(0, 5, (B, T)).astype(np.int32)),
        "labelD": jnp.asarray(r.integers(-2, 3, (B, T)).astype(np.float32)),
        "frame2": frames_u8,
        "label2": jnp.asarray(r.integers(0, 5, (B, T)).astype(np.int32)),
        "labelD2": jnp.asarray(r.integers(-2, 3, (B, T)).astype(np.float32)),
    }
    variables = jax.jit(model.init, static_argnums=(2,))(
        rng, jnp.zeros((1, T, S, S, 3), jnp.float32), False
    )
    tx = make_optimizer(8e-4, 100, 10_000)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    k = jax.random.PRNGKey(1)

    # ---- GSF micro-breakdown -----------------------------------------
    from flax import linen as nn

    from tdeed_tpu.models.shift import GSF, GatedShift, fold_dim_for

    # s3 geometry of rny002 @ 224: (B*T, 14, 14, 152), fold 40
    for (h, c) in [(14, 152), (7, 368)]:
        fold = fold_dim_for(c)
        x = jnp.asarray(
            r.standard_normal((B * T, h, h, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        gs = GatedShift(clip_len=T, mode="gsf", dtype=jnp.bfloat16)
        gvars = gs.init(rng, x, False)
        f = jax.jit(functools.partial(gs.apply, gvars, train=False))
        sec = time_fn(lambda: f(x), iters=10)
        print(f"GatedShift fwd ({h}x{h}x{c}, fold {fold}): {sec*1e3:7.2f} ms",
              flush=True)

        head = x[..., :fold].reshape(B, T, h, h, fold)
        gsf = GSF(dtype=jnp.bfloat16)
        fvars = gsf.init(rng, head, False)

        # BN+relu alone
        bn = nn.BatchNorm(use_running_average=True, momentum=0.9,
                          epsilon=1e-5, dtype=jnp.float32)
        bvars = {"params": fvars["params"]["bn"],
                 "batch_stats": fvars["batch_stats"]["bn"]}
        fbn = jax.jit(lambda y: nn.relu(bn.apply(bvars, y.astype(jnp.float32))))
        print(f"  bn+relu: {time_fn(lambda: fbn(head), iters=10)*1e3:7.2f} ms",
              flush=True)

        # gate conv alone (3x3x3, groups=2, out 2)
        conv = nn.Conv(features=2, kernel_size=(3, 3, 3),
                       feature_group_count=2, padding="SAME",
                       dtype=jnp.bfloat16)
        cvars = conv.init(rng, head)
        fconv = jax.jit(lambda y: conv.apply(cvars, y))
        print(f"  gate conv3d: {time_fn(lambda: fconv(head), iters=10)*1e3:7.2f} ms",
              flush=True)

        # full GSF module
        fgsf = jax.jit(functools.partial(gsf.apply, fvars, train=False))
        print(f"  GSF total: {time_fn(lambda: fgsf(head), iters=10)*1e3:7.2f} ms",
              flush=True)

    import time as _time

    def bench_threaded(step, st, n=20):
        """Honest steady-state timing: thread state through, vary rng, and
        report the last loss so the execution is verifiably real."""
        ks = [jax.random.fold_in(jax.random.PRNGKey(2), i) for i in range(n)]
        st, m = step(st, batch, ks[0])
        jax.block_until_ready(m["loss"])
        t0 = _time.perf_counter()
        for i in range(1, n):
            st, m = step(st, batch, ks[i])
        jax.block_until_ready(m["loss"])
        return (_time.perf_counter() - t0) / (n - 1), float(m["loss"])

    variants = [
        ("xla-augment", model, False),
        ("pallas-augment", model, True),
    ]
    for name, mdl, flag in variants:
        step = jax.jit(
            make_train_step(
                mdl, tx, crop_dim=S, num_classes_bg=5, mixup=True,
                radi_displacement=2, acc_grad_iter=1, pallas_augment=flag,
            ),
        )
        try:
            sec, last_loss = bench_threaded(step, state)
        except Exception as e:
            print(f"train step [{name}]: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        print(f"train step [{name}]: {sec*1e3:8.2f} ms  "
              f"{B*T/sec:9.0f} frames/s  loss@20={last_loss:.4f}", flush=True)



if __name__ == "__main__":
    main()
