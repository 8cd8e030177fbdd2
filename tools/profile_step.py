"""Component-level timing breakdown of the training step on the live device.

Times, in one process (one TPU claim):
  - full train step (mixup + augment + fwd/bwd + AdamW)
  - forward-only (predict path)
  - backbone-only forward
  - backbone-only without temporal shift
  - device-side augmentation alone
  - SGP temporal stack alone
and prints a table, optionally capturing a jax.profiler trace of the full
step (--trace DIR).
"""

from __future__ import annotations

import argparse
import functools
import itertools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdeed_tpu.config import TDEEDConfig  # noqa: E402
from tdeed_tpu.models.regnet import RegNetY  # noqa: E402
from tdeed_tpu.models.sgp import EDSGPMixer  # noqa: E402
from tdeed_tpu.models.tdeed import build_model  # noqa: E402
from tdeed_tpu.train import augment  # noqa: E402
from tdeed_tpu.train.schedule import make_optimizer  # noqa: E402
from tdeed_tpu.train.state import TrainState  # noqa: E402
from tdeed_tpu.train.step import make_predict_step, make_train_step  # noqa: E402
from tdeed_tpu.utils.profiling import (  # noqa: E402
    enable_compilation_cache,
    time_fn,
    trace,
)

enable_compilation_cache()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--clip_len", type=int, default=100)
    p.add_argument("--crop", type=int, default=224)
    p.add_argument("--arch", default="rny002_gsf")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--trace", default=None, help="profiler trace output dir")
    args = p.parse_args(argv)

    B, T, S = args.batch, args.clip_len, args.crop
    frames_per_step = B * T
    cfg = TDEEDConfig(
        dataset="finediving", num_classes=4, clip_len=T, crop_dim=S,
        feature_arch=args.arch, n_layers=2, sgp_ks=7, sgp_r=4,
        radi_displacement=2,
    )
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)

    frames_u8 = jnp.asarray(
        r.integers(0, 256, (B, T, 256, 256, 3), np.uint8)
    )
    frames_crop = jnp.asarray(
        r.integers(0, 256, (B, T, S, S, 3), np.uint8)
    )
    batch = {
        "frame": frames_u8,
        "label": jnp.asarray(r.integers(0, 5, (B, T)).astype(np.int32)),
        "labelD": jnp.asarray(r.integers(-2, 3, (B, T)).astype(np.float32)),
        "frame2": frames_u8,
        "label2": jnp.asarray(r.integers(0, 5, (B, T)).astype(np.int32)),
        "labelD2": jnp.asarray(r.integers(-2, 3, (B, T)).astype(np.float32)),
    }

    variables = jax.jit(model.init, static_argnums=(2,))(
        rng, frames_crop.astype(jnp.float32), False
    )
    tx = make_optimizer(8e-4, 100, 10_000)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)

    rows = []

    def report(name, sec, frames=frames_per_step):
        rows.append((name, sec * 1e3, frames / sec))
        print(f"{name:34s} {sec * 1e3:9.2f} ms   {frames / sec:10.0f} frames/s")

    # full train step (state threaded; identical dispatches get
    # deduplicated by the runtime)
    train_step = jax.jit(make_train_step(
        model, tx, crop_dim=S, num_classes_bg=5, mixup=True,
        radi_displacement=2, acc_grad_iter=1,
    ))
    k = jax.random.PRNGKey(1)
    import time as _t

    st = state
    st, m = train_step(st, batch, k)
    jax.block_until_ready(m["loss"])
    t0 = _t.perf_counter()
    for _ in range(args.iters):
        st, m = train_step(st, batch, k)
    jax.block_until_ready(m["loss"])
    report("train step (full)", (_t.perf_counter() - t0) / args.iters)

    if args.trace:
        with trace(args.trace):
            jax.block_until_ready(train_step(state, batch, k)[1]["loss"])
        print(f"trace written to {args.trace}")

    # predict path (cycle distinct inputs to defeat dispatch dedup)
    predict = jax.jit(make_predict_step(
        model, crop_dim=S, radi_displacement=2), static_argnums=(3,))
    variants_it = itertools.cycle(
        [frames_crop, jnp.roll(frames_crop, 1, axis=1),
         jnp.roll(frames_crop, 2, axis=1), jnp.roll(frames_crop, 3, axis=1)]
    )
    report("predict step", time_fn(
        lambda: predict(state.params, state.batch_stats, next(variants_it),
                        False)[1],
        iters=args.iters))

    # augmentation alone
    aug = jax.jit(lambda f, key: augment.train_preprocess(
        f.astype(jnp.float32), key, S))
    keys_it = itertools.cycle(jax.random.split(k, 7))
    report("augment (train preprocess)", time_fn(
        lambda: aug(frames_u8, next(keys_it)), iters=args.iters))

    # backbone fwd with / without shift
    x_flat = frames_crop.reshape(B * T, S, S, 3).astype(jnp.bfloat16)
    for shift in (None, "gsf"):
        bb = RegNetY(arch="rny002", shift_mode=shift, clip_len=T,
                     dtype=jnp.bfloat16)
        bvars = bb.init(rng, x_flat, False)
        bfwd = jax.jit(functools.partial(bb.apply, bvars, train=False))
        xs_it = itertools.cycle([x_flat, x_flat + 1, x_flat + 2, x_flat + 3])
        report(f"backbone fwd (shift={shift})", time_fn(
            lambda: bfwd(next(xs_it)), iters=args.iters))

    # SGP stack alone
    feat = jnp.asarray(r.normal(size=(B, T, 368)).astype(np.float32)).astype(
        jnp.bfloat16)
    sgp = EDSGPMixer(clip_len=T, num_layers=2, kernel_size=7, k=4,
                     dtype=jnp.bfloat16)
    svars = sgp.init(rng, feat)
    sfwd = jax.jit(functools.partial(sgp.apply, svars))
    feat_it = itertools.cycle([feat, feat + 1, feat + 2, feat + 3])
    report("SGP U-Net fwd", time_fn(lambda: sfwd(next(feat_it)),
                                    iters=args.iters))

    print("\ncomponent, ms, frames/sec")
    for name, ms, fps in rows:
        print(f"{name}, {ms:.2f}, {fps:.0f}")


if __name__ == "__main__":
    main()
