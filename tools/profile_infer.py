"""Inference (predict-step) throughput on the live device.

Dedup-proof by dependency chaining: each call's input frames are perturbed
by a scalar derived from the previous call's output, so the runtime cannot
serve cached results (CLAUDE.md measurement rule; independent dispatches
measure wrong through the axon tunnel).

Measures the flagship FineDiving geometry and, optionally, the SNB serving
geometry (crop -1, 796x448 broadcast frames).

Usage: python tools/profile_infer.py [--iters 20] [--snb]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdeed_tpu.utils.profiling import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from tdeed_tpu.config import TDEEDConfig  # noqa: E402
from tdeed_tpu.models.tdeed import build_model  # noqa: E402
from tdeed_tpu.train.step import make_predict_step  # noqa: E402


def bench_predict(name, cfg, b, h, w, iters):
    model = build_model(cfg)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.clip_len, h, w, 3), jnp.float32), False,
    )
    predict = make_predict_step(
        model, crop_dim=cfg.crop_dim,
        radi_displacement=cfg.radi_displacement,
    )

    @jax.jit
    def chained(params, stats, frames, salt):
        # perturb input by the previous call's output scalar -> serialized,
        # never bit-identical dispatches
        frames = (frames + salt).astype(jnp.uint8)
        pred, probs = predict(params, stats, frames, False)
        return probs, (probs.sum() * 1e3).astype(jnp.int32) % 3

    r = np.random.default_rng(0)
    frames = jnp.asarray(
        r.integers(0, 253, (b, cfg.clip_len, h, w, 3), np.uint8)
    )
    params, stats = variables["params"], variables["batch_stats"]
    salt = jnp.int32(0)
    probs, salt = chained(params, stats, frames, salt)
    probs, salt = chained(params, stats, frames, salt)
    jax.block_until_ready(probs)
    t0 = time.perf_counter()
    for _ in range(iters):
        probs, salt = chained(params, stats, frames, salt)
    jax.block_until_ready(probs)
    dt = (time.perf_counter() - t0) / iters
    fps = b * cfg.clip_len / dt
    print(f"{name}: {dt * 1e3:.2f} ms/batch, {fps:.0f} frames/s/chip",
          flush=True)
    return fps


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--snb", action="store_true")
    args = p.parse_args(argv)

    fd = TDEEDConfig(
        dataset="finediving", num_classes=4, clip_len=100, crop_dim=224,
        feature_arch="rny002_gsf", n_layers=2, sgp_ks=7, sgp_r=4,
        radi_displacement=2,
    )
    # eval protocol: batch 4 (ref: util/eval.py:32), center-crop 224 from 256
    bench_predict("finediving predict (b4, 256->224)", fd, 4, 256, 256,
                  args.iters)

    if args.snb:
        snb = TDEEDConfig(
            dataset="soccernetball", num_classes=12, clip_len=100,
            crop_dim=-1, feature_arch="rny002_gsf", n_layers=2, sgp_ks=9,
            sgp_r=4, radi_displacement=4,
        )
        bench_predict("SNB predict (b4, 796x448 full-frame)", snb, 4, 448,
                      796, args.iters)


if __name__ == "__main__":
    main()
