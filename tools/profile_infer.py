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


def bench_aggregation():
    """SN-length sliding-window serving: host accumulate (per-batch D2H
    sync) vs device accumulate (scatter-add buffers, one D2H per video).

    SN geometry: 45-min half @ stride 12 -> t_len 5625, hop 50, 113
    windows. 8 distinct pre-built batches cycle (RAM bound); repeats may
    dedup in the HOST path's favor (device path chains through the buffer,
    so it cannot dedup) — a conservative comparison.
    """
    from tdeed_tpu.config import TDEEDConfig
    from tdeed_tpu.infer.evaluate import predict_windows
    from tdeed_tpu.infer.predictor import SpottingPredictor
    from tdeed_tpu.models.tdeed import build_model

    cfg = TDEEDConfig(
        dataset="soccernet", num_classes=17, clip_len=100, crop_dim=224,
        feature_arch="rny002_gsf", n_layers=2, sgp_ks=7, sgp_r=4,
        radi_displacement=4,
    )
    model = build_model(cfg)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.clip_len, 256, 256, 3), jnp.float32), False,
    )
    classes = {f"c{i}": i for i in range(1, 18)}
    pred = SpottingPredictor(
        cfg, variables["params"], variables["batch_stats"], classes
    )

    t_len, hop, bs = 5625, 50, 4
    starts = list(range(-5, t_len - 50, hop))
    r = np.random.default_rng(0)
    distinct = [
        r.integers(0, 256, (bs, cfg.clip_len, 256, 256, 3), np.uint8)
        for _ in range(8)
    ]

    def batches():
        for ofs in range(0, len(starts), bs):
            chunk = starts[ofs:ofs + bs]
            fr = distinct[(ofs // bs) % len(distinct)]
            yield [
                {"video": "half1", "start": s, "frame": fr[i]}
                for i, s in enumerate(chunk)
            ]

    # warm both executables
    warm = [next(iter(batches()))]
    pred._spot_device(iter(warm), t_len, bs, False)
    pd = {"half1": (np.zeros((t_len, 18), np.float32),
                    np.zeros(t_len, np.int32))}
    predict_windows(
        lambda f, h: pred._predict(pred._params, pred._batch_stats, f, h)[1],
        pd, iter(warm), bs, False,
    )

    t0 = time.perf_counter()
    sc_d, sup_d = pred._spot_device(batches(), t_len, bs, False)
    dt_dev = time.perf_counter() - t0

    pd = {"half1": (np.zeros((t_len, 18), np.float32),
                    np.zeros(t_len, np.int32))}
    t0 = time.perf_counter()
    predict_windows(
        lambda f, h: pred._predict(pred._params, pred._batch_stats, f, h)[1],
        pd, batches(), bs, False,
    )
    dt_host = time.perf_counter() - t0
    n_frames = len(starts) * cfg.clip_len
    print(f"SN half ({len(starts)} windows): device-agg {dt_dev:.2f}s "
          f"({n_frames/dt_dev:.0f} f/s) vs host-agg {dt_host:.2f}s "
          f"({n_frames/dt_host:.0f} f/s)")
    sc_h, sup_h = pd["half1"]
    print("  max|scores diff|:", float(np.abs(sc_d - sc_h).max()),
          " support equal:", bool((sup_d == sup_h).all()))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--snb", action="store_true")
    p.add_argument("--agg", action="store_true")
    args = p.parse_args(argv)

    if args.agg:
        bench_aggregation()
        return

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
