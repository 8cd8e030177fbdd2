"""Serving-batch scaling: SNB-geometry inference throughput vs batch.

The eval PROTOCOL fixes inference batch 4 (ref: util/eval.py:32 — all
protocol numbers in DESIGN.md use it), but a production serving engine
(infer/predictor.SpottingPredictor) is free to batch wider per chip.
This measures the per-chip serving ceiling at the SNB challenge geometry
(796x448 full frames, clip 100) across batch sizes, chained per the
CLAUDE.md honest-timing rule.

One TPU claim; 3-4 small inference compiles (safe under the ~5 large
executables/process exhaustion limit — these are forward-only).

Run: python tools/probe_serving_scale.py [--batches 2,4,8,16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTH, HEIGHT, CLIP_LEN = 796, 448, 100
NUM_CLASSES, RADI = 12, 4


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batches", default="2,4,8,16")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--out", default="/tmp/serving_scale.json")
    p.add_argument("--height", type=int, default=HEIGHT)
    p.add_argument("--width", type=int, default=WIDTH)
    p.add_argument("--clip-len", type=int, default=CLIP_LEN)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tdeed_tpu.config import TDEEDConfig
    from tdeed_tpu.models.tdeed import build_model
    from tdeed_tpu.train.step import make_predict_step
    from tdeed_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    h, w, t = args.height, args.width, args.clip_len

    cfg = TDEEDConfig(
        dataset="soccernetball", num_classes=NUM_CLASSES, clip_len=t,
        crop_dim=None, feature_arch="rny002_gsf", n_layers=2, sgp_ks=9,
        sgp_r=4, radi_displacement=RADI,
    )
    model = build_model(cfg, two_heads=(NUM_CLASSES + 1, 18))
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, t, h, w, 3), jnp.float32), False
    )
    params, stats = variables["params"], variables["batch_stats"]
    predict = make_predict_step(model, crop_dim=None, radi_displacement=RADI)

    @jax.jit
    def chained(params, stats, frames, salt):
        frames = (frames + salt).astype(jnp.uint8)
        _, probs = predict(params, stats, frames, False)
        return probs, (probs.sum() * 1e3).astype(jnp.int32) % 3

    r = np.random.default_rng(0)
    results = {"geometry": f"{w}x{h}", "clip_len": t,
               "backend": jax.default_backend()}
    for b in [int(x) for x in args.batches.split(",")]:
        try:
            frames = jnp.asarray(
                r.integers(0, 253, (b, t, h, w, 3), np.uint8))
            salt = jnp.int32(0)
            t0 = time.perf_counter()
            probs, salt = chained(params, stats, frames, salt)
            jax.block_until_ready(probs)
            compile_s = time.perf_counter() - t0
            probs, salt = chained(params, stats, frames, salt)
            jax.block_until_ready(probs)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                probs, salt = chained(params, stats, frames, salt)
            jax.block_until_ready(probs)
            dt = time.perf_counter() - t0
            fps = b * t * args.iters / dt
            results[f"b{b}"] = {
                "ms_per_call": round(dt / args.iters * 1e3, 2),
                "infer_fps": round(fps, 1),
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:
            results[f"b{b}"] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(json.dumps({f"b{b}": results[f"b{b}"]}), flush=True)
        del frames
    with open(args.out, "w") as fp:
        json.dump(results, fp, indent=1)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
