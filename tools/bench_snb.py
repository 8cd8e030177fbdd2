"""SNB challenge-geometry benchmark: train + infer at 796x448 full frames.

The reference's marquee capability is the 2024 SoccerNet Ball Action
Spotting challenge win (ref: README.md:19), trained on FULL 796x448 frames
(ref: extract_frames_snb.py:22-23) with
configs/SoccerNetBall/SoccerNetBall_challenge1.json: batch 4, clip_len 100,
crop_dim -1 (no crop), rny002_gsf, n_layers 2, sgp_ks 9, sgp_r 4,
radi_displacement 4, mixup, joint SN pretrain head (12+17 classes).
Every round-1..3 perf number lives on the FineDiving 224^2 envelope; this
tool measures the SNB envelope directly, with the variant knobs that scale
differently at W=796:

  flip mode   kernels/augment.py hflip schedule: 'matmul' (always-on W x W
              exchange matmul — ~1.7 GFLOP/frame here vs 0.07 at W=224),
              'cond' (lax.cond-gated: flipped clips only), 'xla' (u8
              reverse+select outside the kernel).
  PHOTO_GATED photometric lax.cond gating (flagship winner) at SNB size.
  remat       checkpoint_backbone: full frames x clip 100 may not fit HBM
              without remat; measured, not assumed.
  --acc       acc_grad_iter micro-batching: the optimizer batch stays
              --batch but the graph peaks at batch/acc activations (the
              TPU-native answer when the challenge batch exceeds one
              chip's HBM; multi-chip DP is the other).

Timing follows CLAUDE.md rules: state threads through steps (dependency
chain), inputs cycle through distinct batches.

Run (one TPU claim does all variants; CPU smoke: --height 32 --width 64
--batch 2 --clip-len 4 --steps 2):
    python tools/bench_snb.py [--variants matmul,cond,xla,ungated]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# SNB challenge-1 training envelope (ref: configs/SoccerNetBall/
# SoccerNetBall_challenge1.json; frames ref: extract_frames_snb.py:22-23)
WIDTH, HEIGHT = 796, 448
BATCH, CLIP_LEN = 4, 100
NUM_CLASSES, PRETRAIN_CLASSES = 12, 17
RADI_DISPLACEMENT = 4

# variant -> env knobs set before (re)building the jitted step
VARIANTS = {
    "matmul": {"FLIP_MODE": "matmul", "PHOTO_GATED": "1"},
    "cond": {"FLIP_MODE": "cond", "PHOTO_GATED": "1"},
    "xla": {"FLIP_MODE": "xla", "PHOTO_GATED": "1"},
    "ungated": {"FLIP_MODE": "matmul", "PHOTO_GATED": "0"},
}


def build_step(cfg_kw, tx, remat: bool, acc: int = 1,
               pallas_augment=None):
    import jax

    from tdeed_tpu.config import TDEEDConfig
    from tdeed_tpu.models.tdeed import build_model
    from tdeed_tpu.train.step import make_train_step

    cfg = TDEEDConfig(checkpoint_backbone=remat, **cfg_kw)
    two_heads = (NUM_CLASSES + 1, PRETRAIN_CLASSES + 1)
    model = build_model(cfg, two_heads=two_heads)
    step = jax.jit(
        make_train_step(
            model,
            tx,
            crop_dim=None,  # crop_dim -1: full frames
            num_classes_bg=cfg.num_classes_bg,
            mixup=True,
            radi_displacement=RADI_DISPLACEMENT,
            acc_grad_iter=acc,
            two_heads=two_heads,
            pretrain_classes_bg=PRETRAIN_CLASSES + 1,
            pallas_augment=pallas_augment,
        ),
        donate_argnums=(0,),
    )
    return cfg, model, step


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--variants", default="matmul,cond,xla,ungated")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--batch", type=int, default=BATCH)
    p.add_argument("--clip-len", type=int, default=CLIP_LEN)
    p.add_argument("--height", type=int, default=HEIGHT)
    p.add_argument("--width", type=int, default=WIDTH)
    p.add_argument("--acc", type=int, default=1,
                   help="acc_grad_iter (micro-batch = batch/acc)")
    p.add_argument("--remat", action="store_true",
                   help="compile with backbone remat directly — the "
                        "OOM->remat fallback cannot work on backends where "
                        "an OOM leaves the device RESOURCE_EXHAUSTED for "
                        "the process lifetime (measured r5, axon)")
    p.add_argument("--no-pallas-augment", action="store_true",
                   help="force the XLA augment chain (isolates Mosaic "
                        "compile failures at non-flagship geometries)")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tdeed_tpu.train.schedule import make_optimizer
    from tdeed_tpu.train.state import TrainState
    from tdeed_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    b, t, h, w = args.batch, args.clip_len, args.height, args.width
    cfg_kw = dict(
        dataset="soccernetball",
        num_classes=NUM_CLASSES,
        clip_len=t,
        crop_dim=None,
        feature_arch="rny002_gsf",
        n_layers=2,
        sgp_ks=9,
        sgp_r=4,
        radi_displacement=RADI_DISPLACEMENT,
    )
    tx = make_optimizer(8e-4, warmup_steps=100, cosine_steps=10_000)

    r = np.random.default_rng(0)

    def make_batch():
        return {
            "frame": r.integers(0, 256, (b, t, h, w, 3), np.uint8),
            "label": r.integers(0, NUM_CLASSES + 1, (b, t)).astype(np.int32),
            "labelD": r.integers(
                -RADI_DISPLACEMENT, RADI_DISPLACEMENT + 1, (b, t)
            ).astype(np.float32),
            "frame2": r.integers(0, 256, (b, t, h, w, 3), np.uint8),
            "label2": r.integers(0, NUM_CLASSES + 1, (b, t)).astype(np.int32),
            "labelD2": r.integers(
                -RADI_DISPLACEMENT, RADI_DISPLACEMENT + 1, (b, t)
            ).astype(np.float32),
            # joint-training head routing (all rows SNB here; the where()
            # cost is identical either way)
            "dataset": np.ones((b,), np.int32),
        }

    batches = [jax.tree.map(jnp.asarray, make_batch()) for _ in range(2)]

    results: dict = {
        "geometry": f"{w}x{h}", "batch": b, "clip_len": t,
        "acc_grad_iter": args.acc, "backend": jax.default_backend(),
        "pallas_augment": not args.no_pallas_augment,
    }
    remat_used = None

    # init once (host copy; each variant re-uploads — steps donate state)
    _, model0, _ = build_step(cfg_kw, tx, remat=False)
    variables = jax.jit(model0.init, static_argnums=(2,))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, t, h, w, 3), jnp.float32),
        False,
    )
    variables = jax.tree.map(np.asarray, variables)

    for name in args.variants.split(","):
        knobs = VARIANTS[name]
        for k, v in knobs.items():
            os.environ[k] = v
        try:
            # memory envelope: the first variant tries the plain graph, and
            # on failure falls back to remat (jax.checkpoint over the
            # backbone); later variants reuse whichever fit. RECORDED.
            if args.remat:
                tries = [True]
            else:
                tries = ([remat_used] if remat_used is not None
                         else [False, True])
            err = None
            for remat in tries:
                cfg, model, step = build_step(
                    cfg_kw, tx, remat, args.acc,
                    pallas_augment=False if args.no_pallas_augment else None,
                )
                try:
                    state = TrainState.create(
                        jax.tree.map(jnp.asarray, variables["params"]),
                        jax.tree.map(jnp.asarray, variables["batch_stats"]),
                        tx,
                    )
                    rng = jax.random.PRNGKey(1)
                    t_compile = time.perf_counter()
                    state, metrics = step(state, batches[0], rng)
                    jax.block_until_ready(metrics["loss"])
                    t_compile = time.perf_counter() - t_compile
                    remat_used = remat
                    err = None
                    break
                except Exception as e:  # OOM on the plain graph -> remat
                    err = e
                    print(f"[{name}] remat={remat} acc={args.acc}: "
                          f"{type(e).__name__}: {str(e)[:1500]}", flush=True)
            if err is not None:
                results[name] = {"error": f"{type(err).__name__}"}
                continue

            for i in range(args.warmup):
                state, metrics = step(state, batches[i % 2], rng)
            jax.block_until_ready(metrics["loss"])
            t0 = time.perf_counter()
            for i in range(args.steps):
                state, metrics = step(state, batches[i % 2], rng)
            jax.block_until_ready(metrics["loss"])
            dt = time.perf_counter() - t0
            ms = dt / args.steps * 1e3
            results[name] = {
                "ms_per_step": round(ms, 2),
                "train_fps": round(b * t * args.steps / dt, 1),
                "remat": remat_used,
                "loss": round(float(metrics["loss"]), 4),
                "first_step_s": round(t_compile, 1),
            }
            print(f"[{name}] {ms:.2f} ms/step "
                  f"({results[name]['train_fps']} f/s, remat={remat_used})",
                  flush=True)
            del state
        finally:
            for k in knobs:
                os.environ.pop(k, None)

    # --- inference at SNB geometry (eval protocol batch 4, chained) ------
    from tdeed_tpu.train.step import make_predict_step

    cfg, model, _ = build_step(cfg_kw, tx, remat=False)
    predict = make_predict_step(
        model, crop_dim=None, radi_displacement=RADI_DISPLACEMENT,
        two_heads=(NUM_CLASSES + 1, PRETRAIN_CLASSES + 1),
    )

    @jax.jit
    def chained_predict(params, stats, frames, salt):
        frames = (frames + salt).astype(jnp.uint8)
        _, probs = predict(params, stats, frames, False)
        return probs, (probs.sum() * 1e3).astype(jnp.int32) % 3

    pframes = jnp.asarray(r.integers(0, 253, (b, t, h, w, 3), np.uint8))
    params = jax.tree.map(jnp.asarray, variables["params"])
    stats = jax.tree.map(jnp.asarray, variables["batch_stats"])
    salt = jnp.int32(0)
    probs, salt = chained_predict(params, stats, pframes, salt)
    probs, salt = chained_predict(params, stats, pframes, salt)
    jax.block_until_ready(probs)
    t0 = time.perf_counter()
    iters = max(args.steps, 5)
    for _ in range(iters):
        probs, salt = chained_predict(params, stats, pframes, salt)
    jax.block_until_ready(probs)
    results["infer_fps"] = round(
        b * t * iters / (time.perf_counter() - t0), 1
    )
    print(f"[infer] {results['infer_fps']} f/s", flush=True)

    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as fp:
            json.dump(results, fp, indent=2)
    return results


if __name__ == "__main__":
    main()
