"""One-claim TPU measurement session for round 5.

TPU claims cost minutes of hand-over latency, so extract everything in one
long-lived process (CLAUDE.md environment rules):

  1. SNB challenge-geometry trace attribution (VERDICT r4 item 4): run the
     796x448 b4 c100 train step (best-known variant: matmul hflip,
     ungated photometric) under jax.profiler.trace, dump the compiled HLO,
     and aggregate per-op device time — locating the ~30% per-pixel
     deficit vs the flagship 224^2 envelope (docs/DESIGN.md).
  2. Geometry probes: the same step at padded/trimmed widths and heights
     (lane-tiling hypothesis: W=796 pads to 896 in 128-lane ops) plus the
     XLA-augment variant — each per-pixel normalized so the intervention
     candidates rank directly.
  3. Flagship bench.py with driver-default knobs (publishable numbers,
     now incl. the cached input-pipeline rate).

Results land in /tmp/r5_session.json (+ /tmp/r5_snb_hlo.txt.gz).

Run ON the TPU (axon site must stay importable):
    python tools/tpu_session_r5.py [--skip trace,probes,bench]
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/r5_session.json"
HLO_OUT = "/tmp/r5_snb_hlo.txt.gz"
TRACE_DIR = "/tmp/jax_trace_r5_snb"


def snb_trace(steps: int = 3, smoke: bool = False) -> dict:
    """Phase 1: per-op device attribution of the SNB challenge train step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tools.bench_snb import (
        BATCH, CLIP_LEN, HEIGHT, NUM_CLASSES, PRETRAIN_CLASSES,
        RADI_DISPLACEMENT, WIDTH, build_step,
    )
    from tools.profile_trace import parse_trace
    from tdeed_tpu.train.schedule import make_optimizer
    from tdeed_tpu.train.state import TrainState

    os.environ["FLIP_MODE"] = "matmul"
    os.environ["PHOTO_GATED"] = "0"  # measured-best r4 variant
    b, t, h, w = BATCH, CLIP_LEN, HEIGHT, WIDTH
    if smoke:  # CPU plumbing check only — numbers meaningless
        b, t, h, w = 2, 4, 32, 64
    cfg_kw = dict(
        dataset="soccernetball", num_classes=NUM_CLASSES, clip_len=t,
        crop_dim=None, feature_arch="rny002_gsf", n_layers=2, sgp_ks=9,
        sgp_r=4, radi_displacement=RADI_DISPLACEMENT,
    )
    tx = make_optimizer(8e-4, warmup_steps=100, cosine_steps=10_000)
    cfg, model, step = build_step(cfg_kw, tx, remat=False)

    r = np.random.default_rng(0)

    def mk():
        return {
            "frame": jnp.asarray(r.integers(0, 256, (b, t, h, w, 3), np.uint8)),
            "label": jnp.asarray(
                r.integers(0, NUM_CLASSES + 1, (b, t)).astype(np.int32)),
            "labelD": jnp.asarray(r.integers(
                -RADI_DISPLACEMENT, RADI_DISPLACEMENT + 1, (b, t)
            ).astype(np.float32)),
            "frame2": jnp.asarray(r.integers(0, 256, (b, t, h, w, 3), np.uint8)),
            "label2": jnp.asarray(
                r.integers(0, NUM_CLASSES + 1, (b, t)).astype(np.int32)),
            "labelD2": jnp.asarray(r.integers(
                -RADI_DISPLACEMENT, RADI_DISPLACEMENT + 1, (b, t)
            ).astype(np.float32)),
            "dataset": jnp.ones((b,), jnp.int32),
        }

    batches = [mk(), mk()]
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, t, h, w, 3), jnp.float32), False
    )
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    rng = jax.random.PRNGKey(1)

    hlo = step.lower(state, batches[0], rng).compile().as_text()
    with gzip.open(HLO_OUT, "wt") as fp:
        fp.write(hlo)
    print(f"HLO -> {HLO_OUT} ({len(hlo)} bytes)", flush=True)

    state, m = step(state, batches[0], rng)
    state, m = step(state, batches[1], rng)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    with jax.profiler.trace(TRACE_DIR):
        for i in range(steps):
            state, m = step(state, batches[i % 2], rng)
        jax.block_until_ready(m["loss"])
    wall = time.perf_counter() - t0
    rows, total_dev = parse_trace(TRACE_DIR, top=60, steps=steps)
    return {
        "wall_ms_per_step": round(wall / steps * 1e3, 2),
        "device_ms_total": round(total_dev, 1),
        "steps": steps,
        "top_ops": [
            {"ms": round(ms, 3), "n": n, "name": name[:200]}
            for ms, n, name in rows[:60]
        ],
    }


PROBES = {
    # name -> (height, width, extra argv)
    "baseline_796": (448, 796, []),
    "w768_trim": (448, 768, []),      # 6x128 lanes (slightly fewer px)
    "w800": (448, 800, []),           # nearest mult-of-32 pad
    "w896_pad": (448, 896, []),       # 7x128 lanes (full lane pad)
    "h512_pad": (512, 796, []),       # sublane-axis control
    "xla_augment_796": (448, 796, ["--no-pallas-augment"]),
    # batch-scaling decomposition: SNB trains b4 (HBM), flagship b8 —
    # how much of the per-pixel deficit is batch, not geometry?
    "b8_796": (448, 796, ["--batch", "8", "--remat"]),
    "sq224_b8": (224, 224, ["--batch", "8"]),
    "sq224_b4": (224, 224, ["--batch", "4"]),
    # remat-pressure interventions: the r5 trace shows ~39 ms/step (10.4%)
    # of XLA auto-remat duplicated fusions + compressed activation copies
    # at 796x448 b4 (docs/experiments/snb_trace_attrib_r5.txt). acc=2
    # halves live micro-batch activations; explicit backbone remat replaces
    # XLA's choice with structured recompute.
    "acc2_796": (448, 796, ["--acc", "2"]),
    "acc4_796": (448, 796, ["--acc", "4"]),
    # optimizer batch 8 at micro-batch 4: same live activations as the b4
    # baseline but half the optimizer/collective overhead per frame.
    "b8_acc2_796": (448, 796, ["--batch", "8", "--acc", "2"]),
    # h512 control with remat (plain graph OOMs; fallback can't recover)
    "h512_remat": (512, 796, ["--remat"]),
}


def snb_geometry_probes(smoke: bool = False, names: str = "") -> dict:
    """Phase 2: per-pixel-normalized step rate across geometry variants."""
    import gc

    import jax

    from tools import bench_snb

    probes = PROBES
    if names:
        probes = {k: PROBES[k] for k in names.split(",")}
    if smoke:
        probes = {"baseline_796": (32, 64, []),
                  "xla_augment_796": (32, 64, ["--no-pallas-augment"])}
    out = {}
    for name, (h, w, extra) in probes.items():
        argv = [
            "--variants", "ungated", "--steps", "8", "--warmup", "3",
            "--height", str(h), "--width", str(w),
        ] + (["--batch", "2", "--clip-len", "4"] if smoke else []) + extra
        print(f"\n=== probe {name}: {w}x{h} {extra} ===", flush=True)
        try:
            res = bench_snb.main(argv)
            row = res.get("ungated", {})
            if "ms_per_step" in row:
                px = res["batch"] * res["clip_len"] * h * w
                row["px_per_sec"] = round(px / (row["ms_per_step"] / 1e3), 0)
            row["infer_fps"] = res.get("infer_fps")
            out[name] = row
        except Exception as e:
            out[name] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        # Each probe compiles fresh executables whose device buffers the
        # live jit caches pin — without this, probe N+1 OOMs on the
        # accumulated HBM of probes 1..N (measured: h512 died after w896).
        # MEASURED r5: clear_caches()+gc is NOT sufficient on the axon
        # backend — after ~5 large-geometry compiles the device stays
        # RESOURCE_EXHAUSTED for the rest of the process (even PRNGKey
        # fails); only a fresh process/claim recovers. Run big-geometry
        # probes <=2 per process (--probes a,b --out f.json) and batch
        # them from a shell driver.
        jax.clear_caches()
        gc.collect()
        print(json.dumps({name: out[name]}), flush=True)
    return out


def flagship_bench() -> dict:
    import gc

    import jax

    jax.clear_caches()
    gc.collect()
    import bench

    return bench.main()


def main() -> None:
    global OUT
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--skip", default="",
                   help="comma list: trace,probes,bench")
    p.add_argument("--smoke", action="store_true",
                   help="CPU plumbing check at tiny shapes (skips bench)")
    p.add_argument("--probes", default="",
                   help="comma list of PROBES names (default: all)")
    p.add_argument("--out", default=OUT,
                   help="results JSON path (default %(default)s)")
    args = p.parse_args()
    OUT = args.out
    skip = set(filter(None, args.skip.split(",")))
    if args.smoke:
        skip.add("bench")

    results: dict = {"started": time.strftime("%Y-%m-%d %H:%M:%S")}

    def record(key, fn):
        t0 = time.time()
        try:
            results[key] = fn()
        except Exception as e:
            import traceback

            traceback.print_exc()
            results[key] = {"error": f"{type(e).__name__}: {str(e)[:500]}"}
        results[f"{key}_sec"] = round(time.time() - t0, 1)
        with open(OUT, "w") as fp:
            json.dump(results, fp, indent=2)
        print(f"[{key}] done in {results[f'{key}_sec']}s -> {OUT}", flush=True)

    if "trace" not in skip:
        record("snb_trace", lambda: snb_trace(smoke=args.smoke))
    if "probes" not in skip:
        record("snb_probes", lambda: snb_geometry_probes(
            smoke=args.smoke, names=args.probes))
    if "bench" not in skip:
        record("bench", flagship_bench)
    print(json.dumps({k: v for k, v in results.items()
                      if not isinstance(v, dict) or "top_ops" not in v}))


if __name__ == "__main__":
    main()
