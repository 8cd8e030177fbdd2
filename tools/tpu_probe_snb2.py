"""One-claim TPU session: isolate the SNB-geometry train compile failure.

Round-4 probe 1 (tools/tpu_probe_snb.py): the SNB challenge train program
(796x448) fails remote compile at EVERY batch/acc/remat point — including
batch 1 — while inference at the same geometry compiles and runs. The
common denominator unique to training is the Pallas photometric augment
kernel (auto-selected on TPU; the flagship 224/256 geometry compiles
fine). This probe:

  1. compiles/runs the photometric kernel ALONE at the SNB frame geometry
     (and at the flagship geometry as control);
  2. runs the bench_snb ladder with --no-pallas-augment (the XLA chain);
  3. if (2) fits, measures all hflip/gating variants there.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def kernel_alone(h, w, label, session):
    import jax.numpy as jnp
    import numpy as np

    from tdeed_tpu.kernels.augment import N_PARAMS, photometric_planar

    r = np.random.default_rng(0)
    frames = jnp.asarray(
        r.integers(0, 256, (2, 4, 3, h, w), np.uint8)
    ).astype(jnp.bfloat16)
    params = np.zeros((2, N_PARAMS), np.float32)
    params[:, [0, 2, 4, 6, 8]] = 1.0
    params[:, 9:14] = 0.2
    params[:, 14] = [1.0, 0.0]
    try:
        out = photometric_planar(frames, jnp.asarray(params))
        out.block_until_ready()
        session[f"kernel_{label}"] = "ok"
        print(f"[kernel {label} {w}x{h}] OK", flush=True)
    except Exception as e:
        session[f"kernel_{label}"] = f"{type(e).__name__}: {str(e)[:500]}"
        traceback.print_exc()
        print(f"[kernel {label} {w}x{h}] FAIL {type(e).__name__}", flush=True)


def main() -> None:
    session: dict = {}

    print("=== photometric kernel alone ===", flush=True)
    kernel_alone(256, 256, "flagship", session)   # control
    kernel_alone(448, 796, "snb", session)

    print("=== SNB ladder, XLA augment chain ===", flush=True)
    import tools.bench_snb as snb

    fit = None
    for b, acc in ((4, 1), (4, 4), (1, 1)):
        print(f"--- probe batch={b} acc={acc} (no pallas augment) ---",
              flush=True)
        try:
            res = snb.main([
                "--batch", str(b), "--acc", str(acc), "--no-pallas-augment",
                "--variants", "xla", "--steps", "5", "--warmup", "2",
            ])
        except Exception as e:
            traceback.print_exc()
            session[f"probe_b{b}_acc{acc}"] = {"error": type(e).__name__}
            continue
        session[f"probe_b{b}_acc{acc}"] = res
        if "ms_per_step" in res.get("xla", {}):
            fit = (b, acc)
            break

    if fit is not None:
        b, acc = fit
        print(f"=== SNB variants at batch={b} acc={acc} ===", flush=True)
        try:
            session["snb"] = snb.main([
                "--batch", str(b), "--acc", str(acc), "--no-pallas-augment",
                "--variants", "xla,ungated",
                "--steps", "10", "--out", "/tmp/snb_results3.json",
            ])
        except Exception as e:
            traceback.print_exc()
            session["snb"] = {"error": type(e).__name__}

    with open("/tmp/r4_probe_snb2.json", "w") as fp:
        json.dump(session, fp, indent=2)
    print(json.dumps(session))


if __name__ == "__main__":
    main()
