"""One-claim TPU session, round 4b: validate the augment VMEM fix + SNB train.

Round-4 probes established: the SNB challenge train program (796x448 full
frames, ref: extract_frames_snb.py:22-23) failed remote compile at EVERY
batch/acc/remat point while inference compiled — root cause isolated to the
Pallas photometric kernel: at 448x796 its single-frame block holds ~31.4 MB
of scoped VMEM, past Mosaic's 16 MB default ("Scoped allocation with size
31.39M and limit 16.00M exceeded"). kernels/augment.py now passes a
geometry-scaled vmem_limit_bytes. This session, in one claim:

  1. parity suite (tools/check_tpu_parity.py) — the cancellation-aware
     criterion now matches the measured 8/216 stem-dW flips.
  2. photometric kernel ALONE at flagship (control) and SNB geometry —
     direct validation of the vmem_limit fix.
  3. SNB train ladder WITH the Pallas augment (batch 4 acc 1, all four
     hflip/gating variants — the W=796 exchange-matmul flip measurement
     VERDICT r3 item 3 asks for). bench_snb's built-in remat fallback
     records the memory envelope.
  4. if the Pallas path still fails: the XLA augment chain ladder.
  5. flagship bench with driver-default knobs (regression check: the vmem
     limit floors at the old 16 MB default for 224/256 crops, so flagship
     numbers must not move).

Results land incrementally in /tmp/r4b_session.json.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SESSION_PATH = "/tmp/r4b_session.json"
session: dict = {}


def save() -> None:
    with open(SESSION_PATH, "w") as fp:
        json.dump(session, fp, indent=2)


def kernel_alone(h, w, label) -> bool:
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
        return True
    except Exception as e:
        session[f"kernel_{label}"] = f"{type(e).__name__}: {str(e)[:500]}"
        traceback.print_exc()
        print(f"[kernel {label} {w}x{h}] FAIL {type(e).__name__}", flush=True)
        return False


def main() -> None:
    print("=== 1. parity suite ===", flush=True)
    parity_rc = 0
    try:
        import tools.check_tpu_parity as parity

        parity.main()
    except SystemExit as e:
        parity_rc = int(e.code or 0)
    except Exception as e:
        traceback.print_exc()
        print(f"parity suite CRASHED: {type(e).__name__}", flush=True)
        parity_rc = 1
    session["parity_rc"] = parity_rc
    save()

    print("=== 2. photometric kernel alone (vmem fix) ===", flush=True)
    kernel_alone(256, 256, "flagship")  # control
    snb_kernel_ok = kernel_alone(448, 796, "snb")
    save()

    import tools.bench_snb as snb

    if snb_kernel_ok:
        print("=== 3. SNB train ladder, Pallas augment ===", flush=True)
        try:
            session["snb_pallas"] = snb.main([
                "--variants", "matmul,cond,xla,ungated",
                "--steps", "10", "--out", "/tmp/snb_pallas.json",
            ])
        except Exception as e:
            traceback.print_exc()
            session["snb_pallas"] = {"error": type(e).__name__}
        save()

    trained = any(
        "ms_per_step" in v
        for v in session.get("snb_pallas", {}).values()
        if isinstance(v, dict)
    )
    if not trained:
        print("=== 4. SNB ladder, XLA augment chain ===", flush=True)
        for b, acc in ((4, 1), (4, 4), (1, 1)):
            print(f"--- probe batch={b} acc={acc} (no pallas) ---", flush=True)
            try:
                res = snb.main([
                    "--batch", str(b), "--acc", str(acc),
                    "--no-pallas-augment", "--variants", "xla",
                    "--steps", "5", "--warmup", "2",
                ])
            except Exception as e:
                traceback.print_exc()
                session[f"snb_xla_b{b}_acc{acc}"] = {"error": type(e).__name__}
                save()
                continue
            session[f"snb_xla_b{b}_acc{acc}"] = res
            save()
            if "ms_per_step" in res.get("xla", {}):
                break

    print("=== 5. flagship bench (driver-default knobs) ===", flush=True)
    try:
        for k in ("FUSE_ENTRY", "FUSE_SHIFT", "FUSE_PALLAS", "PHOTO_GATED",
                  "FLIP_MODE"):
            os.environ.pop(k, None)
        import bench

        session["flagship"] = bench.main()
    except Exception as e:
        traceback.print_exc()
        session["flagship"] = {"error": type(e).__name__}
    save()

    print(json.dumps(session))
    sys.exit(parity_rc)


if __name__ == "__main__":
    main()
