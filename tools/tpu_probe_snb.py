"""One-claim TPU session: post-prune parity rerun + SNB training envelope.

Round-4 finding: the SNB challenge-1 training program (796x448, batch 4,
clip 100) fails REMOTE COMPILE on the 16 GB v5e chip in every variant,
remat or not (tpu_compile_helper exit 1 — the XLA memory planner cannot
place the b4 graph). The TPU-native envelope answer is micro-batching:
``acc_grad_iter`` keeps the optimizer batch at the challenge config's 4
while the graph peaks at batch/acc activations (multi-chip DP being the
other axis). This probe walks the ladder (4/acc2 -> 4/acc4 -> 1/acc1),
measures the hflip-schedule + photometric-gating variants at the first
config that fits, and re-runs the parity suite (now jnp-fused only after
the Pallas prune) in the same claim.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    session: dict = {}

    print("=== parity suite (post-prune) ===", flush=True)
    parity_rc = 0
    try:
        import tools.check_tpu_parity as parity

        parity.main()
    except SystemExit as e:
        parity_rc = int(e.code or 0)
    except Exception as e:
        import traceback

        traceback.print_exc()
        parity_rc = 1
    session["parity_rc"] = parity_rc

    print("=== SNB envelope ladder ===", flush=True)
    import tools.bench_snb as snb

    fit = None
    for b, acc in ((4, 2), (4, 4), (1, 1)):
        print(f"--- probe batch={b} acc={acc} ---", flush=True)
        try:
            res = snb.main([
                "--batch", str(b), "--acc", str(acc),
                "--variants", "matmul", "--steps", "5", "--warmup", "2",
            ])
        except Exception as e:
            import traceback

            traceback.print_exc()
            session[f"probe_b{b}_acc{acc}"] = {"error": type(e).__name__}
            continue
        session[f"probe_b{b}_acc{acc}"] = res
        if "ms_per_step" in res.get("matmul", {}):
            fit = (b, acc)
            break

    if fit is not None:
        b, acc = fit
        print(f"=== SNB variants at batch={b} acc={acc} ===", flush=True)
        try:
            session["snb"] = snb.main([
                "--batch", str(b), "--acc", str(acc),
                "--variants", "matmul,cond,xla,ungated",
                "--steps", "10", "--out", "/tmp/snb_results2.json",
            ])
        except Exception as e:
            import traceback

            traceback.print_exc()
            session["snb"] = {"error": type(e).__name__}

    with open("/tmp/r4_probe_snb.json", "w") as fp:
        json.dump(session, fp, indent=2)
    print(json.dumps(session))
    sys.exit(parity_rc)


if __name__ == "__main__":
    main()
