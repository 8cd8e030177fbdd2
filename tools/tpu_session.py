"""One-claim TPU measurement session: parity suite, then the fused A/B.

TPU claims are minutes of hand-over latency each (memory:
axon-tpu-gotchas) and, after an abrupt kill, can take repeated ~30-min
UNAVAILABLE cycles to recover — so when a claim DOES land, extract
everything in one process: the on-device parity suite
(tools/check_tpu_parity.py) followed by the fused-entry A/B
(tools/profile_fused_entry.py). Exit code 1 if parity fails (the A/B
still runs — timing a kernel that is off by ulps is still informative).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import json

    import tools.check_tpu_parity as parity
    import tools.profile_fused_entry as ab

    print("=== parity suite ===", flush=True)
    parity_rc = 0
    try:
        parity.main()
    except SystemExit as e:
        parity_rc = int(e.code or 0)
    except Exception as e:  # e.g. a Mosaic compile failure of a new kernel
        # — the A/B must still run; the claim is too expensive to waste.
        import traceback

        traceback.print_exc()
        print(f"parity suite CRASHED: {type(e).__name__}", flush=True)
        parity_rc = 1

    print("=== fused-entry A/B ===", flush=True)
    results = ab.main() or {}
    with open("/tmp/tpu_ab_results.json", "w") as fp:
        json.dump({k: v * 1e3 for k, v in results.items()}, fp)

    # Same claim: per-op trace of the all-jnp fused variant for next-rock
    # attribution (tools/trace_attrib.py joins it offline with the HLO
    # op_name metadata — no second claim needed).
    print("=== all-jnp fused device trace ===", flush=True)
    try:
        os.environ["FUSE_ENTRY"] = "1"
        os.environ["FUSE_SHIFT"] = "1"
        import tools.profile_trace as trace

        trace.main(["--steps", "3", "--logdir", "/tmp/jax_trace_fused",
                    "--dump-hlo", "/tmp/step_hlo_fused.txt"])
    except Exception as e:
        import traceback

        traceback.print_exc()
        print(f"trace capture CRASHED: {type(e).__name__}", flush=True)

    # Same claim: a publishable bench run with the A/B winner's knobs
    # (claims are scarce during outages — one landed claim should yield
    # parity + A/B + trace + final numbers). Pallas-variant benches only
    # publish when the parity suite passed; otherwise bench the best
    # parity-safe variant.
    print("=== winner bench ===", flush=True)
    try:
        # name -> (FUSE_ENTRY, FUSE_SHIFT, PHOTO_GATED). PHOTO_GATED
        # defaults ON in the kernel, so variants that were MEASURED ungated
        # in the A/B must pin "0" explicitly — popping would resolve to
        # gated and bench a different program than the A/B ran.
        KNOBS = {
            "plain": ("0", "0", "0"),
            "photo-gated": ("0", "0", "1"),
            "fused-jnp": ("1", "0", "0"),
            "fused-shift-jnp": ("0", "1", "0"),
            "all-jnp": ("1", "1", "0"),
        }
        pool = dict(results)
        winner = min(pool, key=pool.get) if pool else "plain"
        fe, fs, pg = KNOBS[winner]
        os.environ["FUSE_ENTRY"] = fe
        os.environ["FUSE_SHIFT"] = fs
        os.environ["PHOTO_GATED"] = pg
        print(f"winner: {winner} (parity_rc={parity_rc})", flush=True)
        import bench

        payload = bench.main()
        payload["variant"] = winner
        payload["parity_rc"] = parity_rc
        with open("/tmp/tpu_bench_winner.json", "w") as fp2:
            json.dump(payload, fp2)
    except Exception as e:
        import traceback

        traceback.print_exc()
        print(f"winner bench CRASHED: {type(e).__name__}", flush=True)

    sys.exit(parity_rc)


if __name__ == "__main__":
    main()
