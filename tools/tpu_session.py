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
    ab.main()

    sys.exit(parity_rc)


if __name__ == "__main__":
    main()
