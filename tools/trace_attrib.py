"""Join a jax.profiler device trace with HLO metadata -> per-layer time.

Input: the trace.json.gz from tools/profile_trace.py and the dumped HLO
text (/tmp/step_hlo.txt from tools/probe_layouts.py — same program, same
fusion names). Aggregates device time by the HLO metadata op_name prefix,
i.e. actual model layers (features/s3_b2/conv2, temp_fine/sgp_0, ...).

Pure host-side: no TPU claim.

Usage: python tools/trace_attrib.py [--depth 3] [--steps 3]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict


def load_hlo_map(path):
    """fusion/op name -> metadata op_name."""
    pat = re.compile(r"%([\w.\-]+) = .*?metadata=\{op_name=\"([^\"]+)\"")
    out = {}
    with open(path) as fp:
        for line in fp:
            m = pat.search(line)
            if m:
                out[m.group(1)] = m.group(2)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--trace-dir", default="/tmp/jax_trace_r3")
    p.add_argument("--hlo", default="/tmp/step_hlo.txt")
    p.add_argument("--depth", type=int, default=3)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--top", type=int, default=60)
    args = p.parse_args(argv)

    hlo_map = load_hlo_map(args.hlo)
    print(f"{len(hlo_map)} HLO ops with metadata")

    traces = glob.glob(
        os.path.join(args.trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    path = max(traces, key=os.path.getmtime)
    with gzip.open(path, "rt") as fp:
        data = json.load(fp)
    events = data.get("traceEvents", [])
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {pid for pid, n in proc_names.items() if "TPU" in n}

    agg = defaultdict(float)
    unmapped = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3 / args.steps  # ms per step
        if name.startswith("jit_train_step") or name in ("0", "1", "2", "3"):
            continue  # whole-step umbrella spans
        total += dur
        op = hlo_map.get(name)
        if op is None:
            unmapped[name] += dur
            continue
        # op_name like jit(train_step)/transpose(jvp(TDEED))/features/s3_b2/conv2/...
        parts = op.split("/")
        bwd = any(p.startswith("transpose") for p in parts)
        layer = [p for p in parts[1:] if not p.startswith(("jvp", "transpose"))]
        key = "/".join(layer[: args.depth]) + ("  [bwd]" if bwd else "  [fwd]")
        agg[key] += dur
    print(f"total attributed device time: {total:.2f} ms/step")
    print(f"\n{'ms/step':>8}  layer")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{v:8.2f}  {k}")
    um = sorted(unmapped.items(), key=lambda kv: -kv[1])[:15]
    if um:
        print("\nunmapped events:")
        for k, v in um:
            print(f"{v:8.2f}  {k[:100]}")


if __name__ == "__main__":
    main()
