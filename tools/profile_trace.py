"""Per-op device timing via jax.profiler trace -> perfetto JSON parsing.

Runs a few production train steps under jax.profiler.trace and aggregates
the device-track event durations by op/fusion name — the ground truth the
ablation ladder can only approximate. Works without tensorboard: the
trace.json.gz is parsed directly.

Usage: python tools/profile_trace.py [--steps 3] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tdeed_tpu.utils.profiling import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from tdeed_tpu.config import TDEEDConfig  # noqa: E402
from tdeed_tpu.models.tdeed import build_model  # noqa: E402
from tdeed_tpu.train.schedule import make_optimizer  # noqa: E402
from tdeed_tpu.train.state import TrainState  # noqa: E402
from tdeed_tpu.train.step import make_train_step  # noqa: E402

B, T, S = 8, 100, 224


def build():
    cfg = TDEEDConfig(
        dataset="finediving", num_classes=4, clip_len=T, crop_dim=S,
        feature_arch="rny002_gsf", n_layers=2, sgp_ks=7, sgp_r=4,
        radi_displacement=2,
        fuse_entry=os.environ.get("FUSE_ENTRY", "") == "1",
        fuse_shift=os.environ.get("FUSE_SHIFT", "") == "1",
    )
    model = build_model(cfg)
    r = np.random.default_rng(0)

    def mk():
        return {
            "frame": jnp.asarray(r.integers(0, 256, (B, T, 256, 256, 3), np.uint8)),
            "label": jnp.asarray(r.integers(0, 5, (B, T)).astype(np.int32)),
            "labelD": jnp.asarray(r.integers(-2, 3, (B, T)).astype(np.float32)),
            "frame2": jnp.asarray(r.integers(0, 256, (B, T, 256, 256, 3), np.uint8)),
            "label2": jnp.asarray(r.integers(0, 5, (B, T)).astype(np.int32)),
            "labelD2": jnp.asarray(r.integers(-2, 3, (B, T)).astype(np.float32)),
        }

    batches = [mk(), mk()]
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, T, S, S, 3), jnp.float32), False
    )
    tx = make_optimizer(8e-4, 100, 10_000)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step = jax.jit(make_train_step(
        model, tx, crop_dim=S, num_classes_bg=5, mixup=True,
        radi_displacement=2,
    ), donate_argnums=(0,))
    return step, state, batches


def parse_trace(logdir: str, top: int = 40, steps: int = 1):
    """Aggregate the newest trace.json.gz under logdir by device op name.

    Returns (rows, total_ms) with rows = [(total_ms, count, name), ...]
    sorted desc — also printed. Shared with tools/tpu_session_r5.py."""
    traces = glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
    )
    if not traces:
        print("NO trace.json.gz produced — profiler unsupported on this "
              "backend?\nfiles under logdir:")
        for f in glob.glob(os.path.join(logdir, "**", "*"), recursive=True):
            print(" ", f)
        return [], 0.0
    path = max(traces, key=os.path.getmtime)
    print("trace:", path)
    with gzip.open(path, "rt") as fp:
        data = json.load(fp)

    events = data.get("traceEvents", [])
    # Identify device process ids (names mention TPU/device)
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {pid for pid, n in proc_names.items()
                if "TPU" in n or "tpu" in n or "Device" in n or "/device" in n}
    print("processes:", proc_names)

    tot = defaultdict(float)
    cnt = defaultdict(int)
    total_dev = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        tot[name] += dur
        cnt[name] += 1
        total_dev += dur
    print(f"\ntotal device-event time: {total_dev:.1f} ms over "
          f"{steps} steps")
    print(f"{'total ms':>9} {'n':>5}  name")
    rows = sorted(tot.items(), key=lambda kv: -kv[1])
    for name, ms in rows[:top]:
        print(f"{ms:9.2f} {cnt[name]:5d}  {name[:140]}")
    return [(ms, cnt[name], name) for name, ms in rows], total_dev


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--logdir", default="/tmp/jax_trace_r3")
    p.add_argument("--dump-hlo", default=None,
                   help="also write the compiled step's HLO text here "
                        "(trace_attrib.py joins it with the trace offline)")
    args = p.parse_args(argv)

    step, state, batches = build()
    k = jax.random.PRNGKey(1)
    if args.dump_hlo:
        txt = step.lower(state, batches[0], k).compile().as_text()
        with open(args.dump_hlo, "w") as fp:
            fp.write(txt)
        print(f"HLO dumped to {args.dump_hlo} ({len(txt)} bytes)", flush=True)
    state, m = step(state, batches[0], k)
    state, m = step(state, batches[1], k)
    jax.block_until_ready(m["loss"])

    with jax.profiler.trace(args.logdir):
        for i in range(args.steps):
            state, m = step(state, batches[i % 2], k)
        jax.block_until_ready(m["loss"])

    parse_trace(args.logdir, args.top, args.steps)


if __name__ == "__main__":
    main()
