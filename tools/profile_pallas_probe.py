"""Microbenchmarks for the planned fused entry-block backward Pallas pass.

The early activations live batch-minor ({0,3,2,1}: physical H,W,C,N — see
/tmp/step_hlo.txt probe), so the kernel will see (H, W, C, N) row-major
blocks with N on the 128-lane dim. Open questions this probe answers on
real hardware before the kernel is written:

  A. stream  — HBM rate of a pure pass-through over (1,56,C,800) blocks
               (pipelined DMA efficiency at N=800 -> 896-padded lanes).
  B. perpix  — added cost of a per-pixel (C,C)@(C,800) MXU matmul loop
               (the conv1-dx shape: K=C=24 tiny, N=800 wide).
  C. stacked — same work with 2 pixels stacked into a (48,48) block-diag
               matmul (denser MXU tiles, half the loop trips).
  D. outerp  — per-pixel (24,800)@(800,24)^T outer-product accumulation
               (the conv1-dW pattern: K=800 contraction, tiny M/N).

All variants include the pass-through write so `delta vs stream` isolates
the matmul cost; timing is dependency-chained (x -> kernel -> x), per the
dispatch-dedup rules (docs/DESIGN.md).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdeed_tpu.utils.profiling import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

INTERPRET = os.environ.get("PROBE_INTERPRET", "") == "1"
if INTERPRET:
    H, W, C, N = 8, 8, 24, 128
else:
    H, W, C, N = 112, 112, 24, 800
HALF = W // 2


def _time_chain(fn, x, iters=30):
    x = fn(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters


def _trace_chain(name, fn, x, iters=5):
    """Ground truth via device trace: per-iteration mean of the top device op."""
    import glob
    import gzip
    import json
    from collections import defaultdict

    logdir = f"/tmp/pallas_probe_trace/{name}"
    x = fn(x)
    jax.block_until_ready(x)
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            x = fn(x)
        jax.block_until_ready(x)
    traces = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                       recursive=True)
    if not traces:
        print(f"  [{name}] no trace produced")
        return
    with gzip.open(max(traces, key=os.path.getmtime), "rt") as fp:
        data = json.load(fp)
    events = data.get("traceEvents", [])
    proc = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in proc.items()
           if "TPU" in n or "tpu" in n or "Device" in n or "/device" in n}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and (not dev or e.get("pid") in dev):
            tot[e.get("name", "?")] += e.get("dur", 0) / 1e3
            cnt[e.get("name", "?")] += 1
    for nm, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:4]:
        print(f"  [{name}] {ms/iters:8.3f} ms/iter x{cnt[nm]//iters}  {nm[:80]}",
              flush=True)


def stream_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * jnp.bfloat16(1.03125)


def perpix_kernel(w_ref, x_ref, o_ref, *, n_rows):
    w = w_ref[...]

    def body(i, _):
        s = x_ref[0, i]  # (C, N)
        o_ref[0, i] = jax.lax.dot(
            w, s, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        return 0

    jax.lax.fori_loop(0, n_rows, body, 0)


def outerp_kernel(x_ref, o_ref, acc_ref, *, n_rows):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(i, acc):
        s = x_ref[0, i]  # (C, N)
        o_ref[0, i] = s * jnp.bfloat16(1.03125)
        return acc + jax.lax.dot_general(
            s, s, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc_ref[...] += jax.lax.fori_loop(
        0, n_rows, body, jnp.zeros_like(acc_ref)
    )


def run(name, kernel, shape, out_shapes=None, grid=None, extra_in=None,
        block=None, traffic=None):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(shape), jnp.bfloat16
    )
    n_rows = shape[1] // grid[1]
    blk = (1, n_rows) + shape[2:] if block is None else block
    in_specs = []
    args = []
    if extra_in is not None:
        in_specs.append(pl.BlockSpec(extra_in.shape, lambda h, j: (0,) * extra_in.ndim))
        args.append(extra_in)
    in_specs.append(pl.BlockSpec(blk, lambda h, j: (h, j) + (0,) * (len(blk) - 2)))

    outs = [jax.ShapeDtypeStruct(shape, jnp.bfloat16)]
    out_specs = [pl.BlockSpec(blk, lambda h, j: (h, j) + (0,) * (len(blk) - 2))]
    if out_shapes:
        for s, d in out_shapes:
            outs.append(jax.ShapeDtypeStruct(s, d))
            out_specs.append(pl.BlockSpec(s, lambda h, j: (0,) * len(s)))

    f = pl.pallas_call(
        functools.partial(kernel, n_rows=n_rows) if "n_rows" in kernel.__code__.co_varnames else kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs[0] if len(outs) == 1 else out_specs,
        out_shape=outs[0] if len(outs) == 1 else outs,
        interpret=INTERPRET,
    )

    if len(outs) == 1:
        fn = jax.jit(lambda v: f(*args, v))
    else:
        fn = jax.jit(lambda v: f(*args, v)[0])
    sec = _time_chain(fn, x)
    gb = (traffic or 2 * x.size * 2) / 1e9
    print(f"{name:10s} {sec*1e3:7.3f} ms   {gb/sec:6.0f} GB/s", flush=True)
    if not INTERPRET:
        _trace_chain(name, fn, x)
    return sec


def main():
    print(f"devices: {jax.devices()}", flush=True)
    base = run("stream", stream_kernel, (H, W, C, N), grid=(H, 2))

    w24 = jnp.asarray(np.random.default_rng(1).standard_normal((C, C)) / np.sqrt(C), jnp.bfloat16)
    t = run("perpix", perpix_kernel, (H, W, C, N), grid=(H, 2), extra_in=w24)
    print(f"  perpix matmul delta: {(t-base)*1e3:+.3f} ms", flush=True)

    w48 = jnp.asarray(np.random.default_rng(2).standard_normal((48, 48)) / np.sqrt(48), jnp.bfloat16)
    t = run("stacked2", perpix_kernel, (H, HALF, 2 * C, N), grid=(H, 2), extra_in=w48)
    print(f"  stacked2 matmul delta: {(t-base)*1e3:+.3f} ms", flush=True)

    t = run("outerp", outerp_kernel, (H, W, C, N), grid=(H, 2),
            out_shapes=[((C, C), jnp.float32)])
    print(f"  outerp matmul delta: {(t-base)*1e3:+.3f} ms", flush=True)


if __name__ == "__main__":
    main()
