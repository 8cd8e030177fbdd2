"""Profiling hooks: jax.profiler traces + per-step wall-clock timers.

The reference's only observability is epoch wall-clock prints
(ref: train_tdeed.py:165-213). Here: (a) ``trace(logdir)`` wraps a region in
a jax.profiler trace viewable in TensorBoard/Perfetto, (b) ``StepTimer``
aggregates per-step latencies with jitter stats, (c) ``annotate`` names a
region inside a trace (TraceAnnotation).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace of the enclosed region.

    (jax 0.9 start_trace takes no tracer-level kwargs — passing one raised
    TypeError and made every capture dead code; review finding.)"""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a device trace."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timer with percentile summary.

    Use ``with timer.step(): run()`` around each training step; the result
    must be blocked on inside the region for honest numbers.
    """

    def __init__(self):
        self.samples: List[float] = []

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self.samples.append(time.perf_counter() - t0)

    def summary(self, skip_warmup: int = 2) -> Dict[str, float]:
        s = sorted(self.samples[skip_warmup:])
        if not s:
            # no measured steps: report emptiness, never a fake 0.0s step
            return {"steps": 0, "mean_s": float("nan"), "p50_s": float("nan"),
                    "p90_s": float("nan"), "min_s": float("nan"),
                    "max_s": float("nan")}
        n = len(s)
        return {
            "steps": n,
            "mean_s": sum(s) / n,
            "p50_s": s[n // 2],
            "p90_s": s[int(n * 0.9)],
            "min_s": s[0],
            "max_s": s[-1],
        }


def time_fn(fn, *args, warmup: int = 2, iters: int = 10, **kwargs) -> float:
    """Mean seconds/call of a jitted fn (blocks on the result).

    WARNING (axon runtime): bit-identical dispatches are deduplicated and
    even independent varying dispatches can measure wrong — the caller
    must make fn's inputs a dependency chain (consume the previous output)
    or the numbers are untrustworthy; see docs/DESIGN.md measurement
    gotchas and tools/profile_roofline.py for the honest pattern."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def enable_compilation_cache(path: str = None) -> None:
    """Persistent XLA compilation cache: first compile of each program is
    slow (remote-compile tunnels especially); subsequent processes reuse it.
    """
    import os as _os

    if path is None:
        path = _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__)))),
            ".jax_cache",
        )
    _os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
