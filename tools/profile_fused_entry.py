"""A/B: plain vs fused-entry (custom-VJP stem/s1_b1/s2_b1) full train step.

One process = one TPU claim; both variants timed in here with the honest
threaded-state methodology (state chained through steps, rng varied —
docs/DESIGN.md dispatch-dedup gotchas).
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdeed_tpu.utils.profiling import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from tdeed_tpu.config import TDEEDConfig  # noqa: E402
from tdeed_tpu.models.tdeed import build_model  # noqa: E402
from tdeed_tpu.train.schedule import make_optimizer  # noqa: E402
from tdeed_tpu.train.state import TrainState  # noqa: E402
from tdeed_tpu.train.step import make_train_step  # noqa: E402

B, T, S = 8, 100, 224


def main():
    cfg = TDEEDConfig(
        dataset="finediving", num_classes=4, clip_len=T, crop_dim=S,
        feature_arch="rny002_gsf", n_layers=2, sgp_ks=7, sgp_r=4,
        radi_displacement=2,
    )
    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)
    frames_u8 = jnp.asarray(r.integers(0, 256, (B, T, 256, 256, 3), np.uint8))
    batch = {
        "frame": frames_u8,
        "label": jnp.asarray(r.integers(0, 5, (B, T)).astype(np.int32)),
        "labelD": jnp.asarray(r.integers(-2, 3, (B, T)).astype(np.float32)),
        "frame2": frames_u8,
        "label2": jnp.asarray(r.integers(0, 5, (B, T)).astype(np.int32)),
        "labelD2": jnp.asarray(r.integers(-2, 3, (B, T)).astype(np.float32)),
    }
    tx = make_optimizer(8e-4, 100, 10_000)

    def bench_threaded(step, st, n=20):
        ks = [jax.random.fold_in(jax.random.PRNGKey(2), i) for i in range(n)]
        st, m = step(st, batch, ks[0])
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for i in range(1, n):
            st, m = step(st, batch, ks[i])
        jax.block_until_ready(m["loss"])
        return (time.perf_counter() - t0) / (n - 1), float(m["loss"])

    results = {}
    # (name, fuse_entry, fuse_shift) — the Pallas P2 variants were pruned
    # after measuring NEGATIVE (docs/DESIGN.md round-4 A/B table); what
    # remains A/Bs the jnp custom-VJP restructure and photometric gating.
    variants = [
        ("plain", False, False),
        ("photo-gated", False, False),
        ("fused-jnp", True, False),
        ("fused-shift-jnp", False, True),
        ("all-jnp", True, True),
    ]
    for name, fuse, fuse_shift in variants:
        if name.endswith("photo-gated") or name.endswith("+photo"):
            os.environ["PHOTO_GATED"] = "1"
        else:
            # PHOTO_GATED now DEFAULTS to on; the non-photo variants must
            # force it OFF (popping would silently measure gated-vs-gated
            # and detach 'plain' from the recorded baselines).
            os.environ["PHOTO_GATED"] = "0"
        model = build_model(
            dataclasses.replace(cfg, fuse_entry=fuse, fuse_shift=fuse_shift)
        )
        variables = jax.jit(model.init, static_argnums=(2,))(
            rng, jnp.zeros((1, T, S, S, 3), jnp.float32), False
        )
        state = TrainState.create(variables["params"], variables["batch_stats"], tx)
        step = jax.jit(
            make_train_step(
                model, tx, crop_dim=S, num_classes_bg=5, mixup=True,
                radi_displacement=2, acc_grad_iter=1,
            ),
        )
        try:
            sec, last_loss = bench_threaded(step, state)
        except Exception as e:
            print(f"[{name}] FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        results[name] = sec
        print(f"train step [{name}]: {sec*1e3:8.2f} ms  "
              f"{B*T/sec:9.0f} frames/s  loss@20={last_loss:.4f}", flush=True)

    if "plain" in results:
        for name in ("photo-gated", "fused-jnp", "fused-shift-jnp",
                     "all-jnp"):
            if name in results:
                d = (results["plain"] - results[name]) * 1e3
                print(f"delta[{name}]: {d:+.2f} ms "
                      f"({100*d/(results['plain']*1e3):+.1f}%)", flush=True)
    return results


if __name__ == "__main__":
    main()
