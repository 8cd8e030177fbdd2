"""Dump the compiled train step's HLO and audit early-stage tensor layouts.

Question under test (round-3 item: stem+s1+s2 at ~2x HBM roofline): does
XLA:TPU lane-pad the small-channel early activations (C=32/24/56 vs the
128-lane registers), inflating HBM traffic — or are layouts packed and the
gap lives elsewhere (e.g. extra materializations)?

Prints: memory analysis, the distinct layouts of every >=64MB buffer, and
all fusion shapes mentioning the early spatial dims.
"""

from __future__ import annotations

import collections
import os
import re
import sys

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


def main():
    cfg = TDEEDConfig(
        dataset="finediving", num_classes=4, clip_len=T, crop_dim=S,
        feature_arch="rny002_gsf", n_layers=2, sgp_ks=7, sgp_r=4,
        radi_displacement=2,
        fuse_entry=os.environ.get("FUSE_ENTRY", "") == "1",
        fuse_shift=os.environ.get("FUSE_SHIFT", "") == "1",
    )
    model = build_model(cfg)
    r = np.random.default_rng(0)
    batch = {
        "frame": jnp.asarray(r.integers(0, 256, (B, T, 256, 256, 3), np.uint8)),
        "label": jnp.asarray(r.integers(0, 5, (B, T)).astype(np.int32)),
        "labelD": jnp.asarray(r.integers(-2, 3, (B, T)).astype(np.float32)),
        "frame2": jnp.asarray(r.integers(0, 256, (B, T, 256, 256, 3), np.uint8)),
        "label2": jnp.asarray(r.integers(0, 5, (B, T)).astype(np.int32)),
        "labelD2": jnp.asarray(r.integers(-2, 3, (B, T)).astype(np.float32)),
    }
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, T, S, S, 3), jnp.float32), False
    )
    tx = make_optimizer(8e-4, 100, 10_000)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step = jax.jit(make_train_step(
        model, tx, crop_dim=S, num_classes_bg=5, mixup=True,
        radi_displacement=2,
    ), donate_argnums=(0,))
    compiled = step.lower(state, batch, jax.random.PRNGKey(1)).compile()

    try:
        ma = compiled.memory_analysis()
        print("memory:", ma)
    except Exception as e:
        print("memory_analysis unavailable:", e)

    txt = compiled.as_text()
    print(f"HLO text: {len(txt) / 1e6:.1f} MB")
    with open("/tmp/step_hlo.txt", "w") as fp:
        fp.write(txt)

    # All tensor shapes with layout annotations, bucketed by spatial size.
    pat = re.compile(r"(bf16|f32|u8|s8)\[([0-9,]+)\]({[^}]*})?")
    sizes = collections.Counter()
    layouts = collections.defaultdict(collections.Counter)
    for m in pat.finditer(txt):
        dt, dims, lay = m.group(1), m.group(2), m.group(3) or ""
        shape = tuple(int(d) for d in dims.split(","))
        if len(shape) < 3:
            continue
        n = np.prod(shape) * (2 if dt == "bf16" else 4 if dt == "f32" else 1)
        if n < 32e6:
            continue
        key = f"{dt}[{dims}]"
        sizes[key] += 1
        if lay:
            layouts[key][lay] += 1
    print("\n== big (>=32MB logical) tensor shapes in the HLO ==")
    for key, cnt in sizes.most_common(40):
        print(f"  {cnt:5d}x {key}")
        for lay, c in layouts[key].most_common(3):
            print(f"           {c:5d}x layout {lay[:120]}")


if __name__ == "__main__":
    main()
