"""Learning-dynamics check: overfit one fixed batch to (near-)zero loss.

SURVEY.md §7 build-plan step 3: the single-device train step must drive a
tiny synthetic problem to ~zero loss — validating the full gradient path
(augmentation off-switch via fixed rng would hide bugs, so augmentation
stays ON; the loss floor is therefore nonzero but must drop hard).

Usage: python tools/overfit_check.py [--steps 60] [--target 0.5]
"""

from __future__ import annotations

import argparse
import os
import sys

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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--target", type=float, default=1.0)
    p.add_argument("--clip_len", type=int, default=16)
    p.add_argument("--crop", type=int, default=64)
    args = p.parse_args(argv)

    T, S = args.clip_len, args.crop
    cfg = TDEEDConfig(
        dataset="finediving", num_classes=4, clip_len=T, crop_dim=S,
        feature_arch="rny002_gsf", n_layers=2, sgp_ks=3, sgp_r=2,
        radi_displacement=1,
    )
    model = build_model(cfg)
    r = np.random.default_rng(0)
    B = 4
    batch = {
        "frame": jnp.asarray(r.integers(0, 256, (B, T, S, S, 3), np.uint8)),
        "label": jnp.asarray(r.integers(0, 5, (B, T)).astype(np.int32)),
        "labelD": jnp.asarray(r.integers(-1, 2, (B, T)).astype(np.float32)),
    }
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, T, S, S, 3), jnp.float32), False
    )
    tx = make_optimizer(2e-3, warmup_steps=5, cosine_steps=10 * args.steps)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    # mixup off: a fixed batch must be memorizable exactly
    step = jax.jit(make_train_step(
        model, tx, crop_dim=S, num_classes_bg=5, mixup=False,
        radi_displacement=1, acc_grad_iter=1,
    ))

    rng = jax.random.PRNGKey(7)
    first = None
    for i in range(args.steps):
        state, m = step(state, batch, rng)
        if i == 0:
            first = float(m["loss"])
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:3d}: loss {float(m['loss']):.4f}", flush=True)
    last = float(m["loss"])
    print(f"first {first:.4f} -> last {last:.4f}")
    assert last < args.target and last < first * 0.25, (
        f"did not overfit: {first:.4f} -> {last:.4f}"
    )
    print("OVERFIT CHECK PASSED")


if __name__ == "__main__":
    main()
