"""Benchmark: training throughput (frames/sec/chip) on FineDiving_small.

Runs the full jitted train step (mixup + device-side augmentation +
rny002_gsf backbone + SGP-Mixer + weighted CE + displacement MSE + AdamW)
on synthetic data with the flagship training envelope (batch 8, clip_len
100, crop 224 — ref: config/FineDiving/FineDiving_small.json), on however
many local chips are present (batch scales with the mesh; throughput is
reported per chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / A100_BASELINE_FPS. The reference publishes no
throughput numbers (BASELINE.md), so A100_BASELINE_FPS is an estimate of
the reference PyTorch trainer on one A100 (batch 8 x clip 100 @ 224px,
AMP): ~1000 frames/sec. Replace with a measured number when available.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_BASELINE_FPS = 1000.0

BATCH_PER_CHIP = 8
CLIP_LEN = 100
CROP = 224
FRAME_SIZE = 256  # pre-crop frame size fed to the step (RandomCrop -> 224)
WARMUP_STEPS = 3
BENCH_STEPS = 10


def main() -> None:
    from tdeed_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from tdeed_tpu.config import TDEEDConfig
    from tdeed_tpu.models.tdeed import build_model
    from tdeed_tpu.parallel.mesh import make_mesh, shard_batch
    from tdeed_tpu.train.schedule import make_optimizer
    from tdeed_tpu.train.state import TrainState
    from tdeed_tpu.train.step import make_train_step

    n_chips = jax.local_device_count()
    cfg = TDEEDConfig(
        dataset="finediving",
        num_classes=4,
        clip_len=CLIP_LEN,
        crop_dim=CROP,
        feature_arch="rny002_gsf",
        n_layers=2,
        sgp_ks=7,
        sgp_r=4,
        radi_displacement=2,
    )
    model = build_model(cfg)

    rng = jax.random.PRNGKey(0)
    frames0 = jnp.zeros((1, CLIP_LEN, CROP, CROP, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnums=(2,))(rng, frames0, False)
    tx = make_optimizer(8e-4, warmup_steps=100, cosine_steps=10_000)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)

    def build_step(pallas_augment):
        return jax.jit(
            make_train_step(
                model,
                tx,
                crop_dim=CROP,
                num_classes_bg=cfg.num_classes_bg,
                mixup=True,
                radi_displacement=cfg.radi_displacement,
                acc_grad_iter=1,
                pallas_augment=pallas_augment,
            ),
            donate_argnums=(0,),
        )

    train_step = build_step(None)  # auto: fused Pallas augment on TPU

    b = BATCH_PER_CHIP * n_chips
    r = np.random.default_rng(0)
    batch = {
        "frame": r.integers(0, 256, (b, CLIP_LEN, FRAME_SIZE, FRAME_SIZE, 3), np.uint8),
        "label": r.integers(0, cfg.num_classes_bg, (b, CLIP_LEN)).astype(np.int32),
        "labelD": r.integers(-2, 3, (b, CLIP_LEN)).astype(np.float32),
        "frame2": r.integers(0, 256, (b, CLIP_LEN, FRAME_SIZE, FRAME_SIZE, 3), np.uint8),
        "label2": r.integers(0, cfg.num_classes_bg, (b, CLIP_LEN)).astype(np.int32),
        "labelD2": r.integers(-2, 3, (b, CLIP_LEN)).astype(np.float32),
    }
    if n_chips > 1:
        mesh = make_mesh(n_chips)
        batch = shard_batch(batch, mesh)
    else:
        batch = jax.tree.map(jnp.asarray, batch)

    step_rng = jax.random.PRNGKey(1)
    try:
        state, metrics = train_step(state, batch, step_rng)
        jax.block_until_ready(metrics["loss"])
    except Exception as e:  # toolchain-specific kernel failure: fall back
        import sys

        print(f"pallas path failed ({type(e).__name__}); falling back to "
              f"the XLA augmentation chain", file=sys.stderr)
        state = TrainState.create(
            variables["params"], variables["batch_stats"], tx
        )
        train_step = build_step(False)
    for _ in range(WARMUP_STEPS):
        state, metrics = train_step(state, batch, step_rng)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(BENCH_STEPS):
        state, metrics = train_step(state, batch, step_rng)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    fps_per_chip = b * CLIP_LEN * BENCH_STEPS / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "train_frames_per_sec_per_chip",
                "value": round(fps_per_chip, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps_per_chip / A100_BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
