"""Multi-process DP harness: the real train/eval building blocks on a tiny
model, runnable as 1 process with 2 devices OR 2 jax.distributed processes
with 1 device each (tests/test_multihost.py launches both and asserts
identical results).

Exercises exactly the pieces the training CLI composes for multi-host runs
(cli/train.py): BatchLoader global-row sharding, form_global_batch, the
real make_train_step/make_val_step/make_predict_step over a global mesh,
checkpoint saves through host_replica, and the process-local (main-only)
eval predict path that replaces collective eval — the round-2 deadlock
shape.

Env: TDEED_MH_MODE=single|dist, TDEED_MH_NPROC, TDEED_MH_PID,
TDEED_MH_PORT, TDEED_MH_OUT (json path), TDEED_MH_CKPT (dir).
"""

import json
import os
import sys


def main():
    mode = os.environ["TDEED_MH_MODE"]
    out_path = os.environ["TDEED_MH_OUT"]
    ckpt_dir = os.environ["TDEED_MH_CKPT"]

    import jax

    if mode == "dist":
        nproc = int(os.environ["TDEED_MH_NPROC"])
        pid = int(os.environ["TDEED_MH_PID"])
        port = os.environ["TDEED_MH_PORT"]
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc,
            process_id=pid,
        )
    else:
        jax.config.update("jax_num_cpu_devices", 2)

    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from tdeed_tpu.checkpoint import CheckpointManager
    from tdeed_tpu.data.loader import BatchLoader, device_prefetch
    from tdeed_tpu.parallel.mesh import (
        form_global_batch,
        host_replica,
        make_mesh,
        shard_batch,
    )
    from tdeed_tpu.train.schedule import make_optimizer
    from tdeed_tpu.train.state import TrainState
    from tdeed_tpu.train.step import (
        make_predict_step,
        make_train_step,
        make_val_step,
    )

    assert len(jax.devices()) == 2, jax.devices()
    multihost = jax.process_count() > 1
    is_main = jax.process_index() == 0
    mesh = make_mesh(devices=jax.devices())

    T, HW, C_BG = 4, 8, 3

    class TinyNet(nn.Module):
        """Minimal TDEED-interface model: conv + BN (stat threading) +
        per-frame logits head."""

        @nn.compact
        def __call__(self, x, train: bool = False):
            b, t, h, w, c = x.shape
            y = x.reshape(b * t, h, w, c)
            y = nn.Conv(8, (3, 3), name="conv")(y)
            y = nn.BatchNorm(use_running_average=not train, name="bn")(y)
            y = nn.relu(y).mean(axis=(1, 2)).reshape(b, t, 8)
            return {"logits": nn.Dense(C_BG, name="head")(y)}

    model = TinyNet()
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), jnp.zeros((1, T, HW, HW, 3), jnp.float32), False
    )

    class StubSampler:
        """Deterministic per-rng sample (stands in for ClipSampler's decode)."""

        def sample(self, rng):
            r = np.random.default_rng(rng.randint(0, 2**31 - 1))
            return {
                "frame": r.integers(0, 256, (T, HW, HW, 3)).astype(np.uint8),
                "label": r.integers(0, C_BG, (T,)).astype(np.int32),
            }

    global_batch, nprocs = 4, jax.process_count()
    local_batch = global_batch // nprocs
    loader = BatchLoader(
        StubSampler(), local_batch, dataset_len=16, num_workers=2, seed=1,
        global_batch_size=global_batch,
        shard_offset=jax.process_index() * local_batch,
    )
    val_loader = BatchLoader(
        StubSampler(), local_batch, dataset_len=8, num_workers=2, seed=77,
        global_batch_size=global_batch,
        shard_offset=jax.process_index() * local_batch,
    )

    tx = make_optimizer(1e-3, warmup_steps=2, cosine_steps=6)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    train_step = jax.jit(
        make_train_step(
            model, tx, crop_dim=None, num_classes_bg=C_BG, mixup=False,
            radi_displacement=0, pallas_augment=False,
        ),
        donate_argnums=(0,),
    )
    val_step = jax.jit(
        make_val_step(
            model, crop_dim=None, num_classes_bg=C_BG, radi_displacement=0
        )
    )
    predict_step = jax.jit(
        make_predict_step(model, crop_dim=None, radi_displacement=0),
        static_argnums=(3,),
    )

    def place(batch):
        if multihost:
            return form_global_batch(batch, mesh)
        return shard_batch(batch, mesh)

    rng = jax.random.PRNGKey(9)
    train_losses, val_losses = [], []
    for epoch in range(2):
        for batch in device_prefetch(map(place, loader.epoch(epoch))):
            state, metrics = train_step(state, batch, rng)
            train_losses.append(float(host_replica(metrics["loss"])))
        ep = []
        for batch in device_prefetch(map(place, val_loader.epoch(epoch))):
            aux = val_step(state, batch)
            ep.append(float(host_replica(aux["loss"])))
        val_losses.append(float(np.mean(ep)))

    # Checkpoint through host_replica (main only, like cli/train.py).
    ckpt = CheckpointManager(ckpt_dir)
    if is_main:
        ckpt.save_epoch(
            state, 1, {"train": train_losses[-1], "val": val_losses[-1]},
            True, val_losses[-1],
        )

    # EVERY process restores (the CLI's --resume path): per-process orbax
    # scoping must let a lone process read without a global barrier. Sync
    # first so non-main doesn't race the write.
    if multihost:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("harness:ckpt-written")
    restored = ckpt.restore_best()
    assert "params" in restored and "conv" in restored["params"]

    # Main-only PROCESS-LOCAL eval: the round-2 deadlock shape was predict
    # on globally-replicated params from process 0 alone. Pull the local
    # replica and run a local program; other processes do not participate.
    eval_stat = None
    if is_main:
        p, bs = jax.device_put(
            host_replica((state.params, state.batch_stats))
        )
        r = np.random.default_rng(123)
        frames = r.integers(0, 256, (2, T, HW, HW, 3)).astype(np.uint8)
        _, probs = predict_step(p, bs, jnp.asarray(frames), False)
        eval_stat = np.asarray(probs, np.float64)

        head = host_replica(state.params)["head"]["kernel"]
        json.dump(
            {
                "train_losses": train_losses,
                "val_losses": val_losses,
                "eval_probs": eval_stat.tolist(),
                "head_kernel": np.asarray(head, np.float64).tolist(),
            },
            open(out_path, "w"),
        )
    if multihost:
        from jax.experimental import multihost_utils

        # mirror cli/train.py's final sync: all processes exit together
        multihost_utils.sync_global_devices("harness:final")
    print(f"harness done (process {jax.process_index()})")


if __name__ == "__main__":
    main()
    sys.exit(0)
