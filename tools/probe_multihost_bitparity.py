"""Bit-parity probe: 1-process-2-device vs 2-process jax.distributed.

Runs ONE real train step (full tiny TDEED: mixup, crop, photometric,
rny002_gsf, bf16 compute) in both topologies over the same global batch
and identical init, then reports:

  * the step-0 loss bit pattern (must be identical — it covers the loader
    row split, form_global_batch stitching, in-step augment RNG and the
    fp32 BN psums over the global batch),
  * per-leaf digests of the post-step params/batch_stats and the
    magnitude of any differences.

Round-4 measured result (docs/DESIGN.md "Round 4: the REAL CLI as 2 OS
processes"): loss bit-identical; 200/473 leaves differ by exactly ±1-2
AdamW LR quanta. Root cause is NOT a wiring defect: the optimized HLO of
both topologies is identical except XLA:CPU ParallelTaskAssignment's
``outer_dimension_partitions`` (intra-op reduction splitting keyed to the
client's threading), which changes gradient accumulation order at ULP
level. TPU executables are not repartitioned by host thread count, so
real pods do not see this. tests/test_multihost_cli.py's tolerance design
rests on this probe.

Run (drives both topologies, ~10 min cold on one CPU core):
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python \
        tools/probe_multihost_bitparity.py
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker():
    mode = os.environ["MH_MODE"]
    out_path = os.environ["MH_OUT"]
    import jax

    if mode == "dist":
        jax.distributed.initialize(
            coordinator_address="localhost:" + os.environ["MH_PORT"],
            num_processes=2,
            process_id=int(os.environ["MH_PID"]),
        )
        from tdeed_tpu.parallel.mesh import startup_barrier

        startup_barrier("probe")
    else:
        jax.config.update("jax_num_cpu_devices", 2)

    import jax.numpy as jnp

    from tdeed_tpu.config import TDEEDConfig
    from tdeed_tpu.models.tdeed import build_model
    from tdeed_tpu.parallel.mesh import (
        form_global_batch,
        host_replica,
        make_mesh,
        shard_batch,
    )
    from tdeed_tpu.train.schedule import make_optimizer
    from tdeed_tpu.train.state import TrainState
    from tdeed_tpu.train.step import make_train_step
    from tdeed_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    cfg = TDEEDConfig(model="probe", dataset="finediving", num_classes=4,
                      feature_arch="rny002_gsf", clip_len=8, crop_dim=16,
                      batch_size=2, n_layers=1)
    model = build_model(cfg)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 16, 16, 3), jnp.float32),
        False)
    tx = make_optimizer(1e-3, warmup_steps=4, cosine_steps=8)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    mesh = make_mesh(devices=jax.devices())
    step = jax.jit(make_train_step(model, tx, crop_dim=16, num_classes_bg=5,
                                   mixup=True, radi_displacement=1,
                                   pallas_augment=False))

    r = np.random.default_rng(5)
    gb = {
        "frame": r.integers(0, 256, (2, 8, 24, 24, 3), np.uint8),
        "label": r.integers(0, 5, (2, 8)).astype(np.int32),
        "labelD": r.integers(-2, 3, (2, 8)).astype(np.float32),
        "frame2": r.integers(0, 256, (2, 8, 24, 24, 3), np.uint8),
        "label2": r.integers(0, 5, (2, 8)).astype(np.int32),
        "labelD2": r.integers(-2, 3, (2, 8)).astype(np.float32),
    }
    if mode == "dist":
        pid = jax.process_index()
        batch = form_global_batch(
            {k: v[pid:pid + 1] for k, v in gb.items()}, mesh)
    else:
        batch = shard_batch(gb, mesh)
    state, metrics = step(state, batch, jax.random.PRNGKey(7))

    params, stats = host_replica((state.params, state.batch_stats))
    flat = (jax.tree_util.tree_flatten_with_path(params)[0]
            + jax.tree_util.tree_flatten_with_path(stats)[0])
    arrs = {jax.tree_util.keystr(p): np.asarray(l) for p, l in flat}
    if mode != "dist" or jax.process_index() == 0:
        np.savez(out_path, **arrs)
        with open(out_path + ".loss", "w") as f:
            loss32 = np.float32(float(metrics["loss"]))
            f.write(json.dumps({
                "loss": float(loss32),
                "bits": int(loss32.view(np.uint32)),
            }))
    print("probe done:", mode)


def drive():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    me = os.path.abspath(__file__)

    def run(extra):
        e = dict(env)
        e.update(extra)
        return subprocess.Popen([sys.executable, me, "--worker"], env=e)

    run({"MH_MODE": "single", "MH_OUT": "/tmp/bitp_single.npz"}).wait()
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    ps = [run({"MH_MODE": "dist", "MH_PORT": port, "MH_PID": str(i),
               "MH_OUT": f"/tmp/bitp_dist{i}.npz"}) for i in (0, 1)]
    for p in ps:
        assert p.wait() == 0

    ls = json.load(open("/tmp/bitp_single.npz.loss"))
    ld = json.load(open("/tmp/bitp_dist0.npz.loss"))
    s = np.load("/tmp/bitp_single.npz")
    d = np.load("/tmp/bitp_dist0.npz")
    ndiff, worst = 0, 0.0
    for k in s.files:
        a, b = s[k].astype(np.float64), d[k].astype(np.float64)
        if not np.array_equal(a, b):
            ndiff += 1
            worst = max(worst, float(np.abs(a - b).max()))
    out = {
        "loss_bits_equal": ls["bits"] == ld["bits"],
        "loss_single": ls["loss"],
        "loss_dist": ld["loss"],
        "leaves_total": len(s.files),
        "leaves_differing": ndiff,
        "max_abs_param_diff": worst,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        drive()
