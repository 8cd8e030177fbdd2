"""Multi-host through the REAL training CLI: 2 OS processes vs 1 process.

tests/test_multihost.py proves the multi-host building blocks compose
deadlock-free; this test drives the actual entry point the reference's
users run (ref contract: train_tdeed.py:90-315) — ``tdeed_tpu.cli.train
main(--distributed)`` — end to end (store -> load -> train -> val ->
checkpoint -> test tail) as TWO ``jax.distributed`` OS processes with one
CPU device each, and as ONE process with two devices, then asserts:

  * the per-epoch train/val loss history (loss.json) matches,
  * the best checkpoints hold identical weights,
  * the test-tail tolerance-mAPs (results_test.json) match.

The 2-process run bootstraps exactly as a generic multi-host launcher
would: JAX_COORDINATOR_ADDRESS (read natively by jax.distributed) plus
JAX_NUM_PROCESSES / JAX_PROCESS_ID forwarded by the CLI.

Tolerance design (measured, docs/DESIGN.md round 4): on the CPU backend
the two topologies compile IDENTICAL HLO except for
``outer_dimension_partitions`` — XLA:CPU's intra-op parallel task
assignment splits reduction loops by the client's threading (2 local
devices -> split 2, 1 device/process -> unsplit), changing accumulation
order at the ULP level. Probed step-by-step
(tools/probe_multihost_bitparity.py): the step-0 forward loss is
BIT-IDENTICAL (data sharding, stitching, in-step augment RNG and the
fp32 BN psums all agree exactly); the step-0 AdamW update then differs
by +-1 LR quantum wherever near-zero grads meet Adam's sign
normalization. This is a host-threading artifact of the CPU test
backend — TPU executables are not repartitioned by host thread count.

The test therefore (a) trains with learning_rate=1e-6 so a real WIRING
bug (wrong rows, wrong RNG, missed collective — all O(10%) effects)
still trips the tight tolerances while the quantum drift cannot
(drift <= steps * 2 * lr per weight, linear in fp32), and (b) pins
``dtype=float32`` for the compute path: under the production bf16
compute dtype the +-2e-6 weight quanta land on bf16 rounding boundaries
(~4e-3 relative ULP) and amplify step-function-like — MEASURED
2026-08-20: epoch-mean train loss drifted 1.77% relative at lr=1e-6,
3,500x beyond the linear bound. fp32 keeps the wiring comparison exact
where it must be exact; the bf16 step itself is parity-covered
elsewhere (tests/test_multihost.py, tests/test_train_step_oracle.py),
and the bf16-vs-topology interaction exists only on this CPU backend.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.fixtures import make_finediving_fixture, write_tiny_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env(extra):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no fake-device forcing unless asked
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO  # drops any TPU-forcing site dir
    env.update({k: str(v) for k, v in extra.items()})
    return env


def _run_cli(model, cfg_root, data_root, env_extra, timeout=1500):
    proc = subprocess.run(
        [sys.executable, "-m", "tdeed_tpu.cli.train",
         "--model", model, "--config_root", cfg_root,
         "--data_root", data_root, "--no_wandb"]
        + (["--distributed"] if "JAX_PROCESS_ID" in env_extra else []),
        env=_env(env_extra), capture_output=True, text=True, timeout=timeout,
        cwd=REPO,
    )
    return proc


@pytest.mark.slow
def test_distributed_cli_matches_single_process(tmp_path):
    root = str(tmp_path)
    fx = make_finediving_fixture(root, num_videos=2, num_frames=24, size=24)
    data_root = fx["data_root"]

    kw = dict(clip_len=8, crop_dim=16, num_epochs=2, batch_size=2,
              epoch_num_frames=64, learning_rate=1e-6, dtype="float32")
    cfg_root = write_tiny_config(root, fx, model="FineDiving_mhstore",
                                 store_mode="store", **kw)
    single_dir = os.path.join(root, "ckpt_single")
    dist_dir = os.path.join(root, "ckpt_dist")
    # the CLI nests its artifacts under <save_dir>/<model>/
    single_out = os.path.join(single_dir, "FineDiving_mhsingle")
    dist_out = os.path.join(dist_dir, "FineDiving_mhdist")
    write_tiny_config(root, fx, model="FineDiving_mhsingle",
                      store_mode="load", save_dir=single_dir, **kw)
    write_tiny_config(root, fx, model="FineDiving_mhdist",
                      store_mode="load", save_dir=dist_dir, **kw)

    # --- store pass (writes the clip plans both runs load) ---------------
    proc = _run_cli("FineDiving_mhstore", cfg_root, data_root, {},
                    timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]

    # --- 1 process, 2 devices --------------------------------------------
    proc = _run_cli(
        "FineDiving_mhsingle", cfg_root, data_root,
        {"XLA_FLAGS": "--xla_force_host_platform_device_count=2"},
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "CORRECTLY FINISHED" in proc.stdout, proc.stdout[-2000:]

    # --- 2 jax.distributed processes, 1 device each ----------------------
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tdeed_tpu.cli.train",
             "--model", "FineDiving_mhdist", "--config_root", cfg_root,
             "--data_root", data_root, "--no_wandb", "--distributed"],
            env=_env({
                "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
                "JAX_NUM_PROCESSES": 2,
                "JAX_PROCESS_ID": pid,
            }),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO,
        )
        for pid in (0, 1)
    ]
    outs, errs = [], []
    for p in procs:
        try:
            out, err = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        errs.append(err)
    assert all(p.returncode == 0 for p in procs), (
        "\n".join(e[-4000:] for e in errs)
    )
    assert "CORRECTLY FINISHED" in outs[0], outs[0][-2000:]

    # --- loss.json history parity ----------------------------------------
    hist_s = json.load(open(os.path.join(single_out, "loss.json")))
    hist_d = json.load(open(os.path.join(dist_out, "loss.json")))
    assert len(hist_s) == len(hist_d) == 2
    np.testing.assert_allclose(
        [h["train"] for h in hist_d], [h["train"] for h in hist_s],
        rtol=5e-4,
    )
    np.testing.assert_allclose(
        [h["val"] for h in hist_d], [h["val"] for h in hist_s], rtol=5e-4
    )

    # --- best-checkpoint weight parity ------------------------------------
    from tdeed_tpu.checkpoint import restore_params

    best_s = restore_params(os.path.join(single_out, "checkpoint_best"))
    best_d = restore_params(os.path.join(dist_out, "checkpoint_best"))
    leaves_s = jax_leaves(best_s["params"])
    leaves_d = jax_leaves(best_d["params"])
    assert len(leaves_s) == len(leaves_d)
    for ls, ld in zip(leaves_s, leaves_d):
        np.testing.assert_allclose(
            np.asarray(ld), np.asarray(ls), rtol=1e-3, atol=5e-5
        )

    # --- test-tail metric parity ------------------------------------------
    res_s = json.load(open(os.path.join(single_out, "results_test.json")))
    res_d = json.load(open(os.path.join(dist_out, "results_test.json")))
    assert res_s.keys() == res_d.keys()
    for k in res_s:
        assert res_d[k] == pytest.approx(res_s[k], abs=1e-3), k


def jax_leaves(tree):
    import jax

    return jax.tree.leaves(tree)
