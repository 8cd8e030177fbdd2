"""End-to-end CLI drive on synthetic fixtures (the /verify recipe, codified).

Drives, with tiny shapes:
  1. finediving: store mode -> load mode (train 1 epoch, val, best ckpt,
     test eval with NMS/mAP, prediction store)
  2. soccernetball challenge: fabricated best checkpoint -> label-free
     CHALLENGE inference -> per-game results_spotting.json

Run on CPU (slow compiles, ~15 min):
  PYTHONPATH=<repo> JAX_PLATFORMS=cpu python tools/drive_e2e.py
or on the TPU (PYTHONPATH must include the axon site dir).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def drive_finediving(root: str) -> None:
    from tests.fixtures import make_finediving_fixture, write_tiny_config

    from tdeed_tpu.cli.train import main

    fx = make_finediving_fixture(root, num_videos=2, num_frames=24)
    cfg_root = write_tiny_config(root, fx, store_mode="store")
    argv = ["--model", "FineDiving_tiny", "--config_root", cfg_root,
            "--data_root", fx["data_root"], "--no_wandb"]
    print("== finediving STORE ==", flush=True)
    try:
        main(argv)
    except SystemExit as e:
        assert e.code in (0, None), e.code
    write_tiny_config(root, fx, store_mode="load")
    print("== finediving LOAD (train + eval) ==", flush=True)
    main(argv)
    run_dir = os.path.join(fx["save_dir"], "FineDiving_tiny")
    assert os.path.exists(os.path.join(run_dir, "checkpoint_best")), run_dir
    assert os.path.exists(os.path.join(run_dir, "loss.json"))
    print("== finediving DRIVE OK ==", flush=True)


def drive_snb_challenge(root: str) -> None:
    import numpy as np
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from tdeed_tpu.checkpoint import CheckpointManager
    from tdeed_tpu.cli.evaluate_challenge import main
    from tdeed_tpu.config import TDEEDConfig
    from tdeed_tpu.models.tdeed import build_model

    game = "england_efl/2019-2020/2019-10-02 - Cardiff City - Queens Park Rangers"
    frame_dir = os.path.join(root, "frames")
    data_root = os.path.join(root, "data")
    save_dir = os.path.join(root, "save")
    ds_dir = os.path.join(data_root, "soccernetball")
    os.makedirs(ds_dir, exist_ok=True)

    rng = np.random.default_rng(0)
    vdir = os.path.join(frame_dir, game)
    os.makedirs(vdir, exist_ok=True)
    for i in range(30):
        Image.fromarray(
            rng.integers(0, 256, (24, 32, 3), np.uint8)
        ).save(os.path.join(vdir, f"frame{i}.jpg"))

    classes = ["PASS", "DRIVE", "HEADER", "HIGH PASS", "OUT", "CROSS",
               "THROW IN", "SHOT", "BALL PLAYER BLOCK",
               "PLAYER SUCCESSFUL TACKLE", "FREE KICK", "GOAL"]
    with open(os.path.join(ds_dir, "class.txt"), "w") as fp:
        fp.write("\n".join(classes) + "\n")
    with open(os.path.join(ds_dir, "challenge.json"), "w") as fp:
        json.dump([{"video": game, "num_frames": 30}], fp)

    cfg = {
        "frame_dir": frame_dir, "save_dir": save_dir, "store_dir": save_dir,
        "store_mode": "load", "batch_size": 2, "clip_len": 8, "crop_dim": -1,
        "dataset": "soccernetball", "radi_displacement": 1,
        "epoch_num_frames": 64, "feature_arch": "rny002_gsf",
        "learning_rate": 1e-3, "mixup": True, "modality": "rgb",
        "num_classes": 12, "num_epochs": 1, "warm_up_epochs": 1,
        "start_val_epoch": 0, "temporal_arch": "ed_sgp_mixer", "n_layers": 2,
        "sgp_ks": 3, "sgp_r": 2, "only_test": True, "criterion": "map",
        "num_workers": 2,
    }
    cfg_root = os.path.join(root, "configs")
    os.makedirs(os.path.join(cfg_root, "SoccerNetBall"), exist_ok=True)
    with open(os.path.join(cfg_root, "SoccerNetBall",
                           "SoccerNetBall_tiny.json"), "w") as fp:
        json.dump(cfg, fp)

    # fabricate a best checkpoint (random init weights)
    tc = TDEEDConfig.from_dict(cfg, model="SoccerNetBall_tiny")
    model = build_model(tc)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 24, 32, 3), jnp.float32),
        False,
    )
    mgr = CheckpointManager(os.path.join(save_dir, "SoccerNetBall_tiny"))
    from tdeed_tpu.checkpoint import save_params

    save_params(
        os.path.join(mgr.save_dir, "checkpoint_best"),
        variables["params"], variables["batch_stats"],
    )

    print("== SNB CHALLENGE inference ==", flush=True)
    main(["--model", "SoccerNetBall_tiny", "--config_root", cfg_root,
          "--data_root", data_root])
    out = os.path.join(mgr.save_dir, "preds", game, "results_spotting.json")
    assert os.path.exists(out), out
    with open(out) as fp:
        preds = json.load(fp)
    assert "predictions" in preds
    print(f"== SNB CHALLENGE DRIVE OK ({len(preds['predictions'])} preds) ==",
          flush=True)


def main():
    root1 = tempfile.mkdtemp(prefix="drive_fd_")
    drive_finediving(root1)
    root2 = tempfile.mkdtemp(prefix="drive_snb_")
    drive_snb_challenge(root2)
    print("ALL E2E DRIVES OK")


if __name__ == "__main__":
    main()
