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

    # Serving surface: standalone spotting CLI over the trained run
    from tdeed_tpu.cli.predict import main as predict_main

    out_json = os.path.join(root, "events.json")
    predict_main([
        "--model", "FineDiving_tiny", "--config_root", cfg_root,
        "--data_root", fx["data_root"],
        "--split", os.path.join(fx["data_root"], "finediving", "test.json"),
        "--out", out_json,
    ])
    with open(out_json) as fp:
        payload = json.load(fp)
    assert payload and "events" in payload[0]
    print("== PREDICT CLI DRIVE OK ==", flush=True)


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


def drive_joint_pretrain(root: str) -> None:
    """SNB + SN joint training: FC2 double head, 50/50 tagged sampling,
    per-sample CE routing (ref: model/model.py:169-172,278-306)."""
    import numpy as np
    from PIL import Image

    from tdeed_tpu.cli.train import main

    frame_dir = os.path.join(root, "frames")
    data_root = os.path.join(root, "data")
    save_dir = os.path.join(root, "save")
    store_dir = os.path.join(root, "store")

    def frames(dirpath, n):
        os.makedirs(dirpath, exist_ok=True)
        r = np.random.default_rng(0)
        for i in range(n):
            Image.fromarray(
                r.integers(0, 256, (24, 32, 3), np.uint8)
            ).save(os.path.join(dirpath, f"frame{i}.jpg"))

    # --- SNB primary ----------------------------------------------------
    snb_dir = os.path.join(data_root, "soccernetball")
    os.makedirs(snb_dir, exist_ok=True)
    snb_labels = os.path.join(root, "labels_snb")
    snb_classes = ["PASS", "DRIVE", "GOAL"]
    with open(os.path.join(snb_dir, "class.txt"), "w") as fp:
        fp.write("\n".join(snb_classes) + "\n")
    with open(os.path.join(snb_dir, "labels_path.txt"), "w") as fp:
        fp.write(snb_labels)
    for split, games in (("train", ["g1", "g2"]), ("val", ["g3"])):
        metas = []
        for g in games:
            game = f"league/2020/{g}"
            frames(os.path.join(frame_dir, game), 60)
            os.makedirs(os.path.join(snb_labels, game), exist_ok=True)
            ann = [{"gameTime": "1 - 00:01", "label": "PASS",
                    "position": "1000"}]
            with open(os.path.join(snb_labels, game, "Labels-ball.json"),
                      "w") as fp:
                json.dump({"annotations": ann}, fp)
            metas.append({"video": game, "num_frames": 60})
        with open(os.path.join(snb_dir, f"{split}.json"), "w") as fp:
            json.dump(metas, fp)

    # --- SN pretrain ------------------------------------------------------
    sn_dir = os.path.join(data_root, "soccernet")
    os.makedirs(sn_dir, exist_ok=True)
    sn_labels = os.path.join(root, "labels_sn")
    with open(os.path.join(sn_dir, "class.txt"), "w") as fp:
        fp.write("Goal\nFoul\n")
    with open(os.path.join(sn_dir, "labels_path.txt"), "w") as fp:
        fp.write(sn_labels)
    for split, games in (("train", ["m1"]), ("val", ["m2"])):
        metas = []
        for g in games:
            game = f"cup/2020/{g}"
            for half in (1, 2):
                frames(os.path.join(frame_dir, game, str(half)), 240)
            os.makedirs(os.path.join(sn_labels, game), exist_ok=True)
            ann = [
                {"gameTime": "1 - 00:02", "label": "Goal", "position": "2000"},
                {"gameTime": "1 - 00:06", "label": "Foul", "position": "6000"},
                {"gameTime": "2 - 00:02", "label": "Goal", "position": "2000"},
                {"gameTime": "2 - 00:06", "label": "Foul", "position": "6000"},
            ]
            with open(os.path.join(sn_labels, game, "Labels-v2.json"),
                      "w") as fp:
                json.dump({"annotations": ann}, fp)
            metas.extend(
                {"video": f"{game}/{half}", "num_frames": 240}
                for half in (1, 2)
            )
        with open(os.path.join(sn_dir, f"{split}.json"), "w") as fp:
            json.dump(metas, fp)

    cfg = {
        "frame_dir": frame_dir, "save_dir": save_dir, "store_dir": store_dir,
        "store_mode": "store", "batch_size": 2, "clip_len": 8, "crop_dim": -1,
        "dataset": "soccernetball", "radi_displacement": 1,
        "epoch_num_frames": 32, "feature_arch": "rny002_gsf",
        "learning_rate": 1e-3, "mixup": True, "modality": "rgb",
        "num_classes": 3, "num_epochs": 1, "warm_up_epochs": 1,
        "start_val_epoch": 99, "temporal_arch": "ed_sgp_mixer", "n_layers": 2,
        "sgp_ks": 3, "sgp_r": 2, "only_test": False, "criterion": "loss",
        "num_workers": 2,
        "pretrain": {"dataset": "soccernet", "num_classes": 2,
                     "frame_dir": frame_dir, "store_dir": store_dir + "2"},
    }
    cfg_root = os.path.join(root, "configs")
    os.makedirs(os.path.join(cfg_root, "SoccerNetBall"), exist_ok=True)
    cfg_path = os.path.join(cfg_root, "SoccerNetBall",
                            "SoccerNetBall_joint.json")
    with open(cfg_path, "w") as fp:
        json.dump(cfg, fp)
    argv = ["--model", "SoccerNetBall_joint", "--config_root", cfg_root,
            "--data_root", data_root, "--no_wandb"]
    print("== JOINT STORE ==", flush=True)
    try:
        main(argv)
    except SystemExit as e:
        assert e.code in (0, None), e.code
    cfg["store_mode"] = "load"
    with open(cfg_path, "w") as fp:
        json.dump(cfg, fp)
    print("== JOINT LOAD (double-head train) ==", flush=True)
    main(argv)
    run_dir = os.path.join(save_dir, "SoccerNetBall_joint")
    assert os.path.exists(os.path.join(run_dir, "loss.json"))
    print("== JOINT PRETRAIN DRIVE OK ==", flush=True)


def drive_challenge_training(root: str) -> None:
    """The SNB challenge-training flow: train on train_challenge /
    val_challenge split metadata (config keys train_split/val_split), then
    run label-free challenge inference from the trained best checkpoint
    (ref: evaluate_tdeed_challenge.py:29-141,
    config/SoccerNetBall/SoccerNetBall_challenge1.json)."""
    import numpy as np
    from PIL import Image

    from tdeed_tpu.cli.evaluate_challenge import main as challenge_main
    from tdeed_tpu.cli.train import main as train_main

    frame_dir = os.path.join(root, "frames")
    data_root = os.path.join(root, "data")
    save_dir = os.path.join(root, "save")
    store_dir = os.path.join(root, "store")
    snb_dir = os.path.join(data_root, "soccernetball")
    labels_root = os.path.join(root, "labels_snb")
    os.makedirs(snb_dir, exist_ok=True)

    classes = ["PASS", "DRIVE", "HEADER", "HIGH PASS", "OUT", "CROSS",
               "THROW IN", "SHOT", "BALL PLAYER BLOCK",
               "PLAYER SUCCESSFUL TACKLE", "FREE KICK", "GOAL"]
    with open(os.path.join(snb_dir, "class.txt"), "w") as fp:
        fp.write("\n".join(classes) + "\n")
    with open(os.path.join(snb_dir, "labels_path.txt"), "w") as fp:
        fp.write(labels_root)

    r = np.random.default_rng(0)

    def make_game(game, n_frames, labeled=True):
        vdir = os.path.join(frame_dir, game)
        os.makedirs(vdir, exist_ok=True)
        for i in range(n_frames):
            Image.fromarray(r.integers(0, 256, (24, 32, 3), np.uint8)).save(
                os.path.join(vdir, f"frame{i}.jpg")
            )
        if labeled:
            os.makedirs(os.path.join(labels_root, game), exist_ok=True)
            ann = [{"gameTime": "1 - 00:01", "label": "PASS",
                    "position": "1000"}]
            with open(os.path.join(labels_root, game, "Labels-ball.json"),
                      "w") as fp:
                json.dump({"annotations": ann}, fp)
        return {"video": game, "num_frames": n_frames}

    for split, games, labeled in (
        ("train_challenge", ["league/2020/c1", "league/2020/c2"], True),
        ("val_challenge", ["league/2020/c3"], True),
        ("challenge", ["league/2020/c4"], False),
    ):
        metas = [make_game(g, 60, labeled) for g in games]
        with open(os.path.join(snb_dir, f"{split}.json"), "w") as fp:
            json.dump(metas, fp)

    cfg = {
        "frame_dir": frame_dir, "save_dir": save_dir, "store_dir": store_dir,
        "store_mode": "store", "batch_size": 2, "clip_len": 8, "crop_dim": -1,
        "dataset": "soccernetball", "radi_displacement": 1,
        "epoch_num_frames": 32, "feature_arch": "rny002_gsf",
        "learning_rate": 1e-3, "mixup": True, "modality": "rgb",
        "num_classes": 12, "num_epochs": 1, "warm_up_epochs": 1,
        "start_val_epoch": 99, "temporal_arch": "ed_sgp_mixer", "n_layers": 2,
        "sgp_ks": 3, "sgp_r": 2, "only_test": False, "criterion": "loss",
        "num_workers": 2,
        "train_split": "train_challenge", "val_split": "val_challenge",
    }
    cfg_root = os.path.join(root, "configs")
    os.makedirs(os.path.join(cfg_root, "SoccerNetBall"), exist_ok=True)
    cfg_path = os.path.join(cfg_root, "SoccerNetBall",
                            "SoccerNetBall_chtrain.json")
    with open(cfg_path, "w") as fp:
        json.dump(cfg, fp)

    argv = ["--model", "SoccerNetBall_chtrain", "--config_root", cfg_root,
            "--data_root", data_root, "--no_wandb"]
    print("== CHALLENGE-TRAIN STORE ==", flush=True)
    try:
        train_main(argv)
    except SystemExit as e:
        assert e.code in (0, None), e.code
    cfg["store_mode"] = "load"
    with open(cfg_path, "w") as fp:
        json.dump(cfg, fp)
    print("== CHALLENGE-TRAIN LOAD (train on challenge splits) ==", flush=True)
    train_main(argv)
    run_dir = os.path.join(save_dir, "SoccerNetBall_chtrain")
    assert os.path.exists(os.path.join(run_dir, "checkpoint_best")), run_dir

    print("== CHALLENGE inference from trained ckpt ==", flush=True)
    challenge_main(["--model", "SoccerNetBall_chtrain",
                    "--config_root", cfg_root, "--data_root", data_root])
    out = os.path.join(run_dir, "preds", "league/2020/c4",
                       "results_spotting.json")
    assert os.path.exists(out), out
    print("== CHALLENGE-TRAINING DRIVE OK ==", flush=True)


def main():
    root1 = tempfile.mkdtemp(prefix="drive_fd_")
    drive_finediving(root1)
    root2 = tempfile.mkdtemp(prefix="drive_snb_")
    drive_snb_challenge(root2)
    root3 = tempfile.mkdtemp(prefix="drive_joint_")
    drive_joint_pretrain(root3)
    root4 = tempfile.mkdtemp(prefix="drive_chtrain_")
    drive_challenge_training(root4)
    print("ALL E2E DRIVES OK")


if __name__ == "__main__":
    main()
