"""File-tree SoccerNet evaluators + the SN val-mAP inference path
(ref behaviours: util/eval.py:422-589, train_tdeed.py:271-296)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from tdeed_tpu.metrics.soccernet import (
    SNB_EVENTS,
    SNB_GAMES,
    evaluate_games,
    evaluate_snb,
    val_map_sn,
)


def _write_labels(root, game, label_file, anns):
    os.makedirs(os.path.join(root, game), exist_ok=True)
    with open(os.path.join(root, game, label_file), "w") as fp:
        json.dump({"annotations": anns}, fp)


def _write_preds(root, game, preds):
    os.makedirs(os.path.join(root, game), exist_ok=True)
    with open(os.path.join(root, game, "results_spotting.json"), "w") as fp:
        json.dump({"UrlLocal": game, "predictions": preds}, fp)


def test_evaluate_snb_perfect_predictions(tmp_path):
    labels_root = str(tmp_path / "labels")
    preds_root = str(tmp_path / "preds")
    for game in SNB_GAMES["test"]:
        anns = [
            {"gameTime": "1 - 00:10", "label": "PASS", "position": "10000"},
            {"gameTime": "1 - 00:30", "label": "GOAL", "position": "30000"},
        ]
        _write_labels(labels_root, game, "Labels-ball.json", anns)
        _write_preds(preds_root, game, [
            {"gameTime": "1 - 00:10", "label": "PASS", "position": 10000,
             "confidence": 0.9, "half": 1},
            {"gameTime": "1 - 00:30", "label": "GOAL", "position": 30000,
             "confidence": 0.8, "half": 1},
        ])
    res = evaluate_snb(labels_root, preds_root, "test")
    # perfect predictions on the 2 annotated classes; 10 empty classes
    # contribute AP 0 to the 12-class mean
    assert res["a_mAP"] == pytest.approx(2 / 12)


def test_evaluate_games_both_halves(tmp_path):
    labels_root = str(tmp_path / "labels")
    preds_root = str(tmp_path / "preds")
    game = "cup/2021/final"
    events = {"X": 0, "Y": 1}
    anns = [
        {"gameTime": "1 - 00:05", "label": "X", "position": "5000"},
        {"gameTime": "2 - 00:05", "label": "Y", "position": "5000"},
    ]
    _write_labels(labels_root, game, "Labels-v2.json", anns)
    _write_preds(preds_root, game, [
        {"gameTime": "1 - 00:05", "label": "X", "position": 5000,
         "confidence": 0.9, "half": 1},
        {"gameTime": "2 - 00:05", "label": "Y", "position": 5000,
         "confidence": 0.9, "half": 2},
    ])
    res = evaluate_games(
        labels_root, preds_root, [game], "Labels-v2.json", num_classes=2,
        event_dict=events, metric="at1", framerate=25, halves=(1, 2),
    )
    assert res["a_mAP"] == pytest.approx(1.0)


def test_val_map_sn_with_oracle(tmp_path):
    """SN val-mAP over sliding-window inference: an oracle emitting the
    labels must score ~1.0 tight a-mAP."""
    frame_dir = tmp_path / "frames"
    labels_root = tmp_path / "labels"
    data_root = tmp_path / "data"
    sn_dir = data_root / "soccernet"
    os.makedirs(sn_dir)

    classes = {"Goal": 1, "Foul": 2}
    with open(sn_dir / "class.txt", "w") as fp:
        fp.write("Goal\nFoul\n")

    game = "league/2020/g1"
    video = f"{game}/1"
    n_frames = 600  # 24 s @ 25 fps
    rng = np.random.default_rng(0)
    vdir = frame_dir / video
    os.makedirs(vdir)
    for i in range(0, n_frames, 12):  # only strided frames needed
        Image.fromarray(rng.integers(0, 256, (8, 8, 3), np.uint8)).save(
            vdir / f"frame{i}.jpg"
        )
    anns = [
        {"gameTime": "1 - 00:08", "label": "Goal", "position": "8000"},
        {"gameTime": "1 - 00:16", "label": "Foul", "position": "16000"},
    ]
    _write_labels(str(labels_root), game, "Labels-v2.json", anns)
    with open(sn_dir / "val.json", "w") as fp:
        json.dump([{"video": video, "num_frames": n_frames}], fp)

    class Cfg:
        frame_dir = str(tmp_path / "frames")
        clip_len = 10

    # oracle: one-hot scores at strided GT positions
    gt = {8000 // 1000 * 25 // 12: 1, 16000 // 1000 * 25 // 12: 2}

    state = {}

    def predict_fn(frames, hflip=False):
        out = np.zeros((frames.shape[0], 10, 3), np.float32)
        batch = state["batch"]
        for i, clip in enumerate(batch):
            for t in range(10):
                f = clip["start"] + t
                out[i, t, gt.get(f, 0)] = 1.0
        return out

    from tdeed_tpu.infer import windows as windows_mod

    orig = windows_mod.VideoWindows.batches

    def batches(self, batch_size, num_workers=8):
        for b in orig(self, batch_size, num_workers):
            state["batch"] = b
            yield b

    windows_mod.VideoWindows.batches = batches
    try:
        score = val_map_sn(predict_fn, Cfg, str(data_root), str(labels_root))
    finally:
        windows_mod.VideoWindows.batches = orig
    # 2 of 17 official classes have GT and are predicted perfectly; classes
    # without GT contribute AP 0 -> the mean sits at 2/17
    assert score == pytest.approx(2 / 17, abs=0.02)