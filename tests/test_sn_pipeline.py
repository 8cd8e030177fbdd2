"""SoccerNet / SoccerNet-Ball data-path tests: external label trees,
position(ms) -> frame conversion, half filtering, events-only clip
filtering (ref behaviours: dataset/frame.py:107-174, util/eval.py)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from tdeed_tpu.data.clips import plan_clips
from tdeed_tpu.data.registry import event_frame, get_spec
from tdeed_tpu.infer.windows import VideoWindows

SNB_CLASSES = {"PASS": 1, "DRIVE": 2, "GOAL": 3}
SN_CLASSES = {"Goal": 1, "Foul": 2}


def _frames(dirpath, n, size=16):
    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 256, (size, size, 3), np.uint8)
        ).save(os.path.join(dirpath, f"frame{i}.jpg"))


@pytest.fixture(scope="module")
def snb_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("snb")
    frame_dir = root / "frames"
    labels_root = root / "labels"
    game = "england_efl/2019-2020/testgame"
    _frames(str(frame_dir / game), 40)
    ann = [
        # 1.0 s -> frame 25 @ FPS_SN=25
        {"gameTime": "1 - 00:01", "label": "PASS", "position": "1000"},
        {"gameTime": "1 - 00:00", "label": "GOAL", "position": "200"},
    ]
    os.makedirs(labels_root / game, exist_ok=True)
    with open(labels_root / game / "Labels-ball.json", "w") as fp:
        json.dump({"annotations": ann}, fp)
    split = [{"video": game, "num_frames": 40}]
    with open(root / "train.json", "w") as fp:
        json.dump(split, fp)
    return {
        "frame_dir": str(frame_dir),
        "labels_root": str(labels_root),
        "train_json": str(root / "train.json"),
        "game": game,
    }


def test_event_frame_ms_conversion():
    assert event_frame(
        {"position": "1000", "gameTime": "1 - 00:01", "label": "x"},
        "soccernetball",
    ) == (25, 1)
    assert event_frame(
        {"position": "2000", "gameTime": "2 - 00:02", "label": "x"},
        "soccernet",
    ) == (50, 2)
    assert event_frame({"frame": 7, "label": "x"}, "finediving") == (7, 0)


def test_snb_plan_uses_external_labels(snb_fixture):
    spec = get_spec("soccernetball")
    plan = plan_clips(
        "soccernetball",
        snb_fixture["train_json"],
        snb_fixture["frame_dir"],
        SNB_CLASSES,
        clip_len=10,
        stride=spec.train_stride,  # 2
        overlap=spec.train_overlap,
        radi_displacement=1,
        labels_root=snb_fixture["labels_root"],
    )
    assert len(plan) > 0
    # PASS at frame 25, stride 2 -> label_idx depends on window start; at
    # least one clip must carry a PASS (1) and one a GOAL (3) label
    labels = {rec["label"] for clip in plan.labels for rec in clip}
    assert 1 in labels and 3 in labels


def test_sn_events_only_filter(tmp_path):
    """SN keeps only clips containing >= 1 event (ref: frame.py:169-174)."""
    frame_dir = tmp_path / "frames"
    labels_root = tmp_path / "labels"
    game_dir = "league/2020/game1"
    for half in (1, 2):
        _frames(str(frame_dir / game_dir / str(half)), 60)
    ann = [
        {"gameTime": "1 - 00:00", "label": "Goal", "position": "400"},
        # half 2 event must NOT label half-1 video
        {"gameTime": "2 - 00:00", "label": "Foul", "position": "400"},
    ]
    os.makedirs(labels_root / game_dir, exist_ok=True)
    with open(labels_root / game_dir / "Labels-v2.json", "w") as fp:
        json.dump({"annotations": ann}, fp)
    split = [{"video": f"{game_dir}/1", "num_frames": 60}]
    with open(tmp_path / "train.json", "w") as fp:
        json.dump(split, fp)

    plan = plan_clips(
        "soccernet",
        str(tmp_path / "train.json"),
        str(frame_dir),
        SN_CLASSES,
        clip_len=4,
        stride=2,
        overlap=0.5,
        radi_displacement=0,
        labels_root=str(labels_root),
    )
    # every surviving clip has >= 1 event, and only half-1 labels appear
    assert len(plan) > 0
    for clip in plan.labels:
        assert clip
        assert all(rec["label"] == SN_CLASSES["Goal"] for rec in clip)


def test_snb_video_windows_labels(snb_fixture):
    spec = get_spec("soccernetball")
    data = VideoWindows(
        "soccernetball",
        snb_fixture["train_json"],
        snb_fixture["frame_dir"],
        clip_len=10,
        overlap_len=5,
        stride=spec.eval_stride,  # 2
        labels_root=snb_fixture["labels_root"],
    )
    labels = data.get_labels(snb_fixture["game"], SNB_CLASSES)
    assert labels.shape[0] == 20  # ceil(40 / 2)
    assert labels[25 // 2] == SNB_CLASSES["PASS"]
    assert labels[5 // 2] == SNB_CLASSES["GOAL"]

    # stride-rescaled events for the scorer
    meta = data.labels[0]
    assert meta["fps"] == 12.5
    frames = {e["label"]: e["frame"] for e in meta["events"]}
    assert frames["PASS"] == 12 and frames["GOAL"] == 2