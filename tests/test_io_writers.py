"""SN/SNB results_spotting.json writers (ref: util/io.py:22-68)."""

import json
import os

from tdeed_tpu.utils.io import store_json_sn, store_json_snb


def _pred(video, frames_scores):
    return {
        "video": video,
        "events": [
            {"label": "Goal", "frame": f, "score": s} for f, s in frames_scores
        ],
        "fps": 25.0,
    }


def test_store_json_sn_pairs_halves(tmp_path):
    pred_path = str(tmp_path / "run" / "pred-test")
    os.makedirs(os.path.dirname(pred_path), exist_ok=True)
    preds = [
        _pred("league/2020/game1/1", [(25, 0.9)]),   # half 1
        _pred("league/2020/game1/2", [(50, 0.8)]),   # half 2, same game
    ]
    store_json_sn(pred_path, preds, stride=12)
    out = os.path.join(
        str(tmp_path / "run"), "preds", "league/2020/game1",
        "results_spotting.json",
    )
    assert os.path.exists(out)
    with open(out) as fp:
        game = json.load(fp)
    assert game["UrlLocal"].startswith("league/2020/game1")
    p1, p2 = game["predictions"]
    # frame -> ms: frame / 25 * 1000 * stride (ref: util/io.py:31)
    assert p1["position"] == int(25 / 25 * 1000 * 12)
    assert p1["half"] == 1 and p2["half"] == 2
    assert p1["gameTime"].startswith("1 - ")
    assert p2["gameTime"].startswith("2 - ")
    assert p1["confidence"] == 0.9


def test_store_json_snb_single_half(tmp_path):
    pred_path = str(tmp_path / "run" / "pred-challenge")
    os.makedirs(os.path.dirname(pred_path), exist_ok=True)
    preds = [_pred("england_efl/2019-2020/game", [(125, 0.7)])]
    store_json_snb(pred_path, preds, stride=2)
    out = os.path.join(
        str(tmp_path / "run"), "preds", "england_efl/2019-2020/game",
        "results_spotting.json",
    )
    with open(out) as fp:
        game = json.load(fp)
    (p,) = game["predictions"]
    assert p["half"] == 1
    assert p["position"] == int(125 / 25 * 1000 * 2)
    # gameTime minute:second from position (10 s)
    assert p["gameTime"] == "1 - 0:10"