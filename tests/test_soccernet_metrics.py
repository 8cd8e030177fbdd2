"""SoccerNet average-mAP scorer tests on hand-computed tiny cases
(ref behaviours: util/eval.py:422-674)."""

import numpy as np
import pytest

from tdeed_tpu.metrics.soccernet import (
    SNB_EVENTS,
    average_map,
    closest_map,
    deltas_for,
    label2vector,
    predictions2vector,
)


def _vec(size, num_classes, entries, fill=0.0):
    v = np.full((size, num_classes), fill)
    for f, c, val in entries:
        v[f, c] = val
    return v


def test_deltas():
    assert list(deltas_for("tight")) == [1, 2, 3, 4, 5]
    assert list(deltas_for("loose")) == list(range(5, 61, 5))
    assert list(deltas_for("at1")) == [1]


def test_label2vector_positions_and_visibility():
    anns = [
        {"gameTime": "1 - 00:10", "label": "PASS", "position": "10000"},
        {"gameTime": "1 - 00:20", "label": "GOAL", "position": "20000",
         "visibility": "not shown"},
        {"gameTime": "2 - 00:10", "label": "PASS", "position": "10000"},
        {"gameTime": "1 - 00:05", "label": "UNKNOWN", "position": "5000"},
    ]
    v = label2vector(anns, 12, SNB_EVENTS, framerate=25, half=1)
    assert v[250, SNB_EVENTS["PASS"]] == 1.0
    assert v[500, SNB_EVENTS["GOAL"]] == -1.0
    assert np.sum(v != 0) == 2  # half-2 and unknown-label events skipped


def test_predictions2vector():
    preds = [
        {"position": 10000, "label": "PASS", "confidence": 0.9, "half": 1},
        {"position": 10000, "label": "PASS", "confidence": 0.8, "half": 2},
    ]
    v = predictions2vector(preds, 12, SNB_EVENTS, framerate=25, half=1)
    assert v[250, SNB_EVENTS["PASS"]] == 0.9
    assert np.sum(v >= 0) == 1


def test_closest_map_midpoints():
    t = np.zeros((10, 1))
    t[2, 0] = 1.0
    t[8, 0] = -1.0
    c = closest_map(t)
    # midpoint of 2 and 8 is 5: frames 0..4 -> value at 2, 5..9 -> value at 8
    assert np.all(c[:5, 0] == 1.0)
    assert np.all(c[5:, 0] == -1.0)


def test_average_map_perfect_predictions():
    size, C = 1000, 2
    targets = [_vec(size, C, [(100, 0, 1.0), (300, 1, 1.0)])]
    det = _vec(size, C, [(100, 0, 0.9), (300, 1, 0.8)], fill=-1.0)
    res = average_map(targets, [det], framerate=25, deltas=[1])
    assert res["a_mAP"] == 1.0
    assert res["a_mAP_visible"] == 1.0


def test_average_map_offset_within_and_outside_tolerance():
    size, C = 1000, 1
    targets = [_vec(size, C, [(500, 0, 1.0)])]
    # offset 10 frames = 0.4 s at 25 fps: inside ±delta*25/2 for delta=1
    near = _vec(size, C, [(510, 0, 0.9)], fill=-1.0)
    res = average_map(targets, [near], framerate=25, deltas=[1])
    assert res["a_mAP"] == 1.0
    # offset 13 frames > 12.5 half-window for delta=1 -> miss
    far = _vec(size, C, [(513, 0, 0.9)], fill=-1.0)
    res = average_map(targets, [far], framerate=25, deltas=[1])
    assert res["a_mAP"] == 0.0
    # but delta=2 (half-window 25) catches it
    res = average_map(targets, [far], framerate=25, deltas=[2])
    assert res["a_mAP"] == 1.0


def test_average_map_greedy_highest_score_wins():
    size, C = 1000, 1
    targets = [_vec(size, C, [(500, 0, 1.0)])]
    # two predictions in-window; the higher-score one must be the TP
    det = _vec(size, C, [(495, 0, 0.6), (505, 0, 0.9)], fill=-1.0)
    res = average_map(targets, [det], framerate=25, deltas=[1])
    # precision at low thresholds is 1 TP / 2 preds = 0.5; recall 1.0
    # 11-pt AP: max precision at recall>=r is 0.9-threshold bin (1 pred, TP)
    assert 0.5 <= res["a_mAP"] <= 1.0


def test_average_map_unshown_bucket():
    size, C = 1000, 1
    targets = [_vec(size, C, [(500, 0, -1.0)])]
    det = _vec(size, C, [(500, 0, 0.9)], fill=-1.0)
    res = average_map(targets, [det], framerate=25, deltas=[1])
    # 17/13: official unshown rescale (13 of 17 SN classes can be unshown)
    assert res["a_mAP_unshown"] == pytest.approx(17.0 / 13.0)
