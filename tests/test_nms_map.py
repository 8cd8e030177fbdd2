"""NMS / Soft-NMS and tolerance-mAP tests on hand-computed cases
(ref behaviours: util/eval.py:195-261, util/score.py:45-161)."""

import numpy as np
import pytest

from tdeed_tpu.infer.nms import (
    non_maximum_suppression,
    soft_non_maximum_suppression,
)
from tdeed_tpu.metrics.map import (
    compute_average_precision,
    compute_maps,
    get_predictions,
    parse_ground_truth,
)


def _video(events, video="v1", fps=10.0):
    return {"video": video, "events": events, "fps": fps, "num_frames": 100}


def test_nms_suppresses_neighbours_keeps_max():
    pred = [
        _video(
            [
                {"label": "a", "frame": 10, "score": 0.9},
                {"label": "a", "frame": 11, "score": 0.8},
                {"label": "a", "frame": 14, "score": 0.7},
                {"label": "b", "frame": 11, "score": 0.6},
            ]
        )
    ]
    out = non_maximum_suppression(pred, window=2)
    frames = [(e["label"], e["frame"]) for e in out[0]["events"]]
    # a@11 is within ±2 of a@10 -> suppressed; a@14 survives; b untouched
    assert ("a", 10) in frames and ("a", 14) in frames
    assert ("a", 11) not in frames
    assert ("b", 11) in frames


def test_nms_threshold():
    pred = [_video([{"label": "a", "frame": 5, "score": 0.05}])]
    out = non_maximum_suppression(pred, window=2, threshold=0.1)
    assert out[0]["events"] == []


def test_soft_nms_decays_by_squared_distance():
    pred = [
        _video(
            [
                {"label": "a", "frame": 10, "score": 1.0},
                {"label": "a", "frame": 12, "score": 0.5},
            ]
        )
    ]
    out = soft_non_maximum_suppression(pred, window=4, threshold=0.01)
    ev = {e["frame"]: e["score"] for e in out[0]["events"]}
    assert ev[10] == 1.0
    # decayed: 0.5 * (2^2 / 4^2) = 0.125, still above threshold -> kept
    assert ev[12] == pytest.approx(0.125)


def test_soft_nms_input_not_mutated():
    events = [{"label": "a", "frame": 10, "score": 1.0},
              {"label": "a", "frame": 12, "score": 0.5}]
    pred = [_video([dict(e) for e in events])]
    soft_non_maximum_suppression(pred, window=4)
    assert pred[0]["events"][1]["score"] == 0.5


def test_ap_perfect_and_miss():
    truth = [_video([{"label": "a", "frame": 10}, {"label": "a", "frame": 50}])]
    gt = parse_ground_truth(truth)
    pred = [
        _video(
            [
                {"label": "a", "frame": 10, "score": 0.9},
                {"label": "a", "frame": 50, "score": 0.8},
            ]
        )
    ]
    ap = compute_average_precision(get_predictions(pred, "a"), gt["a"], tolerance=0)
    assert ap == 1.0
    pred_off = [_video([{"label": "a", "frame": 13, "score": 0.9}])]
    ap = compute_average_precision(get_predictions(pred_off, "a"), gt["a"], 2)
    assert ap == 0.0  # off by 3 > tolerance 2
    ap = compute_average_precision(get_predictions(pred_off, "a"), gt["a"], 4)
    assert ap == pytest.approx(0.5)  # recalls one of two GT


def test_ap_greedy_unclaimed_matching():
    # Two predictions near one GT: only the higher-scored claims it.
    truth = [_video([{"label": "a", "frame": 10}])]
    gt = parse_ground_truth(truth)
    pred = [
        _video(
            [
                {"label": "a", "frame": 10, "score": 0.9},
                {"label": "a", "frame": 11, "score": 0.8},
            ]
        )
    ]
    ap = compute_average_precision(get_predictions(pred, "a"), gt["a"], 2)
    assert ap == 1.0  # precision 1/1 at the recall point; second pred is FP after


def test_compute_maps_multiclass():
    truth = [
        _video(
            [{"label": "a", "frame": 10}, {"label": "b", "frame": 20}]
        )
    ]
    pred = [
        _video(
            [
                {"label": "a", "frame": 10, "score": 0.9},
                {"label": "b", "frame": 40, "score": 0.9},
            ]
        )
    ]
    maps, tols = compute_maps(truth, pred, tolerances=[1, 2], printed=False)
    assert tols == [1, 2]
    assert maps[0] == pytest.approx(0.5)  # a perfect, b missed
