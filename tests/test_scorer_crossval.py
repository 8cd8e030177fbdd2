"""Cross-validation of the first-party scorers (VERDICT r1 item 6).

Two independent anchors, since the official ``SoccerNet`` pip evaluator
cannot be installed offline:

1. tolerance-mAP (`metrics/map.py`) is fuzzed against a from-scratch oracle
   re-deriving the reference algorithm (ref: util/score.py:45-95,98-128) —
   array-based, structured differently from the production code.
2. SoccerNet average-mAP (`metrics/soccernet.py`) is pinned by hand-computed
   golden cases covering the protocol's edge semantics: 11-point AP, empty
   threshold bins, visible/unshown attribution via closest-GT sign, and the
   ±delta*framerate/2 matching window (ref behaviour: util/eval.py:496-674
   and the public SoccerNet-v2 protocol).
"""

from __future__ import annotations

import numpy as np
import pytest

from tdeed_tpu.metrics.map import compute_maps
from tdeed_tpu.metrics.soccernet import (
    average_map,
    closest_map,
    label2vector,
    predictions2vector,
)

# --------------------------------------------------------------------------
# 1. tolerance-mAP fuzz vs an independent oracle
# --------------------------------------------------------------------------


def _oracle_ap(preds, gt_by_video, tolerance):
    """Independent AP oracle: event-table simulation with numpy bookkeeping.

    preds: [(video, frame, score)] — any order; GT: {video: [frames]}.
    Semantics per ref util/score.py:45-95: descending-score greedy matching
    to the nearest *unclaimed* GT frame of the same video; a match counts
    only within ±tolerance; precision recorded at each TP; AP = sum of the
    right-to-left running-max precision, divided by total GT.
    """
    total_gt = sum(len(v) for v in gt_by_video.values())
    if total_gt == 0:
        return 0.0
    order = sorted(range(len(preds)), key=lambda i: -preds[i][2])
    available = {v: list(f) for v, f in gt_by_video.items()}
    tp_precisions = []
    n_matched = 0
    for rank, i in enumerate(order, start=1):
        video, frame, _ = preds[i]
        cands = available.get(video)
        if not cands:
            continue
        dists = np.abs(np.asarray(cands) - frame)
        j = int(np.argmin(dists))
        if dists[j] <= tolerance:
            cands.pop(j)
            n_matched += 1
            tp_precisions.append(n_matched / rank)
    running_max = np.maximum.accumulate(np.asarray(tp_precisions)[::-1])
    return float(running_max.sum()) / total_gt


@pytest.mark.parametrize("seed", range(6))
def test_tolerance_map_matches_oracle_fuzz(seed):
    r = np.random.default_rng(seed)
    n_videos = int(r.integers(1, 4))
    classes = ["a", "b", "c"][: int(r.integers(1, 4))]
    tolerances = [0, 1, 2, 4]

    truth, pred = [], []
    gt = {c: {} for c in classes}
    all_scores = iter(
        r.permutation(np.linspace(0.01, 0.99, 400))
    )  # distinct scores: tie order is implementation-defined
    for v in range(n_videos):
        video = f"v{v}"
        events, pevents = [], []
        for c in classes:
            frames = sorted(
                int(f) for f in r.choice(200, size=int(r.integers(1, 5)),
                                         replace=False)
            )
            gt[c][video] = frames
            events += [{"frame": f, "label": c} for f in frames]
            # predictions: jittered copies + random noise events
            for f in frames:
                if r.random() < 0.8:
                    pevents.append(
                        {"frame": int(f + r.integers(-3, 4)), "label": c,
                         "score": float(next(all_scores))}
                    )
            for _ in range(int(r.integers(0, 4))):
                pevents.append(
                    {"frame": int(r.integers(0, 200)), "label": c,
                     "score": float(next(all_scores))}
                )
        truth.append({"video": video, "events": events, "num_frames": 200,
                      "fps": 25})
        pred.append({"video": video, "events": pevents, "fps": 25})

    maps, tols = compute_maps(truth, pred, tolerances)
    assert tols == tolerances
    for tol, got in zip(tolerances, maps):
        expected = np.mean(
            [
                _oracle_ap(
                    [(v["video"], e["frame"], e["score"]) for v in pred
                     for e in v["events"] if e["label"] == c],
                    gt[c],
                    tol,
                )
                for c in sorted(classes)
            ]
        )
        np.testing.assert_allclose(got, expected, atol=1e-12, err_msg=str(tol))


def test_tolerance_map_interp_golden():
    """Hand case pinning the interpolation: preds at ranks 1 (TP), 2 (FP),
    3 (TP) over 2 GT -> pc = [1/1, 2/3], interp = [1, 2/3], AP = (1+2/3)/2."""
    truth = [{"video": "v", "events": [{"frame": 10, "label": "x"},
                                       {"frame": 50, "label": "x"}],
              "num_frames": 100, "fps": 25}]
    pred = [{"video": "v", "events": [
        {"frame": 10, "label": "x", "score": 0.9},
        {"frame": 30, "label": "x", "score": 0.8},
        {"frame": 50, "label": "x", "score": 0.7},
    ], "fps": 25}]
    maps, _ = compute_maps(truth, pred, [0])
    np.testing.assert_allclose(maps[0], (1.0 + 2.0 / 3.0) / 2.0)


# --------------------------------------------------------------------------
# 2. SoccerNet average-mAP hand-computed goldens
# --------------------------------------------------------------------------

FR = 25  # SNB framerate
SIZE = 120 * 60 * FR


def _vec_from(events, confs=None, num_classes=1):
    """(target, detection) single-class vectors at given frames."""
    t = np.zeros((SIZE, num_classes))
    d = np.full((SIZE, num_classes), -1.0)
    for f, v in events:
        t[f, 0] = v
    if confs:
        for f, c in confs:
            d[f, 0] = c
    return t, d


def test_average_map_perfect_two_events():
    t, d = _vec_from([(250, 1.0), (750, 1.0)], [(250, 0.9), (750, 0.8)])
    res = average_map([t], [d], framerate=FR, deltas=[1])
    assert res["a_mAP"] == pytest.approx(1.0)
    assert res["a_mAP_visible"] == pytest.approx(1.0)


def test_average_map_false_positive_golden():
    """1 GT, hit at conf 0.5 plus miss at conf 0.9: precision is 0.5 for
    thresholds <= 0.5 and 0 above (empty-bin nan->0), recall 1 below.
    11-point AP = 0.5."""
    t, d = _vec_from([(500, 1.0)], [(500, 0.5), (2000, 0.9)])
    res = average_map([t], [d], framerate=FR, deltas=[1])
    assert res["a_mAP"] == pytest.approx(0.5)


def test_average_map_window_half_delta():
    """Matching window is ±delta*framerate/2: at delta=1s/25fps a prediction
    12 frames away matches, 13 frames away does not."""
    t, d = _vec_from([(500, 1.0)], [(512, 0.9)])
    assert average_map([t], [d], framerate=FR, deltas=[1])["a_mAP"] == (
        pytest.approx(1.0)
    )
    t, d = _vec_from([(500, 1.0)], [(513, 0.9)])
    assert average_map([t], [d], framerate=FR, deltas=[1])["a_mAP"] == (
        pytest.approx(0.0)
    )


def test_average_map_unshown_attribution():
    """A detection matched to a 'not shown' GT (closest value -1) counts in
    the unshown PR curve only; visible curve sees only the visible match."""
    t, d = _vec_from(
        [(500, 1.0), (5000, -1.0)], [(500, 0.9), (5000, 0.8)]
    )
    res = average_map([t], [d], framerate=FR, deltas=[1])
    assert res["a_mAP"] == pytest.approx(1.0)
    assert res["a_mAP_visible"] == pytest.approx(1.0)
    # the official scorer rescales unshown by 17/13 (only 13 of 17 SN
    # classes can be 'not shown')
    assert res["a_mAP_unshown"] == pytest.approx(17.0 / 13.0)

    # unshown GT missed, only a nearby-but-outside-window FP
    t, d = _vec_from([(500, 1.0), (5000, -1.0)], [(500, 0.9), (5100, 0.8)])
    res = average_map([t], [d], framerate=FR, deltas=[1])
    assert res["a_mAP_visible"] == pytest.approx(1.0)
    assert res["a_mAP_unshown"] == pytest.approx(0.0)


def test_average_map_greedy_highest_score_claims():
    """Two predictions inside one GT's window: the higher-scoring one is
    claimed as TP; the other stays FP -> AP = 0.5 (P=0.5 at low thresholds,
    1.0 bins empty above 0.9 -> 11pt gives max precision 1.0 for r=0 only
    when some bin has P 1.0: here thresholds in (0.8, 0.9] see only the TP
    -> P=1, R=1, so AP=1.0)."""
    t, d = _vec_from([(500, 1.0)], [(505, 0.9), (498, 0.8)])
    res = average_map([t], [d], framerate=FR, deltas=[1])
    assert res["a_mAP"] == pytest.approx(1.0)

    # flip scores: now the closer one scores lower but highest-score-in-window
    # still claims -> TP has conf 0.9 either way
    t, d = _vec_from([(500, 1.0)], [(505, 0.8), (498, 0.9)])
    res = average_map([t], [d], framerate=FR, deltas=[1])
    assert res["a_mAP"] == pytest.approx(1.0)


def test_closest_map_midpoint_partition():
    t = np.zeros((20, 1))
    t[4, 0] = 1.0
    t[12, 0] = -1.0
    c = closest_map(t)
    # midpoint (4+12)//2 = 8: frames 0..7 -> +1, 8..19 -> -1
    assert (c[:8, 0] == 1.0).all()
    assert (c[8:, 0] == -1.0).all()


def test_rasterizers_reference_semantics():
    """label2vector/predictions2vector match the reference's vendored
    converters (ref: util/eval.py:591-674): ms->frame floor, gameTime
    fallback, unknown labels skipped, clamp to the 120-min grid."""
    ev = {"X": 0, "Y": 1}
    anns = [
        {"gameTime": "1 - 00:10", "label": "X", "position": "10999"},
        {"gameTime": "1 - 05:07", "label": "Y"},  # no position: mm:ss
        {"gameTime": "2 - 00:10", "label": "X", "position": "10000"},  # half 2
        {"gameTime": "1 - 00:10", "label": "ZZZ", "position": "10000"},  # unk
        {"gameTime": "1 - 90:00", "label": "X", "position": str(10**9)},  # clamp
        {"gameTime": "1 - 00:20", "label": "Y", "position": "20000",
         "visibility": "not shown"},
    ]
    v = label2vector(anns, 2, ev, framerate=2, half=1)
    assert v[int(2 * 10.999), 0] == 1.0  # floor(2*10999/1000) = 21
    assert v[2 * (5 * 60 + 7), 1] == 1.0
    assert v[2 * 10, 0] == 0.0  # half-2 event not in half 1
    assert v[-1, 0] == 1.0  # clamped to last bin
    assert v[2 * 20, 1] == -1.0  # unshown

    preds = [
        {"half": 1, "label": "X", "position": 10999, "confidence": 0.7},
        {"half": 2, "label": "X", "position": 5000, "confidence": 0.9},
        {"half": 1, "label": "ZZZ", "position": 1000, "confidence": 0.9},
    ]
    p = predictions2vector(preds, 2, ev, framerate=2, half=1)
    assert p[21, 0] == 0.7
    assert (p[p != 0.7] == -1.0).all()


def test_average_map_trapezoid_over_deltas():
    """Multi-delta averaging is the trapezoid integral / (n-1), not a plain
    mean (official SoccerNet a-mAP): a prediction 40 frames from its GT at
    25 fps matches only for deltas 4,5 of tight -> per-delta mAPs
    [0,0,0,1,1], trapz/(5-1) = 1.5/4 = 0.375 (mean would be 0.4)."""
    t, d = _vec_from([(500, 1.0)], [(540, 0.9)])
    res = average_map([t], [d], framerate=FR, deltas=[1, 2, 3, 4, 5])
    assert res["a_mAP_per_delta"] == [0.0, 0.0, 0.0, 1.0, 1.0]
    assert res["a_mAP"] == pytest.approx(0.375)
