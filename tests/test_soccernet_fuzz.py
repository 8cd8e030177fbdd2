"""Fuzz the first-party SoccerNet scorer against a LITERAL oracle.

tests/test_scorer_crossval.py pins `metrics/soccernet.py` with hand-computed
goldens; this file adds the missing adversarial layer (VERDICT r4 item 5): a
naive, loop-for-loop re-derivation of the vendored evaluator's semantics —
label2vector / predictions2vector rasterization (ref: util/eval.py:591-674),
the closest-GT midpoint partition (ref: util/eval.py:546-561), per-GT greedy
window matching, the 200-threshold PR grid with nan_to_num empty bins, the
11-point AP, the visible/unshown attribution by closest-GT sign with the
17/13 unshown rescale, and trapezoid-over-deltas — fuzzed against the
vectorized production scorer over random small cases (fractional fps,
unshown events, off-grid clamping, unknown labels, at-k edges).

The official ``SoccerNet`` pip package the reference imports
(ref: util/eval.py:13, train_tdeed.py:25) is not installable offline; the
oracle re-derives its public v2 protocol from the vendored code plus the
documented algorithm. One ULP-level choice cannot be settled offline: the
11-point recall grid is evaluated at exact decimals (np.arange(11)/10) on
both sides, so the fuzz is sensitive to every ALGORITHMIC divergence while
staying deterministic.
"""

from __future__ import annotations

import numpy as np
import pytest

from tdeed_tpu.metrics.soccernet import (
    THRESHOLDS,
    average_map,
    closest_map,
    deltas_for,
    label2vector,
    predictions2vector,
)

# --------------------------------------------------------------------------
# Literal oracle (naive loops, mirrors ref: util/eval.py:435-674 semantics)
# --------------------------------------------------------------------------


def oracle_label2vector(labels, num_classes, event_dict, framerate, half):
    """ref: util/eval.py:591-640, loop-literal."""
    vector_size = int(120 * 60 * framerate)
    vec = np.zeros((vector_size, num_classes))
    for annotation in labels["annotations"]:
        time = annotation["gameTime"]
        event = annotation["label"]
        ann_half = int(time[0])
        minutes = int(time[-5:-3])
        seconds = int(time[-2:])
        if "position" in annotation:
            frame = int(framerate * (int(annotation["position"]) / 1000))
        else:
            frame = int(framerate * (seconds + 60 * minutes))
        if event not in event_dict:
            continue
        label = event_dict[event]
        value = 1
        if "visibility" in annotation.keys():
            if annotation["visibility"] == "not shown":
                value = -1
        if ann_half == half:
            frame = min(frame, vector_size - 1)
            vec[frame][label] = value
    return vec


def oracle_predictions2vector(predictions, num_classes, event_dict,
                              framerate, half):
    """ref: util/eval.py:643-674, loop-literal."""
    vector_size = int(120 * 60 * framerate)
    vec = np.zeros((vector_size, num_classes)) - 1
    for annotation in predictions["predictions"]:
        time = int(annotation["position"])
        event = annotation["label"]
        ann_half = int(annotation["half"])
        frame = int(framerate * (time / 1000))
        if event not in event_dict:
            continue
        label = event_dict[event]
        value = annotation["confidence"]
        if ann_half == half:
            frame = min(frame, vector_size - 1)
            vec[frame][label] = value
    return vec


def oracle_closest(label_half: np.ndarray) -> np.ndarray:
    """ref: util/eval.py:546-561, loop-literal."""
    closest_numpy = np.zeros(label_half.shape) - 1
    for c in np.arange(label_half.shape[-1]):
        indexes = np.where(label_half[:, c] != 0)[0].tolist()
        if len(indexes) == 0:
            continue
        indexes.insert(0, -indexes[0])
        indexes.append(2 * closest_numpy.shape[0])
        for i in np.arange(len(indexes) - 2) + 1:
            start = max(0, (indexes[i - 1] + indexes[i]) // 2)
            stop = min(
                closest_numpy.shape[0], (indexes[i] + indexes[i + 1]) // 2
            )
            closest_numpy[start:stop, c] = label_half[indexes[i], c]
    return closest_numpy


def oracle_class_scores(target, closest, detection, delta_frames):
    """Per-GT greedy matching, naive O(gt*pred) loops (official v2
    ActionSpotting semantics: each GT, in ascending order, claims the
    highest-scoring unclaimed prediction within +-delta_frames/2; ties
    break to the earliest prediction)."""
    gt_indexes = np.where(target != 0)[0]
    gt_visible = np.where(target > 0)[0]
    gt_unshown = np.where(target < 0)[0]
    pred_indexes = np.where(detection >= 0)[0]
    pred_scores = detection[pred_indexes]
    game_detections = np.zeros((len(pred_indexes), 3))
    game_detections[:, 0] = np.copy(pred_scores)
    game_detections[:, 2] = np.copy(closest[pred_indexes])

    remove_indexes = []
    for gt_index in gt_indexes:
        max_score = -1
        max_index = None
        game_index = 0
        selected_game_index = 0
        for pred_index, pred_score in zip(pred_indexes, pred_scores):
            if (
                abs(pred_index - gt_index) <= delta_frames / 2
                and pred_score > max_score
                and pred_index not in remove_indexes
            ):
                max_score = pred_score
                max_index = pred_index
                selected_game_index = game_index
            game_index += 1
        if max_index is not None:
            game_detections[selected_game_index, 1] = 1
            remove_indexes.append(max_index)
    return game_detections, len(gt_visible), len(gt_unshown)


def _oracle_ap_from_detections(total_detections, n_gt):
    """200-threshold PR grid with nan_to_num empty bins, 11-point AP."""
    precision, recall = [], []
    with np.errstate(invalid="ignore", divide="ignore"):
        for threshold in THRESHOLDS:
            pred_indexes = np.where(total_detections[:, 0] >= threshold)[0]
            TP = np.sum(total_detections[pred_indexes, 1])
            precision.append(
                float(np.nan_to_num(TP / max(len(pred_indexes), 0) if len(pred_indexes) else np.nan))
            )
            recall.append(float(np.nan_to_num(TP / n_gt if n_gt else np.nan)))
    precision = np.array(precision)
    recall = np.array(recall)
    ap = 0.0
    for r in np.arange(11) / 10.0:
        sel = np.where(recall >= r)[0]
        ap += float(np.max(precision[sel])) if len(sel) else 0.0
    return ap / 11.0


def oracle_average_map(targets, detections, framerate, deltas):
    """Naive end-to-end a-mAP: per-delta per-class matching over all games,
    visible/unshown splits by closest sign (exclude by forcing score to -1,
    the official in-place masking), trapezoid over deltas / (n-1), and the
    17/13 unshown rescale."""
    closests = [oracle_closest(t) for t in targets]
    num_classes = targets[0].shape[1]
    maps, maps_vis, maps_uns = [], [], []
    per_class = []
    for delta in deltas:
        delta_frames = delta * framerate
        ap_c, apv_c, apu_c = [], [], []
        for c in range(num_classes):
            total = np.zeros((0, 3))
            n_vis = n_uns = 0
            for t, cl, d in zip(targets, closests, detections):
                det, nv, nu = oracle_class_scores(
                    t[:, c], cl[:, c], d[:, c], delta_frames
                )
                total = np.append(total, det, axis=0)
                n_vis += nv
                n_uns += nu
            ap_c.append(_oracle_ap_from_detections(total, n_vis + n_uns))
            vis = np.copy(total)
            vis[np.where(vis[:, 2] <= 0.5)[0], 0] = -1
            apv_c.append(_oracle_ap_from_detections(vis, n_vis))
            uns = np.copy(total)
            uns[np.where(uns[:, 2] >= -0.5)[0], 0] = -1
            apu_c.append(_oracle_ap_from_detections(uns, n_uns))
        maps.append(float(np.mean(ap_c)))
        maps_vis.append(float(np.mean(apv_c)))
        maps_uns.append(float(np.mean(apu_c)))
        per_class.append(ap_c)

    def integrate(vals):
        vals = np.asarray(vals, np.float64)
        if vals.shape[0] <= 1:
            return vals[0]
        return np.trapezoid(vals, axis=0) / (vals.shape[0] - 1)

    return {
        "a_mAP": float(integrate(maps)),
        "a_mAP_visible": float(integrate(maps_vis)),
        "a_mAP_unshown": float(integrate(maps_uns)) * 17.0 / 13.0,
        "a_mAP_per_class": list(np.atleast_1d(integrate(per_class))),
        "a_mAP_per_delta": maps,
    }


# --------------------------------------------------------------------------
# Random-case generators
# --------------------------------------------------------------------------

EVENTS = {"PASS": 0, "SHOT": 1, "GOAL": 2, "OUT": 3}


def random_labels(rng, framerate, n, with_gametime_only):
    """Random annotation dicts: known+unknown labels, both halves, unshown
    flags, positions past the grid end (clamp path)."""
    size_ms = int(120 * 60 * 1000)
    anns = []
    for _ in range(n):
        half = int(rng.integers(1, 3))
        pos = int(rng.integers(0, int(size_ms * 1.05)))  # 5% off-grid
        secs_total = min(pos // 1000, 120 * 60 - 1)
        mm, ss = divmod(secs_total, 60)
        ann = {
            "gameTime": f"{half} - {mm:02d}:{ss:02d}",
            "label": rng.choice(list(EVENTS) + ["UNKNOWN EVENT"]),
            "position": str(pos),
        }
        if with_gametime_only and rng.random() < 0.3:
            del ann["position"]  # second-precision path
        if rng.random() < 0.4:
            ann["visibility"] = (
                "not shown" if rng.random() < 0.6 else "visible"
            )
        anns.append(ann)
    return {"annotations": anns}


def random_predictions(rng, n):
    size_ms = int(120 * 60 * 1000)
    preds = []
    for _ in range(n):
        preds.append({
            "position": str(int(rng.integers(0, int(size_ms * 1.05)))),
            "label": rng.choice(list(EVENTS) + ["UNKNOWN EVENT"]),
            "half": int(rng.integers(1, 3)),
            "confidence": float(np.round(rng.random(), 3)),
        })
    return {"predictions": preds}


# --------------------------------------------------------------------------
# Fuzz tests
# --------------------------------------------------------------------------


@pytest.mark.parametrize("framerate,gametime_only", [
    (2, True),          # SN grid, integer fps incl. second-precision path
    (0.5, False),       # coarse fractional-second grid
    (25 / 12, False),   # fractional fps (val_map_sn's 25/stride class)
])
def test_rasterizers_match_oracle(framerate, gametime_only):
    rng = np.random.default_rng(11)
    for trial in range(8):
        labels = random_labels(rng, framerate, int(rng.integers(0, 25)),
                               gametime_only)
        preds = random_predictions(rng, int(rng.integers(0, 40)))
        for half in (1, 2):
            np.testing.assert_array_equal(
                label2vector(labels["annotations"], len(EVENTS), EVENTS,
                             framerate, half),
                oracle_label2vector(labels, len(EVENTS), EVENTS,
                                    framerate, half),
                err_msg=f"labels trial={trial} half={half}",
            )
            np.testing.assert_array_equal(
                predictions2vector(preds["predictions"], len(EVENTS),
                                   EVENTS, framerate, half),
                oracle_predictions2vector(preds, len(EVENTS), EVENTS,
                                          framerate, half),
                err_msg=f"preds trial={trial} half={half}",
            )


def test_closest_map_matches_oracle():
    rng = np.random.default_rng(5)
    for trial in range(20):
        n = int(rng.integers(1, 400))
        c = int(rng.integers(1, 5))
        target = np.zeros((n, c))
        for _ in range(int(rng.integers(0, 12))):
            target[rng.integers(0, n), rng.integers(0, c)] = rng.choice(
                [1.0, -1.0]
            )
        np.testing.assert_array_equal(
            closest_map(target), oracle_closest(target),
            err_msg=f"trial={trial}",
        )


@pytest.mark.parametrize("metric,framerate", [
    ("at1", 0.5),      # SNB-style single delta
    ("at4", 25 / 12),  # at-k edge on a fractional grid
    ("tight", 0.5),    # 5-delta trapezoid
    ("loose", 0.25),   # 12-delta trapezoid, wide windows
])
def test_average_map_matches_oracle(metric, framerate):
    """End-to-end fuzz: random rasterized games through both scorers."""
    rng = np.random.default_rng(hash((metric, framerate)) & 0xFFFF)
    deltas = deltas_for(metric)
    for trial in range(4):
        targets, detections = [], []
        for _ in range(int(rng.integers(1, 3))):  # games
            labels = random_labels(rng, framerate, int(rng.integers(2, 20)),
                                   False)
            preds = random_predictions(rng, int(rng.integers(5, 60)))
            for half in (1, 2):
                targets.append(
                    label2vector(labels["annotations"], len(EVENTS), EVENTS,
                                 framerate, half)
                )
                detections.append(
                    predictions2vector(preds["predictions"], len(EVENTS),
                                       EVENTS, framerate, half)
                )
        got = average_map(targets, detections, framerate=framerate,
                          deltas=deltas)
        want = oracle_average_map(targets, detections, framerate, deltas)
        for key in ("a_mAP", "a_mAP_visible", "a_mAP_unshown"):
            assert got[key] == pytest.approx(want[key], abs=1e-12), (
                metric, trial, key
            )
        np.testing.assert_allclose(
            got["a_mAP_per_class"], want["a_mAP_per_class"], atol=1e-12,
            err_msg=f"{metric} trial={trial}",
        )
        np.testing.assert_allclose(
            got["a_mAP_per_delta"], want["a_mAP_per_delta"], atol=1e-12,
            err_msg=f"{metric} trial={trial}",
        )


def test_no_gt_no_pred_edges():
    """Degenerate games: empty GT, empty predictions, both."""
    framerate = 0.5
    size = int(120 * 60 * framerate)
    zeros_t = np.zeros((size, 2))
    empty_d = np.full((size, 2), -1.0)
    some_t = zeros_t.copy()
    some_t[10, 0] = 1.0
    some_d = empty_d.copy()
    some_d[11, 0] = 0.9
    for targets, detections in [
        ([zeros_t], [empty_d]),
        ([zeros_t], [some_d]),
        ([some_t], [empty_d]),
        ([some_t, zeros_t], [some_d, empty_d]),
    ]:
        got = average_map(targets, detections, framerate=framerate,
                          deltas=deltas_for("at1"))
        want = oracle_average_map(targets, detections, framerate,
                                  deltas_for("at1"))
        assert got["a_mAP"] == pytest.approx(want["a_mAP"], abs=1e-12)
        assert got["a_mAP_unshown"] == pytest.approx(
            want["a_mAP_unshown"], abs=1e-12
        )
