"""Fast NMS/Soft-NMS vs the literal reference loops, fuzzed.

The production postprocessors (infer/nms.py) replace the reference's
O(n²)-per-class greedy scans with a score-ordered sweep (hard) and a lazy
max-heap (soft). These oracles re-derive the reference loops literally
(ref: util/eval.py:195-261) — emission order, tie-breaking, and float
decay products must match bit-for-bit.
"""

import random

import numpy as np

from tdeed_tpu.infer.nms import (
    non_maximum_suppression,
    soft_non_maximum_suppression,
)


def _nms_oracle(pred, window, threshold):
    from collections import defaultdict

    new_pred = []
    for video_pred in pred:
        by_label = defaultdict(list)
        for e in video_pred["events"]:
            by_label[e["label"]].append(dict(e))
        windows = (
            {lbl: window[i] for i, lbl in enumerate(by_label)}
            if isinstance(window, list) else {lbl: window for lbl in by_label}
        )
        events = []
        for lbl, v in by_label.items():
            cw = windows[lbl]
            while v:
                e1 = max(v, key=lambda x: x["score"])
                if e1["score"] < threshold:
                    break
                events.append(dict(e1))
                v = [e for e in v
                     if not (e1["frame"] - cw <= e["frame"] <= e1["frame"] + cw)]
        events.sort(key=lambda x: x["frame"])
        out = {k: v for k, v in video_pred.items() if k != "events"}
        out["events"] = events
        out["num_events"] = len(events)
        new_pred.append(out)
    return new_pred


def _snms_oracle(pred, window, threshold):
    from collections import defaultdict

    new_pred = []
    for video_pred in pred:
        by_label = defaultdict(list)
        for e in video_pred["events"]:
            by_label[e["label"]].append(dict(e))
        windows = (
            {lbl: window[i] for i, lbl in enumerate(by_label)}
            if isinstance(window, list) else {lbl: window for lbl in by_label}
        )
        events = []
        for lbl, v in by_label.items():
            cw = windows[lbl]
            while v:
                pos1 = max(range(len(v)), key=lambda i: v[i]["score"])
                e1 = v[pos1]
                if e1["score"] < threshold:
                    break
                events.append(dict(e1))
                for e in v:
                    if e1["frame"] - cw <= e["frame"] <= e1["frame"] + cw:
                        e["score"] = (
                            e["score"] * abs(e1["frame"] - e["frame"]) ** 2
                            / cw ** 2
                        )
                v.pop(pos1)
        events.sort(key=lambda x: x["frame"])
        out = {k: v for k, v in video_pred.items() if k != "events"}
        out["events"] = events
        out["num_events"] = len(events)
        new_pred.append(out)
    return new_pred


def _case(rng, n_videos=2, n_events=80, n_labels=3, frame_range=200):
    pred = []
    for v in range(n_videos):
        events = [
            {
                "label": f"c{rng.randint(1, n_labels)}",
                "frame": rng.randint(0, frame_range),
                # coarse grid -> plenty of score ties
                "score": rng.randint(1, 40) / 40.0,
            }
            for _ in range(rng.randint(0, n_events))
        ]
        pred.append({"video": f"v{v}", "events": events, "fps": 25.0})
    return pred


def _canon(pred_list):
    return [
        (p["video"], p["num_events"],
         [(e["label"], e["frame"], float(e["score"])) for e in p["events"]])
        for p in pred_list
    ]


def test_hard_nms_fuzz_matches_literal_loop():
    rng = random.Random(0)
    for _ in range(150):
        pred = _case(rng)
        window = rng.choice([3, 6, 12, [2, 5, 9]])
        thr = rng.choice([0.0, 0.05, 0.3])
        got = non_maximum_suppression(pred, window, thr)
        want = _nms_oracle(pred, window, thr)
        assert _canon(got) == _canon(want)


def test_soft_nms_fuzz_matches_literal_loop():
    rng = random.Random(1)
    for _ in range(150):
        pred = _case(rng)
        window = rng.choice([3, 6, 12, [2, 5, 9]])
        thr = rng.choice([0.01, 0.1])
        got = soft_non_maximum_suppression(pred, window, thr)
        want = _snms_oracle(pred, window, thr)
        assert _canon(got) == _canon(want)


def test_sn_scale_runs_fast():
    """SN-half-sized event list (5.6k frames x 13 classes dense above
    threshold) through both postprocessors in a few seconds — the literal
    loops take minutes here."""
    import time

    nprng = np.random.default_rng(3)
    events = []
    for c in range(1, 14):
        for f in range(0, 5600, 2):
            events.append(
                {"label": f"c{c}", "frame": f,
                 "score": float(nprng.random() * 0.5 + 0.01)}
            )
    pred = [{"video": "half1", "events": events, "fps": 25.0}]
    t0 = time.perf_counter()
    out_h = non_maximum_suppression(pred, 6, 0.01)
    out_s = soft_non_maximum_suppression(pred, 12, 0.01)
    dt = time.perf_counter() - t0
    assert out_h[0]["num_events"] > 0 and out_s[0]["num_events"] > 0
    assert dt < 60, dt  # generous CI bound; ~seconds on the 1-core host
