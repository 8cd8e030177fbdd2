"""Spotting postprocessors: hard NMS and Soft-NMS over event lists.

Exact-order reimplementation of the reference postprocessors
(ref: util/eval.py:195-261): per class, repeatedly take the max-score event;
hard NMS drops neighbours within ±window frames, Soft-NMS decays their
scores by |Δframe|² / window². The greedy order is data-dependent and
sequential by construction, so this stays on host over the (small) event
lists produced per video.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Union

Window = Union[int, List[int]]


def _class_windows(events_by_label, window: Window):
    if isinstance(window, list):
        return {lbl: window[i] for i, lbl in enumerate(events_by_label)}
    return {lbl: window for lbl in events_by_label}


def non_maximum_suppression(
    pred: List[dict], window: Window, threshold: float = 0.0
) -> List[dict]:
    """Hard NMS (ref: util/eval.py:195-227)."""
    new_pred = []
    for video_pred in pred:
        events_by_label: Dict[str, List[dict]] = defaultdict(list)
        for e in video_pred["events"]:
            events_by_label[e["label"]].append(dict(e))

        windows = _class_windows(events_by_label, window)
        events = []
        for lbl, v in events_by_label.items():
            cw = windows[lbl]
            while v:
                e1 = max(v, key=lambda x: x["score"])
                if e1["score"] < threshold:
                    break
                events.append(dict(e1))
                v = [
                    e
                    for e in v
                    if not (e1["frame"] - cw <= e["frame"] <= e1["frame"] + cw)
                ]

        events.sort(key=lambda x: x["frame"])
        out = {k: v for k, v in video_pred.items() if k != "events"}
        out["events"] = events
        out["num_events"] = len(events)
        new_pred.append(out)
    return new_pred


def soft_non_maximum_suppression(
    pred: List[dict], window: Window, threshold: float = 0.01
) -> List[dict]:
    """Soft-NMS with quadratic decay (ref: util/eval.py:229-261).

    Neighbours keep shrinking each round (order-dependent), so the loop is
    reproduced literally.
    """
    new_pred = []
    for video_pred in pred:
        events_by_label: Dict[str, List[dict]] = defaultdict(list)
        for e in video_pred["events"]:
            events_by_label[e["label"]].append(dict(e))

        windows = _class_windows(events_by_label, window)
        events = []
        for lbl, v in events_by_label.items():
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
                            e["score"] * abs(e1["frame"] - e["frame"]) ** 2 / cw ** 2
                        )
                v.pop(pos1)

        events.sort(key=lambda x: x["frame"])
        out = {k: v for k, v in video_pred.items() if k != "events"}
        out["events"] = events
        out["num_events"] = len(events)
        new_pred.append(out)
    return new_pred
