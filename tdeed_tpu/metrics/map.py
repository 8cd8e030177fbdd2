"""Tolerance-mAP scorer: greedy nearest-GT matching within ±tolerance frames.

First-party reimplementation of the reference metric
(ref: util/score.py:16-161): per class, predictions are globally sorted by
score; each is matched to the closest unclaimed GT frame in the same video;
AP is the interpolated precision curve integrated over TOTAL GT bins.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from tdeed_tpu.utils.io import load_json

from tdeed_tpu.data.registry import FPS_SN  # single source (ref: dataset/frame.py:27)


def parse_ground_truth(truth: List[dict], labels_root: Optional[str] = None):
    """label -> video -> [frames] (ref: util/score.py:16-32)."""
    label_dict: Dict[str, Dict[str, List[int]]] = defaultdict(
        lambda: defaultdict(list)
    )
    for x in truth:
        if "events" not in x:
            assert labels_root is not None, "SN truth needs labels_root"
            events = load_json(
                os.path.join(
                    labels_root, "/".join(x["video"].split("/")[:-1]) + "/Labels-v2.json"
                )
            )["annotations"]
        else:
            events = x["events"]
        for e in events:
            frame = (
                e["frame"]
                if "frame" in e
                else int(int(e["position"]) / 1000 * FPS_SN)
            )
            label_dict[e["label"]][x["video"]].append(frame)
    return label_dict


def get_predictions(pred: List[dict], label: Optional[str] = None):
    flat = []
    for x in pred:
        for e in x["events"]:
            if label is None or e["label"] == label:
                flat.append((x["video"], e["frame"], e["score"]))
    flat.sort(key=lambda x: x[-1], reverse=True)
    return flat


def compute_average_precision(
    pred: Sequence[Tuple[str, int, float]],
    truth: Dict[str, List[int]],
    tolerance: int = 0,
) -> float:
    """Greedy AP (ref: util/score.py:45-95)."""
    total = sum(len(x) for x in truth.values())
    if total == 0:
        return 0.0
    recalled = set()
    pc: List[float] = []
    prev_score = float("inf")
    for i, (video, frame, score) in enumerate(pred, 1):
        assert score <= prev_score, "predictions must be score-sorted"
        prev_score = score
        gt_closest = None
        for gt_frame in truth.get(video, []):
            if (video, gt_frame) in recalled:
                continue
            if gt_closest is None or abs(frame - gt_closest) > abs(frame - gt_frame):
                gt_closest = gt_frame
        if gt_closest is not None and abs(frame - gt_closest) <= tolerance:
            recalled.add((video, gt_closest))
            pc.append(len(recalled) / i)

    # Right-to-left interpolation, then integrate over TOTAL bins.
    interp = []
    max_p = 0.0
    for p in pc[::-1]:
        max_p = max(p, max_p)
        interp.append(max_p)
    return sum(interp) / total


def plot_pr_curves(
    truth_by_label: Dict,
    pred: List[dict],
    tolerance: int,
    out_path: str,
) -> None:
    """Optional per-class precision-recall plot (ref: util/score.py:147-157).

    Requires matplotlib; silently skips when unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    fig, ax = plt.subplots()
    for label in sorted(truth_by_label):
        flat = get_predictions(pred, label=label)
        total = sum(len(v) for v in truth_by_label[label].values())
        recalled = set()
        pts = []
        for i, (video, frame, score) in enumerate(flat, 1):
            gt_closest = None
            for gt_frame in truth_by_label[label].get(video, []):
                if (video, gt_frame) in recalled:
                    continue
                if gt_closest is None or abs(frame - gt_closest) > abs(frame - gt_frame):
                    gt_closest = gt_frame
            if gt_closest is not None and abs(frame - gt_closest) <= tolerance:
                recalled.add((video, gt_closest))
            if total:
                pts.append((len(recalled) / total, len(recalled) / i))
        if pts:
            r, p = zip(*pts)
            ax.plot(r, p, label=label)
    ax.set_xlabel("recall")
    ax.set_ylabel("precision")
    ax.set_title(f"PR @ tolerance {tolerance}")
    ax.legend(fontsize=6)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def compute_maps(
    truth: List[dict],
    pred: List[dict],
    tolerances: Sequence[int] = (1, 2, 4),
    printed: bool = False,
    labels_root: Optional[str] = None,
    plot_pr: Optional[str] = None,
) -> Tuple[List[float], List[int]]:
    """Per-tolerance mAP over classes (ref: util/score.py:98-161).

    plot_pr: when set, writes PR-curve PNGs ``<plot_pr>_tol{t}.png``."""
    assert {v["video"] for v in truth} == {v["video"] for v in pred}, (
        "Video set mismatch!"
    )
    truth_by_label = parse_ground_truth(truth, labels_root)

    rows = []
    maps = []
    class_aps_per_tol = []
    for tol in tolerances:
        class_aps = []
        for label in sorted(truth_by_label.keys()):
            ap = compute_average_precision(
                get_predictions(pred, label=label), truth_by_label[label], tol
            )
            class_aps.append((label, ap))
        maps.append(float(np.mean([a for _, a in class_aps])))
        class_aps_per_tol.append(class_aps)
        if plot_pr:
            plot_pr_curves(truth_by_label, pred, tol, f"{plot_pr}_tol{tol}.png")

    if printed:
        names = sorted(truth_by_label.keys()) + ["mAP"]
        print(_format_table(names, class_aps_per_tol, maps, tolerances))
        print("Avg mAP (across tolerances): {:0.2f}".format(np.mean(maps) * 100))
    return maps, list(tolerances)


def _format_table(names, class_aps_per_tol, maps, tolerances) -> str:
    header = ["AP @ tol"] + [str(t) for t in tolerances]
    lines = ["\t".join(header)]
    for i, name in enumerate(names):
        vals = []
        for j, _ in enumerate(tolerances):
            if name == "mAP":
                vals.append(maps[j] * 100)
            else:
                vals.append(class_aps_per_tol[j][i][1] * 100)
        lines.append("\t".join([name] + [f"{v:0.2f}" for v in vals]))
    return "\n".join(lines)
