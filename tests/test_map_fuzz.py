"""Fuzz the vectorized tolerance-AP against a naive greedy oracle.

The production matcher (tdeed_tpu/metrics/map.py:_greedy_match) is a
numpy-vectorized rewrite; this oracle re-derives the reference semantics
(ref: util/score.py:45-95) in the most literal way possible — walk
predictions best-first, scan every unclaimed GT frame of the video, claim
the closest (ties to the earliest listed), frame values claimable once —
so any behavioural drift in the rewrite shows up here.
"""

import random

import numpy as np

from tdeed_tpu.metrics.map import compute_average_precision, get_predictions


def _oracle_ap(pred, truth, tolerance):
    total = sum(len(v) for v in truth.values())
    if total == 0:
        return 0.0
    claimed = set()
    precisions = []
    for rank, (video, frame, _score) in enumerate(pred, 1):
        best = None
        for g in truth.get(video, []):
            if (video, g) in claimed:
                continue
            if best is None or abs(frame - g) < abs(frame - best):
                best = g
        if best is not None and abs(frame - best) <= tolerance:
            claimed.add((video, best))
            precisions.append(len(claimed) / rank)
    interp = []
    running = 0.0
    for p in reversed(precisions):
        running = max(running, p)
        interp.append(running)
    return sum(interp) / total


def _random_case(rng):
    videos = [f"v{i}" for i in range(rng.randint(1, 4))]
    truth = {}
    for v in videos:
        n = rng.randint(0, 6)
        # Duplicates on purpose: frame values repeat within a video.
        truth[v] = [rng.randint(0, 40) for _ in range(n)]
    events = []
    for v in videos:
        for _ in range(rng.randint(0, 10)):
            events.append(
                {
                    "video": v,
                    "frame": rng.randint(0, 40),
                    # Coarse scores force plenty of ties.
                    "score": rng.choice([0.1, 0.5, 0.5, 0.9, 1.0]),
                }
            )
    pred = sorted(events, key=lambda e: -e["score"])
    flat = [(e["video"], e["frame"], e["score"]) for e in pred]
    return truth, flat


def test_fuzz_matches_naive_oracle():
    rng = random.Random(0)
    for _ in range(300):
        truth, flat = _random_case(rng)
        for tol in (0, 1, 3, 6):
            got = compute_average_precision(flat, truth, tol)
            want = _oracle_ap(flat, truth, tol)
            assert np.isclose(got, want), (truth, flat, tol, got, want)


def test_get_predictions_tie_order_is_stable():
    # Equal scores must keep flattening order — the greedy matcher's claim
    # order (and hence AP) depends on it.
    pred = [
        {"video": "a", "events": [{"label": "x", "frame": 1, "score": 0.5},
                                  {"label": "x", "frame": 2, "score": 0.5}]},
        {"video": "b", "events": [{"label": "x", "frame": 3, "score": 0.5},
                                  {"label": "x", "frame": 4, "score": 0.9}]},
    ]
    flat = get_predictions(pred, "x")
    assert flat == [("b", 4, 0.9), ("a", 1, 0.5), ("a", 2, 0.5), ("b", 3, 0.5)]


def test_duplicate_gt_frames_claim_once_but_count_in_total():
    # Two GT entries with the same frame value: only one is matchable
    # (reference keys its claimed set by value), yet total stays 2.
    truth = {"v": [10, 10]}
    flat = [("v", 10, 0.9), ("v", 10, 0.8)]
    ap = compute_average_precision(flat, truth, tolerance=0)
    # One hit at rank 1 (precision 1.0), integrated over 2 GT bins.
    assert np.isclose(ap, 0.5)
