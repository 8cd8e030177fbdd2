"""Vectorized eval postprocessing vs a naive per-frame re-derivation.

The production `process_frame_predictions` extracts events and F1 stats
with numpy (flatnonzero / bincount); the reference walks every (frame,
class) pair in Python (ref: util/eval.py:87-140). This pins bit-identical
outputs, including the event ORDER the downstream greedy NMS depends on.
"""

import numpy as np

from tdeed_tpu.infer.evaluate import ForegroundF1, process_frame_predictions


class _StubWindows:
    """Minimal stand-in for VideoWindows: videos + dense labels."""

    def __init__(self, videos, labels):
        self.videos = videos  # [(name, num_frames, fps)]
        self._labels = labels

    def get_labels(self, video, classes):
        return self._labels[video]


def _naive(data, classes, pred_dict, thr):
    """The reference formulation, kept literal as the oracle."""
    classes_inv = {v: k for k, v in classes.items()}
    f1 = ForegroundF1()
    n_err = n_tot = 0
    pred_events = []
    pred_events_hr = []
    for video, (scores, support) in sorted(pred_dict.items()):
        support = support.copy()
        support[support == 0] = 1
        scores = scores / support[:, None]
        pred = np.argmax(scores, axis=1)
        label = data.get_labels(video, classes)
        n_err += int(np.sum(label != pred))
        n_tot += pred.shape[0]
        for i in range(pred.shape[0]):
            f1.update(int(label[i]), int(pred[i]))
        events, events_hr = [], []
        for i in range(pred.shape[0]):
            if pred[i] != 0:
                events.append(
                    {"label": classes_inv[pred[i]], "frame": i,
                     "score": float(scores[i, pred[i]])}
                )
            for j in classes_inv:
                if scores[i, j] >= thr:
                    events_hr.append(
                        {"label": classes_inv[j], "frame": i,
                         "score": float(scores[i, j])}
                    )
        pred_events.append({"video": video, "events": events, "fps": 25.0})
        pred_events_hr.append({"video": video, "events": events_hr, "fps": 25.0})
    return f1, n_err / max(1, n_tot), pred_events, pred_events_hr


def _random_case(rng, n_videos, n_frames, n_classes, shuffled_classes=False):
    names = [f"c{i}" for i in range(1, n_classes + 1)]
    ids = list(range(1, n_classes + 1))
    if shuffled_classes:
        rng.shuffle(ids)  # classes dict in non-ascending id order
    classes = dict(zip(names, ids))
    videos, labels, pred_dict = [], {}, {}
    for v in range(n_videos):
        name = f"vid{v}"
        videos.append((name, n_frames, 25.0))
        labels[name] = rng.integers(0, n_classes + 1, n_frames)
        scores = rng.random((n_frames, n_classes + 1)).astype(np.float32) ** 4
        support = rng.integers(0, 3, n_frames).astype(np.int32)
        pred_dict[name] = (scores, support)
    return _StubWindows(videos, labels), classes, pred_dict


def _assert_equal(data, classes, pred_dict, thr=0.3):
    err, f1, ev, ev_hr, _ = process_frame_predictions(
        data, classes, pred_dict, high_recall_score_threshold=thr
    )
    f1_naive, err_naive, ev_naive, ev_hr_naive = _naive(
        data, classes, pred_dict, thr
    )
    assert err.get() == err_naive
    for k in [None] + list(classes.values()):
        assert f1.tp_fp_fn(k) == f1_naive.tp_fp_fn(k), k
    assert ev == ev_naive
    assert ev_hr == ev_hr_naive  # exact ORDER too


def test_matches_naive_small():
    rng = np.random.default_rng(0)
    data, classes, pred_dict = _random_case(rng, 4, 137, 6)
    _assert_equal(data, classes, pred_dict)


def test_matches_naive_shuffled_class_ids():
    # classes_inv insertion order != ascending ids: the high-recall event
    # order within a frame must follow classes_inv order, not column order.
    rng = np.random.default_rng(1)
    data, classes, pred_dict = _random_case(rng, 2, 61, 5, shuffled_classes=True)
    _assert_equal(data, classes, pred_dict)


def test_sn_scale_smoke():
    """SN-sized geometry (halves x 5.6k frames x 13 classes) runs through
    the vectorized path quickly; spot-check one half against the oracle."""
    rng = np.random.default_rng(2)
    data, classes, pred_dict = _random_case(rng, 24, 5600, 13)
    err, f1, ev, ev_hr, _ = process_frame_predictions(
        data, classes, pred_dict, high_recall_score_threshold=0.6
    )
    assert len(ev) == 24 and len(ev_hr) == 24
    one = {"vid7": pred_dict["vid7"]}
    sub = _StubWindows([("vid7", 5600, 25.0)], {"vid7": data._labels["vid7"]})
    _, _, ev1, ev_hr1, _ = process_frame_predictions(
        sub, classes, one, high_recall_score_threshold=0.6
    )
    f1n, errn, evn, ev_hrn = _naive(sub, classes, one, 0.6)
    assert ev1[0]["events"] == evn[0]["events"]
    assert ev_hr1[0]["events"] == ev_hrn[0]["events"]
