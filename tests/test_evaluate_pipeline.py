"""Inference-orchestrator integration test: sliding windows -> overlap
aggregation -> frame stats -> NMS -> mAP, with an oracle predictor that
emits the ground truth (ref behaviours: util/eval.py:264-419)."""

import json
import os

import numpy as np
import pytest

from tests.fixtures import make_finediving_fixture

from tdeed_tpu.data.registry import load_classes
from tdeed_tpu.infer.evaluate import accumulate_scores, evaluate, run_inference
from tdeed_tpu.infer.windows import VideoWindows

CLIP_LEN = 8


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalpipe")
    return make_finediving_fixture(str(root), num_videos=1, num_frames=24)


@pytest.fixture(scope="module")
def data(fixture):
    return VideoWindows(
        "finediving",
        os.path.join(fixture["data_root"], "finediving", "test.json"),
        fixture["frame_dir"],
        CLIP_LEN,
        overlap_len=CLIP_LEN * 3 // 4,  # ref: train_tdeed.py:256
        stride=1,
    )


@pytest.fixture(scope="module")
def classes(fixture):
    return load_classes(
        os.path.join(fixture["data_root"], "finediving", "class.txt")
    )


def _oracle_predict(data, classes):
    """Predictor that reads the dense GT labels for each window."""
    label_by_video = {}

    def predict(frames, hflip=False):
        # (B, T, H, W, 3) -> (B, T, C+1); identity on labels via lookup
        out = np.zeros((frames.shape[0], CLIP_LEN, len(classes) + 1), np.float32)
        for i, clip in enumerate(predict.current_batch):
            video, start = clip["video"], clip["start"]
            labels = label_by_video.setdefault(
                video, data.get_labels(video, classes)
            )
            for t in range(CLIP_LEN):
                f = start + t
                lab = labels[f] if 0 <= f < len(labels) else 0
                out[i, t, lab] = 1.0
        return out

    return predict


def test_windows_enumeration(data):
    # hop = (clip_len - overlap) * stride = 2; starts from -5
    starts = [s for _, s, _ in data.clips]
    assert starts[0] == -5
    assert all(b - a == 2 for a, b in zip(starts, starts[1:]))
    videos = data.videos
    assert videos[0][1] == 24  # ceil(24/1)


def test_accumulate_scores_clamps_bounds():
    pred = {"v": (np.zeros((10, 3), np.float32), np.zeros(10, np.int32))}
    scores = np.ones((8, 3), np.float32)
    accumulate_scores(pred, "v", -3, scores)  # clips the first 3 rows
    accumulate_scores(pred, "v", 7, scores)  # clips past the end
    s, support = pred["v"]
    # first window covers rows 0..4 (3 negative rows clipped), second 7..9
    assert list(support) == [1, 1, 1, 1, 1, 0, 0, 1, 1, 1]
    assert s[0, 0] == 1.0 and s[5, 0] == 0.0 and s[9, 0] == 1.0


def test_oracle_predictions_reach_perfect_map(data, classes, fixture, capsys):
    # Wire the oracle: run_inference stacks batches internally, so wrap
    # batches() to remember which clips are in flight.
    oracle = _oracle_predict(data, classes)
    orig_batches = data.batches

    def batches(batch_size, num_workers=8):
        for batch in orig_batches(batch_size, num_workers):
            oracle.current_batch = batch
            yield batch

    data.batches = batches
    try:
        maps, tols = evaluate(
            oracle, data, "TEST", classes, test=True, augment=False,
            save_pred=os.path.join(fixture["save_dir"], "pred-test"),
        )
    finally:
        data.batches = orig_batches

    assert tols == [1, 2, 4]
    # GT-emitting predictor must reach mAP 1.0 at every tolerance
    np.testing.assert_allclose(maps, 1.0)
    # predictions stored
    with open(os.path.join(fixture["save_dir"], "pred-test.json")) as fp:
        stored = json.load(fp)
    assert stored and stored[0]["events"]


def test_tta_doubles_support(data, classes):
    """augment=True runs a second hflip pass and counts support per pass
    (ref: util/eval.py:290-349)."""

    def fake_predict(frames, hflip=False):
        return np.full(
            (frames.shape[0], CLIP_LEN, len(classes) + 1), 0.5, np.float32
        )

    plain = run_inference(fake_predict, data, classes, augment=False,
                          batch_size=4)
    tta = run_inference(fake_predict, data, classes, augment=True,
                        batch_size=1)
    v = data.videos[0][0]
    # same coverage pattern, double the support counts under TTA
    np.testing.assert_array_equal(tta[v][1], 2 * plain[v][1])
    np.testing.assert_allclose(tta[v][0], 2 * plain[v][0], rtol=1e-6)


def test_val_mode_returns_mean_map(data, classes, fixture):
    """test=False: NMS at window[0], mean mAP over tolerances — the
    criterion='map' epoch-selection path (ref: train_tdeed.py:182-199)."""
    oracle = _oracle_predict(data, classes)
    orig_batches = data.batches

    def batches(batch_size, num_workers=8):
        for batch in orig_batches(batch_size, num_workers):
            oracle.current_batch = batch
            yield batch

    data.batches = batches
    try:
        score = evaluate(
            oracle, data, "VAL", classes, printed=False, test=False,
            augment=False,
        )
    finally:
        data.batches = orig_batches
    assert isinstance(score, float)
    assert score == pytest.approx(1.0)


def test_eval_reader_pads_missing_trailing_frames(fixture):
    """Eval windows tolerate metadata claiming more frames than exist on
    disk: missing tails decode as zero padding (ref: frame.py:609-614)."""
    import json

    meta_path = os.path.join(fixture["data_root"], "finediving", "test.json")
    with open(meta_path) as fp:
        metas = json.load(fp)
    metas = [dict(metas[0], num_frames=metas[0]["num_frames"] + 6)]
    inflated = os.path.join(fixture["data_root"], "finediving", "_inflated.json")
    with open(inflated, "w") as fp:
        json.dump(metas, fp)

    d = VideoWindows(
        "finediving", inflated, fixture["frame_dir"], CLIP_LEN,
        overlap_len=0, stride=1,
    )
    # the final window covers only missing frames -> skipped gracefully
    assert d.load_clip(len(d) - 1) is None
    # the second-to-last covers a partial tail -> zero-padded, static shape
    partial = d.load_clip(len(d) - 2)
    assert partial is not None
    assert partial["frame"].shape[0] == CLIP_LEN
    import numpy as _np

    assert _np.all(partial["frame"][-1] == 0)  # padded tail rows are zero
