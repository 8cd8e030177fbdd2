"""Store/load clip-planning + sampler/loader tests on a synthetic frame tree
(ref behaviours: dataset/frame.py:97-253, dataset/datasets.py:19-96)."""

import os

import numpy as np
import pytest

from tests.fixtures import make_finediving_fixture

from tdeed_tpu.data.clips import (
    load_plan,
    plan_clips,
    rasterize_labels,
    store_plan,
)
from tdeed_tpu.data.frames import get_decoder, load_clip
from tdeed_tpu.data.loader import BatchLoader, ClipSampler, JointSampler
from tdeed_tpu.data.registry import load_classes

CLIP_LEN = 8
RADI = 1


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("finediving")
    return make_finediving_fixture(str(root), num_videos=2, num_frames=24)


@pytest.fixture(scope="module")
def plan(fixture):
    classes = load_classes(
        os.path.join(fixture["data_root"], "finediving", "class.txt")
    )
    return plan_clips(
        "finediving",
        os.path.join(fixture["data_root"], "finediving", "train.json"),
        fixture["frame_dir"],
        classes,
        CLIP_LEN,
        stride=1,
        overlap=0.5,
        radi_displacement=RADI,
    )


def test_plan_windows_cover_video(plan):
    # hop = (1-0.5)*8 = 4; starts from -5 (pad_len 5) — every video yields
    # multiple clips and every clip record has the reference list format.
    assert len(plan) > 4
    for rec in plan.frame_paths:
        base, found_start, pad_start, pad_end, ndigits, length = rec
        assert length == CLIP_LEN
        assert ndigits == 4  # zero-padded synthetic names
        assert pad_start + pad_end < CLIP_LEN


def test_labels_dilated_and_displacement(plan):
    # Each event dilates to ±RADI rows with matching signed displacements.
    found = False
    for labels, labels_d in zip(plan.labels, plan.labels_d):
        for rec, rec_d in zip(labels, labels_d):
            assert rec["label_idx"] == rec_d["label_idx"]
            assert -RADI <= rec_d["displ"] <= RADI
            found = found or rec_d["displ"] != 0
    assert found, "expected at least one nonzero displacement target"


def test_store_load_roundtrip(plan, fixture):
    store_plan(plan, fixture["store_dir"], CLIP_LEN, RADI, "train")
    loaded = load_plan(fixture["store_dir"], CLIP_LEN, RADI, "train")
    assert loaded.frame_paths == plan.frame_paths
    assert loaded.labels == plan.labels
    assert loaded.labels_d == plan.labels_d


def test_load_clip_shapes_and_padding(plan):
    decoder = get_decoder()
    # First clip starts at -pad_len -> pad_start > 0 -> zero rows up front.
    rec = plan.frame_paths[0]
    arr = load_clip(rec, stride=1, decoder=decoder)
    assert arr.shape[0] == CLIP_LEN
    assert arr.dtype == np.uint8
    if rec[2] > 0:
        assert np.all(arr[: rec[2]] == 0)
        assert arr[rec[2]].sum() > 0


def test_rasterize_labels(plan):
    labels, labels_d = rasterize_labels(
        plan.labels[0], plan.labels_d[0], CLIP_LEN
    )
    assert labels.shape == (CLIP_LEN,)
    assert labels_d.shape == (CLIP_LEN,)
    assert np.all((labels >= 0) & (labels <= 4))


def test_sampler_and_loader_batches(plan):
    sampler = ClipSampler(plan, CLIP_LEN, 1, RADI, mixup=True)
    loader = BatchLoader(sampler, batch_size=2, dataset_len=8, num_workers=2)
    batches = list(loader.epoch(0))
    assert len(batches) == 4
    b = batches[0]
    assert b["frame"].shape[:2] == (2, CLIP_LEN)
    assert b["frame"].shape[-1] == 3
    assert set(b) >= {"frame", "label", "labelD", "frame2", "label2", "labelD2"}
    # Deterministic per (seed, epoch, batch, slot):
    again = list(loader.epoch(0))
    np.testing.assert_array_equal(b["frame"], again[0]["frame"])


def test_loader_start_batch_resumes_exactly(plan):
    """epoch(e, start_batch=k) yields exactly the tail of epoch(e) —
    the contract step-level --resume relies on."""
    sampler = ClipSampler(plan, CLIP_LEN, 1, RADI, mixup=False)
    loader = BatchLoader(sampler, batch_size=2, dataset_len=8, num_workers=2)
    full = list(loader.epoch(3))
    tail = list(loader.epoch(3, start_batch=2))
    assert len(tail) == len(full) - 2
    for a, b in zip(full[2:], tail):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_joint_sampler_tags(plan):
    import random

    s1 = ClipSampler(plan, CLIP_LEN, 1, RADI, mixup=False)
    s2 = ClipSampler(plan, CLIP_LEN, 1, RADI, mixup=False)
    joint = JointSampler(s1, s2)
    tags = {int(joint.sample(random.Random(i))["dataset"]) for i in range(20)}
    assert tags == {1, 2}


def test_native_decoder_parity(plan):
    """C++ batch decode must match the PIL per-frame path bit-for-bit."""
    from tdeed_tpu.data.frames import _decode_pil
    from tdeed_tpu.native import jpeg as native_jpeg

    if not native_jpeg.available():
        import pytest

        pytest.skip("native decoder not built")
    rec = plan.frame_paths[1]
    via_native = load_clip(rec, 1, decoder=None)  # fast path probes itself
    # Compare against per-frame PIL decode of the same slots
    from tdeed_tpu.data.frames import _clip_frame_paths
    import numpy as np

    slots = _clip_frame_paths(rec, 1, pad=True)
    for i, p in enumerate(slots):
        if p is None:
            assert via_native[i].sum() == 0
        else:
            np.testing.assert_array_equal(via_native[i], _decode_pil(p))


def test_loader_abandoned_epoch_releases_producer(plan):
    """Breaking out of an epoch mid-way must not strand the producer thread
    in a full-queue put (review finding: leaked thread + decoded batches)."""
    import threading

    sampler = ClipSampler(plan, CLIP_LEN, 1, RADI, mixup=False)
    loader = BatchLoader(sampler, batch_size=2, dataset_len=40,
                         num_workers=2, prefetch=1)
    before = threading.active_count()
    for _ in range(3):
        gen = loader.epoch(0)
        next(gen)  # consume one batch, then abandon
        gen.close()
    # give the producers a moment to observe stop and exit
    import time

    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= before + 1, (
        threading.active_count(), before
    )


def test_batchloader_shard_union_equals_single_host():
    """Host h's loader materializes rows [h*local, (h+1)*local) of the SAME
    global epoch plan: concatenating the shards reproduces the single-host
    batches bit-for-bit (cli/train.py multi-host contract)."""
    import numpy as np

    from tdeed_tpu.data.loader import BatchLoader

    class Stub:
        def sample(self, rng):
            return {"x": np.asarray([rng.randint(0, 10**9)], np.int64)}

    full = BatchLoader(Stub(), 4, dataset_len=16, num_workers=2, seed=9)
    shard0 = BatchLoader(Stub(), 2, dataset_len=16, num_workers=2, seed=9,
                         global_batch_size=4, shard_offset=0)
    shard1 = BatchLoader(Stub(), 2, dataset_len=16, num_workers=2, seed=9,
                         global_batch_size=4, shard_offset=2)
    for epoch in range(2):
        want = [b["x"] for b in full.epoch(epoch)]
        got0 = [b["x"] for b in shard0.epoch(epoch)]
        got1 = [b["x"] for b in shard1.epoch(epoch)]
        assert len(want) == len(got0) == len(got1) == 4
        for w, a, b in zip(want, got0, got1):
            np.testing.assert_array_equal(w, np.concatenate([a, b]))
