"""Decoded-frame LRU (FrameCache): bit-exactness, isolation, and bounds.

The cache exploits that training clips resample from a FIXED stored plan
with ~90% window overlap (ref: dataset/frame.py:116,210-241) — hot frames
repeat, so serving decode repeats from memory cuts the measured host
decode bottleneck (docs/DESIGN.md "Host input pipeline"). These tests pin
the correctness contract: caching NEVER changes a single pixel, batches
never alias cache storage, and the byte budget holds under churn.
"""

import os
import random

import numpy as np
import pytest

from tests.fixtures import make_finediving_fixture

from tdeed_tpu.data.clips import plan_clips
from tdeed_tpu.data.frames import get_decoder, load_clip
from tdeed_tpu.data.loader import BatchLoader, ClipSampler, FrameCache
from tdeed_tpu.data.registry import load_classes

CLIP_LEN = 8


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("fc")
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
        radi_displacement=1,
    )


@pytest.mark.parametrize("kind", ["auto", "pil"])
def test_cached_clips_bit_identical(plan, kind):
    """Every clip decodes bit-identically with a cold, warm and absent
    cache, for both the native batch path and the per-frame path."""
    decoder = get_decoder(kind)
    cache = FrameCache(64 << 20)
    for rec in plan.frame_paths:
        ref = load_clip(rec, 1, decoder, pad=True)
        cold = load_clip(rec, 1, decoder, pad=True, cache=cache)
        warm = load_clip(rec, 1, decoder, pad=True, cache=cache)
        np.testing.assert_array_equal(cold, ref)
        np.testing.assert_array_equal(warm, ref)
    stats = cache.stats()
    # Overlapping windows + the warm re-reads guarantee real hits.
    assert stats["hits"] > 0 and stats["hit_rate"] > 0.5, stats


def test_batches_never_alias_cache(plan):
    """Mutating a returned clip must not corrupt later reads (cached arrays
    are frozen copies; outputs are freshly allocated)."""
    decoder = get_decoder()
    cache = FrameCache(64 << 20)
    rec = plan.frame_paths[len(plan) // 2]
    ref = load_clip(rec, 1, decoder, pad=True)
    first = load_clip(rec, 1, decoder, pad=True, cache=cache)
    first[:] = 255  # consumer scribbles over its batch
    again = load_clip(rec, 1, decoder, pad=True, cache=cache)
    np.testing.assert_array_equal(again, ref)


def test_eviction_respects_byte_budget(plan):
    decoder = get_decoder()
    frame_bytes = load_clip(plan.frame_paths[0], 1, decoder)[0].nbytes
    cache = FrameCache(3 * frame_bytes + 1)  # room for 3 frames
    for rec in plan.frame_paths:
        load_clip(rec, 1, decoder, pad=True, cache=cache)
    stats = cache.stats()
    assert stats["bytes"] <= cache.capacity_bytes, stats
    assert stats["entries"] <= 3, stats


def test_sampler_stream_unchanged_by_cache(plan):
    """The BatchLoader stream is bit-identical with and without a cache
    (same seeds -> same draws -> same pixels/labels)."""

    def run(cache):
        sampler = ClipSampler(plan, CLIP_LEN, 1, 1, mixup=True, cache=cache)
        loader = BatchLoader(sampler, 2, dataset_len=8, num_workers=2, seed=5)
        return list(loader.epoch(0))

    plain = run(None)
    cached = run(FrameCache(64 << 20))
    assert len(plain) == len(cached) == 4
    for a, b in zip(plain, cached):
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_missing_frame_still_raises(plan, tmp_path):
    """A corrupt/missing mid-clip frame must fail loudly through the cached
    path exactly as it does uncached (fallback re-decodes per-frame)."""
    decoder = get_decoder("pil")
    rec = list(plan.frame_paths[0])
    base, start, pad_start, pad_end, ndigits, length = rec
    # Point at a directory where one mid-clip frame is absent.
    import shutil

    broken = tmp_path / "broken"
    shutil.copytree(base, broken)
    victim = broken / (str(start + 2).zfill(ndigits) + ".jpg")
    os.remove(victim)
    rec[0] = str(broken)
    with pytest.raises((FileNotFoundError, OSError, ValueError)):
        load_clip(rec, 1, decoder, pad=True, cache=FrameCache(64 << 20))


def test_eval_windows_cached_bit_identical(fixture):
    """VideoWindows with a cache yields bit-identical window batches
    (incl. start/end zero-padding for off-video and missing frames) and a
    positive hit rate from the 75% window overlap."""
    from tdeed_tpu.infer.windows import VideoWindows

    label_file = os.path.join(fixture["data_root"], "finediving", "train.json")

    def run(cache):
        vw = VideoWindows(
            "finediving", label_file, fixture["frame_dir"], CLIP_LEN,
            overlap_len=CLIP_LEN * 3 // 4, stride=1, cache=cache,
        )
        return [
            {c["video"]: (c["start"], c["frame"]) for c in batch}
            for batch in vw.batches(4, num_workers=2)
        ]

    plain = run(None)
    cache = FrameCache(64 << 20)
    cached = run(cache)
    assert len(plain) == len(cached) > 0
    for a, b in zip(plain, cached):
        assert a.keys() == b.keys()
        for k in a:
            assert a[k][0] == b[k][0]
            np.testing.assert_array_equal(a[k][1], b[k][1], err_msg=k)
    assert cache.stats()["hit_rate"] > 0.3, cache.stats()


def test_random_stride_draws_match_uncached(plan, fixture):
    """Fuzz: random draws from stride-1 and stride-2 plans through ONE
    shared cache stay bit-exact (stride layout is applied outside the
    cache, so the same cached frame serves both)."""
    classes = load_classes(
        os.path.join(fixture["data_root"], "finediving", "class.txt")
    )
    plan2 = plan_clips(
        "finediving",
        os.path.join(fixture["data_root"], "finediving", "train.json"),
        fixture["frame_dir"],
        classes,
        CLIP_LEN,
        stride=2,
        overlap=0.5,
        radi_displacement=1,
    )
    decoder = get_decoder()
    cache = FrameCache(64 << 20)
    rng = random.Random(7)
    for _ in range(32):
        p, stride = rng.choice([(plan, 1), (plan2, 2)])
        rec = p.frame_paths[rng.randrange(len(p))]
        ref = load_clip(rec, stride, decoder, pad=True)
        got = load_clip(rec, stride, decoder, pad=True, cache=cache)
        np.testing.assert_array_equal(got, ref)
