"""Per-dataset frame-path resolver quirks (ref: dataset/frame.py:274-353)
and the radi_displacement=0 sampler path."""

import os

import numpy as np
import pytest
from PIL import Image

from tdeed_tpu.data.registry import get_spec


def test_tennis_resolver():
    # video '<base>_<frame0>_<frame1>' (ref: dataset/frame.py:283-286)
    spec = get_spec("tennis")
    path, frame0, nd = spec.scheme.resolve(
        "/frames", "usopen_2015_smith_v_jones_120_480", None
    )
    assert path == "/frames/usopen_2015_smith_v_jones"
    assert frame0 == 120 and nd == -1


def test_finegym_resolver():
    # frame0 from _source_info (ref: dataset/frame.py:288-291)
    spec = get_spec("finegym")
    src = {"start_frame": 1000, "pad": [30, 10]}
    path, frame0, nd = spec.scheme.resolve("/frames", "VIDID_E_002", src)
    assert path == "/frames/VIDID"
    assert frame0 == 970 and nd == -1


def test_finediving_resolver(tmp_path):
    # zero-padded names discovered from the listing (frame.py:277-281)
    d = tmp_path / "01" / "07"
    os.makedirs(d)
    for i in (3, 4, 5):
        Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(
            d / f"{i:05d}.jpg"
        )
    spec = get_spec("finediving")
    path, frame0, nd = spec.scheme.resolve(str(tmp_path), "01__07", None)
    assert path == str(d)
    assert frame0 == 3 and nd == 5


def test_plain_resolver():
    for ds in ("fs_comp", "fs_perf", "soccernet", "soccernetball"):
        spec = get_spec(ds)
        path, frame0, nd = spec.scheme.resolve("/f", "some/video", None)
        assert path == "/f/some/video" and frame0 == 0 and nd == -1


def test_sampler_without_displacement(tmp_path):
    """radi_displacement=0: no labelsD anywhere (ref: FineGym configs)."""
    from tests.fixtures import make_finediving_fixture

    from tdeed_tpu.data.clips import load_plan, plan_clips, store_plan
    from tdeed_tpu.data.loader import ClipSampler
    from tdeed_tpu.data.registry import load_classes
    import random

    fx = make_finediving_fixture(str(tmp_path), num_videos=1, num_frames=20)
    classes = load_classes(
        os.path.join(fx["data_root"], "finediving", "class.txt")
    )
    plan = plan_clips(
        "finediving",
        os.path.join(fx["data_root"], "finediving", "train.json"),
        fx["frame_dir"], classes, 8, 1, 0.5, radi_displacement=0,
    )
    assert plan.labels_d is None
    store_plan(plan, fx["store_dir"], 8, 0, "train")
    loaded = load_plan(fx["store_dir"], 8, 0, "train")
    assert loaded.labels_d is None
    s = ClipSampler(loaded, 8, 1, 0, mixup=True)
    sample = s.sample(random.Random(0))
    assert "labelD" not in sample and "labelD2" not in sample
    assert sample["frame"].shape[0] == 8