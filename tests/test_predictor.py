"""SpottingPredictor serving surface: load-once, spot-many inference."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdeed_tpu.infer.predictor import SpottingPredictor


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    """A fabricated finished run: fixture frames + config + best ckpt."""
    root = tmp_path_factory.mktemp("predictor")
    from tests.fixtures import make_finediving_fixture, write_tiny_config

    from tdeed_tpu.checkpoint import save_params
    from tdeed_tpu.config import load_config
    from tdeed_tpu.models.tdeed import build_model

    fx = make_finediving_fixture(str(root), num_videos=1, num_frames=24,
                                 size=16)
    cfg_root = write_tiny_config(str(root), fx, store_mode="load",
                                 clip_len=8, crop_dim=16)
    cfg = load_config("FineDiving_tiny", cfg_root)
    model = build_model(cfg)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.clip_len, 16, 16, 3), jnp.float32), False,
    )
    save_params(
        os.path.join(cfg.save_dir, "checkpoint_best"),
        variables["params"], variables["batch_stats"],
    )
    return fx, cfg_root


def test_spot_returns_valid_events(run_dir):
    fx, cfg_root = run_dir
    pred = SpottingPredictor.from_run(
        "FineDiving_tiny", cfg_root, fx["data_root"], batch_size=4
    )
    with open(os.path.join(fx["data_root"], "finediving", "train.json")) as fp:
        meta = json.load(fp)[0]

    events = pred.spot(fx["frame_dir"], meta["video"], meta["num_frames"],
                       hflip_tta=False)
    assert isinstance(events, list)
    for e in events:
        assert set(e) == {"label", "frame", "score"}
        assert e["label"] in pred.classes
        assert 0 <= e["frame"] < meta["num_frames"]
        assert 0.0 <= e["score"] <= 1.0

    # deterministic across calls (same ckpt, no augmentation)
    again = pred.spot(fx["frame_dir"], meta["video"], meta["num_frames"],
                      hflip_tta=False)
    assert events == again

    # num_frames discovery from the frame dir matches the explicit value
    discovered = pred.spot(fx["frame_dir"], meta["video"], hflip_tta=False)
    assert discovered == events


def test_spot_many_and_nms_modes(run_dir):
    fx, cfg_root = run_dir
    pred = SpottingPredictor.from_run(
        "FineDiving_tiny", cfg_root, fx["data_root"], batch_size=4
    )
    with open(os.path.join(fx["data_root"], "finediving", "train.json")) as fp:
        metas = json.load(fp)

    out = pred.spot_many(fx["frame_dir"], metas, nms="none", threshold=0.0,
                         hflip_tta=False)
    assert set(out) == {m["video"] for m in metas}
    raw = out[metas[0]["video"]]
    nmsed = pred.spot(fx["frame_dir"], metas[0]["video"],
                      metas[0]["num_frames"], nms="nms", threshold=0.0,
                      hflip_tta=False)
    # NMS can only thin the raw event list
    assert len(nmsed) <= len(raw)


def test_spot_num_frames_discovery_not_stride_scaled(run_dir, monkeypatch):
    """Discovered num_frames must equal the frame-file count (source-frame
    units), not count*stride (review finding: stride>1 datasets inflated)."""
    from tdeed_tpu.infer import predictor as pred_mod

    fx, cfg_root = run_dir
    pred = SpottingPredictor.from_run(
        "FineDiving_tiny", cfg_root, fx["data_root"], batch_size=4
    )
    seen = {}
    orig = pred._windows

    def spy(num_frames):
        seen["num_frames"] = num_frames
        return orig(num_frames)

    pred._windows = spy
    with open(os.path.join(fx["data_root"], "finediving", "train.json")) as fp:
        meta = json.load(fp)[0]
    pred.spot(fx["frame_dir"], meta["video"], hflip_tta=False)
    assert seen["num_frames"] == meta["num_frames"]


def test_spot_shared_dir_requires_num_frames(run_dir):
    """tennis/finegym share frame dirs across videos: discovery must refuse
    rather than overcount."""
    import pytest as _pytest

    fx, cfg_root = run_dir
    pred = SpottingPredictor.from_run(
        "FineDiving_tiny", cfg_root, fx["data_root"], batch_size=4
    )
    pred.cfg.dataset = "tennis"
    with _pytest.raises(ValueError, match="num_frames"):
        pred.spot(fx["frame_dir"], "x_0_10")


def test_device_aggregation_matches_host_path(run_dir):
    """spot() device-side scatter-add accumulation vs the host numpy
    accumulator (predict_windows): identical scores through both paths,
    with and without TTA (TTA exercises the per-pass unconditional
    support counting)."""
    fx, cfg_root = run_dir
    pred = SpottingPredictor.from_run(
        "FineDiving_tiny", cfg_root, fx["data_root"], batch_size=3
    )
    with open(os.path.join(fx["data_root"], "finediving", "train.json")) as fp:
        meta = json.load(fp)[0]

    for tta in (False, True):
        dev = pred.spot(fx["frame_dir"], meta["video"], meta["num_frames"],
                        hflip_tta=tta, nms="none", device_aggregate=True)
        host = pred.spot(fx["frame_dir"], meta["video"], meta["num_frames"],
                         hflip_tta=tta, nms="none", device_aggregate=False)
        assert len(dev) == len(host)
        for a, b in zip(dev, host):
            assert a["label"] == b["label"] and a["frame"] == b["frame"]
            np.testing.assert_allclose(a["score"], b["score"], rtol=1e-6)


def test_spot_sharded_matches_single_device(run_dir):
    """n_devices=8 serving mesh: window batches shard over the local mesh;
    events identical to the single-device predictor (both accumulation
    paths, with and without TTA)."""
    fx, cfg_root = run_dir
    pred1 = SpottingPredictor.from_run(
        "FineDiving_tiny", cfg_root, fx["data_root"], batch_size=4
    )
    pred8 = SpottingPredictor.from_run(
        "FineDiving_tiny", cfg_root, fx["data_root"], batch_size=4,
        n_devices=8,
    )
    assert pred8.batch_size == 8  # rounded up to a mesh multiple
    with open(os.path.join(fx["data_root"], "finediving", "train.json")) as fp:
        meta = json.load(fp)[0]

    for kw in (
        {"hflip_tta": False, "device_aggregate": True},
        {"hflip_tta": True, "device_aggregate": True},
        {"hflip_tta": False, "device_aggregate": False},
    ):
        a = pred1.spot(fx["frame_dir"], meta["video"], meta["num_frames"],
                       nms="none", **kw)
        b = pred8.spot(fx["frame_dir"], meta["video"], meta["num_frames"],
                       nms="none", **kw)
        assert len(a) == len(b), kw
        for ea, eb in zip(a, b):
            assert ea["label"] == eb["label"] and ea["frame"] == eb["frame"]
            np.testing.assert_allclose(ea["score"], eb["score"], rtol=1e-5)
