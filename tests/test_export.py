"""StableHLO export round-trip: serialized predict == in-process predict."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdeed_tpu.config import TDEEDConfig
from tdeed_tpu.infer.export import ExportedPredictor, export_predictor
from tdeed_tpu.models.tdeed import build_model
from tdeed_tpu.train.step import make_predict_step

CLASSES = {"a": 1, "b": 2, "c": 3, "d": 4}


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    cfg = TDEEDConfig(
        dataset="finediving",
        num_classes=4,
        clip_len=8,
        crop_dim=16,
        feature_arch="rny002_gsf",
        n_layers=1,
        sgp_ks=3,
        sgp_r=2,
        radi_displacement=1,
    )
    model = build_model(cfg)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.clip_len, 16, 16, 3), jnp.float32),
        False,
    )
    out_dir = str(tmp_path_factory.mktemp("export") / "artifact")
    export_predictor(
        cfg,
        variables["params"],
        variables["batch_stats"],
        CLASSES,
        out_dir,
        batch_size=2,
        platforms=("cpu",),  # executable on the test backend
    )
    return cfg, variables, out_dir


def test_manifest_contents(tiny):
    cfg, _, out_dir = tiny
    with open(os.path.join(out_dir, "manifest.json")) as fp:
        m = json.load(fp)
    assert m["clip_len"] == cfg.clip_len
    assert m["crop_dim"] == cfg.crop_dim
    assert m["batch_size"] == 2
    assert m["classes"] == CLASSES
    assert m["eval_stride"] == 1 and m["pad_len"] > 0
    assert m["platforms"] == ["cpu"]


def test_roundtrip_matches_inprocess(tiny):
    cfg, variables, out_dir = tiny
    ep = ExportedPredictor(out_dir)
    predict = jax.jit(
        make_predict_step(
            model=build_model(cfg),
            crop_dim=cfg.crop_dim,
            radi_displacement=cfg.radi_displacement,
        ),
        static_argnums=(3,),
    )
    frames = np.random.default_rng(0).integers(
        0, 256, (2, cfg.clip_len, 16, 16, 3), np.uint8
    )
    for hflip in (False, True):
        am_e, probs_e = ep(frames, hflip=hflip)
        am_d, probs_d = predict(
            variables["params"], variables["batch_stats"], frames, hflip
        )
        # same program, same backend: bit-identical
        np.testing.assert_array_equal(np.asarray(probs_e), np.asarray(probs_d))
        np.testing.assert_array_equal(np.asarray(am_e), np.asarray(am_d))
    # the TTA pass must actually differ from the straight pass
    assert not np.array_equal(
        np.asarray(ep(frames, hflip=False)[1]), np.asarray(ep(frames, hflip=True)[1])
    )


def test_shape_contract_enforced(tiny):
    _, _, out_dir = tiny
    ep = ExportedPredictor(out_dir)
    bad = np.zeros((1, 8, 16, 16, 3), np.uint8)  # batch 1 != exported 2
    with pytest.raises(ValueError, match="pad ragged batches"):
        ep(bad)


def test_export_cli(tiny, tmp_path):
    """CLI surface: export from a fabricated finished run."""
    from tests.fixtures import make_finediving_fixture, write_tiny_config

    from tdeed_tpu.checkpoint import save_params
    from tdeed_tpu.cli.export_model import main as export_main
    from tdeed_tpu.config import load_config

    root = str(tmp_path)
    fx = make_finediving_fixture(root, num_videos=1, num_frames=24, size=16)
    cfg_root = write_tiny_config(root, fx, store_mode="load", clip_len=8,
                                 crop_dim=16)
    cfg = load_config("FineDiving_tiny", cfg_root)
    model = build_model(cfg)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.clip_len, 16, 16, 3), jnp.float32),
        False,
    )
    save_params(
        os.path.join(cfg.save_dir, "checkpoint_best"),
        variables["params"], variables["batch_stats"],
    )
    out_dir = os.path.join(root, "artifact")
    export_main([
        "FineDiving_tiny", out_dir,
        "--config_root", cfg_root,
        "--data_root", fx["data_root"],
        "--platforms", "cpu",
        "--batch_size", "2",
    ])
    ep = ExportedPredictor(out_dir)
    assert ep.manifest["model"] == "FineDiving_tiny"
    frames = np.zeros((2, cfg.clip_len, 16, 16, 3), np.uint8)
    am, probs = ep(frames)
    assert probs.shape == (2, cfg.clip_len, cfg.num_classes + 1)
    assert np.all(np.isfinite(np.asarray(probs)))
