"""Config system + metrics logger tests (ref: train_tdeed.py:45-77,
config/README.md keys; wandb-optional logging)."""

import json
import os

import pytest

from tdeed_tpu.config import TDEEDConfig, config_path_for_model, load_config
from tdeed_tpu.utils.logging import MetricsLogger

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_shipped_configs_all_load():
    root = os.path.join(REPO, "configs")
    n = 0
    for prefix in sorted(os.listdir(root)):
        if not os.path.isdir(os.path.join(root, prefix)):
            continue
        for f in sorted(os.listdir(os.path.join(root, prefix))):
            cfg = load_config(f[:-5], root)
            assert cfg.clip_len == 100
            assert cfg.modality == "rgb"
            n += 1
    assert n == 14  # all shipped reference models


def test_config_path_resolution():
    assert config_path_for_model("configs", "FineDiving_small") == os.path.join(
        "configs", "FineDiving", "FineDiving_small.json"
    )


def test_pretrain_subconfig():
    cfg = load_config("SoccerNetBall_challenge1", os.path.join(REPO, "configs"))
    assert cfg.pretrain is not None
    assert cfg.pretrain.dataset == "soccernet"
    assert cfg.pretrain.num_classes == 17
    assert cfg.num_classes == 12 and cfg.batch_size == 4


def test_crop_dim_minus_one_means_none():
    cfg = TDEEDConfig(crop_dim=-1)
    assert cfg.crop_dim is None  # ref: train_tdeed.py:110-111


def test_derived_quantities():
    cfg = TDEEDConfig(num_classes=4, epoch_num_frames=1000, clip_len=100,
                      batch_size=8, acc_grad_iter=2)
    assert cfg.num_classes_bg == 5
    assert cfg.dataset_len == 10
    assert cfg.micro_batch_size == 4
    assert cfg.shift_mode == "gsf" and cfg.backbone == "rny002"


def test_unknown_keys_ignored():
    cfg = TDEEDConfig.from_dict({"clip_len": 50, "bogus_key": 1})
    assert cfg.clip_len == 50


def test_batch_not_divisible_by_acc_rejected():
    with pytest.raises(AssertionError):
        TDEEDConfig(batch_size=8, acc_grad_iter=3)  # ref: train_tdeed.py:109


def test_metrics_logger_files(tmp_path):
    cfg = TDEEDConfig()
    logger = MetricsLogger(str(tmp_path), cfg, enable_wandb=False)
    logger.log_epoch({"epoch": 0, "train": 1.0, "val": 2.0})
    logger.log_test("test", [0.5, 0.6], [1, 2])
    logger.finish()
    with open(tmp_path / "results_test.json") as fp:
        rec = json.load(fp)
    assert rec["test_mAP@1"] == 0.5
    assert abs(rec["test_avg_mAP"] - 0.55) < 1e-9