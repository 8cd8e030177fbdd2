"""Orbax checkpoint round-trip + best/last manager semantics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdeed_tpu.checkpoint import CheckpointManager, restore_state, save_state
from tdeed_tpu.train.schedule import make_optimizer
from tdeed_tpu.train.state import TrainState


@pytest.fixture
def state():
    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
    stats = {"bn": {"mean": jnp.zeros((3,)), "var": jnp.ones((3,))}}
    tx = make_optimizer(1e-3, 10, 100)
    return tx, TrainState.create(params, stats, tx)


def _tree_equal(a, b):
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        a,
        b,
    )


def test_state_roundtrip(tmp_path, state):
    tx, st = state
    st = st.replace(step=st.step + 5)
    path = str(tmp_path / "ckpt")
    save_state(path, st)
    back = restore_state(path, st)
    assert int(back.step) == 5
    _tree_equal(back.params, st.params)
    _tree_equal(back.opt_state, st.opt_state)


def test_manager_best_last_and_resume(tmp_path, state):
    tx, st = state
    mgr = CheckpointManager(str(tmp_path / "run"))

    st1 = st.replace(step=st.step + 1)
    mgr.save_epoch(st1, 0, {"epoch": 0, "val": 2.0}, is_best=True, best_criterion=2.0)
    st2 = st1.replace(
        step=st1.step + 1,
        params={"w": st1.params["w"] * 2},
    )
    mgr.save_epoch(st2, 1, {"epoch": 1, "val": 3.0}, is_best=False, best_criterion=2.0)

    # best holds epoch-0 weights; last holds epoch-1
    best = mgr.restore_best()
    _tree_equal(best["params"], st1.params)
    restored, next_epoch = mgr.restore_last(st)
    assert next_epoch == 2
    _tree_equal(restored.params, st2.params)

    meta = mgr.load_meta()
    assert meta["best_criterion"] == 2.0
    assert len(meta["history"]) == 2
    assert os.path.exists(os.path.join(mgr.save_dir, "loss.json"))


def test_restore_last_fresh_run(tmp_path, state):
    _, st = state
    mgr = CheckpointManager(str(tmp_path / "empty"))
    restored, next_epoch = mgr.restore_last(st)
    assert next_epoch == 0
    assert restored is st


def test_load_backbone_overlays_pretrained(tmp_path):
    """backbone_ckpt path: a saved backbone tree lands in features/* and
    leaves every non-backbone parameter at its init value
    (ref: model/model.py:37-46 — timm pretrained=True)."""
    import orbax.checkpoint as ocp

    from tdeed_tpu.checkpoint import load_backbone
    from tdeed_tpu.config import TDEEDConfig
    from tdeed_tpu.models.tdeed import build_model

    cfg = TDEEDConfig(
        dataset="finediving", num_classes=2, clip_len=4, crop_dim=32,
        feature_arch="rny002_gsf", n_layers=1, radi_displacement=1,
    )
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    frames = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnums=(2,))(rng, frames, False)

    # Fabricate a "pretrained" backbone: init values + 1, minus the shift
    # modules (no timm counterpart — they keep their init).
    def strip_gs(tree):
        return {
            k: strip_gs(v) if isinstance(v, dict) else np.asarray(v) + 1.0
            for k, v in tree.items()
            if k != "gs"
        }

    pre = {
        "params": strip_gs(jax.device_get(variables["params"]["features"])),
        "batch_stats": strip_gs(
            jax.device_get(variables["batch_stats"]["features"])
        ),
    }
    path = str(tmp_path / "backbone")
    ocp.PyTreeCheckpointer().save(path, pre)

    merged = load_backbone(variables, path)

    stem_before = np.asarray(variables["params"]["features"]["stem"]["conv"]["kernel"])
    stem_after = np.asarray(merged["params"]["features"]["stem"]["conv"]["kernel"])
    np.testing.assert_allclose(stem_after, stem_before + 1.0, rtol=1e-6)
    # BN running stats come along too
    mean_after = np.asarray(merged["batch_stats"]["features"]["stem"]["bn"]["mean"])
    np.testing.assert_allclose(
        mean_after,
        np.asarray(variables["batch_stats"]["features"]["stem"]["bn"]["mean"]) + 1.0,
        rtol=1e-6,
    )
    # Non-backbone params untouched
    _tree_equal(merged["params"]["temp_enc"], variables["params"]["temp_enc"])
    _tree_equal(merged["params"]["pred_fine"], variables["params"]["pred_fine"])


def test_config_backbone_ckpt_key():
    from tdeed_tpu.config import TDEEDConfig

    cfg = TDEEDConfig.from_dict({"backbone_ckpt": "/some/orbax/dir"})
    assert cfg.backbone_ckpt == "/some/orbax/dir"
    assert TDEEDConfig().backbone_ckpt == ""


def test_restore_last_without_meta(tmp_path, state):
    """An interrupt-save writes checkpoint_last with no train_meta.json
    (Ctrl-C before the first save_epoch); --resume must still restore it
    (the CLI derives the exact position from state.step)."""
    _, st = state
    mgr = CheckpointManager(str(tmp_path / "run"))
    st = st.replace(step=st.step + 7)
    save_state(os.path.join(mgr.save_dir, "checkpoint_last"), st)

    restored, next_epoch = mgr.restore_last(st.replace(step=st.step * 0))
    assert next_epoch == 0
    assert int(restored.step) == 7
    _tree_equal(restored.params, st.params)
