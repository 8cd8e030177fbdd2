"""Data-parallel equivalence: the jitted train step must compute the same
numbers on 1 device and on an 8-way batch-sharded mesh (GSPMD inserts the
gradient/batch-stat all-reduces; BatchNorm stats are global-batch means).

Uses a miniature stand-in model with the same interface as TDEED (logits +
displ heads, BatchNorm batch_stats, dropout rng) so the full step logic
compiles in seconds on CPU.
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from tdeed_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch
from tdeed_tpu.train.schedule import make_optimizer
from tdeed_tpu.train.state import TrainState
from tdeed_tpu.train.step import make_train_step, make_val_step

B, T, S, C_BG = 8, 4, 8, 3


class MiniModel(nn.Module):
    """Tiny conv + BN + heads with TDEED's interface."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frames, train: bool = False):
        b, t, h, w, c = frames.shape
        x = frames.reshape(b * t, h, w, c)
        x = nn.Conv(8, (3, 3), use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        feat = jnp.mean(x, axis=(1, 2)).reshape(b, t, -1)
        feat = nn.Dropout(0.5, deterministic=not train)(feat)
        return {
            "logits": nn.Dense(C_BG)(feat).astype(jnp.float32),
            "displ": nn.Dense(1)(feat)[..., 0].astype(jnp.float32),
        }


@pytest.fixture(scope="module")
def setup():
    model = MiniModel()
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, T, S, S, 3)), False)
    tx = make_optimizer(1e-3, 10, 100)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    r = np.random.default_rng(0)
    batch = {
        "frame": r.integers(0, 256, (B, T, S, S, 3)).astype(np.uint8),
        "label": r.integers(0, C_BG, (B, T)).astype(np.int32),
        "labelD": r.integers(-1, 2, (B, T)).astype(np.float32),
        "frame2": r.integers(0, 256, (B, T, S, S, 3)).astype(np.uint8),
        "label2": r.integers(0, C_BG, (B, T)).astype(np.int32),
        "labelD2": r.integers(-1, 2, (B, T)).astype(np.float32),
    }
    step = jax.jit(
        make_train_step(
            model, tx, crop_dim=None, num_classes_bg=C_BG, mixup=True,
            radi_displacement=1, acc_grad_iter=1,
        )
    )
    return model, state, batch, step


def test_dp_matches_single_device(setup):
    model, state, batch, step = setup
    assert len(jax.devices()) >= 8, "conftest must fake 8 CPU devices"
    key = jax.random.PRNGKey(7)

    s1, m1 = step(state, jax.tree.map(jnp.asarray, batch), key)

    mesh = make_mesh(8)
    s8, m8 = step(state, shard_batch(batch, mesh), key)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=2e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        ),
        jax.device_get(s1.params),
        jax.device_get(s8.params),
    )
    # BN batch stats must be *global* means, not per-shard
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        ),
        jax.device_get(s1.batch_stats),
        jax.device_get(s8.batch_stats),
    )


def test_grad_accumulation_matches_full_batch(setup):
    """acc_grad_iter=2 mean-gradient must track the full-batch step closely
    (not exactly: BN stats thread through microbatches, ref behaviour)."""
    model, state, batch, _ = setup
    tx = make_optimizer(1e-3, 10, 100)
    key = jax.random.PRNGKey(7)

    full = jax.jit(make_train_step(
        model, tx, crop_dim=None, num_classes_bg=C_BG, mixup=False,
        radi_displacement=1, acc_grad_iter=1,
    ))
    acc = jax.jit(make_train_step(
        model, tx, crop_dim=None, num_classes_bg=C_BG, mixup=False,
        radi_displacement=1, acc_grad_iter=2,
    ))
    b = {k: jnp.asarray(v) for k, v in batch.items() if "2" not in k}
    _, mf = full(state, b, key)
    _, ma = acc(state, b, key)
    assert np.isfinite(float(mf["loss"])) and np.isfinite(float(ma["loss"]))


def test_real_tdeed_dp_matches_single_device():
    """The FULL TDEED model (rny002_gsf backbone with GSF batch stats,
    temp_enc, SGP-Mixer U-Net, both heads) computes identical loss/params/
    batch-stats on 1 device and on an 8-way batch-sharded mesh.

    Shapes/config mirror __graft_entry__.dryrun_multichip so the 8-way
    compile shares the persistent cache with the driver's dryrun.
    """
    from __graft_entry__ import _build

    from tdeed_tpu.models.tdeed import build_model

    clip_len, crop, size = 4, 32, 40
    cfg, _ = _build(clip_len, crop)
    # fp32 end-to-end for an exact 1-vs-8-device comparison (production
    # runs bf16; equivalence is about sharding, not dtype)
    cfg.dtype = "float32"
    model = build_model(cfg)

    rng = jax.random.PRNGKey(0)
    frames0 = jnp.zeros((1, clip_len, size, size, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnums=(2,))(
        rng, frames0[:, :, :crop, :crop], False
    )
    tx = make_optimizer(8e-4, warmup_steps=10, cosine_steps=100)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)

    step = jax.jit(
        make_train_step(
            model, tx, crop_dim=crop, num_classes_bg=cfg.num_classes_bg,
            mixup=True, radi_displacement=cfg.radi_displacement,
            acc_grad_iter=1,
        )
    )

    b = 16
    r = np.random.default_rng(0)
    batch = {
        "frame": r.integers(0, 256, (b, clip_len, size, size, 3)).astype(np.uint8),
        "label": r.integers(0, cfg.num_classes_bg, (b, clip_len)).astype(np.int32),
        "labelD": r.integers(-2, 3, (b, clip_len)).astype(np.float32),
        "frame2": r.integers(0, 256, (b, clip_len, size, size, 3)).astype(np.uint8),
        "label2": r.integers(0, cfg.num_classes_bg, (b, clip_len)).astype(np.int32),
        "labelD2": r.integers(-2, 3, (b, clip_len)).astype(np.float32),
    }
    key = jax.random.PRNGKey(7)

    s1, m1 = step(state, jax.tree.map(jnp.asarray, batch), key)
    mesh = make_mesh(8)
    s8, m8 = step(state, shard_batch(batch, mesh), key)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=2e-5)
    # The all-reduce sums in a different order than the local reduction;
    # AdamW normalizes gradients, so near-zero params see absolute noise up
    # to ~2e-5 (a fraction of the 8e-5 warmup step) and relative noise has
    # no floor — bound both: atol 5e-5 (far below any param scale that
    # matters), rtol 5e-4 for the rest.
    for name, t1, t8 in (
        ("params", s1.params, s8.params),
        ("batch_stats", s1.batch_stats, s8.batch_stats),
    ):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
            ),
            jax.device_get(t1),
            jax.device_get(t8),
        )


def test_form_global_batch_matches_shard_batch(setup):
    """form_global_batch (multi-host assembly) produces the same sharded
    arrays as shard_batch when one process owns the whole batch, and a
    jitted step consumes it unchanged."""
    from tdeed_tpu.parallel.mesh import form_global_batch

    model, state, batch, step = setup
    mesh = make_mesh(8)
    g = form_global_batch(batch, mesh)
    s = shard_batch(batch, mesh)
    for k in batch:
        assert g[k].shape == batch[k].shape
        assert g[k].sharding == s[k].sharding, k
        np.testing.assert_array_equal(np.asarray(g[k]), np.asarray(s[k]))

    key = jax.random.PRNGKey(7)
    _, m_global = step(state, g, key)
    _, m_local = step(state, s, key)
    np.testing.assert_allclose(
        float(m_global["loss"]), float(m_local["loss"]), rtol=1e-6
    )


def test_val_step_runs_sharded(setup):
    model, state, batch, _ = setup
    val = jax.jit(make_val_step(
        model, crop_dim=None, num_classes_bg=C_BG, radi_displacement=1,
    ))
    mesh = make_mesh(8)
    b = {k: v for k, v in batch.items() if "2" not in k}
    aux = val(state, shard_batch(b, mesh))
    assert np.isfinite(float(aux["loss"]))
    assert aux["logits"].shape == (B, T, C_BG)

def test_sharded_predict_matches_single_device(setup):
    """make_sharded_predict: batch-parallel eval forward == local program
    per sample (eval BN uses running stats, rows are independent)."""
    from tdeed_tpu.parallel.mesh import make_sharded_predict
    from tdeed_tpu.train.step import make_predict_step

    model, state, batch, _ = setup
    predict_step = jax.jit(
        make_predict_step(model, crop_dim=None, radi_displacement=1),
        static_argnums=(3,),
    )
    mesh = make_mesh(8)
    sharded = make_sharded_predict(
        predict_step, mesh, state.params, state.batch_stats
    )
    frames = batch["frame"]
    for hflip in (False, True):
        _, want = predict_step(
            state.params, state.batch_stats, frames, hflip
        )
        got = sharded(frames, hflip)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7
        )

    with pytest.raises(ValueError, match="not divisible"):
        sharded(frames[:3])


def test_run_inference_with_sharded_predict(setup, tmp_path):
    """The eval orchestrator's padded window batches drive the sharded
    predict_fn end-to-end (batch_size = mesh multiple)."""
    import os

    from tests.fixtures import make_finediving_fixture

    from tdeed_tpu.infer.evaluate import run_inference
    from tdeed_tpu.infer.windows import VideoWindows
    from tdeed_tpu.parallel.mesh import make_sharded_predict
    from tdeed_tpu.train.step import make_predict_step

    model, state, batch, _ = setup
    fx = make_finediving_fixture(str(tmp_path), num_videos=1, num_frames=24,
                                 size=S)
    classes = {"x": 1, "y": 2}  # MiniModel emits C_BG=3 logits (bg + 2)
    data = VideoWindows(
        "finediving",
        os.path.join(fx["data_root"], "finediving", "test.json"),
        fx["frame_dir"],
        T,
        overlap_len=T * 3 // 4,
        stride=1,
    )
    predict_step = jax.jit(
        make_predict_step(model, crop_dim=None, radi_displacement=1),
        static_argnums=(3,),
    )
    mesh = make_mesh(8)
    sharded = make_sharded_predict(
        predict_step, mesh, state.params, state.batch_stats
    )

    def plain(frames, hflip=False):
        return predict_step(state.params, state.batch_stats, frames, hflip)[1]

    got = run_inference(sharded, data, classes, batch_size=8)
    want = run_inference(plain, data, classes, batch_size=8)
    for video in want:
        np.testing.assert_allclose(
            got[video][0], want[video][0], rtol=1e-6, atol=1e-7
        )
        np.testing.assert_array_equal(got[video][1], want[video][1])
