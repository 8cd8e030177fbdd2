"""Pin the convergence experiment's host-side lambda replay.

tools/convergence_check.mixup_lam_sequence claims to replay, host-side,
the EXACT per-step Beta(0.2,0.2) mixup lambdas the jitted train step
draws internally (fold_in(key, state.step) at train/step.py:164, first of
the 4-way split at train/step.py:86). The 400-step mixup
convergence-equivalence experiment (docs/experiments/
convergence_mixup_r5.json) rests on that replay being exact, so this test
guards it against drift in the step's key plumbing: a mixup train step
run with its REAL internal sampler must produce the same loss as the same
step re-built with the host-derived lambda injected as a constant — at
step 0 and at a non-zero state.step (pinning the fold_in component).

Ref mixup recipe: model/model.py:228-254.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdeed_tpu.models.tdeed import TDEED
from tdeed_tpu.train import augment
from tdeed_tpu.train.schedule import make_optimizer
from tdeed_tpu.train.state import TrainState
from tdeed_tpu.train.step import make_train_step

T, HW, NUM_CLASSES = 4, 16, 2
NC_BG = NUM_CLASSES + 1


@pytest.fixture()
def neutral_photometric(monkeypatch):
    monkeypatch.setattr(
        augment,
        "train_preprocess",
        lambda frames, key, crop: augment.standardize(
            frames.astype(jnp.float32) / 255.0
        ),
    )


@pytest.mark.parametrize("start_step", [0, 7])
def test_mixup_lam_sequence_replays_step_draws(
    neutral_photometric, monkeypatch, start_step
):
    from tools.convergence_check import B, mixup_lam_sequence

    # Derive the table BEFORE any monkeypatching — mixup_lam_sequence calls
    # augment.sample_mixup_lam itself.
    lam_seq = mixup_lam_sequence(start_step + 2)
    # Anti-triviality: the per-step lambdas genuinely vary (Beta(0.2,0.2)
    # is bimodal near {0,1}, so compare across the whole table, not one
    # adjacent pair).
    table = np.stack(lam_seq)
    assert np.ptp(table, axis=0).max() > 1e-2

    model = TDEED(
        num_classes=NUM_CLASSES, clip_len=T, feature_arch="rny002_gsf",
        n_layers=1, sgp_ks=3, sgp_r=2, radi_displacement=1,
        dtype=jnp.float32,
    )
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), jnp.zeros((B, T, HW, HW, 3), jnp.float32),
        False,
    )
    tx = make_optimizer(1e-3, warmup_steps=10, cosine_steps=100)

    rng = np.random.default_rng(9)
    batch = {
        "frame": jnp.asarray(
            rng.integers(0, 256, (B, T, HW, HW, 3), np.uint8)),
        "label": jnp.asarray(rng.integers(0, NC_BG, (B, T)).astype(np.int32)),
        "labelD": jnp.asarray(rng.uniform(-1, 1, (B, T)).astype(np.float32)),
        "frame2": jnp.asarray(
            rng.integers(0, 256, (B, T, HW, HW, 3), np.uint8)),
        "label2": jnp.asarray(
            rng.integers(0, NC_BG, (B, T)).astype(np.int32)),
        "labelD2": jnp.asarray(rng.uniform(-1, 1, (B, T)).astype(np.float32)),
    }

    def fresh_state():
        s = TrainState.create(variables["params"], variables["batch_stats"], tx)
        return s.replace(step=jnp.asarray(start_step, s.step.dtype))

    def one_loss():
        step_fn = jax.jit(make_train_step(
            model, tx, crop_dim=None, num_classes_bg=NC_BG, mixup=True,
            radi_displacement=1, pallas_augment=False,
        ))
        # The same caller key jax_run uses; the step folds in state.step.
        _, metrics = step_fn(fresh_state(), batch, jax.random.PRNGKey(42))
        return float(metrics["loss"])

    loss_real = one_loss()

    # Re-build with the host-derived lambda injected as a constant: if the
    # replay derivation matches the step's internal k_mix, the losses agree
    # to float tolerance (everything else is keyed identically).
    monkeypatch.setattr(
        augment, "sample_mixup_lam",
        lambda key, b: jnp.asarray(lam_seq[start_step]),
    )
    loss_injected = one_loss()

    np.testing.assert_allclose(loss_injected, loss_real, rtol=1e-6)
