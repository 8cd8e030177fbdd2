"""Displacement decode vs a literal loop oracle of the reference semantics
(ref: model/modules.py:406-414)."""

import jax.numpy as jnp
import numpy as np

from tdeed_tpu.ops.displacement import (
    decode_displacement,
    soft_labels_from_displacement,
)


def _oracle(probs: np.ndarray, displ: np.ndarray) -> np.ndarray:
    """Python double loop: shift each frame's scores by -round(displ),
    clamp, elementwise max into the output."""
    b, t, c = probs.shape
    out = np.zeros_like(probs)
    for i in range(b):
        for j in range(t):
            # round-half-to-even, like torch.round / jnp.round
            tgt = int(np.clip(j - np.round(displ[i, j]), 0, t - 1))
            out[i, tgt] = np.maximum(out[i, tgt], probs[i, j])
    return out


def test_decode_matches_loop_oracle(rng):
    b, t, c = 3, 17, 5
    probs = rng.random((b, t, c)).astype(np.float32)
    displ = (rng.random((b, t)).astype(np.float32) - 0.5) * 8
    got = np.asarray(decode_displacement(jnp.asarray(probs), jnp.asarray(displ)))
    np.testing.assert_allclose(got, _oracle(probs, displ), rtol=1e-6)


def test_decode_zero_support_rows(rng):
    """Rows no frame maps to must stay exactly zero (load-bearing for the
    eval aggregation's support counting — ref: util/eval.py:317)."""
    b, t, c = 1, 10, 3
    probs = np.ones((b, t, c), np.float32)
    displ = np.full((b, t), -3.0, np.float32)  # every frame maps 3 ahead
    got = np.asarray(decode_displacement(jnp.asarray(probs), jnp.asarray(displ)))
    # frames 0,1,2 receive nothing
    assert np.all(got[0, :3] == 0)
    assert np.all(got[0, 3:] == 1)


def test_soft_labels_from_displacement():
    label = np.array([[0, 2, 2, 2, 0]])
    label_d = np.array([[0, -1, 0, 1, 0]])
    out = soft_labels_from_displacement(label, label_d, num_classes=4)
    # all three dilated rows collapse onto the true event frame 2
    assert out[0, 2, 2] == 1.0 and out[0, 2, 0] == 0.0
    assert out[0, 1, 0] == 1.0 and out[0, 3, 0] == 1.0  # background elsewhere