"""Temporal ops vs torch oracles (AdaptiveMaxPool1d / linear upsample)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tdeed_tpu.ops.temporal import (
    adaptive_max_pool1d,
    linear_upsample,
    lshift_zero,
    rshift_zero,
)
from tdeed_tpu.ops.displacement import decode_displacement


def test_adaptive_max_pool_matches_torch(rng):
    for t_in, t_out in [(100, 50), (50, 25), (25, 13), (13, 7), (100, 13), (7, 7)]:
        x = rng.standard_normal((2, t_in, 8)).astype(np.float32)
        got = np.asarray(adaptive_max_pool1d(jnp.asarray(x), t_out))
        want = (
            torch.nn.AdaptiveMaxPool1d(t_out)(
                torch.from_numpy(x).permute(0, 2, 1)
            )
            .permute(0, 2, 1)
            .numpy()
        )
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_linear_upsample_matches_torch(rng):
    for t_in, t_out in [(25, 50), (13, 25), (7, 13), (50, 100), (1, 4)]:
        x = rng.standard_normal((2, t_in, 8)).astype(np.float32)
        got = np.asarray(linear_upsample(jnp.asarray(x), t_out))
        want = (
            F.interpolate(
                torch.from_numpy(x).permute(0, 2, 1),
                size=t_out,
                mode="linear",
                align_corners=True,
            )
            .permute(0, 2, 1)
            .numpy()
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_shift_zero_pad(rng):
    x = rng.standard_normal((2, 5, 3, 3, 4)).astype(np.float32)
    l = np.asarray(lshift_zero(jnp.asarray(x), axis=1))
    r = np.asarray(rshift_zero(jnp.asarray(x), axis=1))
    np.testing.assert_array_equal(l[:, :-1], x[:, 1:])
    assert np.all(l[:, -1] == 0)
    np.testing.assert_array_equal(r[:, 1:], x[:, :-1])
    assert np.all(r[:, 0] == 0)


def test_decode_displacement_matches_reference_loop(rng):
    """Oracle = the reference Python loop (ref: model/modules.py:406-414)."""
    b, t, c = 3, 20, 5
    probs = rng.random((b, t, c)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    displ = (rng.standard_normal((b, t)) * 3).astype(np.float32)

    want = np.zeros_like(probs)
    tdispl = torch.from_numpy(displ)
    for i in range(b):
        for j in range(t):
            d = int(tdispl[i, j].round().item())
            tgt = max(0, min(t - 1, j - d))
            want[i, tgt] = np.maximum(want[i, tgt], probs[i, j])

    got = np.asarray(decode_displacement(jnp.asarray(probs), jnp.asarray(displ)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
