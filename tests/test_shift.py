"""GSM / GSF / GatedShift golden parity vs torch oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tdeed_tpu.models.shift import GSF, GSM, GatedShift, fold_dim_for
from tdeed_tpu.utils.torch_convert import conv2d_kernel, conv3d_kernel
from tests.torch_oracles import OracleGSF, OracleGSM

B, T, F, H, W = 2, 8, 16, 6, 6


def _np(x):
    return x.detach().numpy()


def _to_nhwc(x_tchw):  # (B*T, C, H, W) -> (B, T, H, W, C)
    return np.transpose(x_tchw.reshape(B, T, F, H, W), (0, 1, 3, 4, 2))


def _from_nhwc(y):  # (B, T, H, W, C) -> (B*T, C, H, W)
    return np.transpose(y, (0, 1, 4, 2, 3)).reshape(B * T, F, H, W)


def _bn_vars(bn):
    return (
        {"scale": _np(bn.weight), "bias": _np(bn.bias)},
        {"mean": _np(bn.running_mean), "var": _np(bn.running_var)},
    )


def test_gsm_matches_oracle(rng):
    torch.manual_seed(0)
    oracle = OracleGSM(F, T)
    # Non-trivial gate weights (zero-init would make the test vacuous).
    with torch.no_grad():
        oracle.conv3d.weight.normal_(0, 0.1)
        oracle.conv3d.bias.normal_(0, 0.1)
        oracle.bn.running_mean.normal_(0, 0.1)
        oracle.bn.running_var.uniform_(0.5, 1.5)
        oracle.bn.weight.normal_(1, 0.1)
        oracle.bn.bias.normal_(0, 0.1)

    x = rng.standard_normal((B * T, F, H, W)).astype(np.float32)
    bn_p, bn_s = _bn_vars(oracle.bn)
    variables = {
        "params": {
            "bn": bn_p,
            "gate_conv": {
                "kernel": conv3d_kernel(_np(oracle.conv3d.weight)),
                "bias": _np(oracle.conv3d.bias),
            },
        },
        "batch_stats": {"bn": bn_s},
    }
    mod = GSM(dtype=jnp.float32)

    # Eval mode: running stats.
    oracle.eval()
    with torch.no_grad():
        want = _np(oracle(torch.from_numpy(x)))
    got = mod.apply(variables, jnp.asarray(_to_nhwc(x)), False)
    np.testing.assert_allclose(_from_nhwc(np.asarray(got)), want, rtol=2e-3, atol=3e-4)

    # Train mode: batch statistics.
    oracle.train()
    with torch.no_grad():
        want = _np(oracle(torch.from_numpy(x)))
    got, _ = mod.apply(
        variables, jnp.asarray(_to_nhwc(x)), True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(_from_nhwc(np.asarray(got)), want, rtol=2e-3, atol=5e-4)


def test_gsf_matches_oracle(rng):
    torch.manual_seed(1)
    oracle = OracleGSF(F, T).eval()
    with torch.no_grad():
        oracle.bn.running_mean.normal_(0, 0.1)
        oracle.bn.running_var.uniform_(0.5, 1.5)
        oracle.bn.weight.normal_(1, 0.1)
        oracle.bn.bias.normal_(0, 0.1)

    x = rng.standard_normal((B * T, F, H, W)).astype(np.float32)
    bn_p, bn_s = _bn_vars(oracle.bn)
    variables = {
        "params": {
            "bn": bn_p,
            "gate_conv": {
                "conv": {
                    "kernel": conv3d_kernel(_np(oracle.conv3d.weight)),
                    "bias": _np(oracle.conv3d.bias),
                }
            },
            "channel_conv1": {
                "conv": {
                    "kernel": conv2d_kernel(_np(oracle.channel_conv1.weight)),
                    "bias": _np(oracle.channel_conv1.bias),
                }
            },
            "channel_conv2": {
                "conv": {
                    "kernel": conv2d_kernel(_np(oracle.channel_conv2.weight)),
                    "bias": _np(oracle.channel_conv2.bias),
                }
            },
        },
        "batch_stats": {"bn": bn_s},
    }
    mod = GSF(dtype=jnp.float32)
    with torch.no_grad():
        want = _np(oracle(torch.from_numpy(x)))
    got = mod.apply(variables, jnp.asarray(_to_nhwc(x)), False)
    np.testing.assert_allclose(_from_nhwc(np.asarray(got)), want, rtol=2e-3, atol=3e-4)


def test_fold_dim():
    # ref: model/shift.py:79 — fold_dim = ceil(channels//4 / 4) * 4
    assert fold_dim_for(64) == 16
    assert fold_dim_for(152) == 40
    assert fold_dim_for(368) == 92
    assert fold_dim_for(56) == 16


def test_gated_shift_passthrough_and_identity_at_init(rng):
    """GSM gates are zero-init => pure residual passthrough at init
    (ref: model/impl/gsm.py:75-76: identity behaviour before training)."""
    c = 48
    x = rng.standard_normal((B * T, H, W, c)).astype(np.float32)
    mod = GatedShift(clip_len=T, mode="gsm", dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    y, _ = mod.apply(variables, jnp.asarray(x), True, mutable=["batch_stats"])
    y = np.asarray(y)
    fold = fold_dim_for(c)
    # untouched channels pass through exactly
    np.testing.assert_array_equal(y[..., fold:], x[..., fold:])
    # zero gate => y = interleave(r1, r2) with r = x (gate=0) => channel permute of x
    # so the set of values per (n, h, w) position is preserved
    np.testing.assert_allclose(
        np.sort(y[..., :fold], axis=-1), np.sort(x[..., :fold], axis=-1), rtol=1e-6
    )


def test_gsm_factored_gate_is_conv_exact(rng):
    """GSM routes its gate through the factored channel GEMM
    (kernels/gated_shift.gsf_gate). Pin the full module output in fp32
    against the same math with the DIRECT conv gate (gsf_gate_conv, the
    reference lowering, ref: model/impl/gsm.py:73-96) at the accumulation-
    order tolerance the GSF gate test uses (tests/test_gsf_kernel.py)."""
    from tdeed_tpu.kernels.gated_shift import gsf_gate_conv
    from tdeed_tpu.models.shift import _interleave_halves
    from tdeed_tpu.ops.temporal import lshift_zero, rshift_zero

    torch.manual_seed(9)
    w = rng.standard_normal((3, 3, 3, F // 2, 2)).astype(np.float32) * 0.1
    b = rng.standard_normal((2,)).astype(np.float32) * 0.1
    bn_p = {
        "scale": rng.uniform(0.8, 1.2, F).astype(np.float32),
        "bias": rng.standard_normal(F).astype(np.float32) * 0.1,
    }
    bn_s = {
        "mean": rng.standard_normal(F).astype(np.float32) * 0.1,
        "var": rng.uniform(0.5, 1.5, F).astype(np.float32),
    }
    variables = {
        "params": {"bn": bn_p, "gate_conv": {"kernel": w, "bias": b}},
        "batch_stats": {"bn": bn_s},
    }
    x = rng.standard_normal((B, T, H, W, F)).astype(np.float32)
    got = np.asarray(GSM(dtype=jnp.float32).apply(variables, jnp.asarray(x), False))

    # Same module math, direct-conv gate. BN in SplitBatchNorm's exact
    # fused-affine form (x*a + b with a = scale*rsqrt(var+eps)).
    a = jnp.asarray(bn_p["scale"]) * jax.lax.rsqrt(jnp.asarray(bn_s["var"]) + 1e-5)
    bb = jnp.asarray(bn_p["bias"]) - jnp.asarray(bn_s["mean"]) * a
    xn = jnp.maximum(jnp.asarray(x) * a + bb, 0.0)
    gate = gsf_gate_conv(xn, jnp.asarray(w), jnp.asarray(b))
    g1, g2 = gate[..., 0:1], gate[..., 1:2]
    x1, x2 = jnp.asarray(x[..., : F // 2]), jnp.asarray(x[..., F // 2 :])
    y1, y2 = g1 * x1, g2 * x2
    y1 = lshift_zero(y1, axis=1) + (x1 - y1)
    y2 = rshift_zero(y2, axis=1) + (x2 - y2)
    want = np.asarray(_interleave_halves(y1, y2))

    np.testing.assert_allclose(got, want, atol=3e-5)
