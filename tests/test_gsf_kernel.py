"""Fused GSF kernel (interpret mode) vs the functional reference and the
Flax module, plus gradient path checks."""

import jax
import jax.numpy as jnp
import numpy as np

from tdeed_tpu.kernels.gated_shift import gsf_core, gsf_fused
from tdeed_tpu.models.shift import GSF, _interleave_halves

B, T, H, W, C = 2, 5, 4, 4, 8


def _inputs(rng):
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    xn = jax.nn.relu(x + 0.1)  # stand-in for BN+ReLU output
    gate_w = jnp.asarray(
        rng.standard_normal((3, 3, 3, C // 2, 2)).astype(np.float32) * 0.1
    )
    gate_b = jnp.asarray(rng.standard_normal((2,)).astype(np.float32) * 0.1)
    ch1_w = jnp.asarray(rng.standard_normal((3, 3, 2, 1)).astype(np.float32))
    ch1_b = jnp.asarray(rng.standard_normal((1,)).astype(np.float32))
    ch2_w = jnp.asarray(rng.standard_normal((3, 3, 2, 1)).astype(np.float32))
    ch2_b = jnp.asarray(rng.standard_normal((1,)).astype(np.float32))
    return x, xn, gate_w, gate_b, ch1_w, ch1_b, ch2_w, ch2_b


def test_kernel_matches_reference(rng):
    args = _inputs(rng)
    want = np.asarray(gsf_core(*args))
    got = np.asarray(gsf_fused(*args, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_reference_matches_flax_module(rng):
    """gsf_core + interleave == the Flax GSF in eval mode with BN neutral."""
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    mod = GSF()
    variables = mod.init(jax.random.PRNGKey(0), x, False)

    params = variables["params"]
    # neutral BN (mean 0, var 1, scale 1, bias 0) => xn = relu(x)
    want = np.asarray(mod.apply(variables, x, False))

    gate_w = params["gate_conv"]["conv"]["kernel"]
    gate_b = params["gate_conv"]["conv"]["bias"]
    ch1_w = params["channel_conv1"]["conv"]["kernel"]
    ch1_b = params["channel_conv1"]["conv"]["bias"]
    ch2_w = params["channel_conv2"]["conv"]["kernel"]
    ch2_b = params["channel_conv2"]["conv"]["bias"]
    xn = jax.nn.relu(x)
    core = gsf_core(x, xn, gate_w, gate_b, ch1_w, ch1_b, ch2_w, ch2_b)
    got = np.asarray(_interleave_halves(core[..., : C // 2], core[..., C // 2:]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gradients_flow(rng):
    args = _inputs(rng)

    def loss_fused(*a):
        return jnp.sum(gsf_fused(*a, interpret=True) ** 2)

    def loss_ref(*a):
        return jnp.sum(gsf_core(*a) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 2, 4))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 2, 4))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )

def test_gate_conv_custom_backward_matches_autodiff(rng):
    """gate_conv's hand-written VJP vs jax autodiff of the raw conv."""
    import jax
    import jax.numpy as jnp
    from tdeed_tpu.kernels.gated_shift import gate_conv

    xn = jnp.asarray(rng.standard_normal((2, 5, 4, 4, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 4, 2)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((2,)).astype(np.float32))

    def raw(xn, w, b):
        return jax.lax.conv_general_dilated(
            xn, w, (1, 1, 1), "SAME",
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            feature_group_count=2,
        ) + b

    cot = jnp.asarray(rng.standard_normal((2, 5, 4, 4, 2)).astype(np.float32))

    out_c, vjp_c = jax.vjp(gate_conv, xn, w, b)
    out_r, vjp_r = jax.vjp(raw, xn, w, b)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_r), rtol=1e-5, atol=1e-5)
    for a, bb_ in zip(vjp_c(cot), vjp_r(cot)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb_), rtol=2e-4, atol=2e-4
        )
