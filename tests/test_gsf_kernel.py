"""GSF compute core (kernels/gated_shift.py) vs the Flax module, plus the
factored-gate parity and gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np

from tdeed_tpu.kernels.gated_shift import gsf_core
from tdeed_tpu.models.shift import GSF, _interleave_halves

B, T, H, W, C = 2, 5, 4, 4, 8


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


def test_gate_factored_matches_conv(rng):
    """The production factored gate (channel GEMM + 27 shifted adds) is
    numerically identical to the direct grouped-conv lowering, values and
    gradients (the factored form is the measured-fast production path)."""
    import jax
    import jax.numpy as jnp
    from tdeed_tpu.kernels.gated_shift import gsf_gate, gsf_gate_conv

    xn = jnp.asarray(rng.standard_normal((2, 5, 4, 6, 8)).astype(np.float32))
    w = jnp.asarray(0.1 * rng.standard_normal((3, 3, 3, 4, 2)).astype(np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal((2,)).astype(np.float32))

    a = gsf_gate(xn, w, b)
    c = gsf_gate_conv(xn, w, b)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=3e-6)

    f1 = lambda *args: jnp.sum(gsf_gate(*args) ** 2)
    f2 = lambda *args: jnp.sum(gsf_gate_conv(*args) ** 2)
    g1 = jax.grad(f1, argnums=(0, 1, 2))(xn, w, b)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(xn, w, b)
    for u, v in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=5e-5)


def test_post_gate_factored_matches_conv(rng):
    """Production post-gate (unrolled stats convs, activation-dtype math)
    vs the direct fp32+lax.conv oracle — exact in fp32, grads included."""
    from tdeed_tpu.kernels.gated_shift import (
        gsf_post_gate_conv,
        gsf_post_gate_ref,
    )

    x = jnp.asarray(rng.standard_normal((2, 5, 4, 6, 8)).astype(np.float32))
    gate = jnp.tanh(
        jnp.asarray(rng.standard_normal((2, 5, 4, 6, 2)).astype(np.float32))
    )
    args = [jnp.asarray(0.3 * rng.standard_normal(s).astype(np.float32))
            for s in [(3, 3, 2, 1), (1,), (3, 3, 2, 1), (1,)]]

    a = gsf_post_gate_ref(x, gate, *args)
    b = gsf_post_gate_conv(x, gate, *args)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    ga = jax.grad(lambda *z: jnp.sum(gsf_post_gate_ref(*z) ** 2),
                  argnums=tuple(range(6)))(x, gate, *args)
    gb = jax.grad(lambda *z: jnp.sum(gsf_post_gate_conv(*z) ** 2),
                  argnums=tuple(range(6)))(x, gate, *args)
    for u, v in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=5e-5)
