"""SGPBlock / SGPMixer / EDSGPMixer golden parity vs torch oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tdeed_tpu.models.sgp import EDSGPMixer, SGPBlock, SGPMixer
from tdeed_tpu.utils.torch_convert import (
    conv1d_kernel,
    dense_from_conv1x1,
    norm_vec,
)
from tests.torch_oracles import OracleSGPBlock, OracleSGPMixer

C, KS, K = 32, 7, 4.0


def _np(x):
    return x.detach().numpy()


def _dw(conv):
    return {
        "Conv_0": {"kernel": conv1d_kernel(_np(conv.weight)), "bias": _np(conv.bias)}
    }


def _ffn(oracle):
    return {
        "gn": {"scale": _np(oracle.gn.weight), "bias": _np(oracle.gn.bias)},
        "mlp_fc1": {
            "dense": {
                "kernel": dense_from_conv1x1(_np(oracle.mlp[0].weight)),
                "bias": _np(oracle.mlp[0].bias),
            }
        },
        "mlp_fc2": {
            "dense": {
                "kernel": dense_from_conv1x1(_np(oracle.mlp[2].weight)),
                "bias": _np(oracle.mlp[2].bias),
            }
        },
    }


def _ln(ln):
    return {"scale": norm_vec(_np(ln.weight)), "bias": norm_vec(_np(ln.bias))}


def sgp_params_from_oracle(o: OracleSGPBlock):
    return {
        "ln": _ln(o.ln),
        "psi": _dw(o.psi),
        "fc": _dw(o.fc),
        "convw": _dw(o.convw),
        "convkw": _dw(o.convkw),
        "global_fc": _dw(o.global_fc),
        "ffn": _ffn(o),
    }


def mixer_params_from_oracle(o: OracleSGPMixer):
    return {
        "ln1": _ln(o.ln1),
        "ln2": _ln(o.ln2),
        "psi1": _dw(o.psi1),
        "psi2": _dw(o.psi2),
        "convw1": _dw(o.convw1),
        "convkw1": _dw(o.convkw1),
        "convw2": _dw(o.convw2),
        "convkw2": _dw(o.convkw2),
        "fc1": _dw(o.fc1),
        "fc2": _dw(o.fc2),
        "global_fc1": _dw(o.global_fc1),
        "global_fc2": _dw(o.global_fc2),
        "concat_fc": {
            "kernel": conv1d_kernel(_np(o.concat_fc.weight)),
            "bias": _np(o.concat_fc.bias),
        },
        "ffn": _ffn(o),
    }


def test_sgp_block_matches_oracle(rng):
    torch.manual_seed(0)
    oracle = OracleSGPBlock(C, KS, K).eval()
    x = rng.standard_normal((2, 20, C)).astype(np.float32)

    with torch.no_grad():
        want = (
            oracle(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
        )

    mod = SGPBlock(kernel_size=KS, k=K, dtype=jnp.float32)
    params = sgp_params_from_oracle(oracle)
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sgp_mixer_matches_oracle(rng):
    torch.manual_seed(1)
    t_small, t_big = 13, 25
    oracle = OracleSGPMixer(C, KS, K, t_size=t_big).eval()
    x = rng.standard_normal((2, t_small, C)).astype(np.float32)
    z = rng.standard_normal((2, t_big, C)).astype(np.float32)

    with torch.no_grad():
        want = (
            oracle(
                torch.from_numpy(x).permute(0, 2, 1),
                torch.from_numpy(z).permute(0, 2, 1),
            )
            .permute(0, 2, 1)
            .numpy()
        )

    mod = SGPMixer(t_size=t_big, kernel_size=KS, k=K, dtype=jnp.float32)
    params = mixer_params_from_oracle(oracle)
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(z)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_ed_sgp_mixer_shapes():
    """U-Net level sizes: 100 -> 50 -> 25 (ref: model/modules.py:62-67)."""
    mod = EDSGPMixer(clip_len=100, num_layers=2, kernel_size=7, k=4.0, dtype=jnp.float32)
    x = jnp.ones((2, 100, C))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    y = mod.apply({"params": params}, x)
    assert y.shape == (2, 100, C)
    # 2L+1 SGP blocks + L mixers exist
    names = set(params.keys())
    assert {"sgp_0", "sgp_1", "sgp_2", "sgp_3", "sgp_4", "mixer_0", "mixer_1"} <= names


def test_ed_sgp_mixer_full_unet_matches_oracle():
    """The COMPLETE temporal U-Net vs the torch composition with identical
    weights (ref wiring: model/modules.py:58-87 — down SGP+pool levels,
    bottleneck, back-to-front mixer+SGP decoder with stored skips). Pins
    the pooling plans, skip ordering, and align_corners upsample in one
    assertion."""
    import math

    torch.manual_seed(7)
    T, L = 25, 2
    lens = [math.ceil(T / (2 ** i)) for i in range(L + 1)]

    blocks = [OracleSGPBlock(C, KS, K).eval() for _ in range(2 * L + 1)]
    mixers = [OracleSGPMixer(C, KS, K, t_size=lens[i]).eval()
              for i in range(L)]
    pools = [torch.nn.AdaptiveMaxPool1d(lens[i + 1]) for i in range(L)]

    x0 = np.random.default_rng(2).standard_normal((2, T, C)).astype(np.float32)

    with torch.no_grad():
        x = torch.from_numpy(x0).permute(0, 2, 1)
        skips = []
        for i in range(L):
            x = blocks[i](x)
            skips.append(x)
            x = pools[i](x)
        x = blocks[L](x)
        for i in range(L):
            x = mixers[-(i + 1)](x, skips[-(i + 1)])
            x = blocks[L + i + 1](x)
        want = x.permute(0, 2, 1).numpy()

    params = {}
    for i, b in enumerate(blocks):
        params[f"sgp_{i}"] = sgp_params_from_oracle(b)
    for i, m in enumerate(mixers):
        params[f"mixer_{i}"] = mixer_params_from_oracle(m)

    mod = EDSGPMixer(clip_len=T, num_layers=L, kernel_size=KS, k=K,
                     dtype=jnp.float32)
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x0)))
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5)
