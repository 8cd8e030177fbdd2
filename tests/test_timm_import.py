"""Weight-importer test: build a timm-shaped state_dict from the Flax tree's
own shapes (inverse layout transform), convert it back, and verify exact
round-trip + a working forward pass."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from import_timm_weights import convert_state_dict, merge_into_model  # noqa: E402

from tdeed_tpu.models.regnet import RegNetY


def _fake_timm_sd(params, stats):
    """Invert the converter's layout mapping to synthesize timm-style keys."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv_entry(key, kernel):
        sd[key] = np.transpose(
            rng.normal(size=kernel.shape).astype(np.float32), (3, 2, 0, 1)
        )

    for mod, sub in params.items():
        timm_mod = "stem" if mod == "stem" else mod.replace("_", ".")
        if mod == "stem":
            conv_entry("stem.conv.weight", sub["conv"]["kernel"])
            sd["stem.bn.weight"] = rng.normal(size=sub["bn"]["scale"].shape).astype(np.float32)
            sd["stem.bn.bias"] = rng.normal(size=sub["bn"]["bias"].shape).astype(np.float32)
            continue
        for blockpart, ptree in sub.items():
            if blockpart in ("conv1", "conv2", "conv3", "downsample"):
                conv_entry(f"{timm_mod}.{blockpart}.conv.weight", ptree["conv"]["kernel"])
                sd[f"{timm_mod}.{blockpart}.bn.weight"] = rng.normal(
                    size=ptree["bn"]["scale"].shape
                ).astype(np.float32)
                sd[f"{timm_mod}.{blockpart}.bn.bias"] = rng.normal(
                    size=ptree["bn"]["bias"].shape
                ).astype(np.float32)
            elif blockpart == "se":
                for fc in ("fc1", "fc2"):
                    conv_entry(f"{timm_mod}.se.{fc}.weight", ptree[fc]["kernel"])
                    sd[f"{timm_mod}.se.{fc}.bias"] = rng.normal(
                        size=ptree[fc]["bias"].shape
                    ).astype(np.float32)

    for mod, sub in stats.items():
        timm_mod = "stem" if mod == "stem" else mod.replace("_", ".")
        def emit_stats(prefix, tree):
            for k, v in tree.items():
                if isinstance(v, dict):
                    emit_stats(f"{prefix}.{k}", v)
                elif k == "mean":
                    sd[f"{prefix}.running_mean"] = rng.normal(size=v.shape).astype(np.float32)
                elif k == "var":
                    sd[f"{prefix}.running_var"] = np.abs(
                        rng.normal(size=v.shape)
                    ).astype(np.float32) + 0.5
        emit_stats(timm_mod, sub)
    # head is stripped by the converter
    sd["head.fc.weight"] = np.zeros((1000, 8), np.float32)
    return sd


@pytest.mark.parametrize("arch", ["rny002"])
def test_roundtrip_and_forward(arch):
    model = RegNetY(arch=arch)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    sd = _fake_timm_sd(params, stats)
    conv_p, conv_s = convert_state_dict(sd)

    merged = merge_into_model(
        {"params": {"features": params}, "batch_stats": {"features": stats}},
        conv_p,
        conv_s,
    )

    # exact value checks through the layout transform
    np.testing.assert_array_equal(
        merged["params"]["features"]["stem"]["conv"]["kernel"],
        np.transpose(sd["stem.conv.weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_array_equal(
        merged["batch_stats"]["features"]["s1_b1"]["conv1"]["bn"]["mean"],
        sd["s1.b1.conv1.bn.running_mean"],
    )
    np.testing.assert_array_equal(
        merged["params"]["features"]["s2_b1"]["se"]["fc1"]["bias"],
        sd["s2.b1.se.fc1.bias"],
    )

    out = model.apply(
        {
            "params": merged["params"]["features"],
            "batch_stats": merged["batch_stats"]["features"],
        },
        x,
        False,
    )
    assert out.shape[0] == 2 and np.all(np.isfinite(out))
