"""RegNet-Y topology and TDEED assembly sanity checks.

Full timm-weight parity needs a checkpoint (no network egress here); the
converter mapping is exercised in test_timm_convert.py. Here: stage widths
from the RegNet generation recipe, param counts vs the reference's printed
sizes (~2.8M/5.7M trunk after removing the 1000-class head from 3.2M/6.3M;
ref: model/model.py:37-46,174-183), and end-to-end shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tdeed_tpu.models.regnet import ARCH_PARAMS, RegNetY, feature_dim, generate_stages
from tdeed_tpu.models.tdeed import TDEED


def _n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def test_stage_generation():
    p = ARCH_PARAMS["rny002"]
    widths, depths, groups = generate_stages(
        p["w0"], p["wa"], p["wm"], p["depth"], p["group_size"]
    )
    assert widths == [24, 56, 152, 368]
    assert depths == [1, 1, 4, 7]
    assert sum(depths) == 13
    assert feature_dim("rny002") == 368

    p = ARCH_PARAMS["rny008"]
    widths, depths, groups = generate_stages(
        p["w0"], p["wa"], p["wm"], p["depth"], p["group_size"]
    )
    assert widths[-1] == 768
    assert sum(depths) == 14
    assert feature_dim("rny008") == 768


def test_regnet_forward_and_params():
    mod = RegNetY(arch="rny002", dtype=jnp.float32)
    x = jnp.ones((2, 64, 64, 3))
    variables = mod.init(jax.random.PRNGKey(0), x, False)
    y = mod.apply(variables, x, False)
    assert y.shape == (2, 368)
    n = _n_params(variables["params"])
    # timm regnety_002 trunk (no classifier): ~2.8M
    assert 2.5e6 < n < 3.1e6, n


def test_tdeed_forward_shapes():
    clip_len, b, hw, nc = 16, 2, 64, 4
    mod = TDEED(
        num_classes=nc, clip_len=clip_len, feature_arch="rny002_gsf",
        n_layers=2, sgp_ks=7, sgp_r=4, radi_displacement=2, dtype=jnp.float32,
    )
    frames = jnp.zeros((b, clip_len, hw, hw, 3))
    variables = mod.init(jax.random.PRNGKey(0), frames, False)
    out = mod.apply(variables, frames, False)
    assert out["logits"].shape == (b, clip_len, nc + 1)
    assert out["displ"].shape == (b, clip_len)
    # GSF shift params exist only in s3/s4 (ref: model/shift.py:57-59)
    feats = variables["params"]["features"]
    assert "gs" in feats["s3_b1"] and "gs" in feats["s4_b1"]
    assert "gs" not in feats["s1_b1"] and "gs" not in feats["s2_b1"]


def test_tdeed_two_heads():
    clip_len, b, hw = 8, 1, 32
    mod = TDEED(
        num_classes=12, clip_len=clip_len, feature_arch="rny002_gsf",
        n_layers=1, sgp_ks=3, sgp_r=2, radi_displacement=1,
        two_heads=(13, 18), dtype=jnp.float32,
    )
    frames = jnp.zeros((b, clip_len, hw, hw, 3))
    variables = mod.init(jax.random.PRNGKey(0), frames, False)
    out = mod.apply(variables, frames, False)
    assert out["logits"].shape == (b, clip_len, 31)  # 13 + 18


def test_rny008_gsf_forward():
    """rny008 (the _big configs' backbone, group width 16) builds and runs
    with GSF injection; feature dim 768 (ref: model/model.py:37-46)."""
    mod = RegNetY(arch="rny008", shift_mode="gsf", clip_len=4,
                  dtype=jnp.float32)
    x = jnp.ones((4, 32, 32, 3))  # B*T with T=4
    variables = mod.init(jax.random.PRNGKey(0), x, False)
    y = mod.apply(variables, x, False)
    assert y.shape == (4, 768)
    n = _n_params(variables["params"])
    # timm regnety_008 trunk ~5.5M + gate/fusion params
    assert 5.0e6 < n < 6.8e6, n


def test_stride2_conv_matches_torch_padding():
    """Downsampling convs must sample torch/timm's grid: explicit (1,1)
    padding, not XLA 'SAME' which pads (0,1) on even inputs (review
    finding — timm-imported weights were silently misaligned)."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    from tdeed_tpu.models.regnet import ConvBN

    r = np.random.default_rng(0)
    x = r.normal(size=(1, 8, 8, 3)).astype(np.float32)
    w = (r.normal(size=(3, 3, 3, 4)) * 0.1).astype(np.float32)

    mod = ConvBN(4, 3, strides=2, act=False, dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    variables["params"]["conv"]["kernel"] = jnp.asarray(w)
    y = mod.apply(variables, jnp.asarray(x), False)  # BN is identity at init

    yt = F.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(w).permute(3, 2, 0, 1),
        stride=2, padding=1,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, atol=2e-5)


def test_yblock_matches_torch_oracle():
    """Full RegNet-Y block (conv1 -> grouped stride-2 conv2 -> SE -> conv3
    -> downsample residual) vs a torch re-derivation with identical
    weights — pins padding grids, SE reduction width, grouping, and the
    residual/ReLU order in one shot."""
    import numpy as np
    import torch

    from tests.torch_oracles import OracleYBlock
    from tdeed_tpu.models.regnet import YBlock

    in_w, w, stride, gs = 8, 16, 2, 8
    r = np.random.default_rng(0)
    x = r.normal(size=(2, 8, 8, in_w)).astype(np.float32)

    blk = YBlock(width=w, in_width=in_w, stride=stride, group_size=gs,
                 dtype=jnp.float32)
    variables = blk.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    y = np.asarray(blk.apply(variables, jnp.asarray(x), False))

    o = OracleYBlock(in_w, w, stride, gs).eval()
    p = variables["params"]

    def k(t):  # flax (kh,kw,cin/g,cout) -> torch (cout,cin/g,kh,kw)
        return torch.from_numpy(np.transpose(np.asarray(t), (3, 2, 0, 1)))

    with torch.no_grad():
        o.conv1.weight.copy_(k(p["conv1"]["conv"]["kernel"]))
        o.conv2.weight.copy_(k(p["conv2"]["conv"]["kernel"]))
        o.conv3.weight.copy_(k(p["conv3"]["conv"]["kernel"]))
        o.down.weight.copy_(k(p["downsample"]["conv"]["kernel"]))
        o.se_fc1.weight.copy_(k(p["se"]["fc1"]["kernel"]))
        o.se_fc1.bias.copy_(torch.from_numpy(np.asarray(p["se"]["fc1"]["bias"])))
        o.se_fc2.weight.copy_(k(p["se"]["fc2"]["kernel"]))
        o.se_fc2.bias.copy_(torch.from_numpy(np.asarray(p["se"]["fc2"]["bias"])))
        for tb, fb in ((o.bn1, "conv1"), (o.bn2, "conv2"), (o.bn3, "conv3"),
                       (o.bn_down, "downsample")):
            tb.weight.copy_(torch.from_numpy(np.asarray(p[fb]["bn"]["scale"])))
            tb.bias.copy_(torch.from_numpy(np.asarray(p[fb]["bn"]["bias"])))
        yt = o(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    np.testing.assert_allclose(y, yt.numpy(), atol=3e-5)


def test_full_trunk_matches_torch_oracle():
    """The COMPLETE rny002 trunk (stem + 13 blocks, no shift) vs the torch
    oracle with identical weights: end-to-end backbone function parity —
    the guarantee the timm importer relies on."""
    import numpy as np
    import torch

    from tests.torch_oracles import OracleRegNetTrunk
    from tdeed_tpu.models.regnet import ARCH_PARAMS, RegNetY, generate_stages

    p_ = ARCH_PARAMS["rny002"]
    widths, depths, groups = generate_stages(
        p_["w0"], p_["wa"], p_["wm"], p_["depth"], p_["group_size"]
    )

    r = np.random.default_rng(1)
    x = r.normal(size=(2, 64, 64, 3)).astype(np.float32)

    net = RegNetY(arch="rny002", dtype=jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    y = np.asarray(net.apply(variables, jnp.asarray(x), False))

    o = OracleRegNetTrunk(widths, depths, groups).eval()
    p = variables["params"]

    def k(t):
        return torch.from_numpy(np.transpose(np.asarray(t), (3, 2, 0, 1)))

    def copy_bn(tb, node):
        tb.weight.copy_(torch.from_numpy(np.asarray(node["scale"])))
        tb.bias.copy_(torch.from_numpy(np.asarray(node["bias"])))

    with torch.no_grad():
        o.stem.weight.copy_(k(p["stem"]["conv"]["kernel"]))
        copy_bn(o.stem_bn, p["stem"]["bn"])
        bi_flat = 0
        for si, d in enumerate(depths, start=1):
            for bi in range(1, d + 1):
                bp = p[f"s{si}_b{bi}"]
                ob = o.blocks[bi_flat]
                ob.conv1.weight.copy_(k(bp["conv1"]["conv"]["kernel"]))
                ob.conv2.weight.copy_(k(bp["conv2"]["conv"]["kernel"]))
                ob.conv3.weight.copy_(k(bp["conv3"]["conv"]["kernel"]))
                copy_bn(ob.bn1, bp["conv1"]["bn"])
                copy_bn(ob.bn2, bp["conv2"]["bn"])
                copy_bn(ob.bn3, bp["conv3"]["bn"])
                ob.se_fc1.weight.copy_(k(bp["se"]["fc1"]["kernel"]))
                ob.se_fc1.bias.copy_(
                    torch.from_numpy(np.asarray(bp["se"]["fc1"]["bias"]))
                )
                ob.se_fc2.weight.copy_(k(bp["se"]["fc2"]["kernel"]))
                ob.se_fc2.bias.copy_(
                    torch.from_numpy(np.asarray(bp["se"]["fc2"]["bias"]))
                )
                if ob.down is not None:
                    ob.down.weight.copy_(k(bp["downsample"]["conv"]["kernel"]))
                    copy_bn(ob.bn_down, bp["downsample"]["bn"])
                bi_flat += 1
        yt = o(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(y, yt, atol=2e-4)
