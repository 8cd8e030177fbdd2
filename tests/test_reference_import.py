"""Reference-checkpoint importer round-trip tests.

The importer (tools/import_reference_checkpoint.py) maps a reference
``checkpoint_best.pt`` state_dict into tdeed_tpu ``{params, batch_stats}``.
No real reference checkpoint is reachable in this sandbox, so the tests
build the torch oracle and EXPORT its weights under the exact key names the
reference model's state_dict carries:

  * ``_features.*`` timm keys with the s3/s4 ``conv1`` spliced into
    ``conv1.gs.*`` / ``conv1.net.*`` (ref: model/shift.py:49-59,80-93),
  * ``temp_enc`` (ref: model/model.py:65),
  * ``_temp_fine._sgp.{i}.*`` / ``_temp_fine._sgpMixer.{i}.*``
    (ref: model/modules.py:63,66) — the oracle SGP modules use the
    reference's own field names, so their state_dicts ARE reference-keyed,
  * ``_pred_fine._fc_out.*`` / ``_pred_displ._fc_out.*``
    (ref: model/modules.py:366-376, model/model.py:73-74),
  * FC2 double head ``_pred_fine._fc{1,2}._fc_out.*``
    (ref: model/modules.py:378-387).

Asserted: (1) the converted params are leaf-identical to the direct mapping
the 4-step training-parity suite proves (flax_params_from_tdeed_oracle) and
cover the model init tree exactly, batch_stats included; (2) the imported
model's EVAL forward — running BN stats, the actual inference use of an
imported checkpoint — matches the torch oracle at fp32; (3) the GSM and FC2
key variants route correctly; (4) the tool's torch.load -> orbax path
round-trips bit-exactly through checkpoint.restore_params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from flax.traverse_util import flatten_dict

from tdeed_tpu.models.regnet import ARCH_PARAMS, generate_stages
from tdeed_tpu.models.shift import GSM
from tdeed_tpu.models.tdeed import TDEED
from tdeed_tpu.train import augment
from tdeed_tpu.utils.torch_convert import conv3d_kernel, dense_kernel
from tests.test_train_step_oracle import flax_params_from_tdeed_oracle
from tests.torch_oracles import OracleGSM, OracleTDEED
from tools.import_reference_checkpoint import convert_reference_state_dict

NUM_CLASSES = 4
NC_BG = NUM_CLASSES + 1
T, HW, KS, K = 4, 32, 3, 2.0


def reference_state_dict_from_oracle(o: OracleTDEED, depths) -> dict:
    """Export the oracle's weights under reference checkpoint key names."""
    sd = {}

    def put(k, t):
        sd[k] = t.detach().clone()

    def put_all(prefix, module):
        for k, v in module.state_dict().items():
            sd[prefix + "." + k] = v.clone()

    put("temp_enc", o.temp_enc)
    put("_features.stem.conv.weight", o.stem.weight)
    put_all("_features.stem.bn", o.stem_bn)

    bi_flat = 0
    for si, d in enumerate(depths, start=1):
        for bi in range(1, d + 1):
            ob = o.blocks[bi_flat]
            bi_flat += 1
            base = f"_features.s{si}.b{bi}"
            # Spliced GatedShift: the original ConvBnAct moves under
            # conv1.net, the shift module under conv1.gs
            # (ref: model/shift.py:55,80-84).
            conv1 = base + (".conv1.net" if ob.shift is not None else ".conv1")
            put(conv1 + ".conv.weight", ob.conv1.weight)
            put_all(conv1 + ".bn", ob.bn1)
            if ob.shift is not None:
                g = ob.shift.gsf
                put(base + ".conv1.gs.conv3D.weight", g.conv3d.weight)
                put(base + ".conv1.gs.conv3D.bias", g.conv3d.bias)
                put_all(base + ".conv1.gs.bn", g.bn)
                put_all(base + ".conv1.gs.channel_conv1", g.channel_conv1)
                put_all(base + ".conv1.gs.channel_conv2", g.channel_conv2)
            put(base + ".conv2.conv.weight", ob.conv2.weight)
            put_all(base + ".conv2.bn", ob.bn2)
            put_all(base + ".se.fc1", ob.se_fc1)
            put_all(base + ".se.fc2", ob.se_fc2)
            put(base + ".conv3.conv.weight", ob.conv3.weight)
            put_all(base + ".conv3.bn", ob.bn3)
            if ob.down is not None:
                put(base + ".downsample.conv.weight", ob.down.weight)
                put_all(base + ".downsample.bn", ob.bn_down)

    # Oracle SGP blocks/mixers reuse the reference field names
    # (ln/gn/psi/fc/convw/convkw/global_fc/mlp, ln1/ln2/psi1/../concat_fc),
    # so their state_dicts are already reference-keyed.
    for i, blk in enumerate(o.sgp):
        put_all(f"_temp_fine._sgp.{i}", blk)
    for i, m in enumerate(o.mixers):
        put_all(f"_temp_fine._sgpMixer.{i}", m)
    put_all("_pred_fine._fc_out", o.pred_fine)
    put_all("_pred_displ._fc_out", o.pred_displ)
    return sd


@pytest.fixture(scope="module")
def rny002_oracle():
    torch.manual_seed(7)
    p = ARCH_PARAMS["rny002"]
    widths, depths, groups = generate_stages(
        p["w0"], p["wa"], p["wm"], p["depth"], p["group_size"]
    )
    o = OracleTDEED(
        widths, depths, groups, clip_len=T, num_classes_bg=NC_BG,
        n_layers=1, ks=KS, k=K,
    ).eval()
    with torch.no_grad():
        o.temp_enc.normal_(std=1.0 / T)
        # Non-default running stats so eval-mode parity exercises every
        # imported batch_stats leaf.
        for m in o.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    return o, depths


def test_full_checkpoint_roundtrip_tree_exact(rny002_oracle):
    oracle, depths = rny002_oracle
    sd = reference_state_dict_from_oracle(oracle, depths)
    params, stats, skipped = convert_reference_state_dict(sd)

    # num_batches_tracked counters are skipped, nothing else.
    assert skipped and all(k.endswith("num_batches_tracked") for k in skipped)

    # Leaf-identical to the proven direct mapping.
    want = flatten_dict(flax_params_from_tdeed_oracle(oracle, depths))
    got = flatten_dict(params)
    assert set(got) == set(want), set(got) ^ set(want)
    for key in want:
        np.testing.assert_array_equal(got[key], want[key], err_msg="/".join(key))

    # Full coverage of the model's init tree, batch_stats included.
    model = TDEED(
        num_classes=NUM_CLASSES, clip_len=T, feature_arch="rny002_gsf",
        n_layers=1, sgp_ks=KS, sgp_r=K, radi_displacement=1,
        dtype=jnp.float32,
    )
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), jnp.zeros((1, T, HW, HW, 3), jnp.float32), False
    )
    fi = flatten_dict(variables["params"])
    assert set(fi) == set(got), set(fi) ^ set(got)
    for key in fi:
        assert fi[key].shape == got[key].shape, key
    si = flatten_dict(variables["batch_stats"])
    ss = flatten_dict(stats)
    assert set(si) == set(ss), set(si) ^ set(ss)

    # Spot-pin stats leaves (the eval-forward test exercises all of them).
    np.testing.assert_array_equal(
        ss[("features", "stem", "bn", "mean")],
        oracle.stem_bn.running_mean.numpy(),
    )
    np.testing.assert_array_equal(
        ss[("features", "s3_b1", "gs", "gs", "bn", "var")],
        oracle.blocks[2].shift.gsf.bn.running_var.numpy(),
    )


def test_imported_eval_forward_matches_oracle(rny002_oracle):
    oracle, depths = rny002_oracle
    sd = reference_state_dict_from_oracle(oracle, depths)
    params, stats, _ = convert_reference_state_dict(sd)

    rng = np.random.default_rng(13)
    frames = rng.integers(0, 256, (1, T, HW, HW, 3)).astype(np.uint8)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 1, 3, 1, 1)
    x = torch.from_numpy(frames).float().permute(0, 1, 4, 2, 3) / 255.0
    with torch.no_grad():
        logits_t, displ_t = oracle((x - mean) / std)

    model = TDEED(
        num_classes=NUM_CLASSES, clip_len=T, feature_arch="rny002_gsf",
        n_layers=1, sgp_ks=KS, sgp_r=K, radi_displacement=1,
        dtype=jnp.float32,
    )
    xj = augment.standardize(jnp.asarray(frames).astype(jnp.float32) / 255.0)
    out = model.apply(
        {
            "params": jax.tree.map(jnp.asarray, params),
            "batch_stats": jax.tree.map(jnp.asarray, stats),
        },
        xj, False,
    )
    np.testing.assert_allclose(
        np.asarray(out["logits"]), logits_t.numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["displ"]), displ_t.numpy(), atol=2e-4, rtol=1e-3
    )


def test_gsm_variant_routes_and_matches_forward():
    """GSM checkpoints carry conv3D/bn only (no channel convs,
    ref: model/impl/gsm.py:69-81); the gate conv maps to a bare nn.Conv
    (gate_conv/{kernel,bias}) unlike GSF's gate_conv/conv/*."""
    torch.manual_seed(3)
    f, t, hw = 8, 4, 6
    oracle = OracleGSM(f, t).eval()
    with torch.no_grad():
        oracle.conv3d.weight.normal_(0, 0.1)
        oracle.conv3d.bias.normal_(0, 0.1)
        oracle.bn.running_mean.normal_(0, 0.1)
        oracle.bn.running_var.uniform_(0.5, 1.5)

    sd = {
        "_features.s3.b1.conv1.gs.conv3D.weight": oracle.conv3d.weight,
        "_features.s3.b1.conv1.gs.conv3D.bias": oracle.conv3d.bias,
    }
    for k, v in oracle.bn.state_dict().items():
        sd[f"_features.s3.b1.conv1.gs.bn.{k}"] = v
    params, stats, _ = convert_reference_state_dict(sd)

    node = params["features"]["s3_b1"]["gs"]["gs"]
    np.testing.assert_array_equal(
        node["gate_conv"]["kernel"],
        conv3d_kernel(oracle.conv3d.weight.detach().numpy()),
    )
    assert "conv" not in node["gate_conv"]

    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, t, hw, hw, f)).astype(np.float32)
    got = GSM(dtype=jnp.float32).apply(
        {
            "params": node,
            "batch_stats": stats["features"]["s3_b1"]["gs"]["gs"],
        },
        jnp.asarray(x), False,
    )
    with torch.no_grad():
        want = oracle(
            torch.from_numpy(
                np.transpose(x, (0, 1, 4, 2, 3)).reshape(t, f, hw, hw)
            )
        ).numpy()
    got_nchw = np.transpose(np.asarray(got).reshape(t, hw, hw, f), (0, 3, 1, 2))
    np.testing.assert_allclose(got_nchw, want, rtol=2e-3, atol=3e-4)


def test_fc2_double_head_routes():
    """FC2 joint-head checkpoints (ref: model/modules.py:378-387)."""
    torch.manual_seed(4)
    d, c1, c2 = 16, 5, 7
    fc1 = torch.nn.Linear(d, c1)
    fc2 = torch.nn.Linear(d, c2)
    sd = {}
    for name, lin in (("_fc1", fc1), ("_fc2", fc2)):
        for k, v in lin.state_dict().items():
            sd[f"_pred_fine.{name}._fc_out.{k}"] = v
    params, _, _ = convert_reference_state_dict(sd)
    np.testing.assert_array_equal(
        params["pred_fine"]["fc1"]["fc_out"]["dense"]["kernel"],
        dense_kernel(fc1.weight.detach().numpy()),
    )
    np.testing.assert_array_equal(
        params["pred_fine"]["fc2"]["fc_out"]["dense"]["bias"],
        fc2.bias.detach().numpy(),
    )


@pytest.mark.slow
def test_validate_reference_checkpoint_gate(rny002_oracle, tmp_path):
    """Turnkey quality gate (tools/validate_reference_checkpoint.py) driven
    end-to-end: oracle-exported checkpoint_best.pt + synthetic fixture ->
    import -> full test-split evaluation per the reference protocol
    (ref: train_tdeed.py:240-311) -> mAP table + verdict line. Covers both
    load paths (.pt and an imported orbax dir) and both verdict outcomes."""
    import os

    from tests.fixtures import make_finediving_fixture, write_tiny_config

    oracle, depths = rny002_oracle
    sd = reference_state_dict_from_oracle(oracle, depths)
    src = tmp_path / "checkpoint_best.pt"
    torch.save(sd, src)

    fx = make_finediving_fixture(
        str(tmp_path), num_videos=1, num_frames=24, size=HW
    )
    cfg_root = write_tiny_config(
        str(tmp_path), fx, model="FineDiving_gate", store_mode="load",
        clip_len=T, crop_dim=-1, n_layers=1, sgp_ks=KS, sgp_r=K,
        dtype="float32",
    )
    cfg_path = os.path.join(cfg_root, "FineDiving", "FineDiving_gate.json")

    from tools.validate_reference_checkpoint import main as validate_main

    out_json = tmp_path / "gate.json"
    res = validate_main([
        "--checkpoint", str(src), "--config", cfg_path,
        "--data_root", fx["data_root"],
        "--expect", "1000", "--metric", "map_avg",
        "--tolerance", "0.5", "--out", str(out_json),
    ])
    assert "map_avg" in res and 0.0 <= res["map_avg"] <= 100.0
    assert res["gate_pass"] is False  # 1000 is out of reach by design
    assert out_json.exists()

    # Same gate through the imported-orbax path must reproduce the number
    # exactly and PASS against itself.
    from tools.import_reference_checkpoint import main as import_main

    orb = tmp_path / "imported_best"
    import_main(["--src", str(src), "--out", str(orb)])
    res2 = validate_main([
        "--checkpoint", str(orb), "--config", cfg_path,
        "--data_root", fx["data_root"],
        "--expect", str(res["map_avg"]), "--metric", "map_avg",
        "--tolerance", "0.5",
    ])
    assert res2["gate_pass"] is True
    assert res2["map_avg"] == pytest.approx(res["map_avg"], abs=1e-9)


def test_tool_main_orbax_roundtrip(rny002_oracle, tmp_path):
    """torch.save -> tool main() -> orbax dir -> checkpoint.restore_params
    (what the predict/challenge CLIs call) is bit-exact."""
    oracle, depths = rny002_oracle
    sd = reference_state_dict_from_oracle(oracle, depths)
    src = tmp_path / "checkpoint_best.pt"
    torch.save(sd, src)

    from tools.import_reference_checkpoint import main

    out = tmp_path / "checkpoint_best"
    main(["--src", str(src), "--out", str(out)])

    from tdeed_tpu.checkpoint import restore_params

    restored = restore_params(str(out))
    params, stats, _ = convert_reference_state_dict(sd)
    want = flatten_dict(params)
    got = flatten_dict(restored["params"])
    assert set(got) == set(want)
    for key in want:
        np.testing.assert_array_equal(got[key], want[key], err_msg="/".join(key))
    want_s = flatten_dict(stats)
    got_s = flatten_dict(restored["batch_stats"])
    assert set(got_s) == set(want_s)
    for key in want_s:
        np.testing.assert_array_equal(got_s[key], want_s[key])
