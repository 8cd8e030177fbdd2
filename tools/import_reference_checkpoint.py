"""Import a FULL reference T-DEED checkpoint into tdeed_tpu weights.

The BASELINE quality gate ("tight mAP within 0.5 of the released
checkpoints", ref: README.md:58-63) needs a bridge from a reference
``checkpoint_best.pt`` (ref: train_tdeed.py:236-238) to this framework's
``{params, batch_stats}`` trees. This tool is that bridge: point it at a
torch state_dict and it writes an orbax weights directory that
``tdeed_tpu.checkpoint.restore_params`` / the predict & challenge CLIs load
directly (name it ``checkpoint_best`` inside a save_dir for CLI pickup).

Reference state_dict layout being mapped (ref: model/model.py:25-103,
model/modules.py:41-55):

  _features.*                 timm RegNet-Y keys (stem, s{i}.b{j}.conv1/2/3,
                              se.fc1/fc2, downsample) — except that in
                              stages s3/s4 every block's ``conv1`` is spliced
                              into a GatedShift (ref: model/shift.py:49-59),
                              so its keys fork into ``conv1.gs.*`` (the
                              _GSM/_GSF module, ref: model/shift.py:80-84)
                              and ``conv1.net.*`` (the original ConvBnAct).
  temp_enc                    (clip_len, D) positional emb (model/model.py:65)
  _temp_fine._sgp.{i}.*       SGP blocks        (ref: model/modules.py:63)
  _temp_fine._sgpMixer.{i}.*  SGP mixers        (ref: model/modules.py:66-67)
  _pred_fine._fc_out.*        classifier head   (ref: model/modules.py:366-376)
  _pred_fine._fc{1,2}._fc_out.*  FC2 double head (ref: model/modules.py:378-387)
  _pred_displ._fc_out.*       displacement head (ref: model/model.py:73-74)

GSM vs GSF is auto-detected per shift module (GSF carries channel_conv1/2,
ref: model/impl/gsf.py:24-25; GSM does not, ref: model/impl/gsm.py:69-81).

Validated by tests/test_reference_import.py: a reference-style state_dict
exported from the torch oracle round-trips through this converter to the
exact trees the (4-step-training-proven) direct mapping produces, and the
imported model's eval forward matches the torch oracle at fp32.

Usage:
    python tools/import_reference_checkpoint.py \
        --src checkpoint_best.pt --out save_dir/checkpoint_best \
        [--config configs/FineDiving/FineDiving_small.json]  # shape check
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from typing import Any, Dict, List, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdeed_tpu.utils.torch_convert import (  # noqa: E402
    conv1d_kernel,
    conv2d_kernel,
    conv3d_kernel,
    dense_from_conv1x1,
    dense_kernel,
    norm_vec,
)
from tools.import_timm_weights import convert_state_dict as timm_convert  # noqa: E402

_GS_RE = re.compile(r"^s(\d+)\.b(\d+)\.conv1\.gs\.(.*)$")
_NET_RE = re.compile(r"^s(\d+)\.b(\d+)\.conv1\.net\.(.*)$")
_SGP_RE = re.compile(r"^_sgp\.(\d+)\.(.*)$")
_MIX_RE = re.compile(r"^_sgpMixer\.(\d+)\.(.*)$")

# Depthwise branch convs shared by SGPBlock and SGPMixer
# (ref: model/modules.py:122-126, 223-234) -> tdeed_tpu _DWConv submodules.
_DW_NAMES = {
    "psi", "fc", "convw", "convkw", "global_fc",
    "psi1", "psi2", "convw1", "convkw1", "convw2", "convkw2",
    "fc1", "fc2", "global_fc1", "global_fc2",
}


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    assert path[-1] not in node, f"duplicate target {'/'.join(path)}"
    node[path[-1]] = value


def _merge(dst: Dict, src: Dict) -> None:
    for k, v in src.items():
        if isinstance(v, dict):
            _merge(dst.setdefault(k, {}), v)
        else:
            assert k not in dst, k
            dst[k] = v


def _convert_gs(entries: Dict[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """One spliced shift module's keys -> (params, stats) under
    <block>/gs/gs (GatedShift wrapper -> GSM/GSF child, both named 'gs')."""
    mode = "gsf" if any(k.startswith("channel_conv") for k in entries) else "gsm"
    p: Dict = {}
    s: Dict = {}
    for rest, v in entries.items():
        if rest == "conv3D.weight":
            # torch Conv3d (2, C/2, 3,3,3) -> (3,3,3, C/2, 2). GSF wraps the
            # gate params in a bare-conv module (gate_conv/conv/*); GSM uses
            # nn.Conv directly (gate_conv/*) — see models/shift.py.
            path = ("gate_conv", "conv") if mode == "gsf" else ("gate_conv",)
            _set(p, path + ("kernel",), conv3d_kernel(v))
        elif rest == "conv3D.bias":
            path = ("gate_conv", "conv") if mode == "gsf" else ("gate_conv",)
            _set(p, path + ("bias",), v)
        elif rest == "bn.weight":
            _set(p, ("bn", "scale"), norm_vec(v))
        elif rest == "bn.bias":
            _set(p, ("bn", "bias"), norm_vec(v))
        elif rest == "bn.running_mean":
            _set(s, ("bn", "mean"), norm_vec(v))
        elif rest == "bn.running_var":
            _set(s, ("bn", "var"), norm_vec(v))
        elif rest.startswith(("channel_conv1.", "channel_conv2.")):
            name, wb = rest.split(".", 1)
            if wb == "weight":
                _set(p, (name, "conv", "kernel"), conv2d_kernel(v))
            else:
                _set(p, (name, "conv", "bias"), v)
        else:
            raise KeyError(f"unrecognized shift key: {rest}")
    return {"gs": {"gs": p}}, {"gs": {"gs": s}} if s else {}


def _sgp_entry(tree: Dict, prefix: Tuple[str, ...], rest: str, v: np.ndarray) -> None:
    """Map one SGPBlock/SGPMixer parameter (ref: model/modules.py:89-318)
    onto the tdeed_tpu sgp tree (models/sgp.py naming)."""
    name, sub = rest.split(".", 1)
    if name in ("ln", "ln1", "ln2"):
        field = "scale" if sub == "weight" else "bias"
        _set(tree, prefix + (name, field), norm_vec(v))
    elif name == "gn":
        field = "scale" if sub == "weight" else "bias"
        _set(tree, prefix + ("ffn", "gn", field), v)
    elif name == "mlp":
        idx, wb = sub.split(".")
        fc = {"0": "mlp_fc1", "2": "mlp_fc2"}[idx]
        if wb == "weight":
            _set(tree, prefix + ("ffn", fc, "dense", "kernel"), dense_from_conv1x1(v))
        else:
            _set(tree, prefix + ("ffn", fc, "dense", "bias"), v)
    elif name == "concat_fc":
        if sub == "weight":
            _set(tree, prefix + ("concat_fc", "kernel"), conv1d_kernel(v))
        else:
            _set(tree, prefix + ("concat_fc", "bias"), v)
    elif name in _DW_NAMES:
        if sub == "weight":
            _set(tree, prefix + (name, "Conv_0", "kernel"), conv1d_kernel(v))
        else:
            _set(tree, prefix + (name, "Conv_0", "bias"), v)
    else:
        raise KeyError(f"unrecognized SGP key: {rest}")


def _head_entry(params: Dict, key: str, v: np.ndarray) -> None:
    """_pred_fine/_pred_displ keys -> heads tree (models/heads.py naming)."""
    mod, rest = key.split(".", 1)
    mod = {"_pred_fine": "pred_fine", "_pred_displ": "pred_displ"}[mod]
    parts = rest.split(".")
    if parts[0] == "_fc_out":  # single FCLayers
        sub: Tuple[str, ...] = ("fc_out",)
        wb = parts[1]
    elif parts[0] in ("_fc1", "_fc2"):  # FC2Layers double head
        sub = (parts[0][1:], "fc_out")
        assert parts[1] == "_fc_out", key
        wb = parts[2]
    else:
        raise KeyError(f"unrecognized head key: {key}")
    if wb == "weight":
        _set(params, (mod,) + sub + ("dense", "kernel"), dense_kernel(v))
    else:
        _set(params, (mod,) + sub + ("dense", "bias"), v)


def convert_reference_state_dict(
    sd: Dict[str, Any],
) -> Tuple[Dict, Dict, List[str]]:
    """Full reference T-DEED state_dict -> (params, batch_stats, skipped).

    ``skipped`` lists keys that carried no parameters to map
    (num_batches_tracked counters). Unknown keys raise.
    """
    feats_sd: Dict[str, np.ndarray] = {}
    gs_sd: Dict[str, Dict[str, np.ndarray]] = {}
    params: Dict = {}
    stats: Dict = {}
    skipped: List[str] = []

    for key, val in sd.items():
        if key.endswith("num_batches_tracked"):
            skipped.append(key)
            continue
        v = _np(val)
        if key.startswith("_features."):
            k = key[len("_features."):]
            m = _GS_RE.match(k)
            if m:
                blk = f"s{m.group(1)}_b{m.group(2)}"
                gs_sd.setdefault(blk, {})[m.group(3)] = v
                continue
            m = _NET_RE.match(k)
            if m:  # unsplice: the wrapped ConvBnAct is the plain conv1
                k = f"s{m.group(1)}.b{m.group(2)}.conv1.{m.group(3)}"
            feats_sd[k] = v
        elif key == "temp_enc":
            params["temp_enc"] = v
        elif key.startswith("_temp_fine."):
            k = key[len("_temp_fine."):]
            m = _SGP_RE.match(k)
            if m:
                _sgp_entry(
                    params, ("temp_fine", f"sgp_{m.group(1)}"), m.group(2), v
                )
                continue
            m = _MIX_RE.match(k)
            if m:
                _sgp_entry(
                    params, ("temp_fine", f"mixer_{m.group(1)}"), m.group(2), v
                )
                continue
            raise KeyError(f"unrecognized _temp_fine key: {key}")
        elif key.startswith(("_pred_fine.", "_pred_displ.")):
            _head_entry(params, key, v)
        else:
            raise KeyError(f"unrecognized checkpoint key: {key}")

    f_params, f_stats = timm_convert(feats_sd)
    for blk, entries in gs_sd.items():
        gp, gstat = _convert_gs(entries)
        _merge(f_params.setdefault(blk, {}), gp)
        if gstat:
            _merge(f_stats.setdefault(blk, {}), gstat)
    params["features"] = f_params
    stats["features"] = f_stats
    return params, stats, skipped


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True, help="reference checkpoint_best.pt")
    p.add_argument("--out", required=True,
                   help="orbax output directory (use <save_dir>/checkpoint_best "
                        "for direct CLI pickup)")
    p.add_argument("--config", default=None,
                   help="optional model config JSON: init the model and "
                        "validate every imported shape against it")
    args = p.parse_args(argv)

    import torch

    sd = torch.load(args.src, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params, stats, skipped = convert_reference_state_dict(sd)

    if args.config:
        import jax
        import jax.numpy as jnp

        from tdeed_tpu.checkpoint import overlay_tree
        from tdeed_tpu.config import load_config
        from tdeed_tpu.models.tdeed import build_model

        cfg = load_config(args.config)
        two_heads = None
        if cfg.pretrain is not None:
            two_heads = (cfg.num_classes + 1, cfg.pretrain.num_classes + 1)
        model = build_model(cfg, two_heads=two_heads)
        dim = cfg.crop_dim if cfg.crop_dim and cfg.crop_dim > 0 else 64
        variables = jax.jit(model.init, static_argnums=2)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.clip_len, dim, dim, 3), jnp.float32),
            False,
        )
        variables = jax.tree.map(np.asarray, variables)
        overlay_tree(variables["params"], params)
        overlay_tree(variables["batch_stats"], stats)
        params = variables["params"]
        stats = variables["batch_stats"]
        print("shape validation against", args.config, "OK")

    import orbax.checkpoint as ocp

    ocp.PyTreeCheckpointer().save(
        os.path.abspath(args.out), {"params": params, "batch_stats": stats}
    )
    import jax

    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"Imported {n:,} params ({len(skipped)} counter keys skipped) "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
