"""Import timm RegNet-Y (regnety_002 / regnety_008) weights into the Flax
backbone.

The reference builds its backbone from timm with ImageNet-pretrained weights
(ref: model/model.py:37-46). This tool converts a timm state_dict (from
``timm.create_model(..., pretrained=True).state_dict()`` or a saved ``.pth``)
into the (params, batch_stats) trees of ``tdeed_tpu.models.regnet.RegNetY``,
whose module names deliberately mirror timm's (stem, s{i}.b{j},
conv1/conv2/conv3, se.fc1/fc2, downsample) so the mapping is a pure
name/layout transform (tdeed_tpu/utils/torch_convert.py).

Shift modules (``gs``) have no timm counterpart and keep their init.

Usage:
    python tools/import_timm_weights.py --arch rny002 \
        --src regnety_002.pth --out backbone_rny002  # orbax dir
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from typing import Any, Dict, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdeed_tpu.utils.torch_convert import conv2d_kernel, norm_vec  # noqa: E402

_BLOCK_RE = re.compile(r"^s(\d+)\.b(\d+)\.(.*)$")


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def convert_state_dict(
    sd: Dict[str, Any], prefix: str = ""
) -> Tuple[Dict, Dict]:
    """timm RegNet state_dict -> (params, batch_stats) trees for RegNetY.

    Returns trees rooted at the backbone (i.e. under TDEED's 'features'
    module). Ignores the classifier head (the reference strips it too,
    ref: model/model.py:40-46).
    """
    params: Dict = {}
    stats: Dict = {}

    def np_(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    for key, val in sd.items():
        if prefix and key.startswith(prefix):
            key = key[len(prefix):]
        if key.startswith("head."):
            continue
        v = np_(val)

        m = _BLOCK_RE.match(key)
        if key.startswith("stem."):
            mod, rest = "stem", key[len("stem."):]
        elif m:
            mod = f"s{m.group(1)}_b{m.group(2)}"
            rest = m.group(3)
        else:
            continue

        if rest == "conv.weight":
            _set(params, (mod, "conv"), {"kernel": conv2d_kernel(v)})
        elif rest.startswith("bn."):
            _map_bn(params, stats, (mod, "bn"), rest[len("bn."):], v)
        elif rest.startswith(("conv1.", "conv2.", "conv3.", "downsample.")):
            sub, srest = rest.split(".", 1)
            if srest == "conv.weight":
                _set(params, (mod, sub, "conv", "kernel"), conv2d_kernel(v))
            elif srest.startswith("bn."):
                _map_bn(params, stats, (mod, sub, "bn"), srest[len("bn."):], v)
        elif rest.startswith("se."):
            # timm SEModule: se.fc1 (Conv2d), se.fc2 (Conv2d)
            sub, srest = rest[len("se."):].split(".", 1)
            if srest == "weight":
                _set(params, (mod, "se", sub, "kernel"), conv2d_kernel(v))
            elif srest == "bias":
                _set(params, (mod, "se", sub, "bias"), norm_vec(v))
    return params, stats


def _map_bn(params, stats, base, rest, v):
    if rest == "weight":
        _set(params, base + ("scale",), norm_vec(v))
    elif rest == "bias":
        _set(params, base + ("bias",), norm_vec(v))
    elif rest == "running_mean":
        _set(stats, base + ("mean",), norm_vec(v))
    elif rest == "running_var":
        _set(stats, base + ("var",), norm_vec(v))


def merge_into_model(variables: Dict, backbone_params: Dict,
                     backbone_stats: Dict, module: str = "features") -> Dict:
    """Overlay converted backbone trees onto a full TDEED init, validating
    shapes. Returns new variables dict."""
    import jax

    from tdeed_tpu.checkpoint import overlay_tree

    variables = jax.tree.map(np.asarray, variables)
    overlay_tree(variables["params"][module], backbone_params, (module,))
    overlay_tree(variables["batch_stats"][module], backbone_stats, (module,))
    return variables


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arch", choices=["rny002", "rny008"], required=True)
    p.add_argument("--src", required=True,
                   help=".pth state_dict file, or a timm model name when "
                        "timm is importable")
    p.add_argument("--out", required=True, help="orbax output directory")
    args = p.parse_args(argv)

    if os.path.exists(args.src):
        import torch

        sd = torch.load(args.src, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    else:
        import timm

        sd = timm.create_model(args.src, pretrained=True).state_dict()

    params, stats = convert_state_dict(sd)

    import orbax.checkpoint as ocp

    ocp.PyTreeCheckpointer().save(
        os.path.abspath(args.out), {"params": params, "batch_stats": stats}
    )
    n = sum(x.size for x in __import__("jax").tree.leaves(params))
    print(f"Converted {n:,} params -> {args.out}")


if __name__ == "__main__":
    main()
