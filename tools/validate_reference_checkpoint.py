"""Turnkey reference-checkpoint quality gate: import -> evaluate -> verdict.

The reference's ultimate evidence is its released checkpoints
(ref: README.md:19,58-63); BASELINE.md defines the gate as "tight mAP
within 0.5" of those numbers. This tool is the ONE command standing
between a real ``checkpoint_best.pt`` + extracted frame dir and that
verdict:

  1. import the torch state_dict (tools/import_reference_checkpoint.py
     mapping, golden-proven by tests/test_reference_import.py) — or load
     an already-imported orbax directory;
  2. run the full split evaluation exactly as the reference's test tail
     does (ref: train_tdeed.py:240-311): sliding windows at the dataset's
     eval stride/overlap, optional hflip TTA, displacement decode,
     high-recall store, NMS/SNMS, tolerance-mAP — plus the SoccerNet
     tight/loose a-mAP adapters for SN/SNB;
  3. print the mAP table and, when ``--expect`` is given (the published
     number from BASELINE.md), the "within tolerance?" verdict line.

Usage:
    python tools/validate_reference_checkpoint.py \
        --checkpoint /path/checkpoint_best.pt \
        --config configs/FineDiving/FineDiving_small.json \
        --frame_dir /path/frames [--data_root data] [--labels_root ...] \
        [--split test] [--expect 84.36 --metric map_avg] [--tolerance 0.5]

Smoke-tested end-to-end (oracle-exported checkpoint, synthetic fixture)
by tests/test_reference_import.py::test_validate_reference_checkpoint_gate.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="reference checkpoint_best.pt (torch state_dict) or "
                        "an already-imported orbax checkpoint directory")
    p.add_argument("--config", required=True,
                   help="model config JSON path (or model name under "
                        "--config_root)")
    p.add_argument("--config_root", default="configs")
    p.add_argument("--frame_dir", default=None,
                   help="override the config's frame_dir")
    p.add_argument("--data_root", default="data",
                   help="dataset metadata root (<ds>/{split}.json, class.txt)")
    p.add_argument("--labels_root", default=None,
                   help="external label tree (SN/SNB); default: "
                        "<data_root>/<ds>/labels_path.txt indirection")
    p.add_argument("--split", default="test")
    p.add_argument("--expect", type=float, default=None,
                   help="published reference number to gate against "
                        "(BASELINE.md)")
    p.add_argument("--metric", default="map_avg",
                   help="which reported metric the gate compares: map_avg, "
                        "map_tol<k>, or (SN/SNB) amap_tight / amap_loose")
    p.add_argument("--tolerance", type=float, default=0.5,
                   help="gate width in mAP points (BASELINE.md: 0.5)")
    p.add_argument("--out", default=None, help="write the result JSON here")
    p.add_argument("--save_pred", default=None,
                   help="also store per-video predictions under this prefix")
    return p.parse_args(argv)


def load_weights(checkpoint: str, cfg):
    """(params, batch_stats) from a torch .pt or an orbax dir, shape-checked
    against the config's model init."""
    import jax
    import jax.numpy as jnp

    from tdeed_tpu.checkpoint import overlay_tree, restore_params
    from tdeed_tpu.models.tdeed import build_model

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

    if os.path.isdir(checkpoint):
        restored = restore_params(checkpoint)
        params, stats = restored["params"], restored["batch_stats"]
    else:
        import torch

        from tools.import_reference_checkpoint import (
            convert_reference_state_dict,
        )

        sd = torch.load(checkpoint, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        params, stats, _ = convert_reference_state_dict(sd)
    overlay_tree(variables["params"], params)
    overlay_tree(variables["batch_stats"], stats)
    return model, variables["params"], variables["batch_stats"], two_heads


def main(argv=None) -> dict:
    args = get_args(argv)

    import jax

    from tdeed_tpu.config import load_config
    from tdeed_tpu.data.registry import get_spec, load_classes
    from tdeed_tpu.infer.evaluate import evaluate
    from tdeed_tpu.infer.windows import VideoWindows
    from tdeed_tpu.train.step import make_predict_step
    from tdeed_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    cfg_path = (
        args.config if args.config.endswith(".json")
        else os.path.join(
            args.config_root, args.config.split("_")[0], args.config + ".json"
        )
    )
    cfg = load_config(cfg_path)
    if args.frame_dir:
        import dataclasses

        cfg = dataclasses.replace(cfg, frame_dir=args.frame_dir)
    spec = get_spec(cfg.dataset)

    labels_root = args.labels_root
    if labels_root is None:
        lp = os.path.join(args.data_root, cfg.dataset, "labels_path.txt")
        if os.path.exists(lp):
            with open(lp) as fp:
                labels_root = fp.read().strip()

    classes = load_classes(
        os.path.join(args.data_root, cfg.dataset, "class.txt")
    )

    model, params, stats, two_heads = load_weights(args.checkpoint, cfg)
    rp = jax.device_put(params)
    rbs = jax.device_put(stats)
    crop = cfg.crop_dim if cfg.crop_dim and cfg.crop_dim > 0 else None
    predict_step = jax.jit(
        make_predict_step(
            model, crop_dim=crop,
            radi_displacement=cfg.radi_displacement, two_heads=two_heads,
        ),
        static_argnums=(3,),
    )

    def predict_fn(frames, hflip=False):
        _, probs = predict_step(rp, rbs, frames, hflip)
        return np.asarray(probs)

    split_path = os.path.join(
        args.data_root, cfg.dataset, f"{args.split}.json"
    )
    data = VideoWindows(
        cfg.dataset,
        split_path,
        cfg.frame_dir,
        cfg.clip_len,
        overlap_len=spec.eval_overlap_len(cfg.clip_len),
        stride=spec.eval_stride,
        labels_root=labels_root,
    )
    maps, tols = evaluate(
        predict_fn, data, args.split.upper(), classes,
        save_pred=args.save_pred, printed=True, test=True,
        augment=spec.hflip_tta, labels_root=labels_root,
    )

    res = {
        "checkpoint": args.checkpoint,
        "config": cfg_path,
        "split": args.split,
    }
    if tols is not None:
        res["tolerances"] = list(tols)
    if maps is not None:  # CHALLENGE splits are label-free: no mAP table
        res["map_avg"] = round(float(np.mean(maps)) * 100, 4)
        for t, m in zip(tols, maps):
            res[f"map_tol{t}"] = round(float(m) * 100, 4)

    if args.save_pred and cfg.dataset in ("soccernet", "soccernetball"):
        from tdeed_tpu.metrics.soccernet import (
            evaluate_sn_official,
            evaluate_snb,
        )

        # store_json_sn[b] writes per-game results_spotting.json trees
        # under <dirname(save_pred)>/preds (utils/io.py:46-75).
        pred_dir = os.path.join(
            os.path.dirname(args.save_pred) or ".", "preds"
        )
        scorer = (
            evaluate_sn_official if cfg.dataset == "soccernet" else evaluate_snb
        )
        try:
            sn = scorer(labels_root, pred_dir, args.split)
            if isinstance(sn, dict):
                for k, v in sn.items():
                    if isinstance(v, (int, float)):
                        res[f"amap_{k}"] = round(float(v), 4)
        except Exception as e:  # label tree absent in CHALLENGE-style runs
            print(f"SoccerNet scorer skipped: {e}")

    # --- verdict table ----------------------------------------------------
    print("\n=== reference-checkpoint quality gate ===")
    for k in sorted(res):
        if k.startswith(("map_", "amap_")):
            print(f"  {k:>12}: {res[k]:.4f}")
    if args.expect is not None:
        got = res.get(args.metric)
        assert got is not None, (
            f"--metric {args.metric} not in results {sorted(res)}"
        )
        res["expect"] = args.expect
        res["gate_metric"] = args.metric
        res["gate_delta"] = round(got - args.expect, 4)
        res["gate_pass"] = bool(abs(got - args.expect) <= args.tolerance)
        print(
            f"VERDICT: {args.metric}={got:.4f} vs reference "
            f"{args.expect:.4f} (delta {res['gate_delta']:+.4f}, "
            f"tolerance {args.tolerance}) -> "
            + ("PASS" if res["gate_pass"] else "FAIL")
        )
    if args.out:
        with open(args.out, "w") as fp:
            json.dump(res, fp, indent=2)
    return res


if __name__ == "__main__":
    main()
