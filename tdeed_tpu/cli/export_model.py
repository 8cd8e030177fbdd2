"""Export a finished run's predict program as a StableHLO serving artifact.

Usage:
    tdeed-export <model_name> <out_dir> [--config_root configs]
        [--data_root data] [--platforms tpu,cpu] [--batch_size 4]
        [--frame_hw H,W]

Loads the run's config + best checkpoint (same resolution as
``SpottingPredictor.from_run``) and writes a self-contained export directory
(see tdeed_tpu/infer/export.py). No reference counterpart — the reference
deploys by shipping its source tree (ref: README.md:40-63).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_name")
    p.add_argument("out_dir")
    p.add_argument("--config_root", default="configs")
    p.add_argument("--data_root", default="data")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering targets")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--frame_hw", default=None,
                   help="stored frame H,W (default: crop_dim,crop_dim)")
    args = p.parse_args(argv)

    from tdeed_tpu.checkpoint import CheckpointManager
    from tdeed_tpu.config import load_config
    from tdeed_tpu.data.registry import load_classes
    from tdeed_tpu.infer.evaluate import INFERENCE_BATCH_SIZE
    from tdeed_tpu.infer.export import export_predictor

    cfg = load_config(args.model_name, args.config_root)
    classes = load_classes(os.path.join(args.data_root, cfg.dataset, "class.txt"))
    two_heads = None
    if cfg.pretrain is not None:
        two_heads = (cfg.num_classes + 1, cfg.pretrain.num_classes + 1)
    ckpt = CheckpointManager(
        cfg.save_dir or os.path.join("checkpoints", cfg.model)
    )
    restored = ckpt.restore_best()
    frame_hw = None
    if args.frame_hw:
        h, w = args.frame_hw.split(",")
        frame_hw = (int(h), int(w))
    out = export_predictor(
        cfg,
        restored["params"],
        restored["batch_stats"],
        classes,
        args.out_dir,
        two_heads=two_heads,
        batch_size=args.batch_size or INFERENCE_BATCH_SIZE,
        frame_hw=frame_hw,
        platforms=tuple(s for s in args.platforms.split(",") if s),
    )
    print(f"exported {args.model_name} -> {out}")


if __name__ == "__main__":
    main()
