"""Challenge-eval CLI: inference-only on the SNB challenge split.

Parity with the reference entry point (ref: evaluate_tdeed_challenge.py:35-141):
asserts dataset == 'soccernetball', loads the best checkpoint, runs the
label-free CHALLENGE path of evaluate() which Soft-NMS-filters and writes
per-game results_spotting.json for submission.
"""

from __future__ import annotations

import argparse
import os


def get_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", "-m", required=True)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--config_root", default="configs")
    parser.add_argument("--data_root", default="data")
    parser.add_argument("--split", default="challenge")
    parser.add_argument("--n_devices", type=int, default=None,
                        help="run inference batch-parallel over this many "
                        "local devices")
    return parser.parse_args(argv)


def main(argv=None) -> None:
    args = get_args(argv)

    from tdeed_tpu.cli.train import seed_everything

    seed_everything(args.seed)  # ref: evaluate_tdeed_challenge.py:38-41

    from tdeed_tpu.config import load_config

    cfg = load_config(args.model, args.config_root)
    assert cfg.dataset == "soccernetball", (
        "Challenge evaluation only supports SNB (ref: evaluate_tdeed_challenge.py:47)"
    )

    import jax

    from tdeed_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from tdeed_tpu.checkpoint import CheckpointManager
    from tdeed_tpu.cli.train import labels_root_for
    from tdeed_tpu.data.registry import get_spec, load_classes
    from tdeed_tpu.infer.evaluate import evaluate
    from tdeed_tpu.infer.windows import VideoWindows
    from tdeed_tpu.models.tdeed import build_model
    from tdeed_tpu.train.step import make_predict_step

    spec = get_spec(cfg.dataset)
    classes = load_classes(os.path.join(args.data_root, cfg.dataset, "class.txt"))
    labels_root = labels_root_for(args.data_root, cfg.dataset)

    two_heads = None
    if cfg.pretrain is not None:
        two_heads = (cfg.num_classes + 1, cfg.pretrain.num_classes + 1)

    model = build_model(cfg, two_heads=two_heads)
    ckpt = CheckpointManager(cfg.save_dir or os.path.join("checkpoints", cfg.model))
    restored = ckpt.restore_best()
    # device_put once: numpy trees would re-upload the model every call
    params = jax.device_put(restored["params"])
    batch_stats = jax.device_put(restored["batch_stats"])

    predict_step = jax.jit(
        make_predict_step(
            model,
            crop_dim=cfg.crop_dim,
            radi_displacement=cfg.radi_displacement,
            two_heads=two_heads,
        ),
        static_argnums=(3,),
    )

    eval_batch_size = None
    if args.n_devices and args.n_devices > 1:
        from tdeed_tpu.infer.evaluate import INFERENCE_BATCH_SIZE
        from tdeed_tpu.parallel.mesh import make_mesh, make_sharded_predict

        mesh = make_mesh(args.n_devices)
        predict_fn = make_sharded_predict(
            predict_step, mesh, params, batch_stats
        )
        eval_batch_size = -(-INFERENCE_BATCH_SIZE // mesh.size) * mesh.size
    else:

        def predict_fn(frames, hflip=False):
            _, probs = predict_step(params, batch_stats, frames, hflip)
            return probs

    from tdeed_tpu.data.loader import FrameCache

    data = VideoWindows(
        cfg.dataset,
        os.path.join(args.data_root, cfg.dataset, f"{args.split}.json"),
        cfg.frame_dir,
        cfg.clip_len,
        overlap_len=spec.eval_overlap_len(cfg.clip_len),
        stride=spec.eval_stride,
        labels_root=labels_root,
        cache=(FrameCache(cfg.decode_cache_mb << 20)
               if cfg.decode_cache_mb > 0 else None),
    )
    pred_file = os.path.join(ckpt.save_dir, f"pred-{args.split}")
    evaluate(
        predict_fn,
        data,
        "CHALLENGE",
        classes,
        save_pred=pred_file,
        test=True,
        augment=False,
        labels_root=labels_root,
        batch_size=eval_batch_size,
    )
    print("CORRECTLY FINISHED CHALLENGE INFERENCE")


if __name__ == "__main__":
    main()
