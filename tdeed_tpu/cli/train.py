"""Training CLI: the reference ``train_tdeed.py`` surface, TPU-native.

Orchestration parity (ref: train_tdeed.py:90-315): seed -> config ->
store/load clip plans -> model/optimizer -> epoch loop with best-checkpoint
selection on val loss or val mAP -> restore best -> test-split inference +
metrics. TPU-native additions: data-parallel mesh over all local chips,
jitted train/val steps, bf16 compute, Orbax checkpoints with true resume,
and a threaded decode pipeline with device prefetch.

Usage:
    python train_tdeed.py --model FineDiving_small [--acc_grad_iter N]
                          [--seed S] [--resume] [--n_devices N]
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time
from typing import Optional

import numpy as np

EVAL_SPLITS = ["test"]  # ref: train_tdeed.py:30


def get_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", "-m", required=True,
                        help="<DatasetPrefix>_<name>, resolves configs/<Prefix>/<model>.json")
    parser.add_argument("--acc_grad_iter", type=int, default=1)
    parser.add_argument("--seed", type=int, default=1)
    # TPU-native extras (no reference counterpart)
    parser.add_argument("--config_root", default="configs")
    parser.add_argument("--data_root", default="data",
                        help="dataset metadata root (train/val/test.json + class.txt)")
    parser.add_argument("--resume", action="store_true",
                        help="resume from checkpoint_last in save_dir")
    parser.add_argument("--n_devices", type=int, default=None,
                        help="limit the data-parallel mesh (default: all local devices)")
    parser.add_argument("--no_wandb", action="store_true")
    parser.add_argument(
        "--profile_dir", default=None,
        help="capture a jax.profiler device trace of the first training "
             "steps of each run into this directory (works on the TPU "
             "backend; inspect with tools/trace_attrib.py)",
    )
    parser.add_argument(
        "--distributed", action="store_true",
        help="call jax.distributed.initialize() for multi-host DP "
             "(coordinator/process env from the launcher, e.g. TPU pod "
             "runtime vars); each host then loads its slice of the global "
             "batch and form_global_batch stitches the shards",
    )
    return parser.parse_args(argv)


def seed_everything(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def labels_root_for(data_root: str, dataset: str) -> Optional[str]:
    """SN/SNB external label tree via labels_path.txt indirection
    (ref: train_tdeed.py:102-107)."""
    path = os.path.join(data_root, dataset, "labels_path.txt")
    if os.path.exists(path):
        with open(path) as fp:
            return fp.read().strip()
    return None


def build_samplers(cfg, args, classes, classes2=None, cache=None):
    """Store-or-load the clip plans and build train/val samplers
    (ref: dataset/datasets.py:19-96). In store mode this function stores
    plans for train+val (and the pretrain dataset when set) and exits, like
    the reference (ref: train_tdeed.py:120-122)."""
    from tdeed_tpu.data.clips import load_plan, plan_clips, store_plan
    from tdeed_tpu.data.loader import ClipSampler, JointSampler
    from tdeed_tpu.data.registry import get_spec
    from tdeed_tpu.data.frames import get_decoder

    spec = get_spec(cfg.dataset)
    labels_root = labels_root_for(args.data_root, cfg.dataset)
    decoder = get_decoder(cfg.decoder)

    # Challenge-training flow: configs may redirect the split files
    # (train_challenge/val_challenge — ref: data/soccernetball tree).
    split_names = (cfg.train_split, cfg.val_split)

    def _prepare(dataset, frame_dir, store_dir, cls, splits=split_names):
        dspec = get_spec(dataset)
        lroot = labels_root_for(args.data_root, dataset)
        plans = {}
        for split in splits:
            if cfg.store_mode == "store":
                plan = plan_clips(
                    dataset,
                    os.path.join(args.data_root, dataset, f"{split}.json"),
                    frame_dir,
                    cls,
                    cfg.clip_len,
                    dspec.train_stride,
                    dspec.train_overlap,
                    cfg.radi_displacement,
                    labels_root=lroot,
                )
                store_plan(plan, store_dir, cfg.clip_len, cfg.radi_displacement, split)
                print(f"Stored {len(plan)} {dataset}/{split} clips -> {store_dir}")
            else:
                plan = load_plan(store_dir, cfg.clip_len, cfg.radi_displacement, split)
            plans[split] = plan
        return plans

    plans = _prepare(cfg.dataset, cfg.frame_dir, cfg.store_dir, classes)
    plans2 = None
    if cfg.pretrain is not None:
        # The pretrain dataset (SN) has no challenge split variants; it
        # always trains on its plain train/val metadata.
        plans2 = _prepare(
            cfg.pretrain.dataset,
            cfg.pretrain.frame_dir or cfg.frame_dir,
            cfg.pretrain.store_dir or cfg.store_dir,
            classes2,
            splits=("train", "val"),
        )
    if cfg.store_mode == "store":
        print("Store mode done; rerun with store_mode='load'.")
        sys.exit(0)

    def _sampler(plan, dataset, mixup, tag=None):
        return ClipSampler(
            plan,
            cfg.clip_len,
            get_spec(dataset).train_stride,
            cfg.radi_displacement,
            mixup,
            decoder=decoder,
            dataset_tag=tag,
            cache=cache,
        )

    tr, va = split_names
    if plans2 is not None:
        # Joint 50/50 sampling with dataset tags (ref: dataset/frame.py:640-663)
        train = JointSampler(
            _sampler(plans[tr], cfg.dataset, cfg.mixup),
            _sampler(plans2["train"], cfg.pretrain.dataset, cfg.mixup),
        )
        val = JointSampler(
            _sampler(plans[va], cfg.dataset, False),
            _sampler(plans2["val"], cfg.pretrain.dataset, False),
        )
    else:
        train = _sampler(plans[tr], cfg.dataset, cfg.mixup)
        val = _sampler(plans[va], cfg.dataset, False)
    return train, val, labels_root


def main(argv=None) -> None:
    args = get_args(argv)
    seed_everything(args.seed)

    from tdeed_tpu.config import load_config

    cfg = load_config(args.model, args.config_root, acc_grad_iter=args.acc_grad_iter)

    import jax

    if args.distributed:
        # Multi-host bootstrap: on TPU pods jax.distributed autodetects
        # everything; generic launchers (SSH scripts, CPU tests) pass the
        # topology via env — JAX_COORDINATOR_ADDRESS is read natively by
        # jax, JAX_NUM_PROCESSES / JAX_PROCESS_ID are forwarded here.
        jax.distributed.initialize(
            num_processes=(int(os.environ["JAX_NUM_PROCESSES"])
                           if "JAX_NUM_PROCESSES" in os.environ else None),
            process_id=(int(os.environ["JAX_PROCESS_ID"])
                        if "JAX_PROCESS_ID" in os.environ else None),
        )
        # Establish the collective channels NOW, while the processes are
        # in lockstep — the first train-step collective otherwise fires
        # after a full-model compile whose wall-time can skew between
        # hosts past the transport's rendezvous timeout (30 s for
        # XLA:CPU gloo). See parallel.mesh.startup_barrier.
        from tdeed_tpu.parallel.mesh import startup_barrier

        startup_barrier("tdeed:train:init")

    import jax.numpy as jnp

    from tdeed_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    # Multi-host: exactly one process owns checkpoint/metric IO (shared
    # save_dir would otherwise see racing rmtree/save and N wandb runs).
    is_main = jax.process_index() == 0

    from tdeed_tpu.checkpoint import CheckpointManager
    from tdeed_tpu.data.loader import BatchLoader, device_prefetch
    from tdeed_tpu.data.registry import get_spec, load_classes
    from tdeed_tpu.infer.evaluate import evaluate
    from tdeed_tpu.infer.windows import VideoWindows
    from tdeed_tpu.models.tdeed import build_model
    from tdeed_tpu.parallel.mesh import make_mesh, shard_batch
    from tdeed_tpu.train.schedule import make_optimizer
    from tdeed_tpu.train.state import TrainState
    from tdeed_tpu.train.step import make_predict_step, make_train_step, make_val_step
    from tdeed_tpu.utils.logging import MetricsLogger

    spec = get_spec(cfg.dataset)
    classes = load_classes(os.path.join(args.data_root, cfg.dataset, "class.txt"))
    assert len(classes) == cfg.num_classes, (len(classes), cfg.num_classes)

    two_heads = None
    classes2 = None
    if cfg.pretrain is not None:
        classes2 = load_classes(
            os.path.join(args.data_root, cfg.pretrain.dataset, "class.txt")
        )
        # (C1+1, C2+1) incl. background slots (ref: model/model.py:169-172)
        two_heads = (cfg.num_classes + 1, cfg.pretrain.num_classes + 1)

    # One decoded-frame LRU per host process, shared by the train/val
    # samplers AND the eval windows (same decoder backend; plans and eval
    # windows overlap heavily, so hot frames repeat — docs/DESIGN.md).
    from tdeed_tpu.data.loader import FrameCache

    frame_cache = (
        FrameCache(cfg.decode_cache_mb << 20)
        if cfg.decode_cache_mb > 0 else None
    )
    train_sampler, val_sampler, labels_root = build_samplers(
        cfg, args, classes, classes2, cache=frame_cache
    )

    # --- model / optimizer / mesh --------------------------------------
    # Multi-host: jax.distributed must be initialized by the launcher; each
    # process loads its slice of the global batch (distinct sampler seeds)
    # and form_global_batch stitches the shards over the full mesh.
    n_local = args.n_devices or jax.local_device_count()
    multihost = jax.process_count() > 1
    if multihost:
        mesh = make_mesh(devices=jax.devices())
    else:
        mesh = make_mesh(n_local) if n_local > 1 else None
    model = build_model(cfg, two_heads=two_heads)

    crop = cfg.crop_dim
    if crop is None and cfg.acc_grad_iter == 1:
        # Full-frame (crop_dim -1) training, e.g. the SNB challenge
        # envelope at 796x448: the plain graph only fits HBM through
        # XLA's silent rematerialization (~10% of the step). Measured:
        # --acc_grad_iter 2 trains 19% faster at identical optimizer
        # batch (docs/DESIGN.md "SNB 796x448 per-layer attribution").
        print("hint: full-frame training with acc_grad_iter=1 — "
              "--acc_grad_iter 2 measured 19% faster at this geometry "
              "(see configs/README.md)")
    rng = jax.random.PRNGKey(args.seed)
    # init at eval-crop spatial size; shapes are polymorphic in H/W at trace
    size = crop or 224
    # jitted init: eager init dispatches every layer's ops separately
    # (minutes through a remote-compile tunnel — CLAUDE.md rule)
    variables = jax.jit(model.init, static_argnums=(2,))(
        rng, jnp.zeros((1, cfg.clip_len, size, size, 3), jnp.float32), False
    )
    if cfg.backbone_ckpt:
        # ImageNet-pretrained backbone (ref: model/model.py:37-46 uses timm
        # pretrained=True; here provenance is an explicit orbax dir).
        from tdeed_tpu.checkpoint import load_backbone

        variables = load_backbone(variables, cfg.backbone_ckpt)
        print(f"Loaded pretrained backbone <- {cfg.backbone_ckpt}")

    steps_per_epoch = cfg.dataset_len // cfg.batch_size  # optimizer steps
    tx = make_optimizer(
        cfg.learning_rate,
        warmup_steps=cfg.warm_up_epochs * steps_per_epoch,
        cosine_steps=(cfg.num_epochs - cfg.warm_up_epochs) * steps_per_epoch,
    )
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)

    pretrain_bg = cfg.pretrain.num_classes + 1 if cfg.pretrain else 0
    train_step = jax.jit(
        make_train_step(
            model,
            tx,
            crop_dim=crop,
            num_classes_bg=cfg.num_classes_bg,
            mixup=cfg.mixup,
            radi_displacement=cfg.radi_displacement,
            acc_grad_iter=cfg.acc_grad_iter,
            two_heads=two_heads,
            pretrain_classes_bg=pretrain_bg,
            pallas_augment=cfg.pallas_augment,
        ),
        donate_argnums=(0,),
    )
    val_step = jax.jit(
        make_val_step(
            model,
            crop_dim=crop,
            num_classes_bg=cfg.num_classes_bg,
            radi_displacement=cfg.radi_displacement,
            two_heads=two_heads,
            pretrain_classes_bg=pretrain_bg,
        )
    )
    predict_step = jax.jit(
        make_predict_step(
            model,
            crop_dim=crop,
            radi_displacement=cfg.radi_displacement,
            two_heads=two_heads,
        ),
        static_argnums=(3,),
    )

    def eval_predict_fn():
        """Predict closure over a process-local copy of the current state.

        Multi-host DP replicates the train state over the GLOBAL mesh, so
        any computation on it is a collective program every process must
        join — but eval (val-mAP + test tail) runs on process 0 only. Pull
        the local replica (a few MB) and run a purely process-local
        program: main-only eval cannot deadlock. Single-host: zero-copy.
        """
        if multihost:
            from tdeed_tpu.parallel.mesh import host_replica

            p, bs = jax.device_put(
                host_replica((state.params, state.batch_stats))
            )
        else:
            p, bs = state.params, state.batch_stats
            if mesh is not None:
                # Single host, >1 local device: run the eval forward
                # batch-parallel over the same mesh training uses (window
                # batches are padded to eval_batch_size, a mesh multiple).
                from tdeed_tpu.parallel.mesh import make_sharded_predict

                return make_sharded_predict(predict_step, mesh, p, bs)

        def fn(frames, hflip=False):
            _, probs = predict_step(p, bs, frames, hflip)
            return probs

        return fn

    # Window-batch size for eval: a mesh multiple when the eval forward is
    # sharded (see eval_predict_fn), else None = the protocol defaults.
    if mesh is not None and not multihost:
        from tdeed_tpu.infer.evaluate import INFERENCE_BATCH_SIZE

        eval_batch_size = -(-INFERENCE_BATCH_SIZE // mesh.size) * mesh.size
    else:
        eval_batch_size = None

    # --- data loaders ---------------------------------------------------
    # Each host materializes its row-slice of the SAME global epoch plan
    # (sample RNGs keyed by global row index): the union over hosts equals
    # the single-host epoch bit-for-bit, so N-process and 1-process runs
    # are numerically identical (tests/test_multihost.py).
    local_batch = cfg.batch_size // jax.process_count()
    assert local_batch * jax.process_count() == cfg.batch_size, (
        "batch_size must divide evenly across hosts"
    )
    shard_off = jax.process_index() * local_batch
    train_loader = BatchLoader(
        train_sampler,
        local_batch,
        cfg.dataset_len,
        num_workers=max(4, cfg.num_workers),
        seed=args.seed,
        global_batch_size=cfg.batch_size,
        shard_offset=shard_off,
    )
    val_loader = BatchLoader(
        val_sampler,
        local_batch,
        cfg.dataset_len // 4,  # ref: datasets.py:49
        num_workers=max(4, cfg.num_workers),
        seed=args.seed + 100_000,
        global_batch_size=cfg.batch_size,
        shard_offset=shard_off,
    )

    val_data_frames = None
    if cfg.criterion == "map" and cfg.dataset != "soccernet":
        val_data_frames = VideoWindows(
            cfg.dataset,
            os.path.join(args.data_root, cfg.dataset, f"{cfg.val_split}.json"),
            cfg.frame_dir,
            cfg.clip_len,
            overlap_len=0,
            stride=spec.eval_stride,
            labels_root=labels_root,
            cache=frame_cache,
        )

    ckpt = CheckpointManager(cfg.save_dir or os.path.join("checkpoints", cfg.model))
    logger = MetricsLogger(
        ckpt.save_dir, cfg, enable_wandb=(not args.no_wandb) and is_main
    )

    start_epoch = 0
    resume_batch = 0
    if not args.resume and not cfg.only_test and is_main:
        # Fresh run in a reused save_dir: a stale best_criterion/history
        # would suppress checkpoint_best for the whole run and the final
        # eval would score the OLD weights.
        ckpt.save_meta({"epoch": -1, "best_criterion": None, "history": []})
    if args.resume:
        state, start_epoch = ckpt.restore_last(state)
        # Step-level resume: state.step counts consumed batches, and batch b
        # of epoch e is a pure function of (seed, e, b) — an interrupt-saved
        # mid-epoch checkpoint continues from the exact next batch (the
        # reference restarts from scratch, SURVEY.md §5).
        steps_done = int(state.step)
        n_batches = (cfg.dataset_len // jax.process_count()) // local_batch
        if n_batches > 0 and steps_done > 0:
            start_epoch = steps_done // n_batches
            resume_batch = steps_done % n_batches
        print(f"Resumed at epoch {start_epoch}, batch {resume_batch} "
              f"(step {steps_done})")
    best = ckpt.load_meta().get("best_criterion") if args.resume else None
    if best is None:
        best = float("inf") if cfg.criterion == "loss" else 0.0

    step_rng = jax.random.PRNGKey(args.seed + 7)

    def place(batch):
        if multihost:
            from tdeed_tpu.parallel.mesh import form_global_batch

            return form_global_batch(batch, mesh)
        if mesh is not None:
            return shard_batch(batch, mesh)
        return batch

    def placed(iterator):
        # double-buffered H2D: decode/assembly overlaps device compute
        return device_prefetch(map(place, iterator), sharding=None, depth=2)

    profiled = {"done": args.profile_dir is None}

    def run_train_epoch(epoch: int, start_batch: int = 0) -> float:
        nonlocal state
        # Loss scalars stay on device until the epoch ends: a float() per
        # step would block the dispatch pipeline that device_prefetch fills.
        losses = []
        trace = None
        for i, batch in enumerate(
            placed(train_loader.epoch(epoch, start_batch=start_batch))
        ):
            if not profiled["done"] and i == 1:  # skip the compile step
                trace = jax.profiler.trace(args.profile_dir)
                trace.__enter__()
            state, metrics = train_step(state, batch, step_rng)
            losses.append(metrics["loss"])
            if trace is not None and i == 4:
                jax.block_until_ready(metrics["loss"])
                trace.__exit__(None, None, None)
                trace = None
                profiled["done"] = True
                print(f"profiler trace -> {args.profile_dir} "
                      "(tools/trace_attrib.py to attribute)")
        if trace is not None:  # short epoch: close the span
            jax.block_until_ready(losses[-1])
            trace.__exit__(None, None, None)
            profiled["done"] = True
        if not losses:
            return 0.0
        return float(np.mean(jax.device_get(losses)))

    def run_val_epoch(epoch: int) -> float:
        losses = []
        for batch in placed(val_loader.epoch(epoch)):
            aux = val_step(state, batch)
            losses.append(aux["loss"])
        if not losses:
            return 0.0
        return float(np.mean(jax.device_get(losses)))

    def _train_epochs():
        nonlocal best, resume_batch
        for epoch in range(start_epoch, cfg.num_epochs):
            t0 = time.time()
            train_loss = run_train_epoch(epoch, start_batch=resume_batch)
            resume_batch = 0
            t1 = time.time()
            val_loss = run_val_epoch(epoch)
            t2 = time.time()

            val_map = None
            is_best = False
            if not is_main:
                pass  # only process 0 selects/saves/logs
            elif cfg.criterion == "loss":
                is_best = val_loss < best
                if is_best:
                    best = val_loss
            elif epoch >= cfg.start_val_epoch:  # ref: train_tdeed.py:182-199
                pfn = eval_predict_fn()
                if cfg.dataset == "soccernet":
                    from tdeed_tpu.metrics.soccernet import val_map_sn

                    val_map = val_map_sn(
                        pfn, cfg, args.data_root, labels_root,
                        batch_size=eval_batch_size,
                    )
                else:
                    val_map = evaluate(
                        pfn,
                        val_data_frames,
                        "VAL",
                        classes,
                        printed=False,
                        test=False,
                        augment=False,
                        labels_root=labels_root,
                        batch_size=eval_batch_size,
                    )
                is_best = val_map > best
                if is_best:
                    best = val_map

            record = {
                "epoch": epoch,
                "train": train_loss,
                "val": val_loss,
                "val_mAP": val_map,
                "train_time": t1 - t0,
                "val_time": t2 - t1,
            }
            if is_main:
                logger.log_epoch(record)
                print(
                    f"[epoch {epoch}] train {train_loss:.4f} val {val_loss:.4f}"
                    + (f" val_mAP {val_map:.4f}" if val_map is not None else "")
                    + (" *best*" if is_best else "")
                )
                ckpt.save_epoch(state, epoch, record, is_best, best)

    from tdeed_tpu.checkpoint import BEST

    if cfg.only_test and not os.path.exists(os.path.join(ckpt.save_dir, BEST)):
        # Fail fast: only_test with no trained checkpoint would silently
        # launch a full training run (hours) before the eval the user asked
        # for; the reference crashes on the missing checkpoint file too.
        raise SystemExit(
            f"only_test=True but no {BEST} under {ckpt.save_dir}"
        )
    if not cfg.only_test:
        try:
            _train_epochs()
        except KeyboardInterrupt:
            # Graceful interrupt: persist the in-flight state so --resume
            # continues from here (the reference restarts from scratch —
            # SURVEY.md §5 failure-recovery gap).
            if is_main:
                print("interrupted: saving checkpoint_last for --resume")
                from tdeed_tpu.checkpoint import LAST, save_state

                save_state(os.path.join(ckpt.save_dir, LAST), state)
            raise

    def _final_sync():
        # Multi-host: every process must reach interpreter exit together —
        # jax.distributed's shutdown barrier times out (and kills the
        # survivors) if non-main processes exit while main is still running
        # the minutes-long test tail.
        if multihost:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("tdeed:final")

    # --- test ----------------------------------------------------------
    if not is_main:
        logger.finish()
        _final_sync()
        return
    if os.path.exists(os.path.join(ckpt.save_dir, BEST)):
        restored = ckpt.restore_best()
        # device_put once: numpy trees in the predict closure would re-upload
        # the whole model every sliding-window call. Restored arrays are
        # process-local, so the closure below is a local program even after
        # a multi-host training run.
        rp = jax.device_put(restored["params"])
        rbs = jax.device_put(restored["batch_stats"])

        if mesh is not None and not multihost:
            from tdeed_tpu.parallel.mesh import make_sharded_predict

            test_predict_fn = make_sharded_predict(predict_step, mesh, rp, rbs)
        else:

            def test_predict_fn(frames, hflip=False):
                _, probs = predict_step(rp, rbs, frames, hflip)
                return probs
    else:
        # No epoch ever improved the criterion (e.g. num_epochs <
        # start_val_epoch): evaluate the final state instead.
        print("warning: no best checkpoint; evaluating final state")
        test_predict_fn = eval_predict_fn()

    for split in EVAL_SPLITS:
        split_path = os.path.join(args.data_root, cfg.dataset, f"{split}.json")
        if not os.path.exists(split_path):
            continue
        data = VideoWindows(
            cfg.dataset,
            split_path,
            cfg.frame_dir,
            cfg.clip_len,
            overlap_len=spec.eval_overlap_len(cfg.clip_len),
            stride=spec.eval_stride,
            labels_root=labels_root,
            cache=frame_cache,
        )
        pred_file = os.path.join(ckpt.save_dir, f"pred-{split}")
        maps, tols = evaluate(
            test_predict_fn,
            data,
            split.upper(),
            classes,
            save_pred=pred_file,
            printed=True,
            test=True,
            augment=spec.hflip_tta,
            labels_root=labels_root,
            batch_size=eval_batch_size,
        )
        if maps is not None:
            logger.log_test(split, maps, tols)

        if cfg.dataset == "soccernet":
            from tdeed_tpu.metrics.soccernet import evaluate_sn_official

            evaluate_sn_official(labels_root, os.path.join(ckpt.save_dir, "preds"), split)
        elif cfg.dataset == "soccernetball":
            from tdeed_tpu.metrics.soccernet import evaluate_snb

            evaluate_snb(labels_root, os.path.join(ckpt.save_dir, "preds"), split)
    logger.finish()
    _final_sync()
    print("CORRECTLY FINISHED TRAINING AND INFERENCE")


if __name__ == "__main__":
    main()
