"""Host input-pipeline throughput benchmark.

SURVEY.md ranks JPEG decode the #2 hot loop (ref: dataset/frame.py:271 — the
reference hides it in 4 torch DataLoader worker processes, measured class
~600-900 frames/s/core for 224-class JPEGs, BASELINE.md). The TPU device
path trains at ~10.4k frames/s/chip (BENCH_r03), so the host side must be
shown to feed it. This tool measures, on a synthetic JPEG tree:

  1. per-backend decoder throughput (native C++ / cv2 / PIL), single thread;
  2. the native batch decoder with its own C++ threads (GIL-free);
  3. the production path end-to-end: ClipSampler -> BatchLoader (threaded
     decode + collate + bounded prefetch) in frames/s, with and without the
     mixup second stream (mixup doubles decode work per trained frame,
     ref: dataset/frame.py:244-252);
  4. the per-core feed requirement: cores needed at the measured
     frames/s/core to keep one chip at a target train rate.

Run anywhere (pure host work, no device):
    PYTHONPATH=/root/repo python tools/bench_input.py \
        [--geom flagship|snb] [--frames 400] [--batches 6] [--target 10375]

Prints one JSON line; record results in docs/DESIGN.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GEOMS = {
    # stored-frame geometry: (width, height, clip_len, batch)
    "flagship": (256, 256, 100, 8),  # FineDiving_small class (crop 224)
    "snb": (796, 448, 100, 4),       # SNB challenge full frames
                                     # (ref: extract_frames_snb.py:22-23)
}


def synth_tree(root: str, n_frames: int, w: int, h: int) -> str:
    """Write a video dir of textured JPEGs (quality 85, camera-ish load)."""
    from PIL import Image

    vdir = os.path.join(root, "video0")
    os.makedirs(vdir, exist_ok=True)
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n_frames):
        base = (
            128
            + 80 * np.sin(xx / 17.0 + i / 3.0)
            + 60 * np.cos(yy / 23.0 - i / 5.0)
        )
        img = np.stack(
            [base, np.roll(base, i % 7, axis=1), base[::-1]], axis=-1
        )
        img = img + rng.normal(0, 12, img.shape)
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            os.path.join(vdir, f"{i + 1:04d}.jpg"), quality=85
        )
    return vdir


def bench_decoders(vdir: str, n: int, w: int, h: int) -> dict:
    from tdeed_tpu.data import frames as F

    paths = [os.path.join(vdir, f"{i + 1:04d}.jpg") for i in range(n)]
    out = {}

    backends = []
    try:
        from tdeed_tpu.native import jpeg as native_jpeg

        if native_jpeg.available():
            backends.append(("native", native_jpeg.decode))
    except Exception:
        pass
    try:
        backends.append(("cv2", F._decode_cv2))
        F._get_cv2()
    except Exception:
        backends.pop()
    backends.append(("pil", F._decode_pil))

    for name, dec in backends:
        dec(paths[0])  # warm (imports, caches)
        t0 = time.perf_counter()
        for p in paths:
            a = dec(p)
        dt = time.perf_counter() - t0
        assert a.shape == (h, w, 3), a.shape
        out[f"decode_{name}_fps_1thread"] = round(n / dt, 1)

    try:
        from tdeed_tpu.native import jpeg as native_jpeg

        if native_jpeg.available():
            native_jpeg.decode_batch(paths[:8], h, w)  # warm
            t0 = time.perf_counter()
            _, n_ok = native_jpeg.decode_batch(paths, h, w)
            dt = time.perf_counter() - t0
            assert n_ok == n, (n_ok, n)
            out["decode_native_batch_fps"] = round(n / dt, 1)
    except Exception:
        pass
    return out


def bench_pipeline(
    vdir: str, n_frames: int, clip_len: int, batch: int, n_batches: int,
    mixup: bool, cache_mb: int = 0, stats: dict = None,
) -> float:
    """Production-path frames/s: ClipSampler + BatchLoader over a plan whose
    clips tile the synthetic video (decode + collate + prefetch queue).

    cache_mb > 0 measures the decode-ahead FrameCache path at steady state
    (one extra warm batch fills the LRU; hit stats land in `stats`). The
    steady-state rate is what a production epoch sees once its hot window
    is resident — the honest production number scales with the hit rate,
    which the synthetic tree (working set << budget) gives at ~100%."""
    from tdeed_tpu.data.clips import ClipPlan
    from tdeed_tpu.data.loader import BatchLoader, ClipSampler, FrameCache

    starts = range(1, max(2, n_frames - clip_len), max(1, clip_len // 4))
    plan = ClipPlan(
        frame_paths=[[vdir, s, 0, 0, 4, clip_len] for s in starts],
        labels=[[{"label": 1, "label_idx": 3}] for _ in starts],
        labels_d=[[{"displ": 1, "label_idx": 3}] for _ in starts],
    )
    cache = FrameCache(cache_mb << 20) if cache_mb else None
    sampler = ClipSampler(
        plan, clip_len=clip_len, stride=1, radi_displacement=2, mixup=mixup,
        cache=cache,
    )
    n_warm = 1 if cache is None else 2
    loader = BatchLoader(
        sampler,
        batch_size=batch,
        dataset_len=batch * (n_batches + 1 + n_warm),
        num_workers=min(8, (os.cpu_count() or 1) * 2),
        prefetch=2,
    )
    it = loader.epoch(0)
    for _ in range(n_warm):  # warm: thread pool up, page cache / LRU hot
        next(it)
    if cache is not None:  # count hits over the measured region only
        cache.hits = cache.misses = 0
    t0 = time.perf_counter()
    done = 0
    for b in it:
        done += b["frame"].shape[0] * clip_len
        if done >= n_batches * batch * clip_len:
            break
    dt = time.perf_counter() - t0
    for _ in it:  # drain so the producer thread exits
        pass
    if cache is not None and stats is not None:
        stats.update(cache.stats())
    return done / dt


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--geom", choices=sorted(GEOMS), default="flagship")
    p.add_argument("--frames", type=int, default=400,
                   help="synthetic frames to write (decode set size)")
    p.add_argument("--batches", type=int, default=6)
    p.add_argument("--target", type=float, default=10375.0,
                   help="device train frames/s/chip the host must feed")
    p.add_argument("--cache_mb", type=int, default=1024,
                   help="FrameCache budget for the cached-pipeline rows")
    args = p.parse_args(argv)

    w, h, clip_len, batch = GEOMS[args.geom]
    cores = os.cpu_count() or 1
    res = {"geom": args.geom, "width": w, "height": h, "cores": cores}

    with tempfile.TemporaryDirectory() as root:
        t0 = time.perf_counter()
        vdir = synth_tree(root, args.frames, w, h)
        res["synth_sec"] = round(time.perf_counter() - t0, 1)

        res.update(bench_decoders(vdir, min(args.frames, 200), w, h))
        res["pipeline_fps"] = round(
            bench_pipeline(vdir, args.frames, clip_len, batch,
                           args.batches, mixup=False), 1
        )
        res["pipeline_fps_mixup"] = round(
            bench_pipeline(vdir, args.frames, clip_len, batch,
                           args.batches, mixup=True), 1
        )
        cstats = {}
        res["pipeline_fps_cached"] = round(
            bench_pipeline(vdir, args.frames, clip_len, batch,
                           args.batches, mixup=False,
                           cache_mb=args.cache_mb, stats=cstats), 1
        )
        res["cache_hit_rate"] = round(cstats.get("hit_rate", 0.0), 4)
        cstats = {}
        res["pipeline_fps_mixup_cached"] = round(
            bench_pipeline(vdir, args.frames, clip_len, batch,
                           args.batches, mixup=True,
                           cache_mb=args.cache_mb, stats=cstats), 1
        )
        res["cache_hit_rate_mixup"] = round(cstats.get("hit_rate", 0.0), 4)

    # Feed requirement: mixup decodes 2 clips per trained clip, so the
    # host must DECODE at 2x the train rate. frames/s/core from the
    # threaded pipeline measured above (on a 1-core host the pipeline IS
    # per-core; on larger hosts divide).
    per_core = res["pipeline_fps"] / cores
    res["pipeline_fps_per_core"] = round(per_core, 1)
    res["cores_to_feed_target"] = round(2.0 * args.target / per_core, 1)
    per_core_c = res["pipeline_fps_mixup_cached"] / cores
    res["cores_to_feed_target_cached"] = (
        round(args.target / per_core_c, 1) if per_core_c else None
    )
    res["target_fps"] = args.target
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main()
