"""Offline video -> JPEG frame extraction (SoccerNet / SoccerNet-Ball / generic).

First-party equivalent of the reference extractors
(ref: extract_frames_sn.py, extract_frames_snb.py): OpenCV decode, resize to
796x448 for soccer broadcasts (ref: extract_frames_snb.py:22-23), temporal
sampling at ``--sample_fps`` (stride = src_fps / sample_fps), a
multiprocessing pool over videos, a per-video ``fps.txt`` sidecar consumed
by the data layer (ref: util/dataset.py:20-22), and FPS-consistency
verification (ref: extract_frames_sn.py:85-178 repairs via ffmpeg; this
tool re-reads with OpenCV and reports instead — no ffmpeg binary required).

Usage:
    python -m tdeed_tpu.cli.extract_frames \
        --video_dir /path/videos --out_dir /path/frames \
        --sample_fps 25 [--recalc_fps] [--num_workers N]
"""

from __future__ import annotations

import argparse
import os
from multiprocessing import Pool
from typing import List, Optional, Tuple

TARGET_HEIGHT = 448
TARGET_WIDTH = 796  # ref: extract_frames_snb.py:22-23
VIDEO_EXTS = (".mkv", ".mp4", ".avi", ".mov")


def get_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--sample_fps", type=float, default=25.0)
    p.add_argument("--height", type=int, default=TARGET_HEIGHT)
    p.add_argument("--width", type=int, default=TARGET_WIDTH)
    p.add_argument("--no_resize", action="store_true")
    p.add_argument("--num_workers", type=int, default=os.cpu_count())
    p.add_argument(
        "--recalc_fps",
        action="store_true",
        help="verify container FPS by re-counting frames (slow but exact)",
    )
    return p.parse_args(argv)


def find_videos(video_dir: str) -> List[str]:
    """All video files below video_dir, as relative paths."""
    out = []
    for root, _, files in os.walk(video_dir):
        for f in sorted(files):
            if f.lower().endswith(VIDEO_EXTS):
                out.append(os.path.relpath(os.path.join(root, f), video_dir))
    return out


def recount_fps(path: str) -> Tuple[float, int]:
    """Exact fps by decoding the whole stream (frames / duration)."""
    import cv2

    vc = cv2.VideoCapture(path)
    n = 0
    while True:
        ok = vc.grab()
        if not ok:
            break
        n += 1
    msec = vc.get(cv2.CAP_PROP_POS_MSEC)
    vc.release()
    if msec <= 0:
        return 0.0, n
    return n / (msec / 1000.0), n


def extract_one(task) -> Optional[dict]:
    """Extract one video. Returns {'video', 'num_frames', 'fps'} metadata."""
    (video_rel, video_dir, out_dir, sample_fps, size, recalc) = task
    import cv2

    src = os.path.join(video_dir, video_rel)
    name = os.path.splitext(video_rel)[0]
    dst = os.path.join(out_dir, name)
    os.makedirs(dst, exist_ok=True)

    vc = cv2.VideoCapture(src)
    fps = vc.get(cv2.CAP_PROP_FPS)
    if recalc:
        exact_fps, _ = recount_fps(src)
        if exact_fps > 0 and abs(exact_fps - fps) > 0.01:
            # ref behaviour: detect container/stream fps mismatch
            # (extract_frames_sn.py:85-178); we trust the recount.
            print(f"[{video_rel}] fps mismatch: header {fps:.3f} vs "
                  f"measured {exact_fps:.3f}; using measured")
            fps = exact_fps
    if fps <= 0:
        print(f"[{video_rel}] unreadable fps; skipping")
        vc.release()
        return None

    # stride in source frames between samples (ref: extract_frames_snb.py:64)
    stride = max(1.0, fps / sample_fps)
    out_fps = fps / stride

    i_src = 0
    i_out = 0
    next_sample = 0.0
    while True:
        ok, frame = vc.read()
        if not ok:
            break
        if i_src >= next_sample:
            next_sample += stride
            if size is not None:
                frame = cv2.resize(frame, size, interpolation=cv2.INTER_AREA)
            cv2.imwrite(
                os.path.join(dst, f"frame{i_out}.jpg"),
                frame,
                [cv2.IMWRITE_JPEG_QUALITY, 95],
            )
            i_out += 1
        i_src += 1
    vc.release()

    with open(os.path.join(dst, "fps.txt"), "w") as fp:
        fp.write(f"{out_fps}\n")
    print(f"[{video_rel}] {i_out} frames @ {out_fps:.3f} fps -> {dst}")
    return {"video": name, "num_frames": i_out, "fps": out_fps}


def main(argv=None) -> None:
    args = get_args(argv)
    videos = find_videos(args.video_dir)
    if not videos:
        raise SystemExit(f"No videos under {args.video_dir}")
    size = None if args.no_resize else (args.width, args.height)
    tasks = [
        (v, args.video_dir, args.out_dir, args.sample_fps, size, args.recalc_fps)
        for v in videos
    ]
    workers = max(1, min(args.num_workers or 1, len(tasks)))
    if workers == 1:
        metas = [extract_one(t) for t in tasks]
    else:
        with Pool(workers) as pool:
            metas = pool.map(extract_one, tasks)
    done = [m for m in metas if m]
    print(f"Extracted {len(done)}/{len(videos)} videos")


if __name__ == "__main__":
    main()
