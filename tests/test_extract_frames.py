"""Frame-extraction tool: decode/resize/sample + split-list filtering
(ref: extract_frames_snb.py, extract_frames_sn.py)."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tdeed_tpu.cli.extract_frames import (  # noqa: E402
    extract_one,
    filter_by_game_list,
    find_videos,
    main,
)


def _write_video(path, n_frames=30, fps=10.0, size=(64, 48)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    vw = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, size
    )
    r = np.random.default_rng(0)
    for _ in range(n_frames):
        vw.write(r.integers(0, 256, (size[1], size[0], 3), np.uint8))
    vw.release()


def test_extract_samples_and_fps_sidecar(tmp_path):
    vid_dir = str(tmp_path / "videos")
    out_dir = str(tmp_path / "frames")
    _write_video(os.path.join(vid_dir, "league/2020/g1.mp4"), n_frames=30,
                 fps=10.0)

    meta = extract_one(
        ("league/2020/g1.mp4", vid_dir, out_dir, 5.0, (32, 24), False, False)
    )
    # stride = 10/5 = 2 -> 15 sampled frames at 5 fps
    assert meta["num_frames"] == 15
    assert meta["fps"] == pytest.approx(5.0)
    dst = os.path.join(out_dir, "league/2020/g1")
    assert os.path.exists(os.path.join(dst, "frame0.jpg"))
    assert os.path.exists(os.path.join(dst, "frame14.jpg"))
    img = cv2.imread(os.path.join(dst, "frame0.jpg"))
    assert img.shape == (24, 32, 3)
    with open(os.path.join(dst, "fps.txt")) as fp:
        assert float(fp.read()) == pytest.approx(5.0)


def test_game_list_filtering(tmp_path):
    videos = [
        "england_efl/2019-2020/2019-10-01 - Leeds United - West Bromwich/video.mp4",
        "england_efl/2019-2020/other game/video.mp4",
        "cup/2021/final/half1.mkv",
    ]
    split = tmp_path / "train.json"
    with open(split, "w") as fp:
        json.dump(
            [
                {"video": "england_efl/2019-2020/2019-10-01 - Leeds United - West Bromwich",
                 "num_frames": 1},
                {"video": "cup/2021/final/half1", "num_frames": 1},  # SN-style
            ],
            fp,
        )
    kept = filter_by_game_list(videos, str(split))
    assert kept == [videos[0], videos[2]]


def test_main_end_to_end(tmp_path, capsys):
    vid_dir = str(tmp_path / "videos")
    out_dir = str(tmp_path / "frames")
    _write_video(os.path.join(vid_dir, "a/g1.mp4"), n_frames=20, fps=10.0)
    _write_video(os.path.join(vid_dir, "b/g2.mp4"), n_frames=20, fps=10.0)
    split = tmp_path / "list.json"
    with open(split, "w") as fp:
        json.dump([{"video": "a/g1", "num_frames": 1}], fp)

    main(["--video_dir", vid_dir, "--out_dir", out_dir, "--sample_fps", "10",
          "--num_workers", "1", "--game_list", str(split)])
    assert os.path.exists(os.path.join(out_dir, "a/g1/frame0.jpg"))
    assert not os.path.exists(os.path.join(out_dir, "b/g2"))
    assert "Extracted 1/1" in capsys.readouterr().out


def test_find_videos(tmp_path):
    _write_video(str(tmp_path / "x/y.mp4"), n_frames=2)
    open(tmp_path / "x/readme.txt", "w").close()
    assert find_videos(str(tmp_path)) == ["x/y.mp4"]


def test_output_name_half_dirs():
    from tdeed_tpu.cli.extract_frames import output_name

    g = "england_epl/2014-2015/some game"
    assert output_name(f"{g}/1_720p.mkv", True) == f"{g}/half1"
    assert output_name(f"{g}/2.mkv", True) == f"{g}/half2"
    assert output_name(f"{g}/1_720p.mkv", False) == f"{g}/1_720p"
    assert output_name("a/clip.mp4", True) == "a/clip"  # non-half untouched
