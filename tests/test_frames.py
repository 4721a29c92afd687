"""Frame extraction (L0 data prep, T17) — the one component round 1 left
with zero automated coverage. A mocked-subprocess test pins the
orchestration (ffprobe duration -> computed fps -> ffmpeg args -> output
layout, mirroring create_folders_and_extract_frames.py:41-52); a real
end-to-end test runs when ffmpeg is installed."""

import os
import shutil
import subprocess
from collections import namedtuple

import numpy as np
import pytest

from ivf_tpu.data import frames as frames_mod

Item = namedtuple("Item", "id label path")


def _fake_ffmpeg(calls, monkeypatch):
    """Replace subprocess calls: ffprobe reports 2.0s; ffmpeg writes JPEGs."""

    def fake_check_output(cmd, **kw):
        assert cmd[0] == "ffprobe"
        calls.append(cmd)
        return b"2.0\n"

    def fake_check_call(cmd, **kw):
        assert cmd[0] == "ffmpeg"
        calls.append(cmd)
        out_pattern = cmd[-1]
        n = int(cmd[cmd.index("-frames:v") + 1])
        from PIL import Image

        for i in range(1, n + 1):
            Image.fromarray(
                np.full((4, 6, 3), i * 10, np.uint8)
            ).save(out_pattern % i)
        return 0

    monkeypatch.setattr(subprocess, "check_output", fake_check_output)
    monkeypatch.setattr(subprocess, "check_call", fake_check_call)


def test_extract_frames_mocked(tmp_path, monkeypatch):
    calls = []
    _fake_ffmpeg(calls, monkeypatch)
    n = frames_mod.extract_frames(
        "/fake/video.webm", str(tmp_path / "out"), nb_frames=5, width=64
    )
    assert n == 5
    names = sorted(os.listdir(tmp_path / "out"))
    assert names == [f"frame{i:02d}.jpg" for i in range(1, 6)]
    ffmpeg_cmd = calls[1]
    # fps = nb_frames / duration = 5 / 2.0
    assert ffmpeg_cmd[ffmpeg_cmd.index("-r") + 1] == "2.5"
    assert "scale=64:-1" in ffmpeg_cmd


def test_extract_dataset_layout(tmp_path, monkeypatch):
    calls = []
    _fake_ffmpeg(calls, monkeypatch)
    items = [
        Item("101", "waving", "/fake/a.webm"),
        Item("102", "boxing", "/fake/b.webm"),
    ]
    frames_mod.extract_dataset(items, str(tmp_path), nb_frames=3, width=32)
    for item in items:
        d = tmp_path / item.label / item.id
        assert sorted(os.listdir(d)) == [
            "frame01.jpg",
            "frame02.jpg",
            "frame03.jpg",
        ]


@pytest.mark.skipif(
    shutil.which("ffmpeg") is None or shutil.which("ffprobe") is None,
    reason="ffmpeg not installed",
)
def test_extract_frames_real_ffmpeg(tmp_path):
    # synthesize a 1-second test video, then extract 4 frames from it
    video = str(tmp_path / "clip.mp4")
    subprocess.check_call(
        [
            "ffmpeg",
            "-y",
            "-v",
            "error",
            "-f",
            "lavfi",
            "-i",
            "testsrc=duration=1:size=64x48:rate=8",
            video,
        ]
    )
    n = frames_mod.extract_frames(video, str(tmp_path / "out"), nb_frames=4, width=32)
    assert n == 4
