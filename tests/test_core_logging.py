"""Observability utilities (core/logging.py — ref §5.5 equivalents) and
media save helpers (data/media.py — ref media.py:155-260)."""

import json

import numpy as np
import pytest

from avsr_tpu.core.logging import (
    CSVLogger,
    LossStabilityMonitor,
    ThroughputMeter,
    save_loss_plot,
)


def test_csv_logger_appends_and_fills(tmp_path):
    p = tmp_path / "log.csv"
    csv = CSVLogger(p, ["step", "loss", "extra"])
    csv.log(step=1, loss=0.5)
    csv.log(step=2, loss=0.4, extra="x")
    lines = p.read_text().strip().splitlines()
    assert lines[0] == "step,loss,extra"
    assert lines[1].startswith("1,0.5")
    assert lines[2] == "2,0.4,x"


def test_stability_monitor_fires_after_bad_window():
    mon = LossStabilityMonitor(window=3, max_bad=2)
    for loss in (1.0, 0.9, 0.8):
        assert not mon.update(loss)
    assert not mon.update(float("nan"))   # 1 bad
    assert mon.update(float("inf"))       # 2 bad -> fire


def test_throughput_meter_reports_rates():
    m = ThroughputMeter(window=4)
    out = None
    for _ in range(3):
        out = m.step(n_tokens=100, n_utts=4)
    assert out["tokens_per_sec"] > 0
    assert out["utts_per_sec"] > 0
    assert out["step_time_s"] >= 0


def test_save_loss_plot(tmp_path):
    pytest.importorskip("matplotlib")
    save_loss_plot({"train": [3.0, 2.0, 1.0], "val": [2.5, 1.5]}, tmp_path)
    assert list(tmp_path.glob("*.png"))


def test_media_save_results(tmp_path):
    from avsr_tpu.data.media import save_results

    out = tmp_path / "r" / "results.json"
    save_results({"wer": 0.1, "utts": 3}, out)
    assert json.loads(out.read_text())["utts"] == 3


def test_media_save_video_roundtrip(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    from avsr_tpu.data.media import save_video
    from avsr_tpu.data.video_io import load_frames

    frames = rng.integers(0, 256, (5, 32, 32, 3)).astype(np.uint8)
    path = tmp_path / "v.mp4"
    save_video(frames, path, fps=25)
    back = load_frames(path, max_frames=5)
    assert back.shape == (5, 32, 32, 3)


def test_extract_audio_requires_ffmpeg(tmp_path):
    from avsr_tpu.data.media import extract_audio_from_video, ffmpeg_available

    if ffmpeg_available():
        pytest.skip("ffmpeg present — gated error path not reachable")
    with pytest.raises(RuntimeError, match="ffmpeg"):
        extract_audio_from_video(tmp_path / "x.mp4")
