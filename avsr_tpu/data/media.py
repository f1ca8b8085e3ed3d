"""Media save/extract helpers (reference src/utils/media.py:155-260).

The reference shells out to ffmpeg for audio extraction (media.py:207-241)
and uses torchaudio/torchvision writers for saving. Here:

  * ``save_audio``  — dependency-free PCM16 WAV (audio_io.write_wav);
  * ``save_video``  — cv2 VideoWriter (mp4v);
  * ``extract_audio_from_video`` — ffmpeg subprocess when the binary
    exists (real LRS3 mp4s keep audio in the container), with a clear
    error otherwise — capability gated, never silently wrong;
  * ``save_results`` — JSON results writer (ref media.py:244-260).
"""

from __future__ import annotations

import json
import logging
import shutil
import subprocess
from pathlib import Path
from typing import Any

import numpy as np

from avsr_tpu.data.audio_io import TARGET_SR, load_audio, write_wav

log = logging.getLogger("avsr.media")

save_audio = write_wav


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def extract_audio_from_video(video_path: str | Path,
                             out_wav: str | Path | None = None,
                             sample_rate: int = TARGET_SR) -> np.ndarray:
    """Extract the audio track of a video to mono f32 @ sample_rate.

    Writes ``out_wav`` (defaults to the video path with .wav) and returns
    the samples. Requires ffmpeg (ref media.py:207-241 behavior); raises
    RuntimeError with a clear message when the binary is absent.
    """
    video_path = Path(video_path)
    out_wav = Path(out_wav) if out_wav else video_path.with_suffix(".wav")
    if not ffmpeg_available():
        raise RuntimeError(
            f"cannot extract audio from {video_path}: ffmpeg not found on "
            "PATH (provide a sibling .wav per the manifest instead)")
    cmd = ["ffmpeg", "-y", "-i", str(video_path), "-vn",
           "-acodec", "pcm_s16le", "-ar", str(sample_rate), "-ac", "1",
           str(out_wav)]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    if proc.returncode != 0 or not out_wav.exists():
        raise RuntimeError(
            f"ffmpeg failed on {video_path}: {proc.stderr[-500:]}")
    return load_audio(out_wav, target_sr=sample_rate)


def save_video(frames: np.ndarray, path: str | Path, fps: float = 25.0) -> None:
    """uint8 [T, H, W, 3] RGB -> mp4 (ref media.py:168-204 equivalent)."""
    import cv2

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    T, H, W, _ = frames.shape
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (W, H))
    try:
        for t in range(T):
            writer.write(cv2.cvtColor(frames[t], cv2.COLOR_RGB2BGR))
    finally:
        writer.release()
    if not path.exists():
        raise IOError(f"failed to write video {path}")


def save_results(results: dict[str, Any] | list[Any],
                 path: str | Path) -> None:
    """JSON results writer (ref media.py:244-260)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as fh:
        json.dump(results, fh, indent=2, default=str)
    log.info("results saved to %s", path)
