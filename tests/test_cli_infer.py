"""Single-utterance inference CLI (the reference README's promised-but-
missing scripts/inference.py — README.md:145): media file -> transcript
through the same jitted paths as decode."""

import numpy as np
import pytest

from avsr_tpu.cli import infer as cli_infer
from avsr_tpu.data.audio_io import write_wav


@pytest.mark.slow   # 9.5s measured r05 — fast-tier budget policy
def test_infer_audio_only(tmp_path, capsys, rng):
    wav = tmp_path / "u.wav"
    x = (0.3 * np.sin(np.linspace(0, 400, 16000))).astype(np.float32)
    write_wav(wav, x)
    rc = cli_infer.main([
        "--config", "avsr_tpu/configs/tiny_cpu.yaml",
        "--audio", str(wav),
        "decode.max_new_tokens=6",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.endswith("\n")   # printed a (possibly empty) transcript


def test_infer_av(tmp_path, capsys, rng):
    wav = tmp_path / "u.wav"
    write_wav(wav, (0.2 * np.sin(np.linspace(0, 300, 12000))).astype(np.float32))
    vid = tmp_path / "u.npy"
    np.save(vid, rng.integers(0, 256, (6, 24, 24, 3)).astype(np.uint8))
    rc = cli_infer.main([
        "--config", "avsr_tpu/configs/tiny_cpu.yaml",
        "--audio", str(wav), "--video", str(vid),
        "model.modality=both",
        "decode.max_new_tokens=4",
    ])
    assert rc == 0
