"""Native C++ data helpers vs the Python reference implementations."""

import numpy as np
import pytest

from avsr_tpu.data.audio_io import load_audio, write_wav
from avsr_tpu import native


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native library unavailable (no g++?)")
    return native.load()


def _tone(sr, secs=1.0, f0=220.0):
    t = np.arange(int(sr * secs), dtype=np.float32) / sr
    return (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)


def test_native_decode_matches_python(lib, tmp_path):
    x = _tone(16000)
    write_wav(tmp_path / "a.wav", x, 16000)
    got = native.decode_wav(tmp_path / "a.wav", 16000)
    ref = load_audio(tmp_path / "a.wav", 16000)
    assert got is not None
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_native_resample_close_to_scipy(lib, tmp_path):
    x = _tone(8000, f0=150.0)
    write_wav(tmp_path / "b.wav", x, 8000)
    got = native.decode_wav(tmp_path / "b.wav", 16000)
    ref = load_audio(tmp_path / "b.wav", 16000)   # scipy polyphase
    assert got is not None
    n = min(len(got), len(ref))
    # ignore filter edge transients
    core = slice(200, n - 200)
    err = np.abs(got[:n][core] - ref[:n][core]).max()
    assert err < 5e-3, err


def test_native_batch_decode(lib, tmp_path):
    paths = []
    for i, sr in enumerate((16000, 8000, 16000)):
        p = tmp_path / f"u{i}.wav"
        write_wav(p, _tone(sr, 0.5, 100 + 60 * i), sr)
        paths.append(p)
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"garbage")
    paths.append(bad)

    out, lens = native.decode_wav_batch(paths, 16000, max_samples=16000)
    assert out.shape == (4, 16000)
    assert lens[0] == 8000          # 0.5 s @ 16 kHz
    assert abs(int(lens[1]) - 8000) <= 4   # resampled 0.5 s
    assert lens[3] == 0             # failed row
    assert not out[3].any()
    # padding is zeroed
    assert not out[0, int(lens[0]):].any()
