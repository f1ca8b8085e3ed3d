"""Log-mel front-end parity vs HF WhisperFeatureExtractor (offline numpy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.ops.logmel import (
    HOP_LENGTH,
    N_FFT,
    frame_signal,
    log_mel_spectrogram,
    mel_filterbank,
)


def test_mel_filterbank_matches_hf():
    from transformers.audio_utils import mel_filter_bank

    hf = mel_filter_bank(
        num_frequency_bins=N_FFT // 2 + 1,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    ).T  # HF returns [n_freq, n_mels]
    ours = mel_filterbank(80, N_FFT)
    np.testing.assert_allclose(ours, hf, atol=1e-6)


def test_frame_count():
    audio = jnp.zeros((1, 480_000))
    frames = frame_signal(audio)
    assert frames.shape == (1, 3000, N_FFT)


@pytest.mark.parametrize("n_samples", [16_000, 480_000])
def test_logmel_matches_whisper_feature_extractor(n_samples, rng):
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=80)
    audio = rng.standard_normal(n_samples).astype(np.float32) * 0.1
    # HF pads/truncates to 30 s; match by padding ourselves.
    padded = np.zeros(480_000, dtype=np.float32)
    padded[:n_samples] = audio
    ref = fe(audio, sampling_rate=16_000, return_tensors="np",
             padding="max_length").input_features[0]  # [80, 3000]

    ours = np.asarray(log_mel_spectrogram(jnp.asarray(padded)[None])[0])
    assert ours.shape == ref.shape == (80, 3000)
    # f32 DFT-matmul vs HF's f64 FFT: the formulation is exact (verified at
    # 8.6e-7 in f64); tolerance covers single-precision accumulation only.
    np.testing.assert_allclose(ours, ref, atol=3e-3)
    assert np.abs(ours - ref).mean() < 1e-4


def test_logmel_length_mask_matches_per_sample():
    """Batched computation with lengths == per-sample host computation."""
    rng = np.random.default_rng(1)
    a = rng.standard_normal(480_000).astype(np.float32) * 0.1
    b = np.zeros(480_000, dtype=np.float32)
    b[:160_000] = rng.standard_normal(160_000).astype(np.float32) * 5.0

    batch = jnp.stack([jnp.asarray(a), jnp.asarray(b)])
    lens = jnp.array([480_000, 160_000])
    out = np.asarray(log_mel_spectrogram(batch, audio_lengths=lens))

    solo_a = np.asarray(log_mel_spectrogram(jnp.asarray(a)[None])[0])
    np.testing.assert_allclose(out[0], solo_a, atol=1e-5)
    # Sample b's clamp peak must come from its valid region only.
    solo_b = np.asarray(
        log_mel_spectrogram(jnp.asarray(b)[None],
                            audio_lengths=jnp.array([160_000]))[0])
    valid = 160_000 // HOP_LENGTH
    np.testing.assert_allclose(out[1][:, :valid], solo_b[:, :valid], atol=1e-5)
