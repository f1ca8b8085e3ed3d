"""Whisper log-mel spectrogram as an on-device TPU op.

The reference computes log-mels on the host inside Dataset.__getitem__ via
HF WhisperProcessor (simple_dataset.py:158-183) — a per-sample CPU bottleneck.
Here the whole front-end runs on the TPU as three chained matmuls that map
straight onto the MXU:

    frames [T, n_fft] @ (hann ⊙ DFT_cos) [n_fft, n_freq]   -> real part
    frames [T, n_fft] @ (hann ⊙ DFT_sin) [n_fft, n_freq]   -> imag part
    (real² + imag²)   [T, n_freq] @ mel_fb.T [n_freq, n_mels] -> mel power

followed by Whisper's log compression (log10, clamp to per-utterance max-8,
(x+4)/4 — matching openai/whisper audio.py semantics). No FFT is needed:
at n_fft=400 the dense DFT-as-matmul costs ~0.5 GFLOP per 30 s utterance,
noise on an MXU, and fuses with the mel projection.

XLA fuses the window/DFT/mel chain into MXU matmuls on its own, so no
hand-written Pallas kernel is needed here; this module is both the
production path and the numerics reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Whisper front-end constants (openai/whisper: 16 kHz, 25 ms window, 10 ms hop)
SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
N_MELS = 80


def hz_to_mel(hz: np.ndarray | float) -> np.ndarray:
    """Slaney-scale mel (librosa default): linear below 1 kHz, log above."""
    hz = np.asarray(hz, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (hz - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(hz >= min_log_hz,
                    min_log_mel + np.log(np.maximum(hz, 1e-10) / min_log_hz) / logstep,
                    mel)


def mel_to_hz(mel: np.ndarray) -> np.ndarray:
    mel = np.asarray(mel, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    hz = f_min + f_sp * mel
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(mel >= min_log_mel,
                    min_log_hz * np.exp(logstep * (mel - min_log_mel)),
                    hz)


@functools.lru_cache(maxsize=4)
def mel_filterbank(
    n_mels: int = N_MELS,
    n_fft: int = N_FFT,
    sample_rate: int = SAMPLE_RATE,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank [n_mels, n_fft//2+1].

    Matches librosa.filters.mel defaults, which is what Whisper ships in its
    mel_filters asset.
    """
    n_freq = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2, n_freq)
    mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(sample_rate / 2), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney normalization: equal area per filter
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm[:, None]
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=4)
def dft_basis(n_fft: int = N_FFT) -> tuple[np.ndarray, np.ndarray]:
    """Hann-windowed real-DFT basis matrices [n_fft, n_fft//2+1]."""
    n_freq = n_fft // 2 + 1
    window = np.hanning(n_fft + 1)[:-1]  # periodic hann, matches torch.hann_window
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_freq)[None, :]
    ang = -2.0 * np.pi * t * k / n_fft
    wc = (window[:, None] * np.cos(ang)).astype(np.float32)
    ws = (window[:, None] * np.sin(ang)).astype(np.float32)
    return wc, ws


def frame_signal(audio: jax.Array, n_fft: int = N_FFT, hop: int = HOP_LENGTH) -> jax.Array:
    """[B, n_samples] -> centered overlapping frames [B, T, n_fft].

    Reflect-pads n_fft//2 on both sides (torch.stft center=True) and drops the
    final frame like Whisper (`stft[..., :-1]`), so n_samples=480000 -> T=3000.
    """
    pad = n_fft // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = audio.shape[-1] // hop  # with the dropped last frame
    # Gather overlapping frames. XLA lowers this to an efficient dynamic-slice
    # gather; the subsequent matmul dominates.
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return x[:, idx]


@functools.partial(jax.jit, static_argnames=("n_mels", "n_fft", "hop"))
def log_mel_spectrogram(
    audio: jax.Array,
    audio_lengths: jax.Array | None = None,
    n_mels: int = N_MELS,
    n_fft: int = N_FFT,
    hop: int = HOP_LENGTH,
) -> jax.Array:
    """Batched Whisper log-mel: [B, n_samples] f32 -> [B, n_mels, T] f32.

    ``audio_lengths`` (in samples) restricts the per-utterance max used in the
    dynamic-range clamp to valid frames, so zero-padded batches match
    per-sample host computation.
    """
    if audio.ndim == 1:
        audio = audio[None]
    audio = audio.astype(jnp.float32)
    frames = frame_signal(audio, n_fft, hop)  # [B, T, n_fft]
    wc, ws = dft_basis(n_fft)
    # HIGHEST precision: on TPU the default matmul precision is bf16; the
    # log compression amplifies small relative power errors, so keep the
    # front end in true f32 (6-pass on MXU — still trivial FLOPs).
    hi = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, wc, precision=hi)
    im = jnp.matmul(frames, ws, precision=hi)
    power = re * re + im * im                 # [B, T, n_freq]
    mel = jnp.matmul(power, mel_filterbank(n_mels, n_fft).T, precision=hi)

    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    if audio_lengths is not None:
        n_frames = frames.shape[1]
        valid = jnp.arange(n_frames)[None, :] < (audio_lengths[:, None] // hop)
        masked = jnp.where(valid[..., None], log_spec, -jnp.inf)
        peak = jnp.max(masked, axis=(1, 2), keepdims=True)
    else:
        peak = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, peak - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.swapaxes(log_spec, 1, 2)       # [B, n_mels, T]


def num_mel_frames(n_samples: int, hop: int = HOP_LENGTH) -> int:
    return n_samples // hop
