"""SpecAugment — on-device time/frequency masking of log-mel features.

Beyond the reference (it has no augmentation of any kind); standard for
ASR/AVSR training (Park et al. 2019). TPU-native: masks are built from
broadcasted iota comparisons with a STATIC number of masks per kind, so
the whole augmentation is a handful of fused elementwise ops inside the
jitted train step — no host RNG, no dynamic shapes, nothing for XLA to
choke on. Masked cells take the per-utterance mean over valid frames
(better behaved than zeroing on normalized log-mels).

Applied only on the training path (train.step gates on the dropout rng),
never at eval/inference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mask_any(rng: jax.Array, n_masks: int, max_width: int, size: int,
              limits: jax.Array) -> jax.Array:
    """[B, size] bool: union of ``n_masks`` random spans per row, each of
    width U[0, max_width] and fully inside [0, limits_b)."""
    B = limits.shape[0]
    kw, ks = jax.random.split(rng)
    w = jax.random.randint(kw, (B, n_masks), 0, max_width + 1)
    w = jnp.minimum(w, limits[:, None])                       # short utts
    # start ~ U[0, limit - w]: uniform float scaled then floored keeps the
    # bound per-row without dynamic shapes
    u = jax.random.uniform(ks, (B, n_masks))
    start = jnp.floor(u * (limits[:, None] - w + 1)).astype(jnp.int32)
    pos = jnp.arange(size)[None, None, :]                     # [1, 1, size]
    span = ((pos >= start[..., None])
            & (pos < (start + w)[..., None]))                 # [B, n, size]
    return jnp.any(span, axis=1)                              # [B, size]


def specaugment(mel: jax.Array, mel_lens: jax.Array | None, rng: jax.Array,
                *, time_masks: int = 2, time_width: int = 50,
                freq_masks: int = 2, freq_width: int = 12) -> jax.Array:
    """mel [B, F, T] (+ valid lengths [B] in frames) -> augmented mel.

    ``time_masks`` spans of up to ``time_width`` frames and ``freq_masks``
    bands of up to ``freq_width`` mel bins are replaced with the
    utterance's mean over its valid frames. Padding frames (>= mel_lens)
    are left untouched — they are masked out downstream anyway, and
    keeping them bit-identical preserves the loader's padding invariants."""
    B, F, T = mel.shape
    lens = (mel_lens.astype(jnp.int32) if mel_lens is not None
            else jnp.full((B,), T, jnp.int32))
    kt, kf = jax.random.split(rng)

    valid_t = jnp.arange(T)[None, :] < lens[:, None]          # [B, T]
    denom = jnp.maximum(lens, 1).astype(mel.dtype) * F
    mean = (jnp.sum(mel * valid_t[:, None, :], axis=(1, 2))
            / denom)[:, None, None]                           # [B, 1, 1]

    tmask = jnp.zeros((B, T), bool)
    if time_masks > 0 and time_width > 0:
        tmask = _mask_any(kt, time_masks, time_width, T, lens)
    fmask = jnp.zeros((B, F), bool)
    if freq_masks > 0 and freq_width > 0:
        fmask = _mask_any(kf, freq_masks, freq_width, F,
                          jnp.full((B,), F, jnp.int32))
    hit = (tmask[:, None, :] | fmask[:, :, None]) & valid_t[:, None, :]
    return jnp.where(hit, mean.astype(mel.dtype), mel)
