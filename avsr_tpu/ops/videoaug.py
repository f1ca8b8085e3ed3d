"""Video augmentation — on-device, time-consistent, inside the train step.

Beyond the reference (it has no augmentation of any kind); random
crop-shift + horizontal flip are the standard VSR/lip-reading training
augmentations (AV-HuBERT trains with exactly these). TPU-native like
ops.specaugment: every transform is drawn per UTTERANCE (identical
across its frames — temporal consistency is what makes video augmentation
valid), shapes stay static (shift = pad + per-sample dynamic_slice under
vmap, flip = a lane reverse selected by jnp.where), and the whole thing
fuses into the jitted train step. Applied only on the training path
(train.step gates on the dropout rng), never at eval/inference.

Operates on the NORMALIZED frames the featurize path produces
([B, T, 3, H, W], CLIP/ImageNet/Inception stats): flip and shift are
statistics-free; brightness/contrast jitter is defined on the normalized
scale (a fraction of a standard deviation), so one implementation serves
every encoder's input convention. Padding frames (t >= frame_lens) are
returned bit-identical — loader padding invariants hold downstream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def video_augment(
    frames: jax.Array,
    frame_lens: jax.Array | None,
    rng: jax.Array,
    *,
    max_shift: int = 8,
    flip: bool = True,
    brightness: float = 0.1,
    contrast: float = 0.1,
) -> jax.Array:
    """frames [B, T, C, H, W] -> augmented frames, same shape/dtype.

    Per utterance (shared by all its frames): horizontal flip with
    p=0.5 (``flip``), an integer spatial shift with dy, dx ~
    U[-max_shift, max_shift] (zero-padded borders — equivalent to a
    random crop of a ``max_shift``-padded frame), and, on the normalized
    pixel scale, contrast ``* (1 + U[-contrast, contrast])`` then
    brightness ``+ U[-brightness, brightness]``.
    """
    B, T, C, H, W = frames.shape
    dt = frames.dtype
    k_flip, k_shift, k_b, k_c = jax.random.split(rng, 4)

    out = frames
    if flip:
        do_flip = jax.random.bernoulli(k_flip, 0.5, (B,))
        out = jnp.where(do_flip[:, None, None, None, None],
                        out[..., ::-1], out)

    if max_shift > 0:
        m = int(max_shift)
        d = jax.random.randint(k_shift, (B, 2), -m, m + 1)    # [B, (dy,dx)]
        padded = jnp.pad(out, ((0, 0), (0, 0), (0, 0), (m, m), (m, m)))

        def crop_one(img, dyx):
            # shift by (dy, dx): read the padded frame at (m+dy, m+dx)
            return jax.lax.dynamic_slice(
                img, (0, 0, m + dyx[0], m + dyx[1]), (T * C, 1, H, W))

        # fold T*C into one leading dim so the slice is one op per sample
        out = jax.vmap(crop_one)(
            padded.reshape(B, T * C, 1, H + 2 * m, W + 2 * m), d
        ).reshape(B, T, C, H, W)

    if contrast > 0:
        c = jax.random.uniform(k_c, (B,), minval=1.0 - contrast,
                               maxval=1.0 + contrast).astype(dt)
        out = out * c[:, None, None, None, None]
    if brightness > 0:
        b = jax.random.uniform(k_b, (B,), minval=-brightness,
                               maxval=brightness).astype(dt)
        out = out + b[:, None, None, None, None]

    if frame_lens is not None:
        valid = (jnp.arange(T)[None, :]
                 < frame_lens.astype(jnp.int32)[:, None])     # [B, T]
        out = jnp.where(valid[:, :, None, None, None], out, frames)
    return out.astype(dt)
