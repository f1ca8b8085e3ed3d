"""CLIP-style video-frame preprocessing as a batched on-device op.

The reference preprocesses video one frame at a time through a Python loop
calling HF CLIPProcessor (simple_dataset.py:213-249) — its data-side hot loop
(SURVEY.md §3.1). Here the whole clip is preprocessed in one vectorized XLA
call: resize shortest-side-to-S (bilinear), center crop S×S, rescale to [0,1],
normalize with the CLIP mean/std. Runs on TPU and fuses into the encoder step.

Input frames are uint8 [T, H, W, 3] (decode order RGB); output is
[T, 3, S, S] in the requested dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)
# ImageNet statistics (HF image processors for microsoft/resnet-*).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

# Inception-style 0.5/0.5 (HF EfficientNetImageProcessor defaults).
INCEPTION_MEAN = np.array([0.5, 0.5, 0.5], dtype=np.float32)
INCEPTION_STD = np.array([0.5, 0.5, 0.5], dtype=np.float32)

# AV-HuBERT lip-ROI statistics (grayscale 0.421/0.165, broadcast to RGB —
# the model averages channels to grayscale, which commutes with this).
AVHUBERT_MEAN = np.array([0.421, 0.421, 0.421], dtype=np.float32)
AVHUBERT_STD = np.array([0.165, 0.165, 0.165], dtype=np.float32)

_STATS = {"clip": (CLIP_MEAN, CLIP_STD),
          "imagenet": (IMAGENET_MEAN, IMAGENET_STD),
          "inception": (INCEPTION_MEAN, INCEPTION_STD),
          "avhubert": (AVHUBERT_MEAN, AVHUBERT_STD)}


@functools.partial(jax.jit, static_argnames=("image_size", "dtype", "stats"))
def preprocess_frames(
    frames: jax.Array,
    image_size: int = 224,
    dtype: jnp.dtype = jnp.float32,
    stats: str = "clip",
) -> jax.Array:
    """uint8 [T,H,W,3] (or [B,T,H,W,3]) -> [T,3,S,S] (or [B,T,3,S,S]).

    Resize-shortest-side + center-crop is computed with static shapes (H, W
    are trace-time constants), so the op stays jittable.
    """
    batched = frames.ndim == 5
    if not batched:
        frames = frames[None]
    B, T, H, W, C = frames.shape
    S = image_size

    x = frames.astype(jnp.float32) / 255.0
    # Resize shortest side to S, preserving aspect ratio (static arithmetic).
    if H <= W:
        new_h, new_w = S, max(S, int(round(W * S / H)))
    else:
        new_h, new_w = max(S, int(round(H * S / W))), S
    # antialias=False matches the host tier's cv2-INTER_LINEAR semantics
    # (data/dataset.resize_crop_frames), so either placement yields the
    # same tensors.
    x = jax.image.resize(x, (B, T, new_h, new_w, C), method="bilinear",
                         antialias=False)
    top = (new_h - S) // 2
    left = (new_w - S) // 2
    x = jax.lax.slice(x, (0, 0, top, left, 0), (B, T, top + S, left + S, C))
    mean, std = _STATS[stats]
    x = (x - mean) / std
    x = jnp.transpose(x, (0, 1, 4, 2, 3))  # -> [B,T,3,S,S]
    x = x.astype(dtype)
    return x if batched else x[0]


@functools.partial(jax.jit, static_argnames=("dtype", "stats"))
def normalize_frames(frames: jax.Array,
                     dtype: jnp.dtype = jnp.float32,
                     stats: str = "clip") -> jax.Array:
    """uint8 [B,T,S,S,3] (host-resized/cropped) -> normalized [B,T,3,S,S].

    The host ships uint8 (4x smaller transfers); rescale + mean/std
    normalization (CLIP or ImageNet stats, by encoder) + CHW transpose
    happen on-device and fuse into the encoder's first matmul.
    """
    mean, std = _STATS[stats]
    x = frames.astype(jnp.float32) / 255.0
    x = (x - mean) / std
    return jnp.transpose(x, (0, 1, 4, 2, 3)).astype(dtype)


def rgb_to_yuv420_np(frames: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pure-numpy planar YUV420 packing (fallback for native.rgb_to_yuv420).

    u8 [..., S, S, 3] RGB -> (Y u8 [..., S, S], UV u8 [..., S/2, S/2, 2]).
    Full-range BT.601 ("JPEG") matrix; chroma is the 2x2 box average — the
    subsampling consumer video codecs already store, so for codec-sourced
    frames the packing is lossless w.r.t. the decoded stream."""
    f = frames.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    S = frames.shape[-2]
    lead = frames.shape[:-3]
    uv = np.stack([u, v], axis=-1)
    uv = uv.reshape(*lead, S // 2, 2, S // 2, 2, 2).mean(axis=(-4, -2))
    to_u8 = lambda x: np.clip(np.rint(x), 0, 255).astype(np.uint8)  # noqa: E731
    return to_u8(y), to_u8(uv)


@functools.partial(jax.jit, static_argnames=("dtype", "stats"))
def normalize_yuv420_frames(y: jax.Array, uv: jax.Array,
                            dtype: jnp.dtype = jnp.float32,
                            stats: str = "clip") -> jax.Array:
    """Planar YUV420 link format -> normalized [B,T,3,S,S] on device.

    Inverse of rgb_to_yuv420 (nearest-neighbor chroma upsample + BT.601
    full-range matrix), fused with the [0,1] rescale + mean/std
    normalization + CHW transpose — all elementwise, so XLA folds the whole
    reconstruction into the encoder's first matmul the same way
    normalize_frames does."""
    yf = y.astype(jnp.float32)
    uvf = uv.astype(jnp.float32) - 128.0
    uvf = jnp.repeat(jnp.repeat(uvf, 2, axis=-3), 2, axis=-2)
    u, v = uvf[..., 0], uvf[..., 1]
    r = yf + 1.402 * v
    g = yf - 0.344136 * u - 0.714136 * v
    b = yf + 1.772 * u
    x = jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0) / 255.0
    mean, std = _STATS[stats]
    x = (x - mean) / std
    return jnp.transpose(x, (0, 1, 4, 2, 3)).astype(dtype)


def sample_frame_indices(num_frames: int, target: int) -> np.ndarray:
    """Uniformly sample/clamp ``target`` frame indices from a clip."""
    if num_frames <= target:
        return np.arange(num_frames)
    return np.linspace(0, num_frames - 1, target).round().astype(np.int64)
