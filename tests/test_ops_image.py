"""On-device frame preprocessing ops (ops.image).

Two supported placements for CLIP preprocessing (replacing the reference's
per-frame Python CLIPProcessor loop, simple_dataset.py:213-249):

  * host resize (native/cv2, data.dataset.resize_crop_frames) + on-device
    ``normalize_frames`` — the default pipeline (uint8 transfers);
  * fully on-device ``preprocess_frames`` — resize + crop + normalize in
    one jitted op, for fixed-resolution sources where the host should not
    spend cycles on video at all.

Both must produce the same tensors.
"""

import numpy as np
import pytest

from avsr_tpu.data.dataset import resize_crop_frames
from avsr_tpu.ops.image import (
    CLIP_MEAN,
    CLIP_STD,
    normalize_frames,
    preprocess_frames,
    sample_frame_indices,
)


def test_normalize_frames_matches_formula(rng):
    frames = rng.integers(0, 256, (2, 3, 8, 8, 3)).astype(np.uint8)
    out = np.asarray(normalize_frames(frames))
    expect = ((frames.astype(np.float32) / 255.0 - CLIP_MEAN)
              / CLIP_STD).transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(out, expect, atol=1e-6)
    assert out.shape == (2, 3, 3, 8, 8)


def test_device_preprocess_matches_host_path(rng):
    """preprocess_frames == host resize_crop_frames + normalize_frames
    within resize-interpolation tolerance."""
    T, H, W, S = 4, 37, 53, 16
    frames = rng.integers(0, 256, (T, H, W, 3)).astype(np.uint8)

    on_device = np.asarray(preprocess_frames(frames, image_size=S))

    host = resize_crop_frames(frames, S)               # u8 [T,S,S,3]
    host_norm = np.asarray(normalize_frames(host[None]))[0]  # [T,3,S,S]

    assert on_device.shape == host_norm.shape == (T, 3, S, S)
    # same sampling semantics, different arithmetic (fixed-point vs f32)
    diff = np.abs(on_device - host_norm)
    assert diff.max() < 0.05, float(diff.max())


def test_sample_frame_indices():
    idx = sample_frame_indices(10, 4)
    assert len(idx) == 4 and idx[0] == 0 and idx[-1] == 9
    idx2 = sample_frame_indices(3, 8)
    np.testing.assert_array_equal(idx2, [0, 1, 2])


def test_yuv420_roundtrip_grayscale_exact(rng):
    """Grayscale frames survive the YUV420 link format exactly (U=V=128,
    Y==the gray level up to integer rounding), so lip-ROI-style content
    pays ~zero fidelity cost for the 2x bytes saved."""
    from avsr_tpu.ops.image import normalize_yuv420_frames, rgb_to_yuv420_np

    gray = rng.integers(0, 256, (1, 2, 8, 8, 1)).astype(np.uint8)
    frames = np.repeat(gray, 3, axis=-1)
    y, uv = rgb_to_yuv420_np(frames)
    np.testing.assert_array_equal(y, gray[..., 0])
    assert np.abs(uv.astype(int) - 128).max() <= 1
    out = np.asarray(normalize_yuv420_frames(y, uv))
    expect = np.asarray(normalize_frames(frames))
    assert np.abs(out - expect).max() < 2.0 / 255.0 / min(CLIP_STD) + 1e-6


def test_yuv420_roundtrip_color_bounded(rng):
    """Random RGB content: the only loss is the 2x2 chroma box average —
    reconstruction error stays within the chroma-subsampling bound and the
    luma channel's contribution is rounding-only."""
    from avsr_tpu.ops.image import normalize_yuv420_frames, rgb_to_yuv420_np

    # smooth-ish content (real video is low-pass; pure noise overstates
    # chroma-subsampling error): upsample a coarse random grid
    coarse = rng.integers(0, 256, (2, 3, 4, 4, 3)).astype(np.uint8)
    frames = np.repeat(np.repeat(coarse, 4, axis=2), 4, axis=3)
    y, uv = rgb_to_yuv420_np(frames)
    assert y.shape == (2, 3, 16, 16) and uv.shape == (2, 3, 8, 8, 2)
    out = np.asarray(normalize_yuv420_frames(y, uv))
    expect = np.asarray(normalize_frames(frames))
    # constant 4x4 blocks -> chroma average is exact within each 2x2; the
    # remaining error is fixed-point rounding through Y'UV and back
    assert np.abs(out - expect).max() < 4.0 / 255.0 / min(CLIP_STD)


def test_yuv420_native_matches_numpy(rng):
    from avsr_tpu import native
    from avsr_tpu.ops.image import rgb_to_yuv420_np

    if not native.available():
        pytest.skip("native library unavailable")
    frames = rng.integers(0, 256, (3, 16, 16, 3)).astype(np.uint8)
    got = native.rgb_to_yuv420(frames)
    assert got is not None
    y_ref, uv_ref = rgb_to_yuv420_np(frames)
    assert np.abs(got[0].astype(int) - y_ref.astype(int)).max() <= 1
    assert np.abs(got[1].astype(int) - uv_ref.astype(int)).max() <= 1
