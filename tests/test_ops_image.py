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
