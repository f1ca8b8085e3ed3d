"""ops.videoaug: on-device, time-consistent video augmentation.

Mirrors the SpecAugment test contract (tests/test_specaugment.py): valid
frames move, padding frames stay bit-identical, transforms are
reproducible per key, the identity config is exact, shifts are genuine
crops of a zero-padded frame (shared by every frame of an utterance),
and the train step composes with it while eval stays unaugmented.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.ops.videoaug import video_augment

from test_models_avsr import tiny_batch, tiny_model_cfg  # noqa: F401


def _frames(rng, B=3, T=5, C=3, H=16, W=16):
    return jnp.asarray(rng.standard_normal((B, T, C, H, W)), jnp.float32)


def test_identity_config_is_exact(rng):
    x = _frames(rng)
    y = video_augment(x, None, jax.random.key(0), max_shift=0, flip=False,
                      brightness=0.0, contrast=0.0)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_reproducible_and_shape_dtype(rng):
    x = _frames(rng).astype(jnp.bfloat16)
    a = video_augment(x, None, jax.random.key(3))
    b = video_augment(x, None, jax.random.key(3))
    c = video_augment(x, None, jax.random.key(4))
    assert a.shape == x.shape and a.dtype == x.dtype
    np.testing.assert_array_equal(np.asarray(a).astype(np.float32),
                                  np.asarray(b).astype(np.float32))
    assert not np.array_equal(np.asarray(a).astype(np.float32),
                              np.asarray(c).astype(np.float32))


def test_padding_frames_untouched(rng):
    x = _frames(rng, B=2, T=6)
    lens = jnp.asarray([4, 2], jnp.int32)
    y = video_augment(x, lens, jax.random.key(1))
    xa, ya = np.asarray(x), np.asarray(y)
    np.testing.assert_array_equal(ya[0, 4:], xa[0, 4:])
    np.testing.assert_array_equal(ya[1, 2:], xa[1, 2:])
    # and the valid region did change for at least one sample
    assert not np.array_equal(ya[0, :4], xa[0, :4]) or \
        not np.array_equal(ya[1, :2], xa[1, :2])


def test_shift_is_a_consistent_padded_crop():
    """A single marker pixel moves by the same integer offset in EVERY
    frame of an utterance (temporal consistency), |offset| <= max_shift,
    and vacated borders are zero."""
    B, T, H, W, m = 4, 3, 12, 12, 3
    x = np.zeros((B, T, 1, H, W), np.float32)
    x[:, :, 0, 6, 6] = 1.0                      # marker at (6, 6)
    y = np.asarray(video_augment(
        jnp.asarray(x), None, jax.random.key(7), max_shift=m, flip=False,
        brightness=0.0, contrast=0.0))
    moved = False
    for b in range(B):
        offs = set()
        for t in range(T):
            pos = np.argwhere(y[b, t, 0] == 1.0)
            assert pos.shape == (1, 2), "marker must survive exactly once"
            dy, dx = int(pos[0][0]) - 6, int(pos[0][1]) - 6
            assert abs(dy) <= m and abs(dx) <= m
            offs.add((dy, dx))
        assert len(offs) == 1            # same shift for all frames
        moved |= offs != {(0, 0)}
        assert float(np.abs(y[b]).sum()) == pytest.approx(T)  # pad is zero
    assert moved                         # 4 samples: some shift happened


def test_flip_is_exact_mirror():
    B, T, H, W = 8, 2, 4, 6
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, 1, H, W)), jnp.float32)
    y = np.asarray(video_augment(x, None, jax.random.key(5), max_shift=0,
                                 flip=True, brightness=0.0, contrast=0.0))
    xa = np.asarray(x)
    flipped = same = 0
    for b in range(B):
        if np.array_equal(y[b], xa[b]):
            same += 1
        elif np.array_equal(y[b], xa[b][..., ::-1]):
            flipped += 1
        else:
            raise AssertionError("sample is neither identity nor mirror")
    assert flipped > 0 and same > 0      # p=0.5 over 8 samples


def test_train_step_composes_and_eval_unaugmented(rng):
    """data.video_augment trains (finite, decreasing-ish loss) and the
    EVAL step — which passes no rng — stays augmentation-free."""
    from avsr_tpu.core.config import (
        AVSRConfig,
        DataConfig,
        MeshConfig,
        RuntimeConfig,
        TrainingConfig,
    )
    from avsr_tpu.models.avsr import init_avsr_model
    from avsr_tpu.train.state import create_train_state
    from avsr_tpu.train.step import make_eval_step, make_train_step, microbatch

    model = tiny_model_cfg(modality="video")
    cfg = AVSRConfig(
        data=DataConfig(synthetic=True, video_augment=True, vid_max_shift=2,
                        audio_buckets=(40,), video_buckets=(4, 8)),
        model=model,
        training=TrainingConfig(learning_rate=1e-3, warmup_steps=1),
        mesh=MeshConfig(remat=False, donate=False),
        runtime=RuntimeConfig(compute_dtype="float32"),
    ).validate()
    params = init_avsr_model(jax.random.key(0), cfg.model)
    batch = tiny_batch(rng, "video")
    state, tx = create_train_state(params, cfg, total_steps=4)
    step = make_train_step(cfg, tx)
    losses = []
    for i in range(3):
        state, m = step(state, microbatch(batch, 1), jax.random.key(i))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)

    # eval: no rng -> no augmentation -> two runs identical
    ev = make_eval_step(cfg)
    m1 = ev(state.params, batch)
    m2 = ev(state.params, batch)
    assert float(m1["loss"]) == float(m2["loss"])
