"""SpecAugment (ops.specaugment): on-device time/freq masking, train-only.

Contract: masks stay inside the valid region and replace cells with the
per-utterance valid-frame mean; padding frames are bit-untouched; the
same rng reproduces the same masks; zero-mask configs are the identity;
and a train step with data.specaugment=true still learns (loss decreases)
while the eval path stays unaugmented (deterministic without rng).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.ops.specaugment import specaugment

from test_models_avsr import tiny_batch
from test_train import tiny_avsr_cfg


def _mel(rng, B=3, F=16, T=40):
    return jnp.asarray(rng.standard_normal((B, F, T)), jnp.float32) + 2.0


def test_masks_inside_valid_region(rng):
    mel = _mel(rng)
    lens = jnp.array([40, 25, 8], jnp.int32)
    out = specaugment(mel, lens, jax.random.key(0),
                      time_masks=2, time_width=10,
                      freq_masks=2, freq_width=4)
    a, b = np.asarray(mel), np.asarray(out)
    assert a.shape == b.shape
    # padding frames bit-untouched
    np.testing.assert_array_equal(a[1, :, 25:], b[1, :, 25:])
    np.testing.assert_array_equal(a[2, :, 8:], b[2, :, 8:])
    # something was masked, and masked cells equal the valid-frame mean
    changed = a != b
    assert changed.any()
    for i, n in enumerate([40, 25, 8]):
        mean = a[i, :, :n].mean()
        assert np.allclose(b[i][changed[i]], mean, atol=1e-5)


def test_reproducible_and_identity(rng):
    mel = _mel(rng)
    lens = jnp.array([40, 40, 40], jnp.int32)
    k = jax.random.key(7)
    o1 = specaugment(mel, lens, k, time_masks=2, time_width=10,
                     freq_masks=1, freq_width=4)
    o2 = specaugment(mel, lens, k, time_masks=2, time_width=10,
                     freq_masks=1, freq_width=4)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    ident = specaugment(mel, lens, k, time_masks=0, time_width=0,
                        freq_masks=0, freq_width=0)
    np.testing.assert_array_equal(np.asarray(ident), np.asarray(mel))


def test_train_step_with_specaugment_learns(rng):
    from avsr_tpu.models.avsr import init_avsr_model
    from avsr_tpu.train.state import create_train_state
    from avsr_tpu.train.step import make_eval_step, make_train_step, microbatch

    cfg = tiny_avsr_cfg()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(
            cfg.data, specaugment=True, spec_time_masks=1,
            spec_time_width=8, spec_freq_masks=1,
            spec_freq_width=3)).validate()
    params = init_avsr_model(jax.random.key(0), cfg.model)
    batch = tiny_batch(rng, "audio", B=2)

    state, tx = create_train_state(params, cfg, total_steps=20)
    step = make_train_step(cfg, tx)
    losses = []
    for i in range(6):
        state, m = step(state, microbatch(batch, 1), jax.random.key(i))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    # eval path is unaugmented: no rng => deterministic twice
    ev = make_eval_step(cfg)
    m1 = ev(state.params, batch)
    m2 = ev(state.params, batch)
    assert float(m1["loss"]) == float(m2["loss"])
