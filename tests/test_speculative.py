"""Speculative decoding: losslessness, self-draft acceptance, edge cases.

The contract under test is the strong one: for ANY draft params, the output
token stream is identical to plain greedy ``generate_tokens`` — the draft
only changes how many target passes the tokens cost.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.infer.generate import generate_tokens
from avsr_tpu.infer.speculative import make_draft_params, speculative_generate
from avsr_tpu.models.avsr import init_avsr_model

from test_models_avsr import tiny_batch, tiny_model_cfg


def _gen_pair(rng, cfg, params, draft_params, *, gamma=3, max_new=12,
              modality="audio"):
    batch = tiny_batch(rng, modality)
    ref = generate_tokens(params, cfg, batch, max_new_tokens=max_new,
                          temperature=0.0, eos_id=2, use_pallas="never")
    spec = speculative_generate(params, draft_params, cfg, batch,
                                gamma=gamma, max_new_tokens=max_new,
                                eos_id=2, use_pallas="never")
    return ref, spec


def test_spec_identical_draft_matches_greedy(rng):
    """Draft == target: every proposal accepted; output must equal greedy."""
    cfg = tiny_model_cfg(modality="audio")
    params = init_avsr_model(jax.random.key(0), cfg)
    ref, spec = _gen_pair(rng, cfg, params, params)
    np.testing.assert_array_equal(np.asarray(ref.lengths),
                                  np.asarray(spec.lengths))
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(spec.tokens))


def test_spec_random_draft_still_lossless(rng):
    """A draft with completely different random weights proposes garbage —
    the verify pass must still reproduce the greedy stream exactly."""
    cfg = tiny_model_cfg(modality="audio")
    params = init_avsr_model(jax.random.key(0), cfg)
    draft = init_avsr_model(jax.random.key(99), cfg)
    ref, spec = _gen_pair(rng, cfg, params, draft, gamma=4)
    np.testing.assert_array_equal(np.asarray(ref.lengths),
                                  np.asarray(spec.lengths))
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(spec.tokens))


def test_spec_quantized_self_draft(rng):
    """The default production draft: same LLM, int8 weight-only. Lossless
    by construction; acceptance is typically high but unasserted."""
    cfg = tiny_model_cfg(modality="audio")
    params = init_avsr_model(jax.random.key(0), cfg)
    draft = make_draft_params(params, cfg, bits=8)
    ref, spec = _gen_pair(rng, cfg, params, draft, gamma=2)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(spec.tokens))


@pytest.mark.parametrize("gamma", [1, 5])
def test_spec_gamma_extremes(rng, gamma):
    cfg = tiny_model_cfg(modality="audio")
    params = init_avsr_model(jax.random.key(0), cfg)
    ref, spec = _gen_pair(rng, cfg, params, params, gamma=gamma)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(spec.tokens))


def test_spec_max_new_one(rng):
    cfg = tiny_model_cfg(modality="audio")
    params = init_avsr_model(jax.random.key(0), cfg)
    ref, spec = _gen_pair(rng, cfg, params, params, max_new=1)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(spec.tokens))
    assert np.asarray(spec.lengths).max() <= 1


def test_spec_av_modality(rng):
    """Both modalities through the fused prefix path."""
    cfg = tiny_model_cfg()
    params = init_avsr_model(jax.random.key(0), cfg)
    ref, spec = _gen_pair(rng, cfg, params, params, modality="both")
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(spec.tokens))
