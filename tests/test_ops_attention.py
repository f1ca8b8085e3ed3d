"""Flash-attention kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.ops.attention import flash_attention, mha_reference


def _rand_qkv(rng, B, H, Hkv, Tq, Tk, D, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((B, H, Tq, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, Hkv, Tk, D)), dtype)
    v = jnp.asarray(rng.standard_normal((B, Hkv, Tk, D)), dtype)
    return q, k, v


def test_reference_softmax_rows_sum(rng):
    q, k, v = _rand_qkv(rng, 2, 4, 4, 16, 16, 8)
    out = mha_reference(q, k, v)
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_reference(rng, causal):
    q, k, v = _rand_qkv(rng, 2, 2, 2, 128, 128, 64)
    ref = mha_reference(q, k, v, causal=causal)
    out = flash_attention(q, k, v, causal=causal, interpret=True, block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_gqa_matches_reference(rng):
    q, k, v = _rand_qkv(rng, 2, 4, 2, 128, 128, 64)
    ref = mha_reference(q, k, v, causal=True)
    out = flash_attention(q, k, v, causal=True, interpret=True, block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_padding_lengths(rng):
    B, H, T, D = 2, 2, 128, 64
    q, k, v = _rand_qkv(rng, B, H, H, T, T, D)
    kv_lens = jnp.array([128, 50])
    q_lens = jnp.array([128, 50])
    ref = mha_reference(q, k, v, causal=True, q_lens=q_lens, kv_lens=kv_lens)
    out = flash_attention(q, k, v, causal=True, q_lens=q_lens,
                          kv_lens=kv_lens, interpret=True, block_q=64,
                          block_k=64)
    # Only compare valid query rows; padded rows are unconstrained.
    np.testing.assert_allclose(np.asarray(out)[1, :, :50],
                               np.asarray(ref)[1, :, :50],
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(ref)[0],
                               atol=2e-5, rtol=2e-5)


def test_flash_nontiling_falls_back(rng):
    q, k, v = _rand_qkv(rng, 1, 2, 2, 100, 100, 64)
    ref = mha_reference(q, k, v, causal=True)
    out = flash_attention(q, k, v, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
