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


@pytest.mark.parametrize("causal,gqa", [(False, False), (True, False),
                                        (True, True)])
def test_flash_backward_matches_reference(rng, causal, gqa):
    """Custom-VJP Pallas backward vs jax.grad of the XLA reference."""
    B, H, T, D = 2, 4, 128, 64
    Hkv = 2 if gqa else H
    q, k, v = _rand_qkv(rng, B, H, Hkv, T, T, D)
    q_lens = jnp.array([128, 70])
    kv_lens = jnp.array([128, 70])

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, causal=causal, q_lens=q_lens,
                              kv_lens=kv_lens, interpret=True,
                              block_q=64, block_k=64)
        mask = (jnp.arange(T)[None, :] < q_lens[:, None])[:, None, :, None]
        return jnp.sum(jnp.where(mask, out, 0.0) ** 2)

    def loss_ref(q, k, v):
        out = mha_reference(q, k, v, causal=causal, q_lens=q_lens,
                            kv_lens=kv_lens)
        mask = (jnp.arange(T)[None, :] < q_lens[:, None])[:, None, :, None]
        return jnp.sum(jnp.where(mask, out, 0.0) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, gf, gr in zip("qkv", g_flash, g_ref):
        # padded query-row grads are unconstrained in the ref; mask them
        if name == "q":
            m = (np.arange(T)[None, :] < np.asarray(q_lens)[:, None])
            gf = np.asarray(gf) * m[:, None, :, None]
            gr = np.asarray(gr) * m[:, None, :, None]
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-4, rtol=5e-4, err_msg=name)
