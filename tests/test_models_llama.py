"""Llama decoder parity vs HF torch + KV-cache decode consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.core.config import LLMConfig, LoRAConfig
from avsr_tpu.models import llama as L

CFG = LLMConfig(vocab_size=128, d_model=64, n_layers=2, n_heads=4,
                n_kv_heads=2, ffn_dim=128, rope_theta=10000.0,
                tie_embeddings=False, max_seq_len=64)


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.d_model,
        num_hidden_layers=CFG.n_layers, num_attention_heads=CFG.n_heads,
        num_key_value_heads=CFG.n_kv_heads, intermediate_size=CFG.ffn_dim,
        rope_theta=CFG.rope_theta, rms_norm_eps=CFG.rms_eps,
        tie_word_embeddings=False, attention_bias=False, mlp_bias=False,
    )
    model = LlamaForCausalLM(hf_cfg).eval()
    params = L.convert_hf_llama(model.state_dict(), CFG)
    return model, params


def test_logits_parity(hf_pair, rng):
    import torch

    model, params = hf_pair
    B, T = 2, 10
    tokens = rng.integers(0, CFG.vocab_size, (B, T))
    with torch.no_grad():
        ref = model(torch.from_numpy(tokens)).logits.numpy()
    embeds = L.embed_tokens(params, jnp.asarray(tokens))
    logits, _ = L.llama_apply(params, CFG, inputs_embeds=embeds,
                              use_pallas="never")
    np.testing.assert_allclose(np.asarray(logits), ref, atol=3e-4, rtol=3e-3)


@pytest.mark.slow   # 7.6s measured r05 — fast-tier budget policy
def test_padded_lengths_match(hf_pair, rng):
    _, params = hf_pair
    tokens = rng.integers(0, CFG.vocab_size, (1, 6))
    padded = np.concatenate([tokens, np.zeros((1, 4), np.int64)], axis=1)
    lo, _ = L.llama_apply(params, CFG,
                          inputs_embeds=L.embed_tokens(params, jnp.asarray(tokens)),
                          use_pallas="never")
    lp, _ = L.llama_apply(params, CFG,
                          inputs_embeds=L.embed_tokens(params, jnp.asarray(padded)),
                          lengths=jnp.array([6]), use_pallas="never")
    np.testing.assert_allclose(np.asarray(lp)[:, :6], np.asarray(lo),
                               atol=1e-4, rtol=1e-3)


@pytest.mark.slow   # 11.6s measured r05 — fast-tier budget policy
def test_decode_step_matches_full_forward(hf_pair, rng):
    """Greedy KV-cache decode must reproduce teacher-forced logits."""
    _, params = hf_pair
    B, T = 2, 8
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, T)))
    embeds = L.embed_tokens(params, tokens)
    full_logits, cache = L.llama_apply(
        params, CFG, inputs_embeds=embeds, return_cache=True, cache_len=16,
        use_pallas="never")

    # Decode position T given cache of [0, T): compare to running full forward
    # on T+1 tokens.
    nxt = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, 1)))
    step_logits, _ = L.llama_decode_step(
        params, CFG, x=L.embed_tokens(params, nxt), cache=cache,
        cur_lens=jnp.full((B,), T))
    ext = jnp.concatenate([tokens, nxt], axis=1)
    ref_logits, _ = L.llama_apply(params, CFG,
                                  inputs_embeds=L.embed_tokens(params, ext),
                                  use_pallas="never")
    np.testing.assert_allclose(np.asarray(step_logits),
                               np.asarray(ref_logits)[:, -1], atol=3e-4,
                               rtol=3e-3)


def test_lora_zero_init_is_identity(hf_pair, rng):
    _, params = hf_pair
    lora = LoRAConfig(use_lora=True, r=4, alpha=8)
    with_lora = L.add_lora(jax.random.key(1), params, CFG, lora)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 5)))
    base, _ = L.llama_apply(params, CFG,
                            inputs_embeds=L.embed_tokens(params, tokens),
                            use_pallas="never")
    adapted, _ = L.llama_apply(with_lora, CFG,
                               inputs_embeds=L.embed_tokens(with_lora, tokens),
                               lora=lora, use_pallas="never")
    np.testing.assert_allclose(np.asarray(adapted), np.asarray(base),
                               atol=1e-6)
    # ... and merge_lora with zero B is also identity
    merged = L.merge_lora(with_lora, lora)
    m, _ = L.llama_apply(merged, CFG,
                         inputs_embeds=L.embed_tokens(merged, tokens),
                         use_pallas="never")
    np.testing.assert_allclose(np.asarray(m), np.asarray(base), atol=1e-6)


def test_lora_nonzero_changes_output(hf_pair, rng):
    _, params = hf_pair
    lora = LoRAConfig(use_lora=True, r=4, alpha=8)
    with_lora = L.add_lora(jax.random.key(1), params, CFG, lora)
    # Perturb one B matrix
    with_lora["layers"][0]["q"]["lora"]["b"] = (
        with_lora["layers"][0]["q"]["lora"]["b"] + 0.1)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 5)))
    base, _ = L.llama_apply(params, CFG,
                            inputs_embeds=L.embed_tokens(params, tokens),
                            use_pallas="never")
    adapted, _ = L.llama_apply(with_lora, CFG,
                               inputs_embeds=L.embed_tokens(with_lora, tokens),
                               lora=lora, use_pallas="never")
    assert not np.allclose(np.asarray(adapted), np.asarray(base), atol=1e-5)
    # merged must equal adapter-path output
    merged = L.merge_lora(with_lora, lora)
    m, _ = L.llama_apply(merged, CFG,
                         inputs_embeds=L.embed_tokens(merged, tokens),
                         use_pallas="never")
    np.testing.assert_allclose(np.asarray(m), np.asarray(adapted), atol=1e-5,
                               rtol=1e-4)


@pytest.mark.slow   # 17.0s measured r05 — fast-tier budget policy
def test_prefill_continue_matches_full_prefill(hf_pair, rng):
    """Chunked prefill (llama_prefill_continue) over [part1][part2] must
    reproduce the full-sequence prefill exactly: same final hidden states,
    same cache columns — the serving primitive behind streaming KV reuse."""
    _, params = hf_pair
    B, T1, T2 = 2, 6, 5
    M = 32
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, T1 + T2)))
    embeds = L.embed_tokens(params, tokens)

    # oracle: one uniform prefill over the whole sequence
    hid_full, cache_full = L.llama_apply(
        params, CFG, inputs_embeds=embeds, return_cache=True, cache_len=M,
        output="hidden", use_pallas="never")

    # chunked: part1 via llama_apply, part2 via prefill_continue
    _, cache1 = L.llama_apply(
        params, CFG, inputs_embeds=embeds[:, :T1], return_cache=True,
        cache_len=M, output="hidden", use_pallas="never")
    hid2, cache2 = L.llama_prefill_continue(
        params, CFG, x=embeds[:, T1:], cache=cache1,
        base_lens=jnp.full((B,), T1, jnp.int32),
        tail_lens=jnp.full((B,), T2, jnp.int32))

    np.testing.assert_allclose(np.asarray(hid2),
                               np.asarray(hid_full)[:, T1:],
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cache2.k)[..., :T1 + T2],
                               np.asarray(cache_full.k)[..., :T1 + T2],
                               atol=2e-5, rtol=1e-4)

    # ragged tails: sample 1 extends by only 3 of the 5 rows
    tl = jnp.array([T2, 3], jnp.int32)
    hid_r, cache_r = L.llama_prefill_continue(
        params, CFG, x=embeds[:, T1:], cache=cache1,
        base_lens=jnp.full((B,), T1, jnp.int32), tail_lens=tl)
    np.testing.assert_allclose(np.asarray(hid_r)[1, :3],
                               np.asarray(hid_full)[1, T1:T1 + 3],
                               atol=2e-5, rtol=1e-4)

    # decode continues seamlessly from the continued cache
    nxt = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, 1)))
    step_c, _ = L.llama_decode_step(
        params, CFG, x=L.embed_tokens(params, nxt), cache=cache2,
        cur_lens=jnp.full((B,), T1 + T2))
    step_f, _ = L.llama_decode_step(
        params, CFG, x=L.embed_tokens(params, nxt), cache=cache_full,
        cur_lens=jnp.full((B,), T1 + T2))
    np.testing.assert_allclose(np.asarray(step_c), np.asarray(step_f),
                               atol=2e-5, rtol=1e-4)
