"""Generation (greedy/sample/beam) + WER."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.core.config import DecodeConfig
from avsr_tpu.infer.generate import beam_search, generate, generate_tokens
from avsr_tpu.infer.wer import WERAccumulator, edit_distance, wer
from avsr_tpu.models import llama as L
from avsr_tpu.models.avsr import Batch, build_prefix, encode, init_avsr_model

from test_models_avsr import tiny_batch, tiny_model_cfg

EOS = 2


def test_edit_distance():
    assert edit_distance("a b c".split(), "a b c".split()) == 0
    assert edit_distance("a b c".split(), "a x c".split()) == 1
    assert edit_distance("a b c".split(), "b c".split()) == 1
    assert edit_distance([], "a b".split()) == 2


def test_wer_values():
    assert wer("hello world", "hello world") == 0.0
    assert wer("hello world", "hello there") == 0.5
    acc = WERAccumulator()
    acc.add("a b c d", "a b c d")
    acc.add("a b", "x y")
    assert acc.wer == pytest.approx(2 / 6)
    assert acc.utterances == 2


@pytest.fixture(scope="module")
def model_and_batch():
    rng = np.random.default_rng(0)
    cfg = tiny_model_cfg(modality="audio")
    params = init_avsr_model(jax.random.key(0), cfg)
    batch = tiny_batch(rng, "audio")
    return cfg, params, batch


@pytest.mark.slow   # 18.2s measured r05 — fast-tier budget policy
def test_greedy_matches_manual_decode(model_and_batch):
    """while_loop greedy decode == step-by-step python loop (oracle)."""
    cfg, params, batch = model_and_batch
    N = 5
    out = generate_tokens(params, cfg, batch, max_new_tokens=N,
                          temperature=0.0, eos_id=EOS, use_pallas="never")
    assert out.tokens.shape == (2, N)

    # Manual oracle: prefill + python loop of decode steps.
    enc = encode(params, cfg, batch, use_pallas="never")
    prefix, plens = build_prefix(params, cfg, batch, enc)
    M = prefix.shape[1] + N
    logits_all, cache = L.llama_apply(
        params["llm"], cfg.llm, inputs_embeds=prefix, lengths=plens,
        lora=cfg.lora, return_cache=True, cache_len=M, use_pallas="never")
    logits = jnp.take_along_axis(logits_all, (plens - 1)[:, None, None],
                                 axis=1)[:, 0]
    cur = plens.astype(jnp.int32)
    toks = []
    done = np.zeros(2, bool)
    for _ in range(N):
        nxt = np.asarray(jnp.argmax(logits, axis=-1))
        nxt = np.where(done, EOS, nxt)
        toks.append(nxt)
        done |= nxt == EOS
        logits, cache = L.llama_decode_step(
            params["llm"], cfg.llm,
            x=L.embed_tokens(params["llm"], jnp.asarray(nxt)[:, None]),
            cache=cache, cur_lens=cur, lora=cfg.lora)
        cur = cur + 1
    oracle = np.stack(toks, axis=1)
    np.testing.assert_array_equal(np.asarray(out.tokens), oracle)


def test_sampling_runs_and_eos_lengths(model_and_batch):
    cfg, params, batch = model_and_batch
    out = generate_tokens(params, cfg, batch, max_new_tokens=4,
                          temperature=0.8, top_p=0.9, eos_id=EOS,
                          rng=jax.random.key(3), use_pallas="never")
    assert out.tokens.shape == (2, 4)
    assert (np.asarray(out.lengths) >= 1).all()
    # everything after first EOS must be EOS
    t = np.asarray(out.tokens)
    for b in range(2):
        hit = np.where(t[b] == EOS)[0]
        if hit.size:
            assert (t[b, hit[0]:] == EOS).all()


def test_beam_search_shapes_and_score(model_and_batch):
    cfg, params, batch = model_and_batch
    out_beam = beam_search(params, cfg, batch, max_new_tokens=4, num_beams=3,
                           eos_id=EOS, use_pallas="never")
    assert out_beam.tokens.shape == (2, 4)

    # Beam-1 must equal greedy.
    out_b1 = beam_search(params, cfg, batch, max_new_tokens=4, num_beams=1,
                         eos_id=EOS, use_pallas="never")
    out_g = generate_tokens(params, cfg, batch, max_new_tokens=4,
                            temperature=0.0, eos_id=EOS, use_pallas="never")
    np.testing.assert_array_equal(np.asarray(out_b1.tokens),
                                  np.asarray(out_g.tokens))


def test_generate_dispatch(model_and_batch):
    cfg, params, batch = model_and_batch
    out = generate(params, cfg, batch, DecodeConfig(max_new_tokens=3),
                   eos_id=EOS, use_pallas="never")
    assert out.tokens.shape == (2, 3)


def test_generate_with_tp_sharded_params(rng):
    """Distributed inference: generation with megatron-TP-sharded params on
    the virtual mesh produces the same tokens as unsharded generation (the
    NamedShardings propagate through the jitted prefill + decode loop)."""
    import dataclasses

    from avsr_tpu.core.config import MeshConfig
    from avsr_tpu.mesh.sharding import build_mesh, shard_params

    cfg = tiny_model_cfg(modality="audio")
    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, vocab_size=64))
    params = init_avsr_model(jax.random.key(0), cfg)
    batch = tiny_batch(rng, "audio")

    ref = generate_tokens(params, cfg, batch, max_new_tokens=8, eos_id=-1)

    mesh = build_mesh(MeshConfig(dp=2, fsdp=2, sp=1, tp=2))
    sharded = shard_params(params, mesh)
    out = generate_tokens(sharded, cfg, batch, max_new_tokens=8, eos_id=-1)

    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.asarray(ref.tokens))


def test_int8_kv_cache_generate(rng):
    """decode.kv_cache_dtype=int8: prefill-quantized cache (per-head
    scales, models.llama.quantize_cache) generates valid sequences whose
    logits track the bf16-cache path closely."""
    import sys
    sys.path.insert(0, "tests")
    from test_models_avsr import tiny_model_cfg

    from avsr_tpu.models import llama as L
    from avsr_tpu.models.avsr import Batch, init_avsr_model
    from avsr_tpu.infer.generate import generate_tokens

    mc = tiny_model_cfg(modality="audio")
    params = init_avsr_model(jax.random.key(0), mc)
    B = 2
    batch = Batch(
        mel=jnp.asarray(rng.standard_normal((B, 80, 40)), jnp.float32),
        mel_lens=jnp.array([40, 24], jnp.int32),
        frames=jnp.zeros((B, 1, 3, 16, 16), jnp.float32),
        frame_lens=jnp.ones((B,), jnp.int32),
        prompt_tokens=jnp.asarray(rng.integers(0, 100, (B, 3)), jnp.int32),
        labels=jnp.zeros((B, 4), jnp.int32),
        label_lens=jnp.zeros((B,), jnp.int32),
    )
    base = generate_tokens(params, mc, batch, max_new_tokens=6, eos_id=-1,
                           use_pallas="never")
    got = generate_tokens(params, mc, batch, max_new_tokens=6, eos_id=-1,
                          use_pallas="never", kv_cache_dtype="int8")
    assert got.tokens.shape == base.tokens.shape
    # int8 rounding can flip near-ties; on a tiny random model most of
    # the argmax chain must still agree
    agree = float(np.mean(np.asarray(got.tokens) == np.asarray(base.tokens)))
    assert agree >= 0.5, agree

    # step-level logits parity (tight): one quantized decode step vs fp
    cache = L.init_cache(mc.llm, batch=B, max_len=8, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, 1, mc.llm.d_model)), jnp.float32)
    lens = jnp.array([3, 2], jnp.int32)
    # warm the fp cache with a couple of rows
    logits_fp, cache = L.llama_decode_step(params["llm"], mc.llm, x=x,
                                           cache=cache, cur_lens=lens)
    qcache = L.quantize_cache(cache)
    assert qcache.quantized and qcache.k.dtype == jnp.int8
    logits_q, qcache2 = L.llama_decode_step(params["llm"], mc.llm, x=x,
                                            cache=qcache, cur_lens=lens + 1)
    logits_f, _ = L.llama_decode_step(params["llm"], mc.llm, x=x,
                                      cache=cache, cur_lens=lens + 1)
    assert qcache2.k.dtype == jnp.int8     # decoded rows stored quantized
    ref = np.asarray(logits_f)
    rel = np.abs(np.asarray(logits_q) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.1, rel


@pytest.mark.slow   # 13.9s measured r05 — fast-tier budget policy
def test_beam_split_cache_matches_flat_cache_oracle(model_and_batch):
    """The shared-prefix split-cache beam (llama_decode_step_split) must be
    token-exact against a python beam loop over the flat [B*W] cache built
    with llama_decode_step (itself oracle-tested above) — same top-k, same
    ragged prefixes, every step gathering the full cache the naive way."""
    cfg, params, batch = model_and_batch
    W, N = 3, 5
    out = beam_search(params, cfg, batch, max_new_tokens=N, num_beams=W,
                      eos_id=EOS, use_pallas="never")

    enc = encode(params, cfg, batch, use_pallas="never")
    prefix, plens = build_prefix(params, cfg, batch, enc)
    B, Tpre = prefix.shape[:2]
    M = Tpre + N
    hidden, cache = L.llama_apply(
        params["llm"], cfg.llm, inputs_embeds=prefix, lengths=plens,
        lora=cfg.lora, return_cache=True, cache_len=M, output="hidden",
        use_pallas="never")
    h_last = jnp.take_along_axis(hidden, (plens - 1)[:, None, None], axis=1)
    last = L.compute_logits(params["llm"], cfg.llm, h_last)[:, 0]

    cache = L.KVCache(jnp.repeat(cache.k, W, axis=1),
                      jnp.repeat(cache.v, W, axis=1))
    cur = jnp.repeat(plens.astype(jnp.int32), W)
    logits = jnp.repeat(last, W, axis=0)
    V = last.shape[-1]
    scores = np.full((B, W), -1e30)
    scores[:, 0] = 0.0
    tokens = np.full((B, W, N), EOS, np.int32)
    done = np.zeros((B, W), bool)
    for step in range(N):
        if done.all():
            break
        logp = np.asarray(jax.nn.log_softmax(logits, -1)).reshape(B, W, V)
        eos_only = np.full((V,), -1e30)
        eos_only[EOS] = 0.0
        logp = np.where(done[..., None], eos_only[None, None], logp)
        flat = (scores[..., None] + logp).reshape(B, W * V)
        top_idx = np.argsort(flat, axis=-1)[:, ::-1][:, :W]
        scores = np.take_along_axis(flat, top_idx, axis=-1)
        src = top_idx // V
        new_tok = (top_idx % V).astype(np.int32)
        gather = (np.arange(B)[:, None] * W + src).reshape(-1)
        cache = L.KVCache(cache.k[:, gather], cache.v[:, gather])
        cur = cur[gather]
        tokens = np.take_along_axis(tokens, src[..., None], axis=1)
        done = np.take_along_axis(done, src, axis=1)
        tokens[:, :, step] = np.where(done, EOS, new_tok)
        done = done | (new_tok == EOS)
        logits, cache = L.llama_decode_step(
            params["llm"], cfg.llm,
            x=L.embed_tokens(params["llm"], jnp.asarray(new_tok).reshape(-1)[:, None]),
            cache=cache, cur_lens=cur, lora=cfg.lora)
        cur = cur + 1

    lens = np.where((tokens == EOS).any(-1),
                    np.argmax(tokens == EOS, -1) + 1, N)
    norm = scores / np.maximum(lens, 1.0)
    best = np.argmax(norm, axis=-1)
    oracle = np.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0]
    np.testing.assert_array_equal(np.asarray(out.tokens), oracle)


def test_beam_int8_prefix_cache(model_and_batch):
    """Serving beam: int8-quantized (prefix) cache — the split attention
    dequants the shared prefix in-einsum; tokens track the fp path."""
    cfg, params, batch = model_and_batch
    base = beam_search(params, cfg, batch, max_new_tokens=4, num_beams=3,
                       eos_id=EOS, use_pallas="never")
    got = beam_search(params, cfg, batch, max_new_tokens=4, num_beams=3,
                      eos_id=EOS, use_pallas="never", kv_cache_dtype="int8")
    assert got.tokens.shape == base.tokens.shape
    agree = float(np.mean(np.asarray(got.tokens) == np.asarray(base.tokens)))
    assert agree >= 0.5, agree


def test_generate_continue_matches_full_prefix(model_and_batch):
    """Streaming serving chain (prefill_extend -> generate_continue) must
    be token-exact vs the one-shot generate_tokens over the same prefix:
    freeze the first S prefix rows into a persistent cache, then decode
    with the remainder as the tail. This is the per-chunk path of
    blockwise streaming (infer.streaming, decode.stream_block_s)."""
    from avsr_tpu.infer.generate import generate_continue, prefill_extend

    cfg, params, batch = model_and_batch
    N = 6
    full = generate_tokens(params, cfg, batch, max_new_tokens=N,
                           temperature=0.0, eos_id=EOS, use_pallas="never")

    enc = encode(params, cfg, batch, use_pallas="never")
    prefix, plens = build_prefix(params, cfg, batch, enc)
    B, Tpre = prefix.shape[:2]
    S = 3
    assert int(plens.min()) > S
    M = -(-(Tpre + N) // 128) * 128
    llm = cfg.llm
    hd = llm.d_model // llm.n_heads
    shape = (llm.n_layers, B, llm.n_kv_heads, hd, M)
    cache = L.KVCache(jnp.zeros(shape, jnp.float32),
                      jnp.zeros(shape, jnp.float32))
    cache = prefill_extend(params, cfg, cache, jnp.zeros((B,), jnp.int32),
                           prefix[:, :S], jnp.full((B,), S, jnp.int32))
    out, _ = generate_continue(
        params, cfg, cache, jnp.full((B,), S, jnp.int32),
        prefix[:, S:], (plens - S).astype(jnp.int32),
        max_new_tokens=N, eos_id=EOS)
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.asarray(full.tokens))
    np.testing.assert_array_equal(np.asarray(out.lengths),
                                  np.asarray(full.lengths))


def test_cer_values():
    """CER oracle values (character Levenshtein over the normalized
    strings) + accumulator aggregation alongside WER."""
    from avsr_tpu.infer.wer import cer

    assert cer("abc", "abc") == 0.0
    assert cer("abc", "abd") == 1 / 3
    assert cer("", "") == 0.0
    assert cer("", "x") == 1.0
    assert cer("ab cd", "abcd") == 0.2          # one space deletion, 5 chars
    acc = WERAccumulator()
    acc.add("hello world", "hello world")
    acc.add("abc", "abd")
    assert acc.wer == 1 / 3                      # 1 word error / 3 ref words
    assert abs(acc.cer - 1 / 14) < 1e-9          # 1 char edit / 14 ref chars
