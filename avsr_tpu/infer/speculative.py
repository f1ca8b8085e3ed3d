"""Lossless speculative decoding: quantized-draft propose, full-model verify.

Serving extension beyond the reference (its decode is strictly one token per
LLM pass — clip_whisper_model.py:1240-1348 via HF generate). TPU decode at
small batch is HBM-bandwidth-bound: each step streams every weight byte for
one token. Speculative decoding converts bandwidth into accepted tokens:

  * a cheap DRAFT model proposes ``gamma`` tokens autoregressively — here
    the draft is by default the *same* LLM with int8/int4 weight-only
    quantization (ops.quant), so it streams 2-4x fewer bytes per step and
    needs no separate training;
  * the full-precision TARGET verifies all gamma proposals in ONE chunked
    prefill pass (models.llama.llama_prefill_continue) — gamma+1 positions
    amortize the full weight read, and the MXU sees a [B, gamma+1] matmul
    instead of gamma single-row ones;
  * the longest prefix of proposals matching the target's greedy argmax is
    accepted, plus the target's own next token (bonus). Output is therefore
    token-for-token IDENTICAL to plain greedy decoding — the draft only
    changes speed, never text.

Cache rewind is free by construction: both caches are position-indexed and
``_gqa_prefill_attention`` masks strictly by base+causal position, so the
columns written for rejected proposals are dead until overwritten by the
next iteration's writes at the same positions.

All shapes static; the whole loop is one ``lax.while_loop`` under jit with
per-sample raggedness (each batch row accepts a different prefix length).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from avsr_tpu.core.config import ModelConfig
from avsr_tpu.models import llama as L
from avsr_tpu.models.avsr import Batch, build_prefix, encode
from avsr_tpu.models.layers import Params

from avsr_tpu.infer.generate import GenOut, _top_p_filter


def _dist(logits: jax.Array, temperature: float, top_p: float) -> jax.Array:
    """Sampling distribution: temperature + nucleus filter, renormalized
    (matches generate._sample_or_greedy's categorical exactly)."""
    z = logits.astype(jnp.float32) / temperature
    if top_p < 1.0:
        z = _top_p_filter(z, top_p)
    return jax.nn.softmax(z, axis=-1)


def _rejection_step(drafts: jax.Array, q: jax.Array, p: jax.Array,
                    key: jax.Array) -> tuple[jax.Array, jax.Array]:
    """One speculative-sampling accept/replace decision (Leviathan et al.).

    drafts [B, G] ~ q; q [B, G, V] the draft's sampling distributions;
    p [B, G+1, V] the target's. Returns (m [B] leading accepts,
    cand [B, G+1]) where cand[:, :m] = accepted drafts, cand[:, m] = the
    replacement (residual-sampled on rejection, p-sampled bonus on full
    accept — uniformly max(p-q,0)-normalized with q padded to zero at the
    bonus slot, where the residual reduces to p). The emitted stream is
    EXACTLY target-distributed for any q: P(out=x) = q(x)min(1,p/q)
    + P(reject)·resid(x) = p(x)."""
    B, G = drafts.shape
    ku, kr = jax.random.split(key)
    qd = jnp.take_along_axis(q, drafts[..., None], axis=-1)[..., 0]
    pd = jnp.take_along_axis(p[:, :G], drafts[..., None], axis=-1)[..., 0]
    u = jax.random.uniform(ku, (B, G))
    accept = u * qd < pd                      # u < min(1, p/q), div-free
    m = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1)

    q_pad = jnp.concatenate([q, jnp.zeros_like(p[:, :1])], axis=1)
    p_m = jnp.take_along_axis(p, m[:, None, None], axis=1)[:, 0]
    q_m = jnp.take_along_axis(q_pad, m[:, None, None], axis=1)[:, 0]
    resid = jnp.maximum(p_m - q_m, 0.0)
    rs = jnp.sum(resid, axis=-1, keepdims=True)
    resid = jnp.where(rs > 1e-9, resid / rs, p_m)   # p==q: sample p
    r = jax.random.categorical(kr, jnp.log(resid + 1e-30)).astype(jnp.int32)

    j = jnp.arange(G + 1)[None, :]
    pad = jnp.concatenate([drafts, drafts[:, -1:]], axis=1)
    cand = jnp.where(j == m[:, None], r[:, None], pad)
    return m, cand


def break_even_tokens_per_pass(model_cfg: ModelConfig, *,
                               bits: int, gamma: int,
                               draft_layers: int = 0) -> float:
    """Cost-model break-even point: the E[tokens/pass] a speculative
    config must exceed to beat plain greedy decoding.

    Bandwidth model (decode at small batch is weight-stream-bound): a
    draft step costs ``cost_ratio = (bits/16) * (L_draft/L)`` of a bf16
    target step, and a verify pass costs ~1 target step (gamma+1
    positions amortize one full weight read). One speculative round
    therefore costs ``gamma * cost_ratio + 1`` target-steps and yields
    E[tokens/pass] tokens, so profit requires

        E[tokens/pass]  >  gamma * cost_ratio + 1

    with E[tokens/pass] <= gamma + 1 as the acceptance-rate ceiling.
    Measured reality on the tunneled v5e is WORSE than this bound (each
    extra dispatch pays ~2 ms of host RTT, and at batch 8 the verify
    pass is no longer free), so a config that fails this check loses
    unconditionally; passing it is necessary, not sufficient. Measured
    verdicts per (batch, config) live in docs/serving.md.
    """
    n_layers = model_cfg.llm.n_layers
    l_draft = draft_layers if draft_layers > 0 else n_layers
    cost_ratio = (bits / 16.0) * (l_draft / n_layers)
    return gamma * cost_ratio + 1.0


def make_draft_params(params: Params, model_cfg: ModelConfig,
                      bits: int = 8) -> Params:
    """Build the default self-draft: the same LLM, weight-only quantized
    and laid out for decode (merge LoRA -> quantize -> fuse q|k|v and
    gate|up), so every draft step runs 4 fused ops.qmatmul launches.

    int8 halves (int4 quarters) the bytes each draft step streams from
    HBM; with the verify pass guaranteeing exactness, draft quality only
    moves the acceptance rate. Takes the RAW (unfused, unquantized)
    params tree — quantize_llm only recognizes raw projection keys, so a
    fused or already-quantized input would silently produce a full-cost
    bf16 clone; reject it loudly instead."""
    from avsr_tpu.ops.quant import is_quantized, quantize_llm

    llm = params["llm"]
    layer0 = llm["layers"][0]
    if "qkv" in layer0 or "gateup" in layer0:
        raise ValueError(
            "make_draft_params needs the raw params tree, not the fused "
            "decode layout (build the draft before "
            "prepare_params_for_decode)")
    if any(is_quantized(v) for v in layer0.values()):
        raise ValueError(
            "make_draft_params needs unquantized params (the target is "
            "already quantized; there is no cheaper self-draft to build "
            "— pass a layer-skip or separate draft instead)")
    if model_cfg.lora.use_lora:
        llm = L.merge_lora(llm, model_cfg.lora)
    out = dict(params)
    # lm_head_bits=bits: the hidden->vocab read is the single largest
    # per-step HBM stream (525 MB bf16 at a 128k vocab) — the draft pays
    # it every proposal, so it quantizes along with the projections
    out["llm"] = L.fuse_decode_layout(
        quantize_llm(llm, bits, lm_head_bits=bits), model_cfg.llm)
    return out


def make_layerskip_draft(params: Params, model_cfg: ModelConfig,
                         n_layers: int) -> tuple[Params, ModelConfig]:
    """Zero-memory self-draft: the target's FIRST ``n_layers`` transformer
    blocks + its own final norm and lm head (LayerSkip-style early exit).

    The returned tree shares every buffer with the target — no extra HBM —
    and costs ~n_layers/L of a target step per proposal. Pass the returned
    (draft_params, draft_cfg) pair to :func:`speculative_generate`; the
    draft shares the target's prefix (same d_model), so no second encoder
    pass either. Acceptance depends on how predictable the model's late
    layers are — worth it when the early exit is well-calibrated (e.g.
    after LayerSkip-style training); exactness never depends on it."""
    import dataclasses

    L_full = model_cfg.llm.n_layers
    if not (1 <= n_layers < L_full):
        raise ValueError(f"n_layers must be in [1, {L_full - 1}]")
    out = dict(params)
    llm = dict(params["llm"])
    llm["layers"] = list(params["llm"]["layers"])[:n_layers]
    out["llm"] = llm
    dcfg = dataclasses.replace(
        model_cfg, llm=dataclasses.replace(model_cfg.llm,
                                           n_layers=n_layers))
    return out, dcfg


@functools.partial(
    jax.jit,
    static_argnames=("model_cfg", "gamma", "max_new_tokens", "eos_id",
                     "compute_dtype", "use_pallas", "mesh", "draft_lora",
                     "return_stats", "temperature", "top_p",
                     "draft_model_cfg", "draft_shares_prefix"))
def speculative_generate(
    params: Params,
    draft_params: Params,
    model_cfg: ModelConfig,
    batch: Batch,
    *,
    gamma: int = 4,
    max_new_tokens: int = 100,
    eos_id: int = 2,
    compute_dtype: str = "float32",
    use_pallas: str = "auto",
    mesh=None,
    draft_lora: bool = False,
    return_stats: bool = False,
    temperature: float = 0.0,
    top_p: float = 1.0,
    rng: jax.Array | None = None,
    draft_model_cfg: ModelConfig | None = None,
    draft_shares_prefix: bool | None = None,
) -> GenOut:
    """Speculative generation in ~1/(accepted+1) as many target passes.

    ``temperature == 0``: greedy — token-identical to ``generate_tokens``.
    ``temperature > 0``: speculative SAMPLING (rejection scheme,
    ``_rejection_step``) — the emitted stream is distributed exactly as
    target sampling with the same temperature/top_p, for ANY draft.

    ``draft_params`` may be ANY params tree (make_draft_params builds the
    quantized self-draft, make_layerskip_draft the early-exit one, or pass
    a genuinely smaller model); correctness never depends on it. A draft
    with its own architecture passes ``draft_model_cfg``; when its d_model
    matches the target's (quantized/layer-skip drafts), the target's
    prefix embeddings are reused (``draft_shares_prefix``, default: share
    unless draft_model_cfg is given a different d_model). ``draft_lora``
    applies the LoRA config to the draft's projections too (off for the
    default draft, which merges LoRA)."""
    dt = jnp.dtype(compute_dtype)
    cfg = model_cfg.llm
    dcfg = draft_model_cfg or model_cfg
    dllm = dcfg.llm
    if dllm.vocab_size != cfg.vocab_size:
        raise ValueError(
            "draft and target must share a vocabulary "
            f"(draft {dllm.vocab_size} vs target {cfg.vocab_size})")
    if draft_shares_prefix is None:
        draft_shares_prefix = dllm.d_model == cfg.d_model
    if draft_shares_prefix and dllm.d_model != cfg.d_model:
        raise ValueError(
            "draft_shares_prefix requires matching d_model "
            f"({dllm.d_model} vs {cfg.d_model})")
    lora = model_cfg.lora if model_cfg.lora.use_lora else None
    dlora = (dcfg.lora if dcfg.lora.use_lora else None) if draft_lora \
        else None
    G = gamma

    # ---- target prefill (identical to generate_tokens) -------------------
    enc = encode(params, model_cfg, batch, compute_dtype=dt,
                 use_pallas=use_pallas, mesh=mesh, moe_rowwise=True)
    prefix, prefix_lens = build_prefix(params, model_cfg, batch, enc,
                                       compute_dtype=dt)
    B, Tpre = prefix.shape[:2]
    M = -(-(Tpre + max_new_tokens + G + 2) // 128) * 128

    hidden, t_cache = L.llama_apply(
        params["llm"], cfg, inputs_embeds=prefix, lengths=prefix_lens,
        lora=lora, compute_dtype=dt, use_pallas=use_pallas,
        moe_rowwise=True,
        return_cache=True, cache_len=M, output="hidden", mesh=mesh)
    h_last = jnp.take_along_axis(
        hidden, (prefix_lens - 1)[:, None, None], axis=1)
    last = L.compute_logits(params["llm"], cfg, h_last)[:, 0]

    # ---- draft prefill -----------------------------------------------
    # Shared-d_model drafts consume the target's prefix embeddings (one
    # encode pass serves both — correctness never depends on what the
    # draft conditions on; only the verify pass decides tokens). A draft
    # with its own architecture runs its own encode/prefix and keeps its
    # own position offsets.
    if draft_shares_prefix:
        d_prefix, d_plens, M_d = prefix, prefix_lens, M
    else:
        d_enc = encode(draft_params, dcfg, batch, compute_dtype=dt,
                       use_pallas=use_pallas, mesh=mesh,
                       moe_rowwise=True)
        d_prefix, d_plens = build_prefix(draft_params, dcfg, batch, d_enc,
                                         compute_dtype=dt)
        M_d = -(-(d_prefix.shape[1] + max_new_tokens + G + 2) // 128) * 128
    _, d_cache = L.llama_apply(
        draft_params["llm"], dllm, inputs_embeds=d_prefix, lengths=d_plens,
        lora=dlora, compute_dtype=dt, use_pallas=use_pallas,
        moe_rowwise=True,
        return_cache=True, cache_len=M_d, output="hidden", mesh=mesh)

    P = prefix_lens.astype(jnp.int32)                 # [B] target prefix
    Pd = d_plens.astype(jnp.int32)                    # [B] draft prefix
    sampling = temperature > 0.0
    key0 = rng if rng is not None else jax.random.key(0)
    if sampling:
        key0, k_e0 = jax.random.split(key0)
        e0 = jax.random.categorical(
            k_e0, jnp.log(_dist(last, temperature, top_p) + 1e-30)
        ).astype(jnp.int32)
    else:
        e0 = jnp.argmax(last, axis=-1).astype(jnp.int32)  # first token

    Tbuf = max_new_tokens + G + 1
    tokens0 = jnp.full((B, Tbuf), eos_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(e0)
    out_pos0 = jnp.ones((B,), jnp.int32)
    done0 = (e0 == eos_id) | (max_new_tokens <= 1)
    # draft-cache gap: emitted tokens the draft hasn't consumed yet (1 or 2,
    # always the stream tail) — starts at 1 (just e0)
    gap0 = jnp.ones((B,), jnp.int32)

    b_idx = jnp.arange(B)

    def cond(carry):
        _, _, _, done, _, _, _, _ = carry
        return ~jnp.all(done)

    def body(carry):
        tokens, out_pos, gap, done, t_cache, d_cache, iters, key = carry
        key, k_draft, k_acc = jax.random.split(key, 3)
        n = out_pos                                   # emitted so far

        # -- draft phase: catch up the <=2 pending tail tokens with two
        # single-token decode steps (NOT a chunked prefill: decode steps
        # keep the quantized draft on the fused qmatmul kernel path, while
        # a T=2 prefill over int8 weights falls back to XLA's
        # dequant-matmul, which rematerializes the full fp weight set
        # every iteration — measured ~6x greedy-step cost per spec
        # iteration before this). gap==1 makes step A identical to step B
        # (same token, same position): an idempotent KV rewrite.
        e_prev = jnp.take_along_axis(tokens, (n - 1)[:, None], axis=1)
        e_prev2 = jnp.take_along_axis(
            tokens, jnp.maximum(n - 2, 0)[:, None], axis=1)
        tokA = jnp.where(gap[:, None] == 2, e_prev2, e_prev)     # [B, 1]
        posA = jnp.where(gap == 2, Pd + n - 2, Pd + n - 1)

        # When every row's gap == 1, step A is an IDENTICAL computation to
        # step B (same token, same position — an idempotent KV rewrite kept
        # only for static-shape simplicity), so skip the whole draft step.
        # Rows at gap == 1 inside a mixed batch still get the harmless
        # duplicate when any row needs the gap-2 correction. At B=1 this
        # drops 1 of the 6 draft steps per round on every partial-accept
        # round (measured ~12% of the per-pass cost at the flagship).
        def _catch_up(dc):
            _, dc = L.llama_decode_step(
                draft_params["llm"], dllm,
                x=L.embed_tokens(draft_params["llm"], tokA, dt),
                cache=dc, cur_lens=posA, lora=dlora, compute_dtype=dt)
            return dc

        d_cache = jax.lax.cond(jnp.any(gap == 2), _catch_up,
                               lambda dc: dc, d_cache)
        dlog, d_cache = L.llama_decode_step(
            draft_params["llm"], dllm,
            x=L.embed_tokens(draft_params["llm"], e_prev, dt),
            cache=d_cache, cur_lens=Pd + n - 1, lora=dlora,
            compute_dtype=dt)

        def draft_step(carry, j):
            dlog, d_cache = carry
            if sampling:
                q = _dist(dlog, temperature, top_p)
                tok = jax.random.categorical(
                    jax.random.fold_in(k_draft, j),
                    jnp.log(q + 1e-30)).astype(jnp.int32)
            else:
                q = jnp.zeros((dlog.shape[0], 1), jnp.float32)  # unused
                tok = jnp.argmax(dlog, axis=-1).astype(jnp.int32)
            demb = L.embed_tokens(draft_params["llm"], tok[:, None], dt)
            dlog2, d_cache = L.llama_decode_step(
                draft_params["llm"], dllm, x=demb, cache=d_cache,
                cur_lens=Pd + n + j, lora=dlora, compute_dtype=dt)
            return (dlog2, d_cache), (tok, q)

        (_, d_cache), (drafts, qprobs) = jax.lax.scan(
            draft_step, (dlog, d_cache), jnp.arange(G))
        drafts = drafts.T                              # [B, G]
        qprobs = qprobs.transpose(1, 0, 2)             # [B, G, Vq]

        # -- verify: one target pass over [e_{n-1}, d_1..d_G] ---------------
        ver_tok = jnp.concatenate(
            [jnp.take_along_axis(tokens, (n - 1)[:, None], axis=1), drafts],
            axis=1)                                    # [B, G+1]
        vemb = L.embed_tokens(params["llm"], ver_tok, dt)
        vh, t_cache = L.llama_prefill_continue(
            params["llm"], cfg, x=vemb, cache=t_cache,
            base_lens=P + n - 1, tail_lens=jnp.full((B,), G + 1, jnp.int32),
            lora=lora, compute_dtype=dt)
        vlog = L.compute_logits(params["llm"], cfg, vh)   # [B, G+1, V]

        # -- accept the longest valid prefix + one more token ---------------
        if sampling:
            p = _dist(vlog, temperature, top_p)
            m, a = _rejection_step(drafts, qprobs, p, k_acc)
        else:
            a = jnp.argmax(vlog, axis=-1).astype(jnp.int32)   # [B, G+1]
            match = (drafts == a[:, :G])                      # [B, G]
            m = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1),
                        axis=1)
        j = jnp.arange(G + 1)[None, :]
        cand_ok = j <= m[:, None]                         # accepted window
        # stop emission after the first EOS inside the window
        eos_before = jnp.cumsum(
            ((a == eos_id) & cand_ok).astype(jnp.int32), axis=1) \
            - ((a == eos_id) & cand_ok).astype(jnp.int32)
        emit = cand_ok & (eos_before == 0) & ~done[:, None] \
            & ((n[:, None] + j) < max_new_tokens)
        n_emit = jnp.sum(emit.astype(jnp.int32), axis=1)  # [B]

        idx = jnp.clip(n[:, None] + j, 0, Tbuf - 1)
        vals = jnp.where(emit, a,
                         jnp.take_along_axis(tokens, idx, axis=1))
        tokens = tokens.at[b_idx[:, None], idx].set(vals)

        emitted_eos = jnp.any(emit & (a == eos_id), axis=1)
        out_pos = out_pos + n_emit
        done = done | emitted_eos | (out_pos >= max_new_tokens) \
            | (n_emit == 0)
        # Draft-cache gap for the next catch-up: the draft consumed
        # e_{n-1} and d_1..d_{G-1}, so of the newly emitted tokens it
        # lacks only the last one (mismatch correction) — except on a
        # full accept (n_emit == G+1), where a_{G-1}=d_G was never fed
        # either and two tokens are pending.
        gap = jnp.where(done, gap, jnp.where(n_emit == G + 1, 2, 1))
        return (tokens, out_pos, gap, done, t_cache, d_cache, iters + 1,
                key)

    carry = (tokens0, out_pos0, gap0, done0, t_cache, d_cache,
             jnp.zeros((), jnp.int32), key0)
    (tokens, out_pos, _, _, _, _, iters, _) = jax.lax.while_loop(
        cond, body, carry)

    lengths = jnp.minimum(out_pos, max_new_tokens)
    out = GenOut(tokens[:, :max_new_tokens], lengths.astype(jnp.int32))
    if return_stats:
        # tokens per verify pass (the speculation win): emitted tokens
        # beyond the prefill freebie, divided by target passes
        emitted = jnp.sum(lengths.astype(jnp.float32)) - B
        stats = {"verify_passes": iters,
                 "tokens_per_pass": emitted / jnp.maximum(
                     iters.astype(jnp.float32) * B, 1.0)}
        return out, stats
    return out
