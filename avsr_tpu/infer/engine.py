"""Continuous-batching serving engine: slot-based decode, static shapes.

The reference serves utterances as whole static batches
(/root/reference/scripts/clip_whisper/decode.py:405-440): every sequence in
a batch decodes until the LAST one finishes, so ragged transcript lengths
leave most rows idle — head-of-line blocking. The standard fix (vLLM/Orca
"continuous batching") readmits new requests into finished rows mid-flight.

TPU-native version: everything stays static-shaped and jitted.

  * one persistent KV cache of S slots, [L, S, Hkv, Dh, M] (position-minor,
    models.llama.KVCache);
  * ``stage`` — prefill/decode disaggregation: encode a FULL batch of
    queued requests and prefill their [prompt][features] prefixes into
    staged cache rows, independent of slot availability — the
    encoder/prefill matmuls always run MXU-wide, and the prefill computes
    while earlier decode chunks are in flight. One jit trace per
    (pow2 width x media bucket);
  * ``install`` — the slot-dependent tail of admission: scatter staged
    rows into free pool slots (no model compute);
  * ``decode_chunk`` — K fused steps over ALL slots (lax.fori_loop of
    llama_decode_step), greedy or per-slot temperature/top-p sampling;
    finished slots idle behind their ``done`` flag. K amortizes host
    round-trips (the tunneled-TPU dispatch tax) against admission latency;
  * the host loop in :class:`ServingEngine` refills finished slots from
    staged rows between chunks, staging one batch ahead.

Per-row numerics are independent of the other slots (row-batched matmuls,
per-row masked attention), so each request's transcript is token-exact vs
a standalone ``generate_tokens`` call — tested in tests/test_engine.py.

Multi-tenant LoRA (``adapter_bank=`` + ``submit(adapter=k)``): one
resident base model serves K fine-tunes concurrently — per-request bank
rows are gathered inside the jitted stage/decode calls and applied
row-batched (infer.adapters), so tenants mix freely in the pool and each
request stays token-exact vs generate_tokens with ITS adapter injected.
"""

from __future__ import annotations

import functools
from collections import deque
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.core.config import AVSRConfig, ModelConfig
from avsr_tpu.data.dataset import Sample
from avsr_tpu.data.loader import (
    audio_frontend_for,
    collate,
    featurize,
    image_stats_for,
)
from avsr_tpu.infer.generate import _top_p_filter
from avsr_tpu.models import llama as L
from avsr_tpu.models.avsr import build_prefix, encode
from avsr_tpu.models.layers import Params


def _slot_sample(logits: jax.Array, temps: jax.Array, top_ps: jax.Array,
                 rng: jax.Array) -> jax.Array:
    """Per-row greedy-or-nucleus next token: rows with temperature <= 0
    take argmax, the rest sample from the top-p filtered distribution at
    their own temperature. logits [S, V], temps/top_ps [S] -> [S]."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(temps, 1e-6)[:, None]
    filtered = _top_p_filter(scaled, top_ps[:, None])
    sampled = jax.random.categorical(rng, filtered).astype(jnp.int32)
    return jnp.where(temps <= 0.0, greedy, sampled)


@functools.partial(
    jax.jit,
    static_argnames=("model_cfg", "cache_len", "cache_dtype", "quantize",
                     "sampling", "compute_dtype", "use_pallas"))
def stage(
    params: Params,
    model_cfg: ModelConfig,
    batch,                         # [W]-request featurized Batch
    temps: jax.Array,              # [W] per-request temperature (<=0 greedy)
    top_ps: jax.Array,             # [W] per-request nucleus p
    rng: jax.Array,                # PRNG key for sampled first tokens
    adapters: Params | None = None,    # [K, ...] LoRA bank (infer.adapters)
    adapter_ids: jax.Array | None = None,  # [W] per-request bank row
    *,
    cache_len: int,                # M — must match the slot cache width
    cache_dtype: str = "bfloat16",
    quantize: bool = False,        # int8 slot cache: quantize staged rows
                                   # with per-(layer, row, kv-head) scales
    sampling: bool = False,        # static: all-greedy workloads skip the
                                   # per-step top-p sort entirely
    compute_dtype: str = "bfloat16",
    use_pallas: str = "auto",
) -> tuple[L.KVCache, jax.Array, jax.Array]:
    """Prefill stage, DECOUPLED from slot availability: encode a full
    media batch and run the [prompt][features] prefixes through the LLM
    with full-width (M) cache rows, returning (rows, first_tokens [W],
    prefix_lens [W]). Which pool slot a row lands in is the only
    slot-dependent part of admission, so it is deferred to the trivial
    :func:`install` scatter — the encoder/prefill matmuls always run at
    the staging width (MXU-wide) no matter how raggedly slots free up,
    prefill compute overlaps the decode chunks already in flight, and a
    queue never pays small-batch encodes (prefill/decode disaggregation
    on one chip)."""
    dt = jnp.dtype(compute_dtype)
    cfg = model_cfg.llm
    llm = params["llm"]
    if adapters is not None:
        # multi-tenant serving: gather each request's LoRA rows from the
        # bank ([K, ...] -> [W, ...], one fused gather per leaf) and graft
        # them over the base tree; proj() applies them row-batched
        from avsr_tpu.infer.adapters import inject_lora, select_lora
        llm = inject_lora(llm, select_lora(adapters, adapter_ids))
    enc = encode(params, model_cfg, batch, compute_dtype=dt,
                 use_pallas=use_pallas, moe_rowwise=True)
    prefix, plens = build_prefix(params, model_cfg, batch, enc,
                                 compute_dtype=dt)
    hidden, rows = L.llama_apply(
        llm, cfg, inputs_embeds=prefix, lengths=plens,
        lora=model_cfg.lora if model_cfg.lora.use_lora else None,
        compute_dtype=dt, use_pallas=use_pallas, moe_rowwise=True,
        return_cache=True, cache_len=cache_len, output="hidden")
    h_last = jnp.take_along_axis(hidden, (plens - 1)[:, None, None], axis=1)
    logits = L.compute_logits(llm, cfg, h_last)[:, 0]
    if sampling:
        tok0 = _slot_sample(logits.astype(jnp.float32), temps, top_ps, rng)
    else:
        tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if quantize:
        # identical per-row math to generate's post-prefill quantize_cache
        # (scales are per-(l, row, h)), so int8 engine transcripts match
        # the int8 static path token for token
        rows = L.quantize_cache(rows)
    else:
        cdt = jnp.dtype(cache_dtype)
        rows = L.KVCache(rows.k.astype(cdt), rows.v.astype(cdt))
    return rows, tok0, plens.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("eos_id",), donate_argnums=(0,))
def install(
    cache: L.KVCache,              # [L, S, Hkv, Dh, M] persistent slot cache
    rows: L.KVCache,               # [L, W, Hkv, Dh, M] staged prefill rows
    idxs: jax.Array,               # [G] int32 rows to take from the stage
    slots: jax.Array,              # [G] int32 destination slots (distinct)
    cur_lens: jax.Array,           # [S] slot state (threaded through)
    last_tok: jax.Array,           # [S]
    done: jax.Array,               # [S] bool
    rem: jax.Array,                # [S] remaining token budget per slot
    budgets: jax.Array,            # [G] per-request max_new_tokens
    tok0: jax.Array,               # [W] staged first tokens
    plens: jax.Array,              # [W] staged prefix lengths
    *,
    eos_id: int = 2,
) -> tuple[L.KVCache, jax.Array, jax.Array, jax.Array, jax.Array,
           jax.Array]:
    """Scatter staged rows into free pool slots — the slot-dependent tail
    of admission, O(G rows copied), no model compute. Returns
    (cache, cur_lens, last_tok, done, rem, first_tokens [G]). Dispatched
    asynchronously like everything else; the cache is donated."""
    # single advanced index on dim 1 stays in place: target [L, G, ...]
    k = cache.k.at[:, slots].set(rows.k[:, idxs])
    v = cache.v.at[:, slots].set(rows.v[:, idxs])
    ks, vs = cache.k_scale, cache.v_scale
    if rows.quantized:       # int8 slot cache: per-slot scales ride along
        ks = ks.at[:, slots].set(rows.k_scale[:, idxs])
        vs = vs.at[:, slots].set(rows.v_scale[:, idxs])
    t0 = tok0[idxs]
    cur_lens = cur_lens.at[slots].set(plens[idxs])
    last_tok = last_tok.at[slots].set(t0)
    done = done.at[slots].set((t0 == eos_id) | (budgets <= 1))
    # tok0 already consumed one budget unit (it came from the prefill)
    rem = rem.at[slots].set(jnp.maximum(budgets - 1, 0))
    return L.KVCache(k, v, ks, vs), cur_lens, last_tok, done, rem, t0


@functools.partial(
    jax.jit,
    static_argnames=("model_cfg", "k_max", "eos_id", "sampling",
                     "compute_dtype"),
    donate_argnums=(2,))
def decode_chunk(
    params: Params,
    model_cfg: ModelConfig,
    cache: L.KVCache,
    cur_lens: jax.Array,           # [S] cache frontier per slot
    last_tok: jax.Array,           # [S] last emitted token per slot
    done: jax.Array,               # [S] bool — finished/idle slots
    rem: jax.Array,                # [S] remaining token budget per slot
    k_dyn: jax.Array,              # scalar int32 — steps THIS chunk (<= k_max)
    temps: jax.Array | None = None,    # [S] per-slot temperature
    top_ps: jax.Array | None = None,   # [S] per-slot nucleus p
    rng: jax.Array | None = None,      # PRNG key (folded per step)
    adapters: Params | None = None,    # [K, ...] LoRA bank (infer.adapters)
    adapter_ids: jax.Array | None = None,  # [S] per-slot bank row
    *,
    k_max: int = 64,
    eos_id: int = 2,
    sampling: bool = False,
    compute_dtype: str = "bfloat16",
) -> tuple[L.KVCache, jax.Array, jax.Array, jax.Array, jax.Array,
           jax.Array, jax.Array]:
    """Up to ``k_dyn`` fused decode steps over all S slots — greedy, or
    (with the static ``sampling`` flag) per-slot greedy-or-nucleus so
    resident requests can carry their own temperature/top_p.

    ``k_dyn`` is a TRACED scalar: the host picks every chunk's length
    (adaptive scheduling — short chunks near predicted completions so
    freed slots refill promptly, long ones when every resident request
    has far to go) without a retrace per length. The loop also exits the
    moment every slot is done, so a draining pool never pays for the
    full dispatch. ``rem`` is the device-side per-slot budget: a slot
    freezes (done) when its budget is spent, which both bounds the cache
    frontier (no overrun past the slot width under pipelined dispatch)
    and lets the host schedule ahead of the fetch — budget exhaustion is
    deterministic, so "this slot is free after the in-flight chunk" is
    known at dispatch time. Finished slots emit ``eos_id`` and stop
    advancing their frontier (their stale writes land at a frozen
    position and are overwritten on readmission).

    Returns (cache, cur_lens, last_tok, done, rem, tokens [S, k_max],
    steps_run)."""
    dt = jnp.dtype(compute_dtype)
    cfg = model_cfg.llm
    S = cur_lens.shape[0]
    llm = params["llm"]
    if adapters is not None:
        # per-slot tenant adapters: gathered once per chunk (bank rows are
        # ~r/d of the base layer bytes — noise next to the KV streams),
        # then every one of the fused steps runs row-batched LoRA
        from avsr_tpu.infer.adapters import inject_lora, select_lora
        llm = inject_lora(llm, select_lora(adapters, adapter_ids))

    def cond(carry):
        _, _, _, done, _, _, j = carry
        return (j < k_dyn) & ~jnp.all(done)

    def body(carry):
        cache, cur, last, done, rem, out, j = carry
        emb = L.embed_tokens(llm, last[:, None], dt)
        logits, cache = L.llama_decode_step(
            llm, cfg, x=emb, cache=cache, cur_lens=cur,
            lora=model_cfg.lora if model_cfg.lora.use_lora else None,
            compute_dtype=dt)
        if sampling:
            pick = _slot_sample(logits.astype(jnp.float32), temps, top_ps,
                                jax.random.fold_in(rng, j))
        else:
            pick = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eos_id, pick)
        out = jax.lax.dynamic_update_slice_in_dim(
            out, nxt[:, None], j, axis=1)
        active = (~done).astype(jnp.int32)
        cur = cur + active
        rem = rem - active
        done = done | (nxt == eos_id) | (rem <= 0)
        return cache, cur, nxt, done, rem, out, j + 1

    out0 = jnp.full((S, k_max), eos_id, jnp.int32)
    cache, cur_lens, last_tok, done, rem, out, steps = jax.lax.while_loop(
        cond, body,
        (cache, cur_lens, last_tok, done, rem, out0,
         jnp.zeros((), jnp.int32)))
    return cache, cur_lens, last_tok, done, rem, out, steps


@functools.partial(jax.jit, donate_argnums=(0,))
def install_rows(cache: L.KVCache, rows: L.KVCache, idxs: jax.Array,
                 slots: jax.Array) -> L.KVCache:
    """Scatter staged rows into pool slots — cache only, no slot state
    (the DRAFT cache of speculative serving installs through this; the
    target cache's install() threads the shared slot state as well)."""
    k = cache.k.at[:, slots].set(rows.k[:, idxs])
    v = cache.v.at[:, slots].set(rows.v[:, idxs])
    ks, vs = cache.k_scale, cache.v_scale
    if rows.quantized:
        ks = ks.at[:, slots].set(rows.k_scale[:, idxs])
        vs = vs.at[:, slots].set(rows.v_scale[:, idxs])
    return L.KVCache(k, v, ks, vs)


@functools.partial(
    jax.jit,
    static_argnames=("model_cfg", "draft_model_cfg", "k_rounds", "gamma",
                     "eos_id", "compute_dtype"),
    donate_argnums=(3, 4))
def decode_chunk_spec(
    params: Params,
    draft_params: Params,
    model_cfg: ModelConfig,
    cache: L.KVCache,              # target slot cache
    d_cache: L.KVCache,            # draft slot cache (same layout)
    cur_lens: jax.Array,           # [S] cache frontier per slot (= P+n-1)
    last_tok: jax.Array,           # [S] newest emitted token e_{n-1}
    prev_tok: jax.Array,           # [S] e_{n-2} (draft catch-up tail)
    gap: jax.Array,                # [S] draft-unconsumed tail size (1|2)
    fresh: jax.Array,              # [S] bool — admitted since last chunk
    done: jax.Array,               # [S] bool
    *,
    k_rounds: int = 4,
    gamma: int = 4,
    eos_id: int = 2,
    compute_dtype: str = "bfloat16",
    draft_model_cfg: ModelConfig | None = None,
) -> tuple[L.KVCache, L.KVCache, jax.Array, jax.Array, jax.Array,
           jax.Array, jax.Array, jax.Array, jax.Array]:
    """``k_rounds`` speculative rounds over all S slots (greedy only):
    each round drafts ``gamma`` tokens per slot with the quantized
    self-draft, verifies them in ONE [S, gamma+1] target prefill pass
    (models.llama.llama_prefill_continue), and accepts the longest
    argmax-matching prefix + the target's bonus token — per-slot
    raggedness throughout, token-for-token identical to the greedy chunk
    (infer.speculative's loop at slot granularity; budgets/EOS truncation
    stay host-side exactly like :func:`decode_chunk`).

    Returns (cache, d_cache, cur_lens, last_tok, prev_tok, gap, done,
    tokens [S, k_rounds*(gamma+1)] eos-padded, n_new [S] valid counts).
    Done/idle slots keep re-verifying at a frozen frontier; their writes
    land in finished/free rows that install() fully overwrites."""
    dt = jnp.dtype(compute_dtype)
    cfg = model_cfg.llm
    # the draft may be shallower (layer-skip early exit) — its decode
    # steps and cache walk its OWN depth; positions/heads match the
    # target's, so the shared slot frontier stays a single cur_lens
    dcfg = (draft_model_cfg or model_cfg).llm
    lora = model_cfg.lora if model_cfg.lora.use_lora else None
    S = cur_lens.shape[0]
    G = gamma
    cap = k_rounds * (G + 1)
    # admitted slots start with only e0 pending for the draft
    prev_tok = jnp.where(fresh, last_tok, prev_tok)
    gap = jnp.where(fresh, 1, gap)
    dllm = draft_params["llm"]

    def round_body(r, carry):
        cache, d_cache, cur, last, prev, gap, done, out, cpos = carry
        # -- draft catch-up: feed the <=2 pending tail tokens (decode
        # steps keep the quantized draft on the fused qmatmul path; see
        # infer.speculative for why not a T=2 prefill). gap==1 makes step
        # A an idempotent rewrite of step B's position.
        tokA = jnp.where(gap == 2, prev, last)[:, None]
        posA = jnp.maximum(jnp.where(gap == 2, cur - 1, cur), 0)

        # Skip step A when NO slot needs the gap-2 correction — it is then
        # an idempotent rewrite of step B's position for every slot (same
        # reasoning as infer.speculative's catch-up skip).
        def _catch_up(dc):
            _, dc = L.llama_decode_step(
                dllm, dcfg, x=L.embed_tokens(dllm, tokA, dt),
                cache=dc, cur_lens=posA, compute_dtype=dt)
            return dc

        d_cache = jax.lax.cond(jnp.any(gap == 2), _catch_up,
                               lambda dc: dc, d_cache)
        dlog, d_cache = L.llama_decode_step(
            dllm, dcfg, x=L.embed_tokens(dllm, last[:, None], dt),
            cache=d_cache, cur_lens=cur, compute_dtype=dt)

        def draft_step(carry, j):
            dlog, d_cache = carry
            tok = jnp.argmax(dlog, axis=-1).astype(jnp.int32)
            dlog2, d_cache = L.llama_decode_step(
                dllm, dcfg, x=L.embed_tokens(dllm, tok[:, None], dt),
                cache=d_cache, cur_lens=cur + 1 + j, compute_dtype=dt)
            return (dlog2, d_cache), tok

        (_, d_cache), drafts = jax.lax.scan(
            draft_step, (dlog, d_cache), jnp.arange(G))
        drafts = drafts.T                                  # [S, G]

        # -- verify: one target pass over [e_{n-1}, d_1..d_G] ------------
        ver = jnp.concatenate([last[:, None], drafts], axis=1)
        vh, cache = L.llama_prefill_continue(
            params["llm"], cfg, x=L.embed_tokens(params["llm"], ver, dt),
            cache=cache, base_lens=cur,
            tail_lens=jnp.full((S,), G + 1, jnp.int32),
            lora=lora, compute_dtype=dt)
        vlog = L.compute_logits(params["llm"], cfg, vh)    # [S, G+1, V]
        a = jnp.argmax(vlog, axis=-1).astype(jnp.int32)

        # -- accept longest matching prefix + bonus ----------------------
        match = drafts == a[:, :G]
        m = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
        j = jnp.arange(G + 1)[None, :]
        cand_ok = j <= m[:, None]
        hit_eos = ((a == eos_id) & cand_ok).astype(jnp.int32)
        emit = cand_ok & (jnp.cumsum(hit_eos, axis=1) - hit_eos == 0) \
            & ~done[:, None]
        n_emit = jnp.sum(emit.astype(jnp.int32), axis=1)   # [S]

        idx = jnp.clip(cpos[:, None] + j, 0, cap - 1)
        vals = jnp.where(emit, a, jnp.take_along_axis(out, idx, axis=1))
        out = out.at[jnp.arange(S)[:, None], idx].set(vals)

        last_new = jnp.where(
            n_emit > 0,
            jnp.take_along_axis(a, jnp.maximum(n_emit - 1, 0)[:, None],
                                axis=1)[:, 0], last)
        prev_new = jnp.where(
            n_emit >= 2,
            jnp.take_along_axis(a, jnp.maximum(n_emit - 2, 0)[:, None],
                                axis=1)[:, 0],
            jnp.where(n_emit == 1, last, prev))
        done = done | jnp.any(emit & (a == eos_id), axis=1)
        gap = jnp.where(done, gap, jnp.where(n_emit == G + 1, 2, 1))
        return (cache, d_cache, cur + n_emit, last_new, prev_new, gap,
                done, out, cpos + n_emit)

    out0 = jnp.full((S, cap), eos_id, jnp.int32)
    (cache, d_cache, cur_lens, last_tok, prev_tok, gap, done, out,
     n_new) = jax.lax.fori_loop(
        0, k_rounds, round_body,
        (cache, d_cache, cur_lens, last_tok, prev_tok, gap, done, out0,
         jnp.zeros((S,), jnp.int32)))
    return (cache, d_cache, cur_lens, last_tok, prev_tok, gap, done, out,
            n_new)


@jax.jit
def mask_done(done: jax.Array, rem: jax.Array,
              mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Force slots done (host-side cancels): one tiny dispatch that lands
    in the device queue between the chunks around it, so a cancelled
    request stops decoding without waiting for its chunk to be fetched."""
    return done | mask, jnp.where(mask, 0, rem)


@dataclass
class _Slot:
    req: int | None = None         # request index, None = free
    tokens: list | None = None     # generated ids so far (incl. first)
    budget: int = 0


@dataclass
class _Req:
    """Host bookkeeping for one request (pipelined schedule). Tokens
    arrive at chunk FETCH time, routed by the per-chunk (slot, req)
    snapshot — a slot may already host a successor request by then."""

    tokens: list
    budget: int
    finished: bool = False


@dataclass
class _Chunk:
    """A dispatched-but-unfetched decode chunk. ``admits`` carries the
    installs dispatched just before it (their first tokens ride the same
    fetch); ``snap`` maps slots to the requests resident at dispatch."""

    out: jax.Array                 # [S, k_max] device
    steps: jax.Array               # scalar device — steps actually run
    k: int                         # steps requested (k_dyn)
    snap: list                     # [(slot, req_id)]
    admits: list                   # [(group meta, tok0_dev)]


class _Fetcher:
    """One background thread that device_gets chunk outputs. On a
    high-latency link (tunneled PJRT) a fetch pays ~tens of ms of RTT
    even for 2 KB of tokens, and it FIFO-serializes behind the queued
    successor chunk — fetched inline, that RTT lands on the scheduler's
    critical path once per chunk. Off-thread, it overlaps the next
    chunk's compute and dispatch. Results come back in submit order."""

    def __init__(self):
        import queue as _queue
        import threading
        self._in: _queue.Queue = _queue.Queue()
        self._out: _queue.Queue = _queue.Queue()
        self._th = threading.Thread(target=self._run, daemon=True)
        self._th.start()

    def submit(self, chunk: "_Chunk") -> None:
        self._in.put(chunk)

    def _run(self) -> None:
        while True:
            c = self._in.get()
            if c is None:
                return
            try:
                fetched = jax.device_get(
                    (c.out, c.steps, [t for _, t in c.admits]))
                self._out.put((c, fetched, None))
            except Exception as e:      # noqa: BLE001 — surfaced to caller
                self._out.put((c, None, e))

    def done(self, block: bool = False):
        """Next (chunk, (out, steps, admit tok0s)) in submit order, or
        None; re-raises fetch errors."""
        import queue as _queue
        try:
            c, fetched, err = self._out.get(block)
        except _queue.Empty:
            return None
        if err is not None:
            raise err
        return c, fetched

    def close(self) -> None:
        self._in.put(None)


class _PrepWorker:
    """One background thread that featurizes admission groups (WAV
    decode + collate + the host->device copy) so the scheduler thread
    never blocks on host prep — staged prefills stay one batch ahead in
    WALL time, not just in dispatch order."""

    def __init__(self, featurize_fn):
        import queue as _queue
        import threading
        self._in: _queue.Queue = _queue.Queue()
        self._out: _queue.Queue = _queue.Queue()
        self._fn = featurize_fn
        self._th = threading.Thread(target=self._run, daemon=True)
        self._th.start()

    def submit(self, group: list) -> None:
        self._in.put(group)

    def _run(self) -> None:
        while True:
            group = self._in.get()
            if group is None:
                return
            try:
                self._out.put((group, self._fn([s for _, s, *_ in group]),
                               None))
            except Exception as e:      # noqa: BLE001 — surfaced to caller
                self._out.put((group, None, e))

    def ready(self, block: bool = False):
        """Next (group, featurized batch) or None; re-raises prep errors."""
        import queue as _queue
        try:
            group, batch, err = self._out.get(block)
        except _queue.Empty:
            return None
        if err is not None:
            raise err
        return group, batch

    def close(self) -> None:
        self._in.put(None)                # this request's max_new_tokens


@dataclass
class _Staged:
    """A prefilled batch waiting for pool slots. ``meta`` entries are
    (req, budget, temperature, top_p); rows/tok0/plens live on device."""
    meta: list
    rows: L.KVCache
    tok0: jax.Array
    plens: jax.Array
    next: int = 0                  # first unconsumed row
    d_rows: L.KVCache | None = None    # draft prefill rows (spec mode)

    @property
    def remaining(self) -> int:
        return len(self.meta) - self.next


class ServingEngine:
    """Continuous-batching driver over a fixed pool of S slots.

    Online interface: :meth:`submit` enqueues a request (with its own
    budget/temperature/top_p) at any time — including while earlier
    requests are mid-decode — and :meth:`step` advances the pool by one
    schedule iteration (refill from staged prefills, one K-token decode
    chunk, one sync), returning whichever requests finished. Offline
    convenience: :meth:`transcribe` submits a whole list and steps until
    done, returning generated ids in input order (EOS included, as
    generate_tokens reports lengths). Short utterances leave early, long
    ones keep their slot, the batch never drains to refill.
    """

    def __init__(self, params: Params, cfg: AVSRConfig, tok, *,
                 num_slots: int = 8, max_new_tokens: int | None = None,
                 k_steps: int = 16, cache_len: int | None = None,
                 seed: int = 0, adapter_bank: Params | None = None,
                 draft_params: Params | None = None, spec_gamma: int = 0,
                 spec_rounds: int = 4, admission: str = "budget",
                 draft_model_cfg=None, pipeline_depth: int = 2):
        self.params = params
        self.cfg = cfg
        self.tok = tok
        self.S = num_slots
        # admission="budget" packs each staging group around the longest
        # remaining budgets (LJF — co-resident slots drain together, so
        # the pool never trails one long request while short slots idle);
        # the oldest queued request is always included, so nothing
        # starves. "fifo" admits strictly in submit order.
        if admission not in ("budget", "fifo"):
            raise ValueError("admission must be 'budget' or 'fifo'")
        self.admission = admission
        # speculative serving (decode.speculative at slot granularity):
        # a quantized self-draft (infer.speculative.make_draft_params)
        # proposes spec_gamma tokens per slot per round; one [S, gamma+1]
        # target verify pass accepts the longest matching prefix + bonus.
        # Token-exact vs the greedy chunk; greedy-only workloads.
        self._spec = spec_gamma > 0
        self._draft = draft_params
        self.spec_gamma = spec_gamma
        self.spec_rounds = spec_rounds
        if self._spec:
            if draft_params is None:
                raise ValueError("spec_gamma > 0 needs draft_params "
                                 "(infer.speculative.make_draft_params)")
            if adapter_bank is not None:
                raise ValueError(
                    "speculative serving does not compose with a LoRA "
                    "adapter bank (the self-draft merges ONE adapter)")
            if cfg.decode.kv_cache_dtype == "int8":
                raise ValueError(
                    "speculative serving needs a full-precision slot "
                    "cache (verify re-prefills into it); unset "
                    "decode.kv_cache_dtype")
            # the draft may be the full-depth self-draft OR a layer-skip
            # slice (make_layerskip_draft, decode.spec_draft_layers): the
            # engine carries a SECOND slot-cache geometry for the draft
            # ([L_draft, S, ...]) — only heads/dims must match the target
            # (the layer-skip draft reuses the target's own blocks, so
            # they always do)
            dcfg = draft_model_cfg or cfg.model
            if (len(draft_params["llm"]["layers"])
                    != dcfg.llm.n_layers):
                raise ValueError(
                    f"draft depth {len(draft_params['llm']['layers'])} "
                    f"does not match draft_model_cfg.llm.n_layers="
                    f"{dcfg.llm.n_layers} — pass the ModelConfig that "
                    "make_layerskip_draft returned")
            tl, dl = cfg.model.llm, dcfg.llm
            if (dl.n_kv_heads, dl.d_model, dl.n_heads) != (
                    tl.n_kv_heads, tl.d_model, tl.n_heads):
                raise ValueError(
                    "speculative serving needs a draft sharing the "
                    "target's head geometry (layer-skip/quantized "
                    "self-drafts do); an alien draft architecture is "
                    "speculative_generate territory")
            self._draft_cfg = dcfg
        else:
            self._draft_cfg = cfg.model
        # multi-tenant LoRA serving (infer.adapters): [K, ...] bank; every
        # request picks a row via submit(adapter=...), mixed freely in the
        # pool. Needs the raw (unfused, lora-bearing) base tree: proj()
        # applies the grafted per-row leaves only where lora is wired in.
        self._bank = adapter_bank
        self._n_adapters = 0
        if adapter_bank is not None:
            from avsr_tpu.infer.adapters import bank_size, select_lora
            self._validate_adapter_base()
            self._check_adapter_structure(select_lora(adapter_bank, 0))
            self._n_adapters = bank_size(adapter_bank)
        self.max_new = max_new_tokens or cfg.decode.max_new_tokens
        self.k_steps = k_steps
        self.k_max = k_steps       # adaptive chunk-length cap (pipelined)
        llm = cfg.model.llm
        hd = llm.d_model // llm.n_heads
        if cache_len is None:
            # worst prefix: prompt + the largest feature bucket (features
            # never exceed mel frames; the slack absorbs connector choices)
            prompt = len(tok.encode(cfg.model.prompt, add_bos=True))
            cache_len = prompt + cfg.data.audio_buckets[-1] + self.max_new
        self.M = -(-cache_len // 128) * 128
        shape = (llm.n_layers, self.S, llm.n_kv_heads, hd, self.M)
        self._kv_int8 = cfg.decode.kv_cache_dtype == "int8"
        if self._kv_int8:
            # int8 slot cache halves the decode-loop HBM stream; staged
            # rows quantize at install with per-slot scales (models.llama
            # decode writes reuse them), matching the static int8 path
            sshape = (llm.n_layers, self.S, llm.n_kv_heads, 1, 1)
            self.cache = L.KVCache(
                jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                jnp.ones(sshape, jnp.bfloat16), jnp.ones(sshape, jnp.bfloat16))
        else:
            dt = jnp.dtype(cfg.runtime.compute_dtype)
            self.cache = L.KVCache(jnp.zeros(shape, dt), jnp.zeros(shape, dt))
        if self._spec:
            # the draft's own slot-cache geometry: same rows/heads/width,
            # its OWN depth (layer-skip drafts are shallower)
            dshape = (self._draft_cfg.llm.n_layers, self.S,
                      llm.n_kv_heads, hd, self.M)
            dt = jnp.dtype(cfg.runtime.compute_dtype)
            self.d_cache = L.KVCache(jnp.zeros(dshape, dt),
                                     jnp.zeros(dshape, dt))
        # Slot STATE lives on device and is threaded value-to-value
        # through install/decode_chunk dispatches (never fetched on the
        # scheduling path); the spec path keeps the legacy numpy mirrors
        # it syncs each chunk.
        self.d_cur = jnp.zeros((self.S,), jnp.int32)
        self.d_last = jnp.full((self.S,), tok.eos_id, jnp.int32)
        self.d_done = jnp.ones((self.S,), bool)    # all slots start idle
        self.d_rem = jnp.zeros((self.S,), jnp.int32)
        # legacy numpy mirrors (speculative schedule only)
        self.cur_lens = np.zeros((self.S,), np.int32)
        self.last_tok = np.full((self.S,), tok.eos_id, np.int32)
        self.done = np.ones((self.S,), bool)
        # speculative slot state: e_{n-2} tail + draft-pending gap; slots
        # admitted since the last chunk reset these via the `fresh` mask
        self.prev_tok = np.full((self.S,), tok.eos_id, np.int32)
        self.spec_gap = np.ones((self.S,), np.int32)
        self._fresh = np.zeros((self.S,), bool)
        self.slots = [_Slot() for _ in range(self.S)]   # spec schedule
        # pipelined schedule: slot -> resident request id, plus the
        # host's PREDICTED remaining budget per slot (budget exhaustion
        # is deterministic, so "free after the in-flight chunk" is known
        # at dispatch time; EOS finishes are learned one fetch later)
        self.slot_rid: list[int | None] = [None] * self.S
        self._pred_rem = np.zeros((self.S,), np.int64)
        self._reqs: dict[int, _Req] = {}
        # dispatch-ahead window: chunks in flight before the scheduler
        # blocks on a fetch. Depth 2 fully hides the fetch RTT once the
        # chunk compute exceeds it (depth 1 re-serializes every fetch
        # behind the successor chunk on a FIFO link); higher depths only
        # delay EOS-freed-slot refills and online result latency.
        self.pipeline_depth = max(pipeline_depth, 1)
        self._fetcher: _Fetcher | None = None
        self._inflight_n = 0       # chunks dispatched, not yet absorbed
        self._prep: _PrepWorker | None = None
        self._prep_rows = 0        # rows handed to the prep worker
        # per-slot sampling params are pure host state: the host knows a
        # request's temperature at scheduling time, so they ride into the
        # jitted calls as inputs and never round-trip
        self.slot_temps = np.zeros((self.S,), np.float32)
        self.slot_tops = np.ones((self.S,), np.float32)
        self.slot_adapter = np.zeros((self.S,), np.int32)
        self._sampling = False     # static trace flag for this workload
        self._base_key = jax.random.key(seed)
        self._rng_calls = 0        # fold counter: unique subkey per call
        self._pending_admits: list = []    # (group, tok0_dev) awaiting fetch
        self._staged: deque[_Staged] = deque()    # prefilled, pre-install
        # online request queue: (req_id, sample, budget, temp, top_p,
        # adapter); req ids are monotonically increasing submit order
        self._queue: deque = deque()
        self._next_req = 0
        self._outstanding: set[int] = set()
        self._cancelled: set[int] = set()   # staged/admitted, swept in step
        self._finished: dict[int, list[int]] = {}   # awaiting collection
        # telemetry
        self.chunks_run = 0        # decode_chunk invocations
        self.stages_run = 0        # stage (batched prefill) invocations
        self.installs_run = 0      # install (scatter) invocations
        self.requests_done = 0     # requests completed across transcribes
        self.requests_cancelled = 0  # requests abandoned via cancel()
        self.tokens_emitted = 0    # tokens returned (incl. first + EOS)
        self.decode_steps_total = 0  # chunk loop iterations actually run
        self.slot_capacity = 0     # decode_steps_total * S (fetched)

    # -- host-side scheduling --------------------------------------------

    def _featurize(self, samples: list[Sample]):
        from dataclasses import replace

        from avsr_tpu.data.audio_io import load_audio
        samples = [
            # manifest datasets defer WAV decode to the batch loader; the
            # engine admits straight from Samples, so decode inline
            replace(s, audio=load_audio(
                s.audio_path, max_samples=self.cfg.data.max_audio_length))
            if s.audio is None and s.audio_path else s
            for s in samples
        ]
        prompt_ids = self.tok.encode(self.cfg.model.prompt, add_bos=True)
        hb = collate(samples, self.cfg.data, prompt_ids, self.tok.pad_id)
        return featurize(hb, self.cfg.runtime.compute_dtype,
                         audio_frontend_for(self.cfg.model),
                         image_stats_for(self.cfg.model))

    def _next_key(self) -> jax.Array:
        self._rng_calls += 1
        return jax.random.fold_in(self._base_key, self._rng_calls)

    def _stage_group(
            self,
            group: list[tuple[int, Sample, int, float, float, int]],
            batch=None,
    ) -> None:
        """Prefill (req, sample, budget, temperature, top_p, adapter)
        tuples in ONE batched :func:`stage` call, independent of slot
        availability. Callers pass power-of-2 group sizes so the jit trace
        count stays bounded at {1,2,4,...} x media buckets. Dispatched
        asynchronously — the prefill computes on device while earlier
        decode chunks are still in flight. ``batch`` is the already-
        featurized group from the prep worker; without it the host
        featurizes inline (spec schedule + warmup)."""
        if batch is None:
            batch = self._featurize([s for _, s, *_ in group])
        rows, tok0, plens = stage(
            self.params, self.cfg.model, batch,
            jnp.asarray([g[3] for g in group], jnp.float32),
            jnp.asarray([g[4] for g in group], jnp.float32),
            self._next_key(),
            self._bank,
            (jnp.asarray([g[5] for g in group], jnp.int32)
             if self._bank is not None else None),
            cache_len=self.M,
            cache_dtype=(self.cfg.runtime.compute_dtype if self._kv_int8
                         else str(self.cache.k.dtype)),
            quantize=self._kv_int8, sampling=self._sampling,
            compute_dtype=self.cfg.runtime.compute_dtype,
            use_pallas=self.cfg.runtime.use_pallas)
        meta = [(req, budget, t, p, aid)
                for req, _, budget, t, p, aid in group]
        d_rows = None
        if self._spec:
            # draft prefill of the same prefixes: the self-draft tree
            # carries the target's encoders/connectors/embeddings
            # unchanged (make_draft_params only rewrites the llm
            # projections), so stage() with draft params reproduces the
            # identical prefix and prefills the draft cache rows. Its
            # logits/tok0 are discarded — the first token is the
            # target's. (The encode pass runs twice per staged batch;
            # staging is overlapped with decode chunks, so this buys
            # simplicity for a few ms of hidden prefill time.)
            d_rows, _, _ = stage(
                self._draft, self._draft_cfg, batch,
                jnp.zeros((len(group),), jnp.float32),
                jnp.ones((len(group),), jnp.float32),
                self._next_key(), None, None,
                cache_len=self.M,
                cache_dtype=self.cfg.runtime.compute_dtype,
                quantize=False, sampling=False,
                compute_dtype=self.cfg.runtime.compute_dtype,
                use_pallas=self.cfg.runtime.use_pallas)
        self._staged.append(_Staged(meta, rows, tok0, plens, d_rows=d_rows))
        self.stages_run += 1

    def _install_group(self, staged: _Staged, slots: list[int]) -> None:
        """Scatter the next ``len(slots)`` staged rows into free pool
        slots (one :func:`install` call, no model compute). The spec
        schedule threads its synced numpy state mirrors; the pipelined
        schedule threads the live device arrays."""
        g = len(slots)
        idxs = list(range(staged.next, staged.next + g))
        meta = staged.meta[staged.next:staged.next + g]
        staged.next += g
        # COPY-on-write, never in-place: device_put of a numpy array can
        # be zero-copy on some backends (XLA:CPU), so an in-place write
        # here would retroactively change the adapter/temperature rows an
        # already-dispatched (pipelined, unfetched) chunk reads — observed
        # as a wrong-tenant final chunk in the multi-adapter exactness
        # test. Fresh arrays leave every in-flight dispatch's buffers
        # untouched.
        self.slot_temps = self.slot_temps.copy()
        self.slot_tops = self.slot_tops.copy()
        self.slot_adapter = self.slot_adapter.copy()
        for slot, (_, _, t, p, aid) in zip(slots, meta):
            self.slot_temps[slot] = t
            self.slot_tops[slot] = p
            self.slot_adapter[slot] = aid
        budgets = jnp.asarray([m[1] for m in meta], jnp.int32)
        if self._spec:
            (self.cache, self.cur_lens, self.last_tok, self.done,
             self.d_rem, t0_dev) = install(
                self.cache, staged.rows,
                jnp.asarray(idxs, jnp.int32), jnp.asarray(slots, jnp.int32),
                self.cur_lens, self.last_tok, self.done, self.d_rem,
                budgets, staged.tok0, staged.plens,
                eos_id=self.tok.eos_id)
            self.d_cache = install_rows(
                self.d_cache, staged.d_rows,
                jnp.asarray(idxs, jnp.int32), jnp.asarray(slots, jnp.int32))
            self._fresh[slots] = True
        else:
            (self.cache, self.d_cur, self.d_last, self.d_done,
             self.d_rem, t0_dev) = install(
                self.cache, staged.rows,
                jnp.asarray(idxs, jnp.int32), jnp.asarray(slots, jnp.int32),
                self.d_cur, self.d_last, self.d_done, self.d_rem,
                budgets, staged.tok0, staged.plens,
                eos_id=self.tok.eos_id)
            for slot, (rid, budget, *_) in zip(slots, meta):
                self.slot_rid[slot] = rid
                self._pred_rem[slot] = max(budget - 1, 0)
        group = [(slot, req, None, budget)
                 for slot, (req, budget, *_) in zip(slots, meta)]
        self._pending_admits.append((group, t0_dev))
        self.installs_run += 1

    # -- pipelined schedule (greedy/sampled) -------------------------------

    def _admission_group(self) -> list:
        """Pop the next power-of-2-width admission group. Budget-aware
        packing (admission="budget"): keep the oldest request (nothing
        starves), fill the rest with the LONGEST remaining budgets so
        co-resident slots drain together instead of one long request
        trailing an otherwise-idle pool (LJF)."""
        q = self._queue
        w = 1 << (min(self.S, len(q)).bit_length() - 1)
        if self.admission == "budget" and len(q) > w:
            head = q.popleft()
            rest = sorted(q, key=lambda r: -r[2])
            take = rest[:w - 1]
            taken = {r[0] for r in take}
            kept = [r for r in q if r[0] not in taken]
            q.clear()
            q.extend(kept)
            return [head] + take
        return [q.popleft() for _ in range(w)]

    def _pump_staging(self) -> None:
        """Queue -> prep worker (host featurize, off this thread) ->
        :func:`stage` dispatch, keeping up to ~2 pools' worth of prefilled
        rows ahead of the slots."""
        if self._queue and self._prep is None:
            self._prep = _PrepWorker(self._featurize)
        ahead = self._prep_rows + sum(st.remaining for st in self._staged)
        while self._queue and ahead < 2 * self.S:
            group = self._admission_group()
            self._prep.submit(group)
            self._prep_rows += len(group)
            ahead += len(group)
        while self._prep is not None:
            item = self._prep.ready()
            if item is None:
                break
            group, batch = item
            self._prep_rows -= len(group)
            self._stage_group(group, batch)

    def _refill_pipelined(self) -> None:
        """Install staged rows into every free slot. A slot is free when
        its resident request was finalized (EOS learned at fetch) or its
        budget is provably spent by the already-dispatched chunks
        (pred_rem == 0) — the latter lets admission run a full chunk
        ahead of the fetch."""
        self._pump_staging()
        while True:
            free = [s for s in range(self.S)
                    if self.slot_rid[s] is None or self._pred_rem[s] == 0]
            if not free or not self._staged:
                break
            st = self._staged[0]
            g = 1 << (min(len(free), st.remaining).bit_length() - 1)
            self._install_group(st, free[:g])
            if st.remaining == 0:
                self._staged.popleft()

    def _pick_k(self) -> int:
        """Chunk length for the next dispatch: run exactly to the next
        predicted slot completion when more work is waiting (freed slots
        refill promptly -> high utilization), or to the farthest one when
        draining (the early-exit loop stops at the true finish). Floor 8:
        below that the per-dispatch overhead costs more than the idle
        slot-steps it saves."""
        occ = self._pred_rem[[s for s in range(self.S)
                              if self.slot_rid[s] is not None]]
        occ = occ[occ > 0]
        if occ.size == 0:
            return 0
        waiting = bool(self._queue) or bool(self._staged) \
            or self._prep_rows > 0
        k = int(occ.min()) if waiting else int(occ.max())
        return min(max(k, 8), self.k_max)

    def _dispatch_chunk(self, k: int) -> None:
        bank = self._bank
        aids = jnp.asarray(self.slot_adapter) if bank is not None else None
        (self.cache, self.d_cur, self.d_last, self.d_done, self.d_rem,
         out, steps) = decode_chunk(
            self.params, self.cfg.model, self.cache, self.d_cur,
            self.d_last, self.d_done, self.d_rem, np.int32(k),
            self.slot_temps, self.slot_tops, self._next_key(), bank, aids,
            k_max=self.k_max, eos_id=self.tok.eos_id,
            sampling=self._sampling,
            compute_dtype=self.cfg.runtime.compute_dtype)
        snap = [(s, rid) for s, rid in enumerate(self.slot_rid)
                if rid is not None]
        if self._fetcher is None:
            self._fetcher = _Fetcher()
        self._fetcher.submit(_Chunk(out, steps, k, snap,
                                    self._pending_admits))
        self._inflight_n += 1
        self._pending_admits = []
        self.chunks_run += 1
        for s, _ in snap:
            self._pred_rem[s] = max(self._pred_rem[s] - k, 0)

    def _drain_fetches(self, finished: dict, block: bool = False) -> None:
        """Absorb fetched chunks (in dispatch order). Non-blocking: take
        whatever the fetcher thread has finished; blocking: wait for
        exactly one."""
        while self._inflight_n > 0:
            item = self._fetcher.done(block)
            if item is None:
                return
            self._inflight_n -= 1
            self._absorb(*item, finished)
            if block:
                return

    def _absorb_admits(self, admits: list, finished: dict,
                       tok0s=None) -> None:
        if tok0s is None:
            tok0s = jax.device_get([t for _, t in admits])
        for (group, _), t0 in zip(admits, tok0s):
            for j, (slot, rid, _, budget) in enumerate(group):
                req = self._reqs.get(rid)
                if req is None or req.finished:
                    continue
                if rid in self._cancelled:
                    self._cancel_resident(rid, slot)
                    continue
                req.tokens.append(int(t0[j]))
                if (t0[j] == self.tok.eos_id or budget <= 1):
                    self._finalize(rid, slot, finished)

    def _absorb(self, chunk: _Chunk, fetched, finished: dict) -> None:
        """Route one fetched chunk's tokens to its requests (the fetcher
        thread already paid the device_get; this is pure host
        bookkeeping)."""
        out, steps, tok0s = fetched
        self._absorb_admits(chunk.admits, finished, tok0s)
        steps = int(steps)
        self.decode_steps_total += steps
        self.slot_capacity += steps * self.S
        eos = self.tok.eos_id
        for slot, rid in chunk.snap:
            req = self._reqs.get(rid)
            if req is None or req.finished:
                continue
            if rid in self._cancelled:
                self._cancel_resident(rid, slot)
                continue
            for t in out[slot, :steps]:
                if (len(req.tokens) >= req.budget
                        or (req.tokens and req.tokens[-1] == eos)):
                    break
                req.tokens.append(int(t))
            if (len(req.tokens) >= req.budget
                    or (req.tokens and req.tokens[-1] == eos)):
                self._finalize(rid, slot, finished)

    def _finalize(self, rid: int, slot: int, finished: dict) -> None:
        req = self._reqs.pop(rid)
        req.finished = True
        ids = req.tokens[: req.budget]
        finished[rid] = ids
        self._finished[rid] = ids
        self._outstanding.discard(rid)
        self.requests_done += 1
        self.tokens_emitted += len(ids)
        if self.slot_rid[slot] == rid:     # not already readmitted
            self.slot_rid[slot] = None
            self._pred_rem[slot] = 0

    def _cancel_resident(self, rid: int, slot: int) -> None:
        """Free a resident slot whose request was cancelled: one tiny
        :func:`mask_done` dispatch freezes the row immediately (dataflow
        order keeps it ahead of any later install into the same slot)."""
        self._cancelled.discard(rid)
        self._reqs.pop(rid, None)
        if self.slot_rid[slot] == rid:
            mask = np.zeros((self.S,), bool)
            mask[slot] = True
            self.d_done, self.d_rem = mask_done(self.d_done, self.d_rem,
                                                mask)
            self.slot_rid[slot] = None
            self._pred_rem[slot] = 0
        self.requests_cancelled += 1

    def _step_pipelined(self) -> dict[int, list[int]]:
        finished: dict[int, list[int]] = {}
        # absorb whatever the fetcher already returned, so EOS-freed
        # slots refill this very step
        self._drain_fetches(finished)
        self._refill_pipelined()
        # pool idle but prep still featurizing: wait for it rather than
        # spinning through empty steps
        if (self._inflight_n == 0 and not self._staged
                and self._prep_rows > 0
                and all(r is None for r in self.slot_rid)):
            group, batch = self._prep.ready(block=True)
            self._prep_rows -= len(group)
            self._stage_group(group, batch)
            self._refill_pipelined()
        k = self._pick_k()
        if k > 0:
            self._dispatch_chunk(k)
        # bound the dispatch-ahead window; on drain (nothing dispatched)
        # absorb everything outstanding
        depth = self.pipeline_depth if k > 0 else 0
        while self._inflight_n > depth:
            self._drain_fetches(finished, block=True)
        if self._inflight_n == 0 and self._pending_admits:
            # installs with no chunk behind them (e.g. budget-1 requests)
            self._absorb_admits(self._pending_admits, finished)
            self._pending_admits = []
        return finished

    # -- spec schedule (legacy synchronous loop) ---------------------------

    def _refill(self) -> None:
        """Fill every free slot from staged rows, staging new batches from
        the request queue as needed, then stage ONE batch ahead so its
        prefill overlaps the coming decode chunks. Stage widths and
        install group sizes are power-of-2 (bounded trace count)."""
        free = [s for s in range(self.S) if self.slots[s].req is None]
        q = self._queue

        def stage_next() -> None:
            w = 1 << (min(self.S, len(q)).bit_length() - 1)
            self._stage_group([q.popleft() for _ in range(w)])

        while free:
            if not self._staged:
                if not q:
                    break
                stage_next()
            st = self._staged[0]
            g = 1 << (min(len(free), st.remaining).bit_length() - 1)
            self._install_group(st, free[:g])
            free = free[g:]
            if st.remaining == 0:
                self._staged.popleft()    # staging buffer freed
        if not self._staged and q:
            stage_next()                   # prefill-ahead behind the chunk

    def _sync(self, extra=None):
        """One blocking device fetch: pending admissions' first tokens +
        the current slot-state arrays (+ ``extra``, returned fetched),
        installed into host bookkeeping. Host-side arrays become writable
        numpy again after this."""
        pend = self._pending_admits
        self._pending_admits = []
        tok0s, cur_h, last_h, done_h, extra_h = jax.device_get(
            ([t for _, t in pend], self.cur_lens, self.last_tok, self.done,
             extra))
        # device_get may hand back read-only views; the host loop mutates
        # these in place
        self.cur_lens = np.array(cur_h, np.int32)
        self.last_tok = np.array(last_h, np.int32)
        self.done = np.array(done_h, bool)
        for (group, _), tok0 in zip(pend, tok0s):
            for j, (slot, req, _, budget, *_unused) in enumerate(group):
                self.slots[slot] = _Slot(req, [int(tok0[j])], budget)
        return extra_h

    def warmup(self, sample: Sample, *, sampling: bool = False) -> None:
        """Pre-compile every stage width and install group size
        (1, 2, 4, ..., S) and the decode chunk for one media shape, then
        reset the pool — so a timed or latency-sensitive run never hits a
        compile mid-flight. Pass ``sampling=True`` to precompile the
        per-slot-sampling traces instead of the greedy ones."""
        self._sampling = sampling
        spec = self._spec
        cur = self.cur_lens if spec else self.d_cur
        last = self.last_tok if spec else self.d_last
        done = self.done if spec else self.d_done
        w = 1
        while w <= self.S:
            self._stage_group([(-1, sample, 1, 0.0, 1.0, 0)] * w)
            st = self._staged.pop()
            # every install trace this width can hit: G in {1, 2, ..., w}
            g = 1
            while g <= w:
                # cache is donated — keep the threaded state (tok0 of these
                # warmup installs is discarded with the pool reset below)
                (self.cache, cur, last, done, self.d_rem, _) = install(
                    self.cache, st.rows,
                    jnp.zeros((g,), jnp.int32),
                    jnp.asarray(list(range(g)), jnp.int32),
                    cur, last, done, self.d_rem,
                    jnp.full((g,), 4, jnp.int32), st.tok0, st.plens,
                    eos_id=self.tok.eos_id)
                g *= 2
            if spec:
                self.d_cache = install_rows(
                    self.d_cache, st.d_rows,
                    jnp.zeros((w,), jnp.int32),
                    jnp.asarray(list(range(w)), jnp.int32))
            w *= 2
        if spec:
            (self.cache, self.d_cache, cur, last,
             self.prev_tok, self.spec_gap, done, _,
             _) = decode_chunk_spec(
                self.params, self._draft, self.cfg.model, self.cache,
                self.d_cache, cur, last,
                jnp.asarray(self.prev_tok), jnp.asarray(self.spec_gap),
                jnp.asarray(self._fresh), done,
                k_rounds=self.spec_rounds, gamma=self.spec_gamma,
                eos_id=self.tok.eos_id,
                compute_dtype=self.cfg.runtime.compute_dtype,
                draft_model_cfg=self._draft_cfg)
            self._fresh[:] = False
        else:
            # ONE trace covers every chunk length (k_dyn is data, and the
            # while_loop's early exit makes the all-done case the same
            # executable)
            (self.cache, cur, last, done, self.d_rem,
             out, _) = decode_chunk(
                self.params, self.cfg.model, self.cache, cur,
                last, done, self.d_rem, np.int32(2),
                self.slot_temps, self.slot_tops,
                self._next_key(), self._bank,
                (jnp.asarray(self.slot_adapter) if self._bank is not None
                 else None),
                k_max=self.k_max,
                eos_id=self.tok.eos_id, sampling=self._sampling,
                compute_dtype=self.cfg.runtime.compute_dtype)
            jax.block_until_ready(out)
        # reset the pool: warmup rows are garbage by design
        self.slots = [_Slot() for _ in range(self.S)]
        self.slot_rid = [None] * self.S
        self._pred_rem[:] = 0
        if spec:
            self.cur_lens = np.zeros((self.S,), np.int32)
            self.last_tok = np.full((self.S,), self.tok.eos_id, np.int32)
            self.done = np.ones((self.S,), bool)
            self.prev_tok = np.full((self.S,), self.tok.eos_id, np.int32)
            self.spec_gap = np.ones((self.S,), np.int32)
        else:
            self.d_done = jnp.ones((self.S,), bool)
            self.d_rem = jnp.zeros((self.S,), jnp.int32)
            self.d_cur, self.d_last = cur, last
        self._pending_admits = []
        self.reset_stats()         # warmup work is not serving work

    def reset(self) -> None:
        """Hard-reset the pool after a fault: drop every queued, staged,
        and resident request (their ids simply never finish — the caller
        is responsible for failing them out, e.g. infer.server does), and
        return every slot to idle so scheduling can resume. Device
        buffers (cache) are kept — stale columns are masked/overwritten
        by design."""
        self.slots = [_Slot() for _ in range(self.S)]
        self.done = np.ones((self.S,), bool)
        self.cur_lens = np.zeros((self.S,), np.int32)
        self.last_tok = np.full((self.S,), self.tok.eos_id, np.int32)
        self.prev_tok = np.full((self.S,), self.tok.eos_id, np.int32)
        self.spec_gap = np.ones((self.S,), np.int32)
        self._fresh = np.zeros((self.S,), bool)
        self.slot_rid = [None] * self.S
        self._pred_rem[:] = 0
        self._reqs.clear()
        self.d_cur = jnp.zeros((self.S,), jnp.int32)
        self.d_last = jnp.full((self.S,), self.tok.eos_id, jnp.int32)
        self.d_done = jnp.ones((self.S,), bool)
        self.d_rem = jnp.zeros((self.S,), jnp.int32)
        while self._inflight_n > 0:      # drop in-flight chunk fetches
            try:
                self._fetcher.done(block=True)
            except Exception:            # noqa: BLE001 — resetting anyway
                pass
            self._inflight_n -= 1
        while self._prep_rows > 0:       # drop in-flight prep results
            try:
                group, _ = self._prep.ready(block=True)
                self._prep_rows -= len(group)
            except Exception:            # noqa: BLE001 — resetting anyway
                self._prep_rows = 0
        self._pending_admits = []
        self._staged = deque()
        self._queue.clear()
        self._outstanding.clear()
        self._cancelled.clear()

    def reset_stats(self) -> None:
        self.chunks_run = self.stages_run = self.installs_run = 0
        self.requests_done = self.tokens_emitted = 0
        self.requests_cancelled = 0
        self.decode_steps_total = self.slot_capacity = 0

    # -- online API ------------------------------------------------------

    def submit(self, sample: Sample, *, max_new: int | None = None,
               temperature: float = 0.0, top_p: float = 1.0,
               adapter: int = 0) -> int:
        """Enqueue one request — at any time, including mid-decode — and
        return its id. ``temperature <= 0`` decodes greedily; a sampled
        submission switches the pool to the sampling trace (greedy rows
        within it still take exact argmax, and the flag stays on until
        the pool drains and an all-greedy workload resets it).
        ``adapter`` picks the request's LoRA bank row (engines built with
        ``adapter_bank``; tenants mix freely within the pool)."""
        if not (0 <= adapter < max(1, self._n_adapters)):
            raise ValueError(
                f"adapter {adapter} out of range: this engine serves "
                f"{self._n_adapters or 'no'} adapter(s)")
        if temperature > 0.0 and self._spec:
            raise ValueError(
                "speculative serving is greedy-only: the rejection-"
                "sampling scheme needs per-slot draft distributions the "
                "slot chunk does not carry (use a non-spec engine for "
                "sampled workloads)")
        rid = self._next_req
        self._next_req += 1
        if temperature > 0.0:
            self._sampling = True
        budget = max_new or self.max_new
        self._queue.append((rid, sample, budget,
                            float(temperature), float(top_p), int(adapter)))
        self._reqs[rid] = _Req([], budget)
        self._outstanding.add(rid)
        return rid

    def outstanding(self) -> int:
        """Requests submitted but not yet finished (queued + staged +
        resident)."""
        return len(self._outstanding)

    def _validate_adapter_base(self) -> None:
        """Bank/onboarding preconditions on the resident base tree."""
        if not self.cfg.model.lora.use_lora:
            raise ValueError(
                "adapter serving needs model.lora.use_lora=true (the "
                "bank rows ride the model's LoRA wiring)")
        if "qkv" in self.params["llm"]["layers"][0]:
            raise ValueError(
                "adapter serving needs the raw params layout, not the "
                "fused decode one (fuse_decode_layout concatenates "
                "projections the per-proj adapters must target)")

    def _check_adapter_structure(self, adapter: Params) -> None:
        """An adapter must mirror extract_lora(base) exactly — a silently
        mis-shaped tree (e.g. from a different-depth config) would
        truncate inject_lora's layer walk."""
        from avsr_tpu.infer.adapters import extract_lora
        want = jax.tree.structure(extract_lora(self.params["llm"]))
        got = jax.tree.structure(adapter)
        if got != want:
            raise ValueError(
                "adapter tree does not match this model's LoRA wiring "
                f"(got {got}, want {want})")

    def add_adapter(self, adapter: Params) -> int:
        """Onboard a LoRA tenant at runtime (no restart, no drain) and
        return its id. ``adapter`` is an infer.adapters.extract_lora tree
        matching this model's LoRA wiring.

        On a bank-less engine the first call CREATES the bank with row 0
        reserved as the base tree's OWN resident adapter (its lora
        leaves, which every request was already applying via proj) —
        resident id-0 requests keep their numerics bit-exact through the
        mid-flight trace switch, whether those leaves are zero-init or a
        trained fine-tune. The new tenant lands at id 1. Capacity grows
        by doubling with zero rows: each new capacity (and the
        bank-less->banked switch) retraces the stage/chunk calls once;
        between growths onboarding is a pure row scatter."""
        from avsr_tpu.infer import adapters as ad

        if self._bank is None:
            self._validate_adapter_base()
            self._check_adapter_structure(adapter)
            self._bank = ad.stack_lora_bank(
                [ad.extract_lora(self.params["llm"]), adapter])
            self._n_adapters = 2
            return 1
        self._check_adapter_structure(adapter)
        k, cap = self._n_adapters, ad.bank_size(self._bank)
        if k == cap:     # double capacity with zero rows (one retrace)
            self._bank = jax.tree.map(
                lambda b: jnp.concatenate([b, jnp.zeros_like(b)]),
                self._bank)
        self._bank = jax.tree.map(lambda b, a: b.at[k].set(a),
                                  self._bank, adapter)
        self._n_adapters = k + 1
        return k

    def cancel(self, req_id: int) -> bool:
        """Abandon a live request and reclaim its slot capacity — the
        serving fix for timed-out/disconnected clients whose requests
        would otherwise keep decoding into the void. Queued requests are
        reclaimed immediately and resident ones at this call (their row
        is masked out of the next chunk); staged/mid-admission ones are
        swept at the next step() boundary (one already-paid prefill is
        discarded). Returns False if the id is unknown or already
        finished (collect its ids instead)."""
        if req_id not in self._outstanding:
            return False
        self._outstanding.discard(req_id)
        for i, item in enumerate(self._queue):
            if item[0] == req_id:          # never staged: free reclaim
                del self._queue[i]
                self._reqs.pop(req_id, None)
                self.requests_cancelled += 1
                return True
        if self._spec:
            for s, st in enumerate(self.slots):
                if st.req == req_id:
                    self.slots[s] = _Slot()
                    self.done[s] = True    # masked out of the next chunk
                    self.requests_cancelled += 1
                    return True
        else:
            for s, rid in enumerate(self.slot_rid):
                if rid == req_id:          # resident: freeze the row now
                    self._cancel_resident(req_id, s)
                    return True
        self._cancelled.add(req_id)        # staged / pending admission
        return True

    def _sweep_cancelled(self) -> None:
        """Free slots whose request was cancelled while staged or
        mid-admission (they become resident only at a later install)."""
        if not self._cancelled:
            return
        for s, st in enumerate(self.slots):
            if st.req is not None and st.req in self._cancelled:
                self._cancelled.discard(st.req)
                self.slots[s] = _Slot()
                self.done[s] = True
                self.requests_cancelled += 1

    def step(self) -> dict[int, list[int]]:
        """One schedule iteration; returns the requests that finished this
        step ({req_id: generated ids}).

        Greedy/sampled engines run the PIPELINED schedule: refill free
        slots (installs are pure scatters; prefill compute ran ahead,
        MXU-wide, on the prep thread's staged batches), dispatch the next
        adaptive-length chunk, THEN fetch the previous chunk's tokens —
        the device always has the successor queued when it finishes a
        chunk, so the host's fetch/schedule latency never idles the chip
        (the round-2 engine lost its wall-clock win exactly there).
        Results therefore surface one step after their chunk runs.

        Speculative engines keep the synchronous schedule (draft state
        lives in host mirrors synced each chunk)."""
        if self._spec:
            return self._step_spec()
        return self._step_pipelined()

    def _step_spec(self) -> dict[int, list[int]]:
        finished: dict[int, list[int]] = {}

        def harvest(slot: int) -> None:
            st = self.slots[slot]
            ids = st.tokens[: st.budget]
            finished[st.req] = ids
            self._finished[st.req] = ids
            self._outstanding.discard(st.req)
            self._reqs.pop(st.req, None)   # spec tracks tokens in _Slot
            self.requests_done += 1
            self.tokens_emitted += len(ids)
            self.slots[slot] = _Slot()

        for s in range(self.S):
            st = self.slots[s]
            if self.done[s] and st.req is not None:
                if (self.tok.eos_id in st.tokens
                        or len(st.tokens) >= st.budget):
                    harvest(s)
        self._refill()
        if (all(st.req is None for st in self.slots)
                and not self._pending_admits):
            return finished                          # pool is idle
        if self._sampling:
            raise ValueError("speculative serving is greedy-only "
                             "(submit with temperature=0)")
        fresh = jnp.asarray(self._fresh)
        self._fresh[:] = False
        (self.cache, self.d_cache, self.cur_lens, self.last_tok,
         self.prev_tok, self.spec_gap, self.done, out,
         n_new) = decode_chunk_spec(
            self.params, self._draft, self.cfg.model, self.cache,
            self.d_cache, self.cur_lens, self.last_tok,
            jnp.asarray(self.prev_tok), jnp.asarray(self.spec_gap),
            fresh, self.done,
            k_rounds=self.spec_rounds, gamma=self.spec_gamma,
            eos_id=self.tok.eos_id,
            compute_dtype=self.cfg.runtime.compute_dtype,
            draft_model_cfg=self._draft_cfg)
        self.chunks_run += 1
        # the ONLY blocking point per chunk: admissions' first tokens,
        # slot state, and the chunk's tokens come back in one fetch
        toks, prev_h, gap_h, n_new = self._sync(
            (out, self.prev_tok, self.spec_gap, n_new))
        self.prev_tok = np.array(prev_h, np.int32)
        self.spec_gap = np.array(gap_h, np.int32)
        self._sweep_cancelled()        # admitted-then-cancelled rows
        for s, st in enumerate(self.slots):
            if st.req is None:
                continue
            valid = toks[s][: int(n_new[s])]
            for t in valid:
                if len(st.tokens) >= st.budget:
                    break
                if st.tokens and st.tokens[-1] == self.tok.eos_id:
                    break
                st.tokens.append(int(t))
            # budget exhausted: free the slot even without EOS
            if (len(st.tokens) >= st.budget
                    or st.tokens[-1] == self.tok.eos_id):
                self.done[s] = True
        return finished

    def collect(self, req_id: int) -> list[int] | None:
        """Pop a finished request's ids (None if not finished yet).

        Finished results are retained until collected — long-running
        callers that consume :meth:`step`'s return dict directly must
        still collect (or ``_finished`` grows without bound; infer.server
        does this per finish)."""
        return self._finished.pop(req_id, None)

    # -- offline convenience ---------------------------------------------

    def transcribe(self, samples,
                   max_new_per_request: list[int] | None = None,
                   temperature_per_request: list[float] | None = None,
                   top_p_per_request: list[float] | None = None,
                   adapter_per_request: list[int] | None = None,
                   ) -> list[list[int]]:
        """Run every request through the slot pool; returns generated ids
        per request, in input order. ``max_new_per_request`` optionally
        caps each request individually (a serving-queue budget — the host
        frees the slot the moment a request's budget is spent, just as it
        does on EOS). ``temperature_per_request`` / ``top_p_per_request``
        give each request its own sampling knobs (temperature <= 0 =
        greedy); a workload with any sampled request uses the sampling
        decode trace, and greedy rows within it still take exact argmax."""
        n_req = len(samples)
        budgets = max_new_per_request or [self.max_new] * n_req
        temps_l = temperature_per_request or [0.0] * n_req
        tops_l = top_p_per_request or [1.0] * n_req
        aids_l = adapter_per_request or [0] * n_req
        if not self._outstanding:        # idle pool: trace flag resets to
            self._sampling = False       # what this workload needs
        ids = [self.submit(s, max_new=b, temperature=t, top_p=p, adapter=a)
               for s, b, t, p, a in zip(samples, budgets, temps_l, tops_l,
                                        aids_l)]
        want = set(ids)
        while want & self._outstanding:
            self.step()
        return [self._finished.pop(i) for i in ids]

    def stats(self) -> dict:
        """Serving telemetry across this engine's lifetime. Chunk
        utilization = useful tokens emitted by decode chunks / chunk-step
        slot capacity — the fraction of batch-wide decode work that
        produced a kept token (the rest is idle/finished-slot padding; the
        whole point of continuous batching is keeping this high on ragged
        workloads)."""
        if self._spec:
            # spec mode: a chunk's capacity is its verify positions
            # (rounds x (gamma+1) per slot)
            cap = self.chunks_run * self.spec_rounds * (self.spec_gamma
                                                        + 1) * self.S
            steps = self.chunks_run * self.spec_rounds
        else:
            # pipelined mode: the chunk loop reports steps actually run
            # (adaptive k_dyn + the all-done early exit)
            cap = self.slot_capacity
            steps = self.decode_steps_total
        chunk_tokens = self.tokens_emitted - self.requests_done  # tok0s are
        return {                                # prefill-stage outputs
            "requests_done": self.requests_done,
            "requests_cancelled": self.requests_cancelled,
            "tokens_emitted": self.tokens_emitted,
            "chunks_run": self.chunks_run,
            "decode_steps": steps,
            "stages_run": self.stages_run,
            "installs_run": self.installs_run,
            "chunk_utilization": round(chunk_tokens / cap, 4) if cap else 0.0,
        }
