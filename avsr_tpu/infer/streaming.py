"""Streaming AVSR transcription: chunked feeds, LocalAgreement commits.

The reference is strictly offline — decode.py batches whole utterances
(scripts/clip_whisper/decode.py:405-440); there is no incremental path.
For live captioning the standard recipe for encoder-decoder speech models
(WhisperFlow, arXiv:2412.11272; whisper_streaming's LocalAgreement-n) is:

  * keep an audio (and optional video-frame) buffer; on every chunk,
    re-encode the buffered media and greedy-decode a full hypothesis —
    cheap here: the encoder forward is ~2 ms and decode is bounded by
    ``max_new_tokens``, with length-bucketed shapes so jit caches one
    executable per bucket, not per chunk;
  * COMMIT only the longest common prefix of the last ``agree_n``
    hypotheses (a token the model keeps producing as more audio arrives
    is stable); committed tokens are monotonic — once emitted they are
    never retracted;
  * when the buffer would outgrow the decode window (the largest
    audio/video length bucket), the current window's full hypothesis is
    committed and the buffer resets — long streams become a sequence of
    window segments (slight context loss at the seam, standard for
    streaming ASR);
  * ``finalize()`` decodes the complete buffer once more and APPENDS its
    suffix past the committed prefix. When the running hypotheses were
    prefix-stable (the common case for greedy decoding over growing
    audio), the result equals the offline transcript; when they were
    not, the already-emitted prefix wins — monotonicity is the contract.

Deltas are emitted as decoded token suffixes (``tok.decode`` of just the
newly committed ids): concatenating them can differ from decoding the
whole sequence at a multi-byte character split across commits, so
``committed_text`` (a decode of all committed tokens) stays the
authoritative transcript.

Blockwise mode (``decode.stream_block_s > 0``, any modality): instead of
re-encoding and re-prefilling the whole buffer every chunk (O(n^2) per
window segment), completed fixed-size media blocks are encoded once and
their connector features frozen into a persistent LLM KV cache
(infer.generate.prefill_extend); each chunk then pays one block encode at
most, a chunked prefill of [un-frozen tail | committed tokens]
(infer.generate.generate_continue), and an EOS-bounded decode of just the
new suffix — flat per-chunk cost across the window. A block spans
``stream_block_s`` seconds of EVERY active modality (audio samples at
16 kHz, video frames at ``decode.stream_video_fps``) — CLIP features are
per-frame and log-mel blocks are time-local, so AV live captioning gets
the same flat-latency path; a block freezes only once BOTH streams have
covered its span (the slower-arriving modality gates it). The trade:
blocks are encoded (and fused) independently, so encoder context and AV
fusion do not span block boundaries (the exact mode, stream_block_s=0,
keeps finalize == offline decode).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.core.config import AVSRConfig
from avsr_tpu.data.dataset import Sample
from avsr_tpu.data.loader import (
    HOP_LENGTH,
    audio_frontend_for,
    collate,
    featurize,
    image_stats_for,
)
from avsr_tpu.infer.generate import (
    generate_continue,
    generate_tokens,
    prefill_extend,
)
from avsr_tpu.models import llama as L


@functools.partial(jax.jit, static_argnames=("model_cfg", "compute_dtype"))
def _encode_features(params, model_cfg, batch, compute_dtype: str):
    """Connector features for one media block (blockwise streaming)."""
    from avsr_tpu.models.avsr import encode

    enc = encode(params, model_cfg, batch,
                 compute_dtype=jnp.dtype(compute_dtype), moe_rowwise=True)
    return enc.features, enc.lengths


def _common_prefix(a: list[int], b: list[int]) -> list[int]:
    out = []
    for x, y in zip(a, b):
        if x != y:
            break
        out.append(x)
    return out


@dataclass
class StreamingTranscriber:
    """Incremental transcription over a growing media buffer.

    ``feed`` returns the text committed by that chunk (possibly empty);
    ``finalize`` flushes the remainder. ``committed_tokens`` /
    ``committed_text`` are monotonic: once committed, never retracted.
    """

    params: object
    cfg: AVSRConfig
    tok: object
    agree_n: int = 2
    _audio: np.ndarray | None = None
    _frames: np.ndarray | None = None
    _hyps: list[list[int]] = field(default_factory=list)
    _committed: list[int] = field(default_factory=list)
    _segment_tokens: list[int] = field(default_factory=list)
    # blockwise mode (decode.stream_block_s > 0): persistent LLM KV cache
    # over [prompt][frozen feature blocks]; per-chunk cost = 1 block encode
    # + tail prefill + decode, flat across the window
    _cache: object | None = None
    _base_len: int = 0             # frozen tokens in the cache
    _frozen_samples: int = 0       # audio samples already frozen as blocks
    _frozen_frames: int = 0        # video frames already frozen as blocks

    def feed(self, audio: np.ndarray | None = None,
             frames: np.ndarray | None = None) -> str:
        """Append a chunk (audio float32 [n] @16 kHz and/or frames uint8
        [T, S, S, 3]) and return newly committed text.

        A chunk larger than the decode window is split into window-sized
        pieces fed in sequence (same time fraction across modalities), so
        no media is ever silently dropped — each piece triggers its own
        rollover/commit as needed."""
        audio = None if audio is None else np.asarray(audio, np.float32)
        frames = None if frames is None else np.asarray(frames, np.uint8)
        n = 1
        if audio is not None:
            n = max(n, -(-audio.shape[0] // self._audio_window))
        if frames is not None:
            n = max(n, -(-frames.shape[0] // self._video_window))
        if n == 1:
            return self._feed_one(audio, frames)
        emitted = ""
        for i in range(n):
            a = (audio[audio.shape[0] * i // n: audio.shape[0] * (i + 1) // n]
                 if audio is not None else None)
            f = (frames[frames.shape[0] * i // n:
                        frames.shape[0] * (i + 1) // n]
                 if frames is not None else None)
            emitted += self._feed_one(a, f)
        return emitted

    def _feed_one(self, audio: np.ndarray | None,
                  frames: np.ndarray | None) -> str:
        emitted = self._maybe_rollover(audio, frames)
        self._buffer(audio, frames)
        if not self._have_media():
            # modality=both with only one stream arrived so far: nothing
            # decodable yet — buffer and wait for the other stream
            return emitted
        hyp = self._hypothesis()
        self._hyps.append(hyp)
        self._hyps = self._hyps[-self.agree_n:]
        if len(self._hyps) == self.agree_n:
            agreed = self._hyps[0]
            for h in self._hyps[1:]:
                agreed = _common_prefix(agreed, h)
            # monotonic: only extend past what is already committed
            if (len(agreed) > len(self._segment_tokens)
                    and agreed[: len(self._segment_tokens)]
                    == self._segment_tokens):
                emitted += self._commit(agreed[len(self._segment_tokens):])
        return emitted

    def finalize(self) -> str:
        """Decode the full buffer once more and append its suffix past
        the committed prefix (see module docstring for the guarantee)."""
        if self._audio is None and self._frames is None:
            return ""
        if not self._have_media():
            # modality=both but one stream never arrived: nothing the
            # fused encoder can decode
            return ""
        full = self._hypothesis()
        return self._commit(full[len(self._segment_tokens):])

    @property
    def committed_tokens(self) -> list[int]:
        return list(self._committed)

    @property
    def committed_text(self) -> str:
        return self.tok.decode(self._committed)

    # -- internals --------------------------------------------------------

    @property
    def _audio_window(self) -> int:
        return self.cfg.data.audio_buckets[-1] * HOP_LENGTH

    @property
    def _video_window(self) -> int:
        return self.cfg.data.video_buckets[-1]

    def _commit(self, new_tokens: list[int]) -> str:
        if not new_tokens:
            return ""
        self._segment_tokens.extend(new_tokens)
        self._committed.extend(new_tokens)
        return self.tok.decode(new_tokens)

    def _maybe_rollover(self, audio, frames) -> str:
        """Segment boundary: if this chunk would push the buffer past the
        decode window (collate truncates to the largest length bucket),
        commit the current window's full transcript and start a fresh
        segment. Keeps every committed token aligned with media the
        decoder actually saw."""
        over_a = (audio is not None and self._audio is not None
                  and self._audio.shape[0] + np.asarray(audio).shape[0]
                  > self._audio_window)
        over_v = (frames is not None and self._frames is not None
                  and self._frames.shape[0] + np.asarray(frames).shape[0]
                  > self._video_window)
        if not (over_a or over_v):
            return ""
        full = self._hypothesis()
        out = self._commit(full[len(self._segment_tokens):])
        self._audio = None
        self._frames = None
        self._hyps = []
        self._segment_tokens = []
        self._cache = None
        self._base_len = 0
        self._frozen_samples = 0
        self._frozen_frames = 0
        return out

    def _buffer(self, audio, frames) -> None:
        if audio is not None:
            audio = np.asarray(audio, np.float32)
            self._audio = (audio if self._audio is None
                           else np.concatenate([self._audio, audio]))
            self._audio = self._audio[: self._audio_window]
        if frames is not None:
            frames = np.asarray(frames, np.uint8)
            self._frames = (frames if self._frames is None
                            else np.concatenate([self._frames, frames]))
            self._frames = self._frames[: self._video_window]

    def _decode_buffer(self) -> list[int]:
        sample = Sample("stream", self._audio, self._frames, "",
                        [self.tok.eos_id])
        prompt_ids = self.tok.encode(self.cfg.model.prompt, add_bos=True)
        hb = collate([sample], self.cfg.data, prompt_ids, self.tok.pad_id)
        batch = featurize(hb, self.cfg.runtime.compute_dtype,
                          audio_frontend_for(self.cfg.model),
                          image_stats_for(self.cfg.model))
        out = generate_tokens(
            self.params, self.cfg.model, batch,
            max_new_tokens=self.cfg.decode.max_new_tokens,
            eos_id=self.tok.eos_id,
            compute_dtype=self.cfg.runtime.compute_dtype,
            use_pallas=self.cfg.runtime.use_pallas,
            kv_cache_dtype=self.cfg.decode.kv_cache_dtype)
        n = int(out.lengths[0])
        toks = [int(t) for t in np.asarray(out.tokens)[0, :n]]
        # drop the trailing EOS from the hypothesis stream
        if toks and toks[-1] == self.tok.eos_id:
            toks = toks[:-1]
        return toks

    # -- blockwise mode (decode.stream_block_s > 0) -----------------------

    @property
    def _blockwise(self) -> bool:
        return self.cfg.decode.stream_block_s > 0

    def _hypothesis(self) -> list[int]:
        return (self._decode_incremental() if self._blockwise
                else self._decode_buffer())

    @property
    def _block_samples(self) -> int:
        # the whole pipeline is 16 kHz (audio_io resamples on ingest;
        # _audio_window above already assumes it via HOP_LENGTH)
        return int(round(self.cfg.decode.stream_block_s * 16000))

    @property
    def _block_frames(self) -> int:
        return max(int(round(self.cfg.decode.stream_block_s
                             * self.cfg.decode.stream_video_fps)), 1)

    @property
    def _needs(self) -> tuple[bool, bool]:
        m = self.cfg.model.modality
        return m in ("audio", "both"), m in ("video", "both")

    def _have_media(self) -> bool:
        """Every stream the modality needs has arrived at least once."""
        need_a, need_v = self._needs
        if need_a and self._audio is None:
            return False
        if need_v and self._frames is None:
            return False
        return True

    def _featurize_media(self, audio: np.ndarray | None,
                         frames: np.ndarray | None):
        """collate+featurize one sample (bucketed static shapes)."""
        sample = Sample("stream", audio, frames, "", [self.tok.eos_id])
        prompt_ids = self.tok.encode(self.cfg.model.prompt, add_bos=True)
        hb = collate([sample], self.cfg.data, prompt_ids, self.tok.pad_id)
        return featurize(hb, self.cfg.runtime.compute_dtype,
                         audio_frontend_for(self.cfg.model),
                         image_stats_for(self.cfg.model))

    def _ensure_cache(self) -> None:
        """First decode of a segment: allocate the persistent KV cache and
        freeze the prompt as its first block. Capacity covers the prompt,
        a full window of features at mel-frame granularity (>= 2x the
        actual count: whisper halves the frame rate and connectors only
        ever downsample — the slack absorbs per-block bucket padding and
        the committed transcript tokens re-fed as tail), and the decode
        budget."""
        if self._cache is not None:
            return
        need_a, need_v = self._needs
        prompt_ids = self.tok.encode(self.cfg.model.prompt, add_bos=True)
        cap = (len(prompt_ids)
               + (self.cfg.data.audio_buckets[-1] if need_a else 0)
               + (self.cfg.data.video_buckets[-1] if need_v else 0)
               + 2 * self.cfg.decode.max_new_tokens + 128)
        M = -(-cap // 128) * 128
        llm = self.cfg.model.llm
        hd = llm.d_model // llm.n_heads
        dt = jnp.dtype(self.cfg.runtime.compute_dtype)
        shape = (llm.n_layers, 1, llm.n_kv_heads, hd, M)
        cache = L.KVCache(jnp.zeros(shape, dt), jnp.zeros(shape, dt))
        emb = L.embed_tokens(self.params["llm"],
                             jnp.asarray([prompt_ids], jnp.int32), dt)
        self._cache = prefill_extend(
            self.params, self.cfg.model, cache,
            jnp.zeros((1,), jnp.int32), emb,
            jnp.asarray([len(prompt_ids)], jnp.int32),
            compute_dtype=self.cfg.runtime.compute_dtype)
        self._base_len = len(prompt_ids)

    def _block_ready(self) -> bool:
        """A block freezes only once EVERY active modality has covered its
        span past the frozen frontier, with a strictly non-empty tail left
        behind (the decoder always conditions on some un-frozen media)."""
        need_a, need_v = self._needs
        ok = True
        if need_a:
            ok &= (self._audio is not None
                   and self._audio.shape[0] - self._frozen_samples
                   > self._block_samples)
        if need_v:
            ok &= (self._frames is not None
                   and self._frames.shape[0] - self._frozen_frames
                   > self._block_frames)
        return ok

    def _freeze_block(self) -> None:
        """Encode one completed block (every active modality's slice of
        the same stream_block_s span, fused block-locally for modality
        'both') and extend the persistent cache."""
        need_a, need_v = self._needs
        a = f = None
        if need_a:
            a = self._audio[self._frozen_samples:
                            self._frozen_samples + self._block_samples]
            self._frozen_samples += self._block_samples
        if need_v:
            f = self._frames[self._frozen_frames:
                             self._frozen_frames + self._block_frames]
            self._frozen_frames += self._block_frames
        batch = self._featurize_media(a, f)
        feat, lens = _encode_features(self.params, self.cfg.model, batch,
                                      self.cfg.runtime.compute_dtype)
        n = int(lens[0])
        M = self._cache.k.shape[-1]
        if self._base_len + feat.shape[1] > M:
            raise RuntimeError(
                f"blockwise stream cache overflow (frozen {self._base_len} "
                f"+ block {feat.shape[1]} > capacity {M}); raise "
                "decode.stream_block_s or shrink data.audio_buckets")
        self._cache = prefill_extend(
            self.params, self.cfg.model, self._cache,
            jnp.asarray([self._base_len], jnp.int32),
            feat, lens.astype(jnp.int32),
            compute_dtype=self.cfg.runtime.compute_dtype)
        self._base_len += n

    def _decode_incremental(self) -> list[int]:
        """Blockwise hypothesis: committed segment tokens (teacher-forced —
        once committed they are never retracted, so re-sampling them buys
        nothing) + a fresh continuation decoded over [frozen blocks | tail].

        Per-chunk cost: one block encode at most (amortized), a chunked
        prefill of [tail features | committed tokens] (parallel, MXU-bound),
        and a decode loop that exits at EOS after roughly the NEW suffix —
        flat across the window, vs the exact mode's full re-encode +
        re-prefill + full-transcript decode every chunk (round-1 VERDICT
        next-step #8)."""
        if self._audio is None and self._frames is None:
            return list(self._segment_tokens)
        self._ensure_cache()
        # freeze completed blocks, always keeping a non-empty tail
        while self._block_ready():
            self._freeze_block()

        need_a, need_v = self._needs
        dt = jnp.dtype(self.cfg.runtime.compute_dtype)
        tail_a = (self._audio[self._frozen_samples:]
                  if need_a and self._audio is not None else None)
        tail_f = (self._frames[self._frozen_frames:]
                  if need_v and self._frames is not None else None)
        batch = self._featurize_media(tail_a, tail_f)
        feat, lens = _encode_features(self.params, self.cfg.model, batch,
                                      self.cfg.runtime.compute_dtype)
        parts = [np.asarray(feat)[0, : int(lens[0])]]
        seg = list(self._segment_tokens)
        # Teacher-force only the last 64 committed tokens as context: with
        # the full transcript re-fed, every chunk's shapes (eager embed
        # gather, packed tail, its host<->device transfers) grew with the
        # transcript — profiled 5.2x late-vs-early chunk latency across a
        # 28 s window, each 64/128-grain crossing paying a fresh compile.
        # A fixed recent-text window keeps every shape constant forever
        # (flat cost), and the model still conditions on ALL audio via the
        # frozen cache — only text context beyond 64 tokens is dropped,
        # the standard streaming-ASR trade.
        ctx = seg[-64:]
        if ctx:
            ids = np.zeros((1, 64), np.int32)
            ids[0, : len(ctx)] = ctx
            emb = L.embed_tokens(self.params["llm"], jnp.asarray(ids), dt)
            parts.append(np.asarray(emb)[0, : len(ctx)])
        tail = np.concatenate(parts, axis=0)
        T = tail.shape[0]
        M = self._cache.k.shape[-1]
        # decode writes land at columns base+T .. base+T+max_new: reserve
        # them, then length-bucket the tail shape for the jit trace (128
        # grain, shrunk to whatever room remains near capacity)
        room = M - self._base_len - self.cfg.decode.max_new_tokens
        if T > room:
            raise RuntimeError(
                f"blockwise stream cache overflow (frozen {self._base_len} "
                f"+ tail {T} + decode budget "
                f"{self.cfg.decode.max_new_tokens} > capacity {M}); raise "
                "decode.stream_block_s or shrink data.audio_buckets")
        Tpad = min(-(-T // 128) * 128, room)
        tail = np.pad(tail, ((0, Tpad - T), (0, 0)))
        out, _ = generate_continue(
            self.params, self.cfg.model, self._cache,
            jnp.asarray([self._base_len], jnp.int32),
            jnp.asarray(tail[None]), jnp.asarray([T], jnp.int32),
            max_new_tokens=self.cfg.decode.max_new_tokens,
            eos_id=self.tok.eos_id,
            compute_dtype=self.cfg.runtime.compute_dtype)
        n = int(out.lengths[0])
        toks = [int(t) for t in np.asarray(out.tokens)[0, :n]]
        if toks and toks[-1] == self.tok.eos_id:
            toks = toks[:-1]
        return seg + toks
