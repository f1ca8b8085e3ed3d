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
"""

from __future__ import annotations

from dataclasses import dataclass, field

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
from avsr_tpu.infer.generate import generate_tokens


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
        hyp = self._decode_buffer()
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
        full = self._decode_buffer()
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
        full = self._decode_buffer()
        out = self._commit(full[len(self._segment_tokens):])
        self._audio = None
        self._frames = None
        self._hyps = []
        self._segment_tokens = []
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
