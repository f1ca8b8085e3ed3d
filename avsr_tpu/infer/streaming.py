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
    is stable); committed text never changes afterwards — exactly what a
    caption consumer needs;
  * ``finalize()`` decodes the complete buffer once more and returns the
    full transcript, so the end state matches the offline decoder
    bit-for-bit (greedy decoding is deterministic).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from avsr_tpu.core.config import AVSRConfig
from avsr_tpu.data.dataset import Sample
from avsr_tpu.data.loader import (
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
    ``finalize`` flushes the remainder. ``committed_text`` is monotonic:
    once emitted, text never changes.
    """

    params: object
    cfg: AVSRConfig
    tok: object
    agree_n: int = 2
    _audio: np.ndarray | None = None
    _frames: np.ndarray | None = None
    _hyps: list[list[int]] = field(default_factory=list)
    _committed: list[int] = field(default_factory=list)
    _emitted_chars: int = 0

    def feed(self, audio: np.ndarray | None = None,
             frames: np.ndarray | None = None) -> str:
        """Append a chunk (audio float32 [n] @16 kHz and/or frames uint8
        [T, S, S, 3]) and return newly committed text."""
        self._buffer(audio, frames)
        hyp = self._decode_buffer()
        self._hyps.append(hyp)
        self._hyps = self._hyps[-self.agree_n:]
        if len(self._hyps) == self.agree_n:
            agreed = self._hyps[0]
            for h in self._hyps[1:]:
                agreed = _common_prefix(agreed, h)
            # monotonic: only extend past what is already committed
            if (len(agreed) > len(self._committed)
                    and agreed[: len(self._committed)] == self._committed):
                self._committed = agreed
        return self._emit()

    def finalize(self) -> str:
        """Decode the full buffer once more; afterwards ``committed_text``
        equals the offline greedy transcript of everything fed."""
        if self._audio is None and self._frames is None:
            return ""
        self._committed = self._decode_buffer()
        return self._emit()

    @property
    def committed_text(self) -> str:
        return self.tok.decode(self._committed)

    # -- internals --------------------------------------------------------

    def _buffer(self, audio, frames) -> None:
        if audio is not None:
            audio = np.asarray(audio, np.float32)
            self._audio = (audio if self._audio is None
                           else np.concatenate([self._audio, audio]))
            cap = self.cfg.data.max_audio_length
            if self._audio.shape[0] > cap:      # ref 30 s cap semantics
                self._audio = self._audio[-cap:]
        if frames is not None:
            frames = np.asarray(frames, np.uint8)
            self._frames = (frames if self._frames is None
                            else np.concatenate([self._frames, frames]))
            cap = self.cfg.data.max_video_length
            if self._frames.shape[0] > cap:
                self._frames = self._frames[-cap:]

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

    def _emit(self) -> str:
        text = self.committed_text
        new = text[self._emitted_chars:]
        self._emitted_chars = len(text)
        return new
