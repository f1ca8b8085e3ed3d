"""Datasets: manifest-driven AVSR samples + a synthetic no-media source.

The host side stays deliberately thin (TPU-first): it decodes media and
emits raw uint8 frames / float32 waveforms; log-mel and image normalization
run on-device (ops.logmel / ops.image), replacing the reference's per-sample
WhisperProcessor and per-frame CLIPProcessor host loops
(simple_dataset.py:158-183, 213-249).

``ManifestAVSRDataset`` keeps the reference's resilience semantics
(simple_dataset.py:133-286): a corrupt/missing sample triggers a retry-walk
over up to 10 subsequent indices before raising.

``SyntheticAVSRDataset`` is the DummyDataset equivalent (dataset.py:332-439)
— deterministic random samples with byte-tokenizable transcripts, so the
full pipeline (incl. WER eval) runs with zero media assets.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any

import numpy as np

from avsr_tpu.core.config import DataConfig
from avsr_tpu.core.registry import DATASETS
from avsr_tpu.data.audio_io import load_audio
from avsr_tpu.data.manifest import load_labels, load_manifest
from avsr_tpu.data.video_io import load_frames

MAX_RETRY_WALK = 10   # ref simple_dataset.py:133


@dataclass
class Sample:
    utt_id: str
    audio: np.ndarray | None       # float32 [n_samples] @ 16 kHz
    frames: np.ndarray | None      # uint8 [T, S, S, 3] (host-resized)
    text: str
    tokens: list[int]              # label token ids (no BOS, with EOS)
    # Set instead of ``audio`` when decode is deferred to the loader's
    # native batch path (avsr_tpu.native.decode_wav_batch).
    audio_path: str | None = None


class ManifestAVSRDataset:
    def __init__(self, cfg: DataConfig, tokenizer, split: str = "train",
                 modality: str = "both", image_size: int = 224,
                 defer_audio: bool | None = None) -> None:
        """``defer_audio`` (default: native library available) leaves WAV
        decode to the DataLoader, which batch-decodes each collate group in
        C++ worker threads (native.decode_wav_batch) instead of per-sample
        Python — the TPU-feeding answer to the reference's per-sample
        soundfile reads (simple_dataset.py:158-183)."""
        manifest_name = getattr(cfg, f"{split.replace('valid', 'val')}_manifest",
                                None) or f"{split}.tsv"
        labels_name = getattr(cfg, f"{split.replace('valid', 'val')}_labels",
                              None) or f"{split}.wrd"
        base = _discover_data_dir(Path(cfg.path), manifest_name)
        self.root, self.entries = load_manifest(base / manifest_name)
        self.texts = load_labels(base / labels_name)
        if len(self.texts) != len(self.entries):
            raise ValueError(
                f"{split}: {len(self.entries)} manifest rows vs "
                f"{len(self.texts)} label lines")
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.modality = modality
        self.image_size = image_size
        if defer_audio is None:
            from avsr_tpu import native
            defer_audio = native.available()
        self.defer_audio = defer_audio

    def __len__(self) -> int:
        return len(self.entries)

    def length_hints(self, idx: int) -> tuple[int, int]:
        """(audio_samples, video_frames) from manifest metadata alone — no
        media IO. Multi-host loaders use these to agree on a batch's static
        bucket without any host loading another host's samples
        (mesh.multihost); the TSV carries both columns natively
        (ref simple_dataset.py:74-108)."""
        e = self.entries[idx]
        return e.num_samples, e.num_frames

    def __getitem__(self, idx: int) -> Sample:
        last_err: Exception | None = None
        for probe in range(MAX_RETRY_WALK):
            i = (idx + probe) % len(self.entries)
            try:
                return self._load(i)
            except Exception as e:  # noqa: BLE001 — ref retry-walk semantics
                last_err = e
        raise IOError(
            f"failed to load sample {idx} after {MAX_RETRY_WALK} retries"
        ) from last_err

    def _load(self, i: int) -> Sample:
        e = self.entries[i]
        text = self.texts[i]
        audio = frames = audio_path = None
        if self.modality in ("audio", "both"):
            path = self.root / e.audio_path
            if self.defer_audio:
                if not path.is_file():   # keep retry-walk on missing files
                    raise FileNotFoundError(path)
                audio_path = str(path)
            else:
                audio = load_audio(path,
                                   max_samples=self.cfg.max_audio_length)
        if self.modality in ("video", "both"):
            raw = load_frames(self.root / e.video_path,
                              self.cfg.max_video_length)
            frames = resize_crop_frames(raw, self.image_size)
        tokens = self.tokenizer.encode(text, add_eos=True)
        tokens = tokens[: self.cfg.max_label_length - 1] + [self.tokenizer.eos_id] \
            if len(tokens) > self.cfg.max_label_length else tokens
        return Sample(e.utt_id, audio, frames, text, tokens,
                      audio_path=audio_path)


def _discover_data_dir(path: Path, manifest_name: str) -> Path:
    """Ref path discovery: root, root/train, root/data (simple_dataset.py:516-537)."""
    for cand in (path, path / "train", path / "data"):
        if (cand / manifest_name).exists():
            return cand
    raise FileNotFoundError(f"{manifest_name} not found under {path}")


def resize_crop_frames(frames: np.ndarray, size: int) -> np.ndarray:
    """uint8 [T,H,W,3] -> uint8 [T,size,size,3]: shortest-side resize +
    center crop on host; normalization happens on-device so the host->device
    transfer stays uint8 (4x less PCIe/DMA than f32).

    Fast path: one native multithreaded C++ call over the whole clip
    (native.resize_crop_frames) — replaces the per-frame Python loop the
    reference was criticized for (SURVEY.md §3.1 hot loop #2). Measured:
    cv2's SIMD bilinear wins ~2x on one core, the native threads win beyond
    ~4 cores (production data hosts), so the dispatch is core-count-based;
    either side also covers the other's absence."""
    import os

    T, H, W, _ = frames.shape
    if H == size and W == size:
        return frames

    try:
        import cv2
    except ImportError:
        cv2 = None

    from avsr_tpu import native
    if cv2 is None or (os.cpu_count() or 1) >= 4:
        out = native.resize_crop_frames(frames, size)
        if out is not None:
            return out
    if cv2 is None:
        raise RuntimeError("frame resize needs cv2 or the native library")
    if H <= W:
        nh, nw = size, max(size, int(round(W * size / H)))
    else:
        nh, nw = max(size, int(round(H * size / W))), size
    out = np.empty((T, nh, nw, 3), np.uint8)
    for t in range(T):
        out[t] = cv2.resize(frames[t], (nw, nh), interpolation=cv2.INTER_LINEAR)
    top, left = (nh - size) // 2, (nw - size) // 2
    return np.ascontiguousarray(out[:, top:top + size, left:left + size])


# ---------------------------------------------------------------------------
# Synthetic dataset (DummyDataset equivalent, ref dataset.py:332-439)
# ---------------------------------------------------------------------------

_WORDS = ("the quick brown fox jumps over a lazy dog while seven wizards "
          "brew hazy potions at midnight near the old stone bridge").split()


class SyntheticAVSRDataset:
    """Deterministic random AV samples with real text transcripts."""

    def __init__(self, cfg: DataConfig, tokenizer, split: str = "train",
                 modality: str = "both", image_size: int = 224,
                 seed: int = 0) -> None:
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.modality = modality
        self.image_size = image_size
        self.size = cfg.synthetic_size if split == "train" else max(
            cfg.synthetic_size // 5, 2)
        self.seed = seed + (0 if split == "train" else 10_000)

    def __len__(self) -> int:
        return self.size

    def transcript(self, idx: int) -> str:
        rng = np.random.default_rng(self.seed + idx)
        n = int(rng.integers(2, 8))
        return " ".join(rng.choice(_WORDS, n))

    def length_hints(self, idx: int) -> tuple[int, int]:
        """(audio_samples, video_frames) without materializing the sample.
        Replays __getitem__'s draw order exactly (transcript() uses its own
        independent rng), so the hints are exact — which is what makes the
        multi-host loader tests able to assert byte-identical batches."""
        rng = np.random.default_rng(self.seed + idx)
        n_a = n_v = 0
        if self.modality in ("audio", "both"):
            n_a = int(rng.integers(8000, min(self.cfg.max_audio_length,
                                             48000)))
        if self.modality in ("video", "both"):
            n_v = int(rng.integers(4, min(self.cfg.max_video_length, 16) + 1))
        return n_a, n_v

    def __getitem__(self, idx: int) -> Sample:
        rng = np.random.default_rng(self.seed + idx)
        text = self.transcript(idx)
        audio = frames = None
        if self.modality in ("audio", "both"):
            n = int(rng.integers(8000, min(self.cfg.max_audio_length, 48000)))
            t = np.arange(n, dtype=np.float32) / 16000.0
            f0 = float(rng.uniform(80, 300))
            audio = (0.3 * np.sin(2 * np.pi * f0 * t)
                     + 0.05 * rng.standard_normal(n)).astype(np.float32)
        if self.modality in ("video", "both"):
            T = int(rng.integers(4, min(self.cfg.max_video_length, 16) + 1))
            frames = rng.integers(
                0, 256, (T, self.image_size, self.image_size, 3)).astype(np.uint8)
        tokens = self.tokenizer.encode(text, add_eos=True)
        if len(tokens) > self.cfg.max_label_length:
            tokens = (tokens[: self.cfg.max_label_length - 1]
                      + [self.tokenizer.eos_id])
        return Sample(f"synthetic/{idx:05d}", audio, frames, text, tokens)


@DATASETS.register("manifest")
def _build_manifest(cfg: DataConfig, tokenizer, **kw) -> Any:
    return ManifestAVSRDataset(cfg, tokenizer, **kw)


@DATASETS.register("synthetic")
def _build_synthetic(cfg: DataConfig, tokenizer, **kw) -> Any:
    return SyntheticAVSRDataset(cfg, tokenizer, **kw)


def build_dataset(cfg: DataConfig, tokenizer, **kw):
    name = "synthetic" if cfg.synthetic else "manifest"
    return DATASETS.get(name)(cfg, tokenizer, **kw)
