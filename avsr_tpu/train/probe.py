"""Startup batch-size probe (ref clip_whisper_trainer.py:976-1003).

The reference doubles the batch until a forward pass OOMs on the GPU. The
TPU version probes the *worst case* instead: one full compiled train step
(fwd+bwd+update, donation on) at the largest configured (audio, video)
bucket pair — if that fits, every real batch fits. Doubles until
RESOURCE_EXHAUSTED or ``max_batch``, returns the largest working size
(a multiple of the mesh's data-parallel ways so sharding stays valid).
"""

from __future__ import annotations

import gc
import logging

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.core.config import AVSRConfig

log = logging.getLogger("avsr.probe")


def _is_oom(err: Exception) -> bool:
    s = str(err)
    return "RESOURCE_EXHAUSTED" in s or "Out of memory" in s or "OOM" in s


def _worst_case_batch(cfg: AVSRConfig, b: int):
    """Largest-bucket synthetic batch of size b (never touches real data)."""
    from avsr_tpu.models.avsr import Batch

    rng = np.random.default_rng(0)
    m = cfg.model
    mel_T = min(cfg.data.audio_buckets[-1], m.whisper.max_frames)
    vid_T = cfg.data.video_buckets[-1]
    Tl = cfg.data.max_label_length
    dt = jnp.dtype(cfg.runtime.compute_dtype)
    audio = m.modality in ("audio", "both")
    video = m.modality in ("video", "both")
    return Batch(
        mel=(jnp.asarray(rng.standard_normal((b, m.whisper.n_mels, mel_T)),
                         jnp.float32) if audio else None),
        mel_lens=jnp.full((b,), mel_T, jnp.int32) if audio else None,
        frames=(jnp.asarray(rng.standard_normal(
            (b, vid_T, 3, m.image_size, m.image_size)), dt)
            if video else None),
        frame_lens=jnp.full((b,), vid_T, jnp.int32) if video else None,
        prompt_tokens=jnp.asarray(
            rng.integers(0, min(m.llm.vocab_size, 1000), (b, 8)), jnp.int32),
        labels=jnp.asarray(
            rng.integers(0, min(m.llm.vocab_size, 1000), (b, Tl)), jnp.int32),
        label_lens=jnp.full((b,), Tl, jnp.int32),
    )


def find_optimal_batch_size(cfg: AVSRConfig, params, *,
                            start: int | None = None,
                            max_batch: int = 512,
                            mesh=None, shard_batch=None) -> int:
    """Doubling probe; returns the largest batch whose worst-case train
    step executes. 0 if even ``start`` OOMs."""
    from avsr_tpu.train.state import create_train_state
    from avsr_tpu.train.step import make_train_step, microbatch

    ways = 1
    if mesh is not None:
        shape = dict(mesh.shape)
        ways = (shape.get("dcn", 1) * shape.get("dp", 1)
                * shape.get("fsdp", 1) * shape.get("ep", 1))
    def _fits(b: int) -> bool:
        # all probe buffers are frame-local: they free when this returns
        try:
            state, tx = create_train_state(params, cfg, total_steps=2)
            if mesh is not None:
                from avsr_tpu.mesh.sharding import shard_state
                state = shard_state(state, mesh)
            step_fn = make_train_step(cfg, tx, mesh)
            batch = microbatch(_worst_case_batch(cfg, b), 1)
            if shard_batch is not None:
                batch = shard_batch(batch)
            state, metrics = step_fn(state, batch, jax.random.key(0))
            jax.block_until_ready(metrics["loss"])
            return True
        except Exception as e:  # noqa: BLE001 — OOM classification below
            if _is_oom(e):
                return False
            raise

    b = max(start or ways, ways)
    best = 0
    while b <= max_batch:
        ok = _fits(b)
        gc.collect()
        if not ok:
            log.info("batch probe: %d OOMs — stopping", b)
            break
        log.info("batch probe: %d fits", b)
        best = b
        b *= 2
    return best
