"""Jitted train / eval steps with real gradient accumulation and NaN guards.

The reference accepts ``grad_accum_steps`` but steps the optimizer every
batch anyway (clip_whisper_trainer.py:75-78 vs :454-464 — SURVEY.md quirk
table); here accumulation is real: the batch carries a leading
[accum, micro, ...] axis and a ``lax.scan`` averages gradients before one
optimizer step. The reference's NaN-loss skip (trainer:444-451) becomes a
``lax.cond`` that keeps the previous state when the loss is non-finite —
branchless on TPU, no host sync.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from avsr_tpu.core.config import AVSRConfig
from avsr_tpu.models.avsr import Batch, forward
from avsr_tpu.train.state import (
    TrainState,
    combine_trainable,
    partition_trainable,
)


def _loss_fn(params, cfg: AVSRConfig, batch: Batch, rng, mesh=None):
    if (cfg.data.specaugment and rng is not None
            and batch.mel is not None):
        # train-time only (eval paths pass no rng); fused elementwise
        # masking on device, so augmentation costs ~nothing per step
        from avsr_tpu.ops.specaugment import specaugment
        rng, aug_rng = jax.random.split(rng)
        batch = batch._replace(mel=specaugment(
            batch.mel, batch.mel_lens, aug_rng,
            time_masks=cfg.data.spec_time_masks,
            time_width=cfg.data.spec_time_width,
            freq_masks=cfg.data.spec_freq_masks,
            freq_width=cfg.data.spec_freq_width))
    if (cfg.data.video_augment and rng is not None
            and batch.frames is not None):
        # same gating as SpecAugment: training path only, on-device
        from avsr_tpu.ops.videoaug import video_augment
        rng, vrng = jax.random.split(rng)
        batch = batch._replace(frames=video_augment(
            batch.frames, batch.frame_lens, vrng,
            max_shift=cfg.data.vid_max_shift,
            flip=cfg.data.vid_flip,
            brightness=cfg.data.vid_brightness,
            contrast=cfg.data.vid_contrast))
    loss, metrics = forward(
        params, cfg.model, batch,
        compute_dtype=jnp.dtype(cfg.runtime.compute_dtype),
        use_pallas=cfg.runtime.use_pallas,
        remat=cfg.mesh.remat,
        dropout_rng=rng,
        mesh=mesh)
    return loss, metrics


def make_train_step(
    cfg: AVSRConfig,
    tx: optax.GradientTransformation,
    mesh=None,
) -> Callable[[TrainState, Batch, jax.Array], tuple[TrainState, dict[str, Any]]]:
    """Build the jitted train step. Batch leaves: [accum, micro, ...].

    ``weights`` ([accum] f32, summing to 1) sets each micro-batch's share of
    the averaged gradient; None means uniform. The Trainer uses zero weights
    to pad partial accumulation groups (end-of-epoch flush) up to the
    compiled ``accum`` without a recompile.
    """

    def train_step(state: TrainState, batch: Batch, rng: jax.Array,
                   weights: jax.Array | None = None):
        accum = jax.tree_util.tree_leaves(batch)[0].shape[0]
        if weights is None:
            weights = jnp.full((accum,), 1.0 / accum, jnp.float32)

        # Differentiate w.r.t. the trainable partition only: the frozen
        # encoders stay primal-only (no backward graph, no zero-grad
        # buffers in the scan carry) — the requires_grad=False equivalent.
        train_p, frozen_p = partition_trainable(state.params, cfg.model)

        def loss_trainable(tp, mb, mrng):
            return _loss_fn(combine_trainable(tp, frozen_p), cfg, mb, mrng,
                            mesh)

        grad_fn = jax.value_and_grad(loss_trainable, has_aux=True)

        # Extra per-microbatch scalars to surface (MoE router auxiliaries) —
        # a static, config-determined key set so the scan carry is fixed.
        extra_keys = (("moe_lb", "moe_z")
                      if (cfg.model.connector_type == "moe"
                          or cfg.model.llm.moe_experts > 0) else ())

        def micro(carry, inp):
            grads_sum, loss_sum, acc_sum, extra_sum = carry
            mb, mrng, w = inp
            (loss, metrics), grads = grad_fn(train_p, mb, mrng)
            grads_sum = jax.tree_util.tree_map(
                lambda a, g: a + w * g, grads_sum, grads)
            extra_sum = {k: extra_sum[k] + w * metrics[k]
                         for k in extra_keys}
            return (grads_sum, loss_sum + w * loss,
                    acc_sum + w * metrics["accuracy"], extra_sum), None

        zero_grads = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), train_p)
        rngs = jax.random.split(rng, accum)
        (grads, loss, acc, extras), _ = jax.lax.scan(
            micro, (zero_grads, jnp.zeros(()), jnp.zeros(()),
                    {k: jnp.zeros(()) for k in extra_keys}),
            (batch, rngs, weights))

        grad_norm = optax.global_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)

        def do_update(_):
            updates, new_opt = tx.update(grads, state.opt_state, train_p)
            new_train = optax.apply_updates(train_p, updates)
            return TrainState(state.step + 1,
                              combine_trainable(new_train, frozen_p),
                              new_opt)

        def skip_update(_):
            # Non-finite loss: keep params/opt, still advance the step counter
            # so schedules and logging move on (ref trainer NaN skip :444-451).
            return TrainState(state.step + 1, state.params, state.opt_state)

        new_state = jax.lax.cond(finite, do_update, skip_update, None)
        metrics = {
            "loss": loss,
            "accuracy": acc,
            "grad_norm": grad_norm,
            "skipped": (~finite).astype(jnp.float32),
            **extras,
        }
        return new_state, metrics

    donate = (0,) if cfg.mesh.donate else ()
    return jax.jit(train_step, donate_argnums=donate)


def make_eval_step(cfg: AVSRConfig, mesh=None):
    """No-grad eval step (ref trainer._validate :543-602)."""

    @jax.jit
    def eval_step(params, batch: Batch):
        loss, metrics = _loss_fn(params, cfg, batch, None, mesh)
        return {"loss": loss, "accuracy": metrics["accuracy"],
                "label_tokens": metrics["label_tokens"]}

    return eval_step


def microbatch(batch: Batch, accum: int) -> Batch:
    """Reshape [B, ...] -> [accum, B // accum, ...] for accumulation."""
    if batch.prompt_tokens is not None and batch.prompt_tokens.ndim == 1:
        B = batch.labels.shape[0]
        batch = batch._replace(prompt_tokens=jnp.broadcast_to(
            batch.prompt_tokens[None], (B, batch.prompt_tokens.shape[0])))
    if accum <= 1:
        return jax.tree_util.tree_map(lambda x: x[None], batch)

    def split(x):
        b = x.shape[0]
        assert b % accum == 0, (b, accum)
        return x.reshape(accum, b // accum, *x.shape[1:])

    return jax.tree_util.tree_map(split, batch)
