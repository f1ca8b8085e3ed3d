"""Train state, trainable-parameter selection, and the optimizer.

Replaces the reference trainer's optimizer setup
(src/clip_whisper/trainer/clip_whisper_trainer.py:183-230): AdamW with
betas=(0.9, 0.95), weight decay applied only to matmul kernels (the ref
excludes bias/norm/embedding params :183-197), cosine/linear/constant
schedule with linear warmup — expressed as optax transforms under jit.

Freezing is expressed as an optax ``multi_transform`` whose frozen branch is
``set_to_zero``: the zeroed updates make the corresponding gradient leaves
dead code, so XLA deletes the frozen backward matmuls entirely — the
TPU-native equivalent of the reference's requires_grad=False.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from avsr_tpu.core.config import AVSRConfig, ModelConfig, TrainingConfig
from avsr_tpu.core.registry import SCHEDULES
from avsr_tpu.models.layers import Params


class TrainState(NamedTuple):
    step: jax.Array            # scalar int32
    params: Params
    opt_state: Any


# ---------------------------------------------------------------------------
# Trainable / decay masks by pytree path
# ---------------------------------------------------------------------------

def _path_keys(path) -> list[str]:
    keys = []
    for p in path:
        if hasattr(p, "key"):
            keys.append(str(p.key))
        elif hasattr(p, "idx"):
            keys.append(str(p.idx))
    return keys


def trainable_mask(params: Params, cfg: ModelConfig) -> Params:
    """True where the leaf should be trained (ref freeze semantics :244-318)."""
    def rule(path, leaf) -> bool:
        del leaf
        keys = _path_keys(path)
        top = keys[0]
        if top in ("audio_connector", "video_connector", "connector"):
            return True
        if top in ("whisper", "clip"):
            return not cfg.freeze_encoders
        if top == "llm":
            if "lora" in keys:
                return cfg.lora.use_lora
            return not cfg.freeze_llm
        return True

    return jax.tree_util.tree_map_with_path(rule, params)


def decay_mask(params: Params) -> Params:
    """Weight decay only on dense kernels — named "w" in every module —
    mirroring the ref's bias/norm/embedding exclusion (trainer:183-197)."""
    def rule(path, leaf) -> bool:
        del leaf
        keys = _path_keys(path)
        return bool(keys) and keys[-1] == "w"

    return jax.tree_util.tree_map_with_path(rule, params)


# ---------------------------------------------------------------------------
# Schedules
# ---------------------------------------------------------------------------

@SCHEDULES.register("cosine")
def cosine_schedule(cfg: TrainingConfig, total_steps: int):
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=cfg.learning_rate,
        warmup_steps=max(cfg.warmup_steps, 1),
        decay_steps=max(total_steps, cfg.warmup_steps + 1),
        end_value=cfg.learning_rate * 0.01)


@SCHEDULES.register("linear")
def linear_schedule(cfg: TrainingConfig, total_steps: int):
    warm = optax.linear_schedule(0.0, cfg.learning_rate,
                                 max(cfg.warmup_steps, 1))
    decay = optax.linear_schedule(
        cfg.learning_rate, 0.0,
        max(total_steps - cfg.warmup_steps, 1))
    return optax.join_schedules([warm, decay], [max(cfg.warmup_steps, 1)])


@SCHEDULES.register("constant")
def constant_schedule(cfg: TrainingConfig, total_steps: int):
    del total_steps
    warm = optax.linear_schedule(0.0, cfg.learning_rate,
                                 max(cfg.warmup_steps, 1))
    return optax.join_schedules(
        [warm, optax.constant_schedule(cfg.learning_rate)],
        [max(cfg.warmup_steps, 1)])


# ---------------------------------------------------------------------------
# Optimizer
# ---------------------------------------------------------------------------

def create_optimizer(cfg: AVSRConfig, params: Params,
                     total_steps: int) -> optax.GradientTransformation:
    t = cfg.training
    schedule = SCHEDULES.get(t.schedule)(t, total_steps)
    adamw = optax.chain(
        optax.clip_by_global_norm(t.max_grad_norm),
        optax.adamw(
            learning_rate=schedule,
            b1=t.adam_b1, b2=t.adam_b2,
            weight_decay=t.weight_decay,
            mask=decay_mask(params),
        ),
    )
    tmask = trainable_mask(params, cfg.model)
    labels = jax.tree_util.tree_map(
        lambda m: "train" if m else "freeze", tmask)
    return optax.multi_transform(
        {"train": adamw, "freeze": optax.set_to_zero()}, labels)


def create_train_state(params: Params, cfg: AVSRConfig,
                       total_steps: int) -> tuple[TrainState, optax.GradientTransformation]:
    tx = create_optimizer(cfg, params, total_steps)
    opt_state = tx.init(params)
    return TrainState(jnp.zeros((), jnp.int32), params, opt_state), tx


def cast_frozen(params: Params, cfg: ModelConfig,
                dtype=jnp.bfloat16) -> Params:
    """Store frozen leaves in ``dtype`` (bf16): they are only ever read, so
    no f32 master is needed — halves their HBM footprint and the weight
    bandwidth of every step. Trainable leaves stay f32."""
    mask = trainable_mask(params, cfg)

    def cast(p, trainable):
        if trainable or not jnp.issubdtype(p.dtype, jnp.floating):
            return p
        return p.astype(dtype)

    return jax.tree_util.tree_map(cast, params, mask)


def count_trainable(params: Params, cfg: ModelConfig) -> tuple[int, int]:
    mask = trainable_mask(params, cfg)
    leaves = jax.tree_util.tree_leaves(params)
    masks = jax.tree_util.tree_leaves(mask)
    total = sum(int(p.size) for p in leaves)
    trainable = sum(int(p.size) for p, m in zip(leaves, masks) if m)
    return trainable, total
