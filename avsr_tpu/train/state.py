"""Train state, trainable-parameter selection, and the optimizer.

Replaces the reference trainer's optimizer setup
(src/clip_whisper/trainer/clip_whisper_trainer.py:183-230): AdamW with
betas=(0.9, 0.95), weight decay applied only to matmul kernels (the ref
excludes bias/norm/embedding params :183-197), cosine/linear/constant
schedule with linear warmup — expressed as optax transforms under jit.

Freezing is structural: params are partitioned into (trainable, frozen)
subtrees and the loss is differentiated w.r.t. the trainable subtree only —
the frozen encoders are pure primal computation (no backward graph is ever
built for them, no zero-grad buffers are materialized), the TPU-native
equivalent of the reference's requires_grad=False. This matters: a
grad-over-everything + zero-out design keeps the whole frozen backward
alive through the grad-norm reduction and carries multi-GB zero grads
through the accumulation scan.
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
        if top in ("whisper", "hubert", "wav2vec2", "clip", "resnet",
                   "efficientnet", "avhubert"):
            # BatchNorm running statistics are data, not weights — never
            # trained even in unfrozen fine-tunes (frozen-BN convention).
            if keys[-1] in ("mean", "var"):
                return False
            if not cfg.freeze_encoders:
                return True
            # Unfreeze selected AV-HuBERT transformer layers
            # (ref finetune_avhubert_layers, src/utils/config.py:73-74).
            if (top == "avhubert" and cfg.finetune_avhubert_layers
                    and len(keys) >= 3 and keys[1] == "blocks"
                    and keys[2].isdigit()
                    and int(keys[2]) in cfg.finetune_avhubert_layers):
                return True
            # Layer-norm-only fine-tuning of frozen encoders
            # (ref unfreeze_layer_norms, src/utils/config.py:86).
            if cfg.unfreeze_layer_norms and len(keys) >= 2:
                parent = keys[-2]
                if parent.startswith("ln") or parent in ("norm", "proj_ln"):
                    return True
            return False
        if top == "llm":
            if "lora" in keys:
                return cfg.lora.use_lora
            return not cfg.freeze_llm
        return True

    return jax.tree_util.tree_map_with_path(rule, params)


def partition_trainable(params: Params, cfg: ModelConfig) -> tuple[Params, Params]:
    """Split params into (trainable, frozen) trees; the other side's
    positions hold None (an empty pytree node), so each side's leaves are
    exactly its own params. Recombine with ``combine_trainable``."""
    mask = trainable_mask(params, cfg)
    train = jax.tree_util.tree_map(
        lambda p, m: p if m else None, params, mask)
    frozen = jax.tree_util.tree_map(
        lambda p, m: None if m else p, params, mask)
    return train, frozen


def combine_trainable(train: Params, frozen: Params) -> Params:
    """Inverse of partition_trainable (equinox-style combine)."""
    return jax.tree_util.tree_map(
        lambda a, b: b if a is None else a, train, frozen,
        is_leaf=lambda x: x is None)


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

def create_optimizer(cfg: AVSRConfig, train_params: Params,
                     total_steps: int) -> optax.GradientTransformation:
    """The optimizer over the *trainable partition only* (pass the train
    side of ``partition_trainable``) — frozen params never enter it, so no
    moments, no zero-updates, no grad requirements for them.

    training.optimizer picks the update rule (the ref hard-codes AdamW,
    trainer:202-207): ``adamw`` keeps two full-size moments; ``adafactor``
    factors the second moment to O(rows+cols) per matrix — the classic
    TPU large-model choice when optimizer state dominates HBM; ``lion``
    keeps one sign-momentum buffer. All share the schedule registry,
    global-norm clip, and the kernels-only decay mask."""
    t = cfg.training
    schedule = SCHEDULES.get(t.schedule)(t, total_steps)
    mask = decay_mask(train_params)
    if t.optimizer == "adafactor":
        opt = optax.adafactor(
            learning_rate=schedule,
            # explicit LR drives the step; parameter-scale multiply stays
            # on (standard adafactor relative updates)
            weight_decay_rate=t.weight_decay or None,
            weight_decay_mask=mask)
    elif t.optimizer == "lion":
        opt = optax.lion(learning_rate=schedule, b1=t.adam_b1, b2=0.99,
                         weight_decay=t.weight_decay, mask=mask)
    else:
        opt = optax.adamw(
            learning_rate=schedule,
            b1=t.adam_b1, b2=t.adam_b2,
            weight_decay=t.weight_decay,
            mask=mask,
        )
    return optax.chain(
        optax.clip_by_global_norm(t.max_grad_norm),
        opt,
    )


def create_train_state(params: Params, cfg: AVSRConfig,
                       total_steps: int) -> tuple[TrainState, optax.GradientTransformation]:
    train_p, _ = partition_trainable(params, cfg.model)
    tx = create_optimizer(cfg, train_p, total_steps)
    opt_state = jax.jit(tx.init)(train_p)
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
