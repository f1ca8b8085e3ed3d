"""Checkpoint averaging: export the element-wise mean of K trainer
checkpoints' params.

Standard ASR practice (Transformer-ASR recipes average the last 5-10
epoch checkpoints for a lower-variance eval model); the reference has no
equivalent — its best checkpoint is a single val-loss argmin
(/root/reference/src/clip_whisper/trainer/clip_whisper_trainer.py:301-305).

    avsr-average --config cfg.yaml --checkpoint outputs/avsr/ckpt \
        --last 3 --out outputs/avsr/avg_params

The output is a params-only Orbax export: pass it straight to
``avsr-decode --checkpoint outputs/avsr/avg_params``. Averaging runs in
float32 and casts back to the stored param dtype; non-float leaves must
be identical across the checkpoints (equality is enforced; the first —
oldest — tree's leaf is returned).
Quantized (use_4bit/use_8bit) runs are refused — packed int leaves do not
average; average the float run, then quantize the result at load.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.cli.common import base_parser, load_cli_config

log = logging.getLogger("avsr.cli.average")


def average_params(trees: list) -> dict:
    """Element-wise float32 mean over param trees, cast back to each
    leaf's dtype. Non-float leaves must agree across trees."""
    n = len(trees)

    def avg(*leaves):
        first = leaves[0]
        if not jnp.issubdtype(jnp.asarray(first).dtype, jnp.inexact):
            for other in leaves[1:]:
                if not np.array_equal(np.asarray(first), np.asarray(other)):
                    raise ValueError(
                        "non-float param leaf differs between checkpoints "
                        "— these runs are not averageable")
            return first
        acc = sum(jnp.asarray(x, jnp.float32) for x in leaves)
        return (acc / n).astype(jnp.asarray(first).dtype)

    return jax.tree_util.tree_map(avg, *trees)


def main(argv: list[str] | None = None) -> int:
    p = base_parser("Average trainer checkpoints into a params export")
    p.add_argument("--checkpoint", required=True,
                   help="trainer checkpoint dir (Orbax CheckpointManager)")
    p.add_argument("--last", type=int, default=0,
                   help="average the newest N retained steps (0 = all)")
    p.add_argument("--steps", default="",
                   help="comma-separated step list (overrides --last)")
    p.add_argument("--out", required=True, help="params export path")
    args = p.parse_args(argv)
    cfg = load_cli_config(args)

    if cfg.model.use_4bit or cfg.model.use_8bit:
        raise SystemExit(
            "avsr-average: quantized (use_4bit/use_8bit) checkpoints do "
            "not average — average the float run, quantize at load")

    from avsr_tpu.models.avsr import init_avsr_model
    from avsr_tpu.train.checkpoint import CheckpointManager, export_params
    from avsr_tpu.train.state import create_train_state

    mngr = CheckpointManager(args.checkpoint)
    steps = mngr.all_steps()
    if args.steps:
        steps = [int(s) for s in args.steps.split(",")]
    elif args.last > 0:
        steps = steps[-args.last:]
    if len(steps) < 2:
        raise SystemExit(f"avsr-average: need >= 2 checkpoints, found "
                         f"{steps} in {args.checkpoint}")
    log.info("averaging %d checkpoints: %s", len(steps), steps)

    params_like = init_avsr_model(
        jax.random.key(cfg.training.seed), cfg.model,
        dtype=jnp.dtype(cfg.runtime.param_dtype))
    state_like, _ = create_train_state(params_like, cfg, total_steps=1)
    trees = [mngr.restore(state_like, step=s).params for s in steps]
    export_params(average_params(trees), args.out)
    log.info("averaged params -> %s", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
