"""Training entry point.

TPU-native counterpart of ``scripts/clip_whisper/train.py`` (ref :33-81 CLI,
:127-275 main). Usage:

    python -m avsr_tpu.cli.train --config avsr_tpu/configs/base.yaml \
        model.modality=both training.num_epochs=10 data.path=/data/lrs3
"""

from __future__ import annotations

import logging

import jax

from avsr_tpu.cli.common import (
    base_parser,
    build_data,
    init_or_load_params,
    load_cli_config,
    maybe_mesh,
)

log = logging.getLogger("avsr.cli.train")


def main(argv: list[str] | None = None) -> int:
    args = base_parser("Train the AVSR model", modes=True).parse_args(argv)
    cfg = load_cli_config(args)

    from avsr_tpu.mesh.sharding import shard_state
    from avsr_tpu.models.avsr import summarize
    from avsr_tpu.train.loop import Trainer

    log.info("devices: %s", jax.devices())
    if cfg.training.auto_batch_size:
        import dataclasses

        from avsr_tpu.train.probe import find_optimal_batch_size
        mesh0, shard0 = maybe_mesh(cfg)
        probe_params = init_or_load_params(cfg)
        best = find_optimal_batch_size(cfg, probe_params, mesh=mesh0,
                                       shard_batch=shard0)
        if best > cfg.data.batch_size:
            log.info("auto_batch_size: %d -> %d", cfg.data.batch_size, best)
            cfg = dataclasses.replace(
                cfg, data=dataclasses.replace(cfg.data, batch_size=best))
        del probe_params
    tok, _, train_loader = build_data(cfg, "train")
    try:
        _, _, val_loader = build_data(cfg, "valid", shuffle=False)
    except (FileNotFoundError, ValueError):
        log.warning("no validation split found — training without val")
        val_loader = None

    params = init_or_load_params(cfg)
    log.info("model summary: %s", summarize(params, cfg.model))

    mesh, shard_batch = maybe_mesh(cfg)
    trainer = Trainer(cfg, params, train_loader, val_loader,
                      mesh=mesh, shard_batch=shard_batch, tok=tok)
    if mesh is not None:
        trainer.state = shard_state(trainer.state, mesh)
    trainer.maybe_resume()
    result = trainer.train()
    log.info("done: %s", result)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
