"""Quick validation entry point (ref scripts/clip_whisper/quick_validate.py).

Builds the model (optionally from a checkpoint), runs a handful of eval
batches, and exits non-zero if the loss is non-finite or degenerate — the
reference's smoke-check contract (quick_validate.py:529-543), minus its
broken attribute probes (SURVEY.md §3.3).

    python -m avsr_tpu.cli.validate data.synthetic=true
"""

from __future__ import annotations

import logging

import numpy as np

from avsr_tpu.cli.common import (
    base_parser,
    build_data,
    init_or_load_params,
    load_cli_config,
)

log = logging.getLogger("avsr.cli.validate")

DUMMY_LOSS = 1e6   # ref sentinel (quick_validate.py:285-298)


def main(argv: list[str] | None = None) -> int:
    p = base_parser("Quick-validate a model/checkpoint")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--num_batches", type=int, default=2)
    p.add_argument("--synthetic", action="store_true",
                   help="shorthand for data.synthetic=true")
    p.add_argument("--checkify", action="store_true",
                   help="run under jax.experimental.checkify (nan/oob/div "
                        "checks inside jit) and report the first error with "
                        "its source location — the deep-debug mode SURVEY "
                        "§5.2 calls for")
    args = p.parse_args(argv)
    if args.synthetic:
        args.overrides.append("data.synthetic=true")
    cfg = load_cli_config(args)

    from avsr_tpu.train.step import make_eval_step

    tok, _, loader = build_data(cfg, "valid" if not cfg.data.synthetic
                                else "train", shuffle=False)
    params = init_or_load_params(cfg, args.checkpoint)
    eval_step = make_eval_step(cfg)
    if args.checkify:
        import dataclasses

        import jax
        from jax.experimental import checkify

        from avsr_tpu.train.step import _loss_fn

        # checkify has no rewrite rule for pallas_call — run the checkified
        # loss on the XLA attention path (numerics-equivalent; the flash
        # kernel has its own parity tests).
        ck_cfg = dataclasses.replace(
            cfg, runtime=dataclasses.replace(cfg.runtime,
                                             use_pallas="never"))
        checked = jax.jit(checkify.checkify(
            lambda p, b: _loss_fn(p, ck_cfg, b, None)[0],
            errors=checkify.float_checks | checkify.index_checks))

        def eval_step(params, batch):  # noqa: F811 — checkified variant
            err, loss = checked(params, batch)
            err.throw()   # raises with the failing op's source location
            return {"loss": loss, "accuracy": float("nan")}

    losses = []
    for i, (hb, batch) in enumerate(loader):
        if i >= args.num_batches:
            break
        out = eval_step(params, batch)
        loss = float(out["loss"])
        log.info("batch %d: loss %.4f acc %.3f", i, loss,
                 float(out["accuracy"]))
        losses.append(loss)

    avg = float(np.mean(losses)) if losses else float("nan")
    ok = np.isfinite(avg) and avg < DUMMY_LOSS / 2
    print(f"validation {'PASSED' if ok else 'FAILED'}: avg loss {avg:.4f} "
          f"over {len(losses)} batches")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
