"""Distill a speculative-decode draft from a trained teacher checkpoint.

Closes the loop the round-5 speculative verdict opened (docs/serving.md):
speculative decoding profits at B=1-2 exactly when the draft's acceptance
clears the measured break-even (~4.3 tok/pass full-depth int8), and
acceptance is a property of draft TRAINING — a task-trained 1/2-depth
draft measures 4.75/5 tok/pass in-suite where every untrained draft
floors at ~1.0. This CLI produces such a draft: a smaller student
(typically fewer LLM layers, same vocab/modality) trained to match the
teacher's label-position distributions (Hinton-style KL at temperature
``tau``, mixed with ``alpha`` hard-label CE), warm-started from the
teacher's own weights where shapes line up (encoders, embeddings, first-k
LLM blocks — LayerSkip-style).

The reference has no distillation (or speculative) machinery; this is
TPU-native serving scope on top of SURVEY §2.1's model zoo.

    avsr-distill --config draft.yaml \
        --teacher-config base.yaml --teacher-checkpoint outputs/avsr/ckpt \
        --out outputs/draft_export \
        model.llm.n_layers=4 training.num_epochs=2

Decode with it:  avsr-decode ... decode.speculative=true \
        decode.spec_draft_checkpoint=outputs/draft_export \
        decode.spec_draft_config=outputs/draft_export/config.yaml
"""

from __future__ import annotations

import functools
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.cli.common import (
    base_parser,
    build_data,
    init_or_load_params,
    load_cli_config,
)
from avsr_tpu.core.config import AVSRConfig, load_config, save_config

log = logging.getLogger("avsr.cli.distill")


def warm_start(student, teacher):
    """Copy every teacher leaf whose path+shape exists in the student.

    Dict keys match by name; lists (LLM layer stacks) align by index, so a
    shallower student receives the teacher's FIRST k blocks — the
    LayerSkip-style initialization whose early-exit calibration the KL
    training then tightens. Returns (tree, n_copied)."""
    copied = [0]

    def rec(s, t):
        if isinstance(s, dict) and isinstance(t, dict):
            return {k: rec(v, t[k]) if k in t else v for k, v in s.items()}
        if isinstance(s, list) and isinstance(t, list):
            return [rec(si, ti) for si, ti in zip(s, t)] + list(s[len(t):])
        if (hasattr(s, "shape") and hasattr(t, "shape")
                and s.shape == getattr(t, "shape", None)):
            copied[0] += 1
            # REAL copy, never an aliasing view: the student state is
            # donated by the distill step while the teacher tree is a
            # separate argument of the same call — shared buffers would
            # be use-after-donate (f(donate(a), a)).
            return jnp.array(t, dtype=s.dtype, copy=True)
        return s

    return rec(student, teacher), copied[0]


def make_distill_step(cfg: AVSRConfig, tcfg: AVSRConfig, tx, *,
                      tau: float, alpha: float):
    """Jitted distill step: KL(teacher || student) at temperature tau over
    the masked label positions (scaled tau^2, standard distillation), plus
    alpha x the student's own hard-label CE. Reports ``agree`` — masked
    teacher/student argmax agreement, the direct proxy for speculative
    acceptance."""
    from avsr_tpu.models.avsr import forward
    from avsr_tpu.train.state import (
        TrainState,
        combine_trainable,
        partition_trainable,
    )

    cdt = jnp.dtype(cfg.runtime.compute_dtype)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, teacher, batch, rng):
        _, t_m = forward(teacher, tcfg.model, batch, compute_dtype=cdt,
                         use_pallas=cfg.runtime.use_pallas,
                         return_logits=True)
        tl = jax.lax.stop_gradient(
            t_m["label_logits"].astype(jnp.float32))          # [B,Tl,V]
        mask = jax.lax.stop_gradient(t_m["label_mask"])       # [B,Tl]
        n = jnp.maximum(jnp.sum(mask), 1.0)
        t_lp = jax.nn.log_softmax(tl / tau, axis=-1)

        train_p, frozen_p = partition_trainable(state.params, cfg.model)

        def loss_fn(tp):
            ce, s_m = forward(combine_trainable(tp, frozen_p), cfg.model,
                              batch, compute_dtype=cdt,
                              use_pallas=cfg.runtime.use_pallas,
                              dropout_rng=rng, return_logits=True)
            sl = s_m["label_logits"].astype(jnp.float32)
            s_lp = jax.nn.log_softmax(sl / tau, axis=-1)
            kl = jnp.sum(jnp.exp(t_lp) * (t_lp - s_lp), axis=-1)   # [B,Tl]
            kl = jnp.sum(kl * mask) / n * (tau * tau)
            loss = alpha * ce + (1.0 - alpha) * kl
            agree = jnp.sum(
                (jnp.argmax(sl, -1) == jnp.argmax(tl, -1)) * mask) / n
            return loss, {"kl": kl, "ce": ce, "agree": agree}

        (loss, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(train_p)
        import optax
        updates, new_opt = tx.update(grads, state.opt_state, train_p)
        new_train = optax.apply_updates(train_p, updates)
        new_state = TrainState(state.step + 1,
                               combine_trainable(new_train, frozen_p),
                               new_opt)
        m["loss"] = loss
        return new_state, m

    return step


def main(argv: list[str] | None = None) -> int:
    p = base_parser("Distill a speculative-decode draft from a trained "
                    "teacher checkpoint")
    p.add_argument("--teacher-config", required=True,
                   help="teacher YAML config")
    p.add_argument("--teacher-checkpoint", required=True,
                   help="teacher trainer ckpt dir or params export")
    p.add_argument("--teacher-override", action="append", default=[],
                   help="dotted override for the TEACHER config (repeatable)")
    p.add_argument("--out", required=True,
                   help="output dir: params-only draft export + config.yaml")
    p.add_argument("--tau", type=float, default=2.0,
                   help="distillation temperature")
    p.add_argument("--alpha", type=float, default=0.3,
                   help="hard-label CE weight (1-alpha on the KL term)")
    p.add_argument("--no-warm-start", action="store_true",
                   help="random student init instead of copying "
                        "shape-matching teacher weights")
    args = p.parse_args(argv)

    cfg = load_cli_config(args)                        # student
    tcfg = load_config(args.teacher_config, args.teacher_override)

    if cfg.model.llm.vocab_size != tcfg.model.llm.vocab_size:
        raise SystemExit(
            f"draft/teacher vocab mismatch: {cfg.model.llm.vocab_size} vs "
            f"{tcfg.model.llm.vocab_size} — speculative verify requires a "
            f"shared vocabulary")
    if cfg.model.freeze_llm:
        raise SystemExit(
            "student model.freeze_llm=true: a frozen-LLM draft cannot "
            "distill — set model.freeze_llm=false (and usually "
            "model.lora.use_lora=false) for the student")

    from avsr_tpu.models.avsr import init_avsr_model
    from avsr_tpu.train.checkpoint import export_params
    from avsr_tpu.train.state import create_train_state

    teacher = init_or_load_params(tcfg, args.teacher_checkpoint)
    student = init_avsr_model(jax.random.key(cfg.training.seed + 1),
                              cfg.model,
                              dtype=jnp.dtype(cfg.runtime.param_dtype))
    if not args.no_warm_start:
        student, n_copied = warm_start(student, teacher)
        log.info("warm start: %d leaves copied from the teacher", n_copied)

    tok, ds, loader = build_data(cfg, "train")
    if len(loader) == 0:
        raise SystemExit(
            f"empty train split under data.path={cfg.data.path!r} — "
            f"nothing to distill on")
    total = (cfg.training.max_steps if cfg.training.max_steps > 0
             else len(loader) * cfg.training.num_epochs)
    if total <= 0:
        raise SystemExit(
            "no training budget: set training.max_steps > 0 or "
            "training.num_epochs > 0")
    state, tx = create_train_state(student, cfg, total_steps=total)
    step_fn = make_distill_step(cfg, tcfg, tx, tau=args.tau,
                                alpha=args.alpha)

    log.info("distilling %d steps (tau=%.2f alpha=%.2f, teacher %d-layer "
             "-> student %d-layer LLM)", total, args.tau, args.alpha,
             tcfg.model.llm.n_layers, cfg.model.llm.n_layers)
    t0 = time.time()
    done = 0
    m = {}
    while done < total:
        for _, batch in loader:
            state, m = step_fn(state, teacher, batch,
                               jax.random.key(cfg.training.seed + done))
            done += 1
            if done % max(1, cfg.training.log_interval) == 0 or done == total:
                log.info("step %d/%d loss %.4f kl %.4f ce %.4f "
                         "teacher-agree %.3f", done, total,
                         float(m["loss"]), float(m["kl"]), float(m["ce"]),
                         float(m["agree"]))
            if done >= total:
                break
    loader.close()
    if not (np.isfinite(float(m["loss"]))):
        log.error("non-finite final loss")
        return 1

    import json
    from pathlib import Path
    out = Path(args.out)
    export_params(state.params, out)
    save_config(cfg, out / "config.yaml")
    report = {"steps": done, "tau": args.tau, "alpha": args.alpha,
              "loss": float(m["loss"]), "kl": float(m["kl"]),
              "ce": float(m["ce"]),
              "teacher_agree": float(m["agree"]),
              "teacher_llm_layers": tcfg.model.llm.n_layers,
              "student_llm_layers": cfg.model.llm.n_layers,
              "wall_s": round(time.time() - t0, 1)}
    (out / "distill_report.json").write_text(json.dumps(report, indent=1))
    log.info("draft export -> %s (+ config.yaml, distill_report.json); "
             "%.1fs; final teacher-agree %.3f", out, report["wall_s"],
             report["teacher_agree"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
