"""Decoding / WER evaluation entry point.

TPU-native counterpart of ``scripts/clip_whisper/decode.py`` (:39-699):
loads a checkpoint, runs batched generation over the test split, streams
HYP/REF pairs, and writes ``results_{ts}.txt`` + ``wer_{ts}.txt`` with the
corpus WER — the reference's artifacts (:656-686), same filenames.

    python -m avsr_tpu.cli.decode --config cfg.yaml \
        --checkpoint outputs/avsr/ckpt decode.num_beams=5
"""

from __future__ import annotations

import logging
import time
from pathlib import Path

import jax
import numpy as np

from avsr_tpu.cli.common import (
    base_parser,
    build_data,
    load_cli_config,
    load_decode_params,
    maybe_mesh,
)

log = logging.getLogger("avsr.cli.decode")


def _warn_if_speculative_loses(cfg, draft_model_cfg=None) -> None:
    """Loudly warn when decode.speculative is enabled in a regime the
    cost model (infer.speculative.break_even_tokens_per_pass) says must
    lose: the text is identical to greedy by construction, so a losing
    config buys nothing and costs throughput. Measured verdicts per
    (batch, config) are tabulated in docs/serving.md 'Measured honesty'.
    ``draft_model_cfg``: the separate trained draft's config, so its TRUE
    depth drives the cost model (spec_draft_layers is 0 on that path)."""
    from avsr_tpu.infer.speculative import break_even_tokens_per_pass

    d = cfg.decode
    gamma = d.spec_gamma
    trained = bool(d.spec_draft_checkpoint)
    draft_layers = d.spec_draft_layers
    if trained and draft_model_cfg is not None:
        draft_layers = min(draft_model_cfg.llm.n_layers,
                           cfg.model.llm.n_layers)
    need = break_even_tokens_per_pass(
        cfg.model, bits=d.spec_draft_bits, gamma=gamma,
        draft_layers=draft_layers)
    ceiling = gamma + 1.0
    batch = d.engine_slots if d.engine_slots > 0 else d.batch_size
    if need >= ceiling:
        log.warning(
            "speculative config (int%d, gamma=%d, draft_layers=%d) can "
            "NEVER win: the cost model needs E[tokens/pass] > %.2f but the "
            "acceptance ceiling is %.0f (gamma+1). A round costs "
            "gamma*cost_ratio+1 target-steps; use fewer draft bits, "
            "layer-skip, or smaller gamma (docs/serving.md).",
            d.spec_draft_bits, gamma, d.spec_draft_layers, need, ceiling)
    elif batch >= 4:
        log.warning(
            "speculative at batch %d is a MEASURED LOSS on this geometry "
            "regardless of draft quality (at batch 8 the crossover is "
            "unreachable at ANY acceptance rate — the verify pass is no "
            "longer bandwidth-free at batch >= 4 and every draft dispatch "
            "pays host RTT). Output is token-identical to greedy, so this "
            "setting only slows decoding; it profits, if anywhere, at "
            "batch 1-2 latency. See docs/serving.md 'Measured honesty'.",
            batch)
    elif trained:
        log.info(
            "speculative at batch %d with a trained separate draft "
            "(depth %d/%d, int%d): profitable when measured acceptance "
            "exceeds %.2f tokens/pass (ceiling %.0f) — check "
            "distill_report.json teacher_agree or return_stats "
            "(docs/serving.md: a task-trained 1/2-depth draft measured "
            "4.75/5).",
            batch, draft_layers, cfg.model.llm.n_layers,
            d.spec_draft_bits, need, ceiling)
    else:
        log.warning(
            "speculative at batch %d profits ONLY with a trained draft: "
            "measured B=1 verdict is ~4 tokens/pass to break even "
            "(best random-init config 0.79x greedy; cost model needs "
            "E[tokens/pass] > %.2f, ceiling %.0f). Check your draft's "
            "acceptance with return_stats before enabling; see "
            "docs/serving.md 'Measured honesty'.",
            batch, need, ceiling)


def main(argv: list[str] | None = None) -> int:
    p = base_parser("Decode the test split and compute WER")
    p.add_argument("--checkpoint", default=None,
                   help="trainer ckpt dir or params export")
    p.add_argument("--split", default="test")
    args = p.parse_args(argv)
    cfg = load_cli_config(args)

    tok, ds, loader = build_data(cfg, args.split, shuffle=False,
                                 batch_size=cfg.decode.batch_size)
    mesh, _ = maybe_mesh(cfg)
    # return_raw only when the self-draft needs the pre-transform tree —
    # otherwise a full duplicate of the weights would stay resident for
    # the whole run (multi-GB at flagship scale). The engine path never
    # speculates, so it must not pay for (or log) a draft either.
    draft_params = draft_cfg = None
    if cfg.decode.speculative:
        from avsr_tpu.infer.speculative import (
            make_draft_params,
            make_layerskip_draft,
        )
        if cfg.decode.spec_draft_checkpoint:
            # Separately-TRAINED draft (avsr-distill export): its own
            # architecture + encoders, own prefix — the profitable
            # acceptance regime (docs/serving.md round-5 measurement).
            # No raw target tree needed (the draft has its own weights):
            # skip return_raw so no duplicate full-precision copy of the
            # target ever materializes.
            from avsr_tpu.cli.common import init_or_load_params
            from avsr_tpu.core.config import load_config
            params = load_decode_params(cfg, args.checkpoint, mesh=mesh)
            dcfg_full = load_config(cfg.decode.spec_draft_config)
            draft_cfg = dcfg_full.model
            if draft_cfg.llm.vocab_size != cfg.model.llm.vocab_size:
                raise SystemExit(
                    "spec_draft_checkpoint vocab mismatch: "
                    f"{draft_cfg.llm.vocab_size} vs "
                    f"{cfg.model.llm.vocab_size}")
            d_raw = init_or_load_params(dcfg_full,
                                        cfg.decode.spec_draft_checkpoint)
            draft_params = make_draft_params(
                d_raw, draft_cfg, bits=cfg.decode.spec_draft_bits)
            del d_raw
        elif cfg.decode.spec_draft_layers > 0:
            # LayerSkip early exit: slice the target's first k blocks
            # (zero extra weight memory pre-quantization), then quantize
            # + fuse the slice like the full-depth self-draft
            params, raw_params = load_decode_params(
                cfg, args.checkpoint, mesh=mesh, return_raw=True)
            d_raw, draft_cfg = make_layerskip_draft(
                raw_params, cfg.model, cfg.decode.spec_draft_layers)
            draft_params = make_draft_params(
                d_raw, draft_cfg, bits=cfg.decode.spec_draft_bits)
            del raw_params
        else:
            params, raw_params = load_decode_params(
                cfg, args.checkpoint, mesh=mesh, return_raw=True)
            draft_params = make_draft_params(
                raw_params, cfg.model, bits=cfg.decode.spec_draft_bits)
            del raw_params
        log.info("speculative decode%s: int%d %s-draft, gamma=%d",
                 " (slot-granular, in-engine)" if cfg.decode.engine_slots
                 else "",
                 cfg.decode.spec_draft_bits,
                 ("trained-separate" if cfg.decode.spec_draft_checkpoint
                  else f"{cfg.decode.spec_draft_layers}-layer-skip"
                  if cfg.decode.spec_draft_layers else "self"),
                 cfg.decode.spec_gamma)
        _warn_if_speculative_loses(cfg, draft_model_cfg=draft_cfg)
    else:
        params = load_decode_params(cfg, args.checkpoint, mesh=mesh)
    shard_batch = None
    if mesh is not None:
        # multi-chip decoding: params shard by the mesh rules (tp/fsdp),
        # batches split over the data axes, and the NamedShardings
        # propagate through the jitted generate loop
        from avsr_tpu.mesh.sharding import infer_batch_sharder, shard_params
        params = shard_params(params, mesh)
        if draft_params is not None:
            # the draft decodes inside the same jitted computation as the
            # sharded target — both trees must live on the mesh
            draft_params = shard_params(draft_params, mesh)
        shard_batch = infer_batch_sharder(mesh)

    return run_protocol(cfg, params, tok, ds, loader, mesh=mesh,
                        shard_batch=shard_batch, draft_params=draft_params,
                        draft_model_cfg=draft_cfg,
                        # a trained-separate draft ran its own encoders in
                        # training; sharing the target prefix would feed it
                        # activations it never learned to read
                        draft_shares_prefix=(
                            False if cfg.decode.spec_draft_checkpoint
                            else None))


def run_protocol(cfg, params, tok, ds, loader, *, mesh=None,
                 shard_batch=None, draft_params=None, draft_model_cfg=None,
                 draft_shares_prefix: bool | None = None,
                 stats_out: dict | None = None) -> int:
    """The full reference eval protocol over an already-built model +
    dataset: batched greedy/sampled/beam/engine decode, per-utterance
    HYP/REF stream, corpus WER/CER, ``results_{ts}.txt`` + ``wer_{ts}.txt``
    artifacts (/root/reference/scripts/clip_whisper/decode.py:316-440,
    656-686). Shared by the checkpoint path (:func:`main`) and the
    pretrained-parity harness (cli.parity --manifest), so the day real
    assets land the reference protocol is one command, not new code."""
    from avsr_tpu.infer.generate import generate
    from avsr_tpu.infer.wer import WERAccumulator

    out_dir = Path(cfg.decode.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    ts = time.strftime("%Y%m%d_%H%M%S")
    results_path = out_dir / f"results_{ts}.txt"
    wer_path = out_dir / f"wer_{ts}.txt"

    acc = WERAccumulator()
    rng = jax.random.key(cfg.training.seed)
    t0 = time.perf_counter()

    if cfg.decode.engine_slots > 0:
        # continuous batching: a fixed slot pool, refilled mid-flight as
        # transcripts finish (infer.engine) — no head-of-line blocking on
        # ragged lengths. One resident cache: with a mesh, tp/fsdp param
        # shardings propagate through the engine's jitted steps while the
        # slot pool itself stays replicated (dp buys nothing here).
        if mesh is not None:
            log.info("engine_slots with a %d-device mesh: slot pool is "
                     "replicated; only tp/fsdp param sharding applies",
                     mesh.size)
        from avsr_tpu.infer.engine import ServingEngine

        eng = ServingEngine(params, cfg, tok,
                            num_slots=cfg.decode.engine_slots,
                            seed=cfg.training.seed,
                            draft_params=draft_params,
                            draft_model_cfg=draft_model_cfg,
                            spec_gamma=(cfg.decode.spec_gamma
                                        if cfg.decode.speculative else 0))
        # decode.temperature/top_p apply engine-wide; the engine API also
        # takes them per request (a serving-queue knob)
        temp, top_p = cfg.decode.temperature, cfg.decode.top_p
        with open(results_path, "w") as rf:
            for start in range(0, len(ds), 256):   # bound host memory
                samples = [ds[i] for i in range(start,
                                                min(start + 256, len(ds)))]
                ids_all = eng.transcribe(
                    samples,
                    temperature_per_request=[temp] * len(samples),
                    top_p_per_request=[top_p] * len(samples))
                for sample, ids in zip(samples, ids_all):
                    hyp = tok.decode(ids)
                    u_wer = acc.add(sample.text, hyp)
                    log.info("utt %s | WER %.3f", sample.utt_id, u_wer)
                    print(f"UTT: {sample.utt_id}", file=rf)
                    print(f"REF: {sample.text}", file=rf)
                    print(f"HYP: {hyp}", file=rf)
                    print(f"WER: {u_wer:.4f}", file=rf)
                    print("", file=rf)
        dt = time.perf_counter() - t0
        log.info("engine stats: %s", eng.stats())
        return _summarize(acc, dt, wer_path, results_path, stats_out)

    seen: set[str] = set()
    with open(results_path, "w") as rf:
        for hb, batch in loader:
            rng, sub = jax.random.split(rng)
            if shard_batch is not None:
                batch = shard_batch(batch)
            out = generate(params, cfg.model, batch, cfg.decode,
                           eos_id=tok.eos_id, rng=sub,
                           compute_dtype=cfg.runtime.compute_dtype,
                           use_pallas=cfg.runtime.use_pallas, mesh=mesh,
                           draft_params=draft_params,
                           draft_model_cfg=draft_model_cfg,
                           draft_shares_prefix=draft_shares_prefix)
            tokens = np.asarray(out.tokens)
            lens = np.asarray(out.lengths)
            for i, (utt, ref) in enumerate(zip(hb.utt_ids, hb.texts)):
                if utt in seen:   # final short batch is wrap-padded
                    continue
                seen.add(utt)
                hyp = tok.decode(tokens[i, : lens[i]])
                u_wer = acc.add(ref, hyp)
                log.info("utt %s | WER %.3f", utt, u_wer)
                print(f"UTT: {utt}", file=rf)
                print(f"REF: {ref}", file=rf)
                print(f"HYP: {hyp}", file=rf)
                print(f"WER: {u_wer:.4f}", file=rf)
                print("", file=rf)
    dt = time.perf_counter() - t0
    return _summarize(acc, dt, wer_path, results_path, stats_out)


def _summarize(acc, dt: float, wer_path: Path,
               results_path: Path | None = None,
               stats_out: dict | None = None) -> int:
    summary = (
        f"utterances: {acc.utterances}\n"
        f"reference words: {acc.ref_words}\n"
        f"word errors: {acc.edits}\n"
        f"WER: {acc.wer:.4f}\n"
        f"CER: {acc.cer:.4f}\n"
        f"decode time: {dt:.1f}s ({acc.utterances / max(dt, 1e-9):.2f} utt/s)\n")
    wer_path.write_text(summary)
    if stats_out is not None:
        stats_out.update(wer=acc.wer, cer=acc.cer,
                         utterances=acc.utterances, decode_s=dt,
                         results_path=str(results_path),
                         wer_path=str(wer_path))
    log.info("overall WER %.4f CER %.4f (%d utts) -> %s", acc.wer, acc.cer,
             acc.utterances, wer_path)
    print(summary)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
