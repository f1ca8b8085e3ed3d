"""Step profiler: per-op device-time attribution for the jitted hot loops.

The reference's observability is logging-based memory instrumentation
(SURVEY.md §5.1 — clip_whisper_model.py:53-84, trainer:967-974); the TPU
equivalent the loop already has is a raw ``jax.profiler`` timeline
(runtime.profile_dir). This CLI closes the loop WITHOUT TensorBoard: it
traces a few steps of the flagship train step (or a greedy decode), parses
the captured ``.xplane.pb`` directly, and prints where device time goes —

  * by HLO category (convolution / fusion / all-reduce / ...) — is the step
    MXU-bound or elementwise/HBM-bound?
  * by JAX scope (the ``tf_op`` stat XLA records per op carries the
    jit trace path) — which model component owns the time?
  * top individual ops — the first kernels to look at.

    python -m avsr_tpu.cli.profile --mode train data.batch_size=8
    python -m avsr_tpu.cli.profile --mode decode decode.max_new_tokens=32

Writes ``profile_report.json`` next to the raw trace. Works on any backend
that emits device planes (TPU; CPU emits host-side XLA lines only, which
the parser falls back to), so the report is testable on the virtual mesh.
"""

from __future__ import annotations

import collections
import json
import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.cli.common import base_parser, load_cli_config

log = logging.getLogger("avsr.cli.profile")


def main(argv: list[str] | None = None) -> int:
    p = base_parser("Trace + attribute device time for the hot loops")
    p.add_argument("--mode", choices=("train", "decode"), default="train")
    p.add_argument("--steps", type=int, default=4,
                   help="traced step count (after one warmup/compile step)")
    p.add_argument("--output_dir", default="outputs/profile")
    p.add_argument("--top", type=int, default=15, help="rows per table")
    args = p.parse_args(argv)
    cfg = load_cli_config(args)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    run_step = _build_runner(cfg, args.mode)
    run_step()                       # compile outside the trace
    jax.profiler.start_trace(str(out))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        run_step()
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    log.info("traced %d %s steps in %.3fs", args.steps, args.mode, wall)

    report = analyze_trace(out, top=args.top)
    report["mode"] = args.mode
    report["steps"] = args.steps
    report["wall_s"] = round(wall, 4)
    with open(out / "profile_report.json", "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report, indent=2))
    return 0


def _build_runner(cfg, mode: str):
    """-> zero-arg callable running ONE compiled step on synthetic data
    shaped by the config's buckets (the bench shapes; no dataset needed)."""
    from avsr_tpu.models.avsr import Batch, init_avsr_model
    from avsr_tpu.train.state import cast_frozen

    B = cfg.data.batch_size
    Ta = cfg.data.audio_buckets[-1] if cfg.data.audio_buckets else 1000
    Tv = cfg.data.video_buckets[-1] if cfg.data.video_buckets else 25
    rng = np.random.default_rng(0)
    batch = Batch(
        mel=jnp.asarray(rng.standard_normal((B, cfg.model.whisper.n_mels, Ta)),
                        jnp.float32),
        mel_lens=jnp.full((B,), Ta, jnp.int32),
        frames=jnp.asarray(
            rng.standard_normal(
                (B, Tv, 3, cfg.model.image_size, cfg.model.image_size)),
            jnp.bfloat16),
        frame_lens=jnp.full((B,), Tv, jnp.int32),
        prompt_tokens=jnp.asarray(rng.integers(0, 100, (B, 8)), jnp.int32),
        labels=jnp.asarray(rng.integers(0, 100, (B, 48)), jnp.int32),
        label_lens=jnp.full((B,), 48, jnp.int32),
    )
    params = jax.jit(
        lambda k: cast_frozen(init_avsr_model(k, cfg.model), cfg.model))(
            jax.random.key(0))
    jax.block_until_ready(params)

    if mode == "train":
        from avsr_tpu.train.state import create_train_state
        from avsr_tpu.train.step import make_train_step, microbatch

        state, tx = create_train_state(params, cfg, total_steps=1000)
        step_fn = make_train_step(cfg, tx)
        mb = microbatch(batch, 1)
        holder = {"state": state, "i": 0}

        def run():
            holder["i"] += 1
            holder["state"], metrics = step_fn(
                holder["state"], mb, jax.random.key(holder["i"]))
            jax.block_until_ready(metrics["loss"])
        return run

    from avsr_tpu.infer.generate import (
        generate_tokens,
        prepare_params_for_decode,
    )

    dparams = prepare_params_for_decode(params, cfg.model,
                                        lm_head_bits=cfg.decode.lm_head_bits)

    def run():
        out = generate_tokens(
            dparams, cfg.model, batch,
            max_new_tokens=cfg.decode.max_new_tokens, eos_id=-1,
            compute_dtype=cfg.runtime.compute_dtype,
            use_pallas=cfg.runtime.use_pallas,
            kv_cache_dtype=cfg.decode.kv_cache_dtype)
        jax.block_until_ready(out.tokens)
    return run


# ---------------------------------------------------------------------------
# xplane parsing (no TensorBoard needed — raw proto via tensorflow's tsl pb2)
# ---------------------------------------------------------------------------

def _load_xspaces(trace_dir: Path):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover — tf is in the image
        raise RuntimeError(
            "xplane parsing needs tensorflow's tsl protos (pip tensorflow); "
            f"import failed: {e}") from e
    spaces = []
    for pb in sorted(trace_dir.glob("plugins/profile/*/*.xplane.pb")):
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(pb.read_bytes())
        spaces.append((pb, xs))
    if not spaces:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    return spaces


def analyze_trace(trace_dir: Path, top: int = 15) -> dict:
    """Aggregate the newest trace under ``trace_dir``: device-plane event
    durations by op, by HLO category, and by JAX scope prefix."""
    pb_path, xs = _load_xspaces(trace_dir)[-1]

    # prefer real device planes; fall back to host XLA lines (CPU backend)
    device_planes = [p for p in xs.planes
                     if "/device:" in p.name or p.name.startswith("/TPU")]
    planes = device_planes or list(xs.planes)

    by_op: collections.Counter = collections.Counter()
    by_cat: collections.Counter = collections.Counter()
    by_scope: collections.Counter = collections.Counter()
    total_ps = 0
    async_ps = 0
    loop_ps = 0
    span_ps = [None, None]   # min start, max end over device lines

    for plane in planes:
        stat_names = {sid: sm.name for sid, sm in plane.stat_metadata.items()}
        ev_meta = plane.event_metadata

        def meta_stat(md, key):
            for st in md.stats:
                if stat_names.get(st.metadata_id) == key:
                    return (st.str_value
                            or stat_names.get(st.ref_value, "") or None)
            return None

        for line in plane.lines:
            # device planes carry one line per core plus bookkeeping lines
            # (Steps, XLA Modules, TC Overlay); synchronous compute lives on
            # "XLA Ops". "Async XLA Ops" holds DMA *windows* that OVERLAP
            # compute (start-to-done spans, 3.5x the real step time at the
            # flagship shape) — summing them into busy time/categories made
            # the first report claim 54% "copy": track them separately as
            # an HBM-traffic signal. Host fallback: take every line.
            lname = line.name.lower()
            if device_planes and "op" not in lname:
                continue
            if device_planes and "async" in lname:
                for ev in line.events:
                    async_ps += int(ev.duration_ps)
                continue
            for ev in line.events:
                md = ev_meta.get(ev.metadata_id)
                name = (md.display_name or md.name) if md else "?"
                dur = int(ev.duration_ps)
                if md is not None:
                    # Control-flow CONTAINER ops (while/conditional/call)
                    # span their whole body — their children are separate
                    # events on the same line, so counting both doubles
                    # every decode loop (a 64-token while showed duty 1.7).
                    pcat = meta_stat(md, "hlo_category")
                    if pcat in ("while", "conditional", "call", "fusion root"):
                        continue
                by_op[name] += dur
                total_ps += dur
                scope_raw = meta_stat(md, "tf_op") if md is not None else None
                # prefill/loop split: ops under a while body belong to the
                # token loop (decode) or the scan body (train grad accum);
                # everything else is the one-shot prefix (encode + prefill
                # + epilogue) — the first number serving work cares about
                if scope_raw and "while/body" in scope_raw:
                    loop_ps += dur
                start = int(line.timestamp_ns) * 1000 + int(ev.offset_ps)
                end = start + dur
                span_ps[0] = start if span_ps[0] is None else min(
                    span_ps[0], start)
                span_ps[1] = end if span_ps[1] is None else max(
                    span_ps[1], end)
                if md is not None:
                    cat = meta_stat(md, "hlo_category") or "uncategorized"
                    by_cat[cat] += dur
                    scope = meta_stat(md, "tf_op")
                    if scope:
                        # "jit(train_step)/while/body/closed_call/jvp(...)/
                        # dot_general:" — the leading segments are control-
                        # flow wrappers (the grad-accum scan puts the WHOLE
                        # step under while/body), worthless for attribution;
                        # strip them and keep the autodiff tag + op, e.g.
                        # "transpose(jvp(jit(flash_attention)))/pallas_call".
                        wrappers = ("while", "body", "closed_call", "cond",
                                    "checkpoint", "remat")
                        parts = [s for s in scope.split("/") if s]
                        while parts and (
                                parts[0] in wrappers
                                or parts[0].startswith(("jit(", "branch_",
                                                        "scan"))):
                            parts.pop(0)
                        by_scope["/".join(parts[:3]) or scope] += dur

    def table(counter, n):
        tot = max(total_ps, 1)
        return [{"name": k, "ms": round(v / 1e9, 3),
                 "pct": round(100 * v / tot, 2)}
                for k, v in counter.most_common(n)]

    busy_ms = total_ps / 1e9
    span_ms = ((span_ps[1] - span_ps[0]) / 1e9
               if span_ps[0] is not None else 0.0)
    return {
        "trace": str(pb_path),
        "planes": [p.name for p in planes],
        "device_busy_ms": round(busy_ms, 3),
        # async DMA window total (start->done spans; overlaps compute, can
        # exceed busy_ms — a traffic signal, not a time budget)
        "async_dma_ms": round(async_ps / 1e9, 3),
        "trace_span_ms": round(span_ms, 3),
        # busy/span < 1 means the device idled — dispatch gaps or host input
        "device_duty_cycle": round(busy_ms / span_ms, 3) if span_ms else None,
        # decode: token-loop vs one-shot prefix (encode+prefill+epilogue);
        # train: the grad-accum scan body vs everything outside it
        "loop_ms": round(loop_ps / 1e9, 3),
        "prefix_ms": round((total_ps - loop_ps) / 1e9, 3),
        "by_category": table(by_cat, top),
        "by_scope": table(by_scope, top),
        "top_ops": table(by_op, top),
    }


if __name__ == "__main__":
    raise SystemExit(main())
