"""Benchmark: flagship AVSR train-step throughput on one TPU chip.

Measures the hot loop of SURVEY.md §3.1 — the jitted bf16 train step
(Whisper-medium encode + CLIP-B/32 encode + connectors + Llama-1B-class
LoRA forward/backward + optimizer) on 10 s utterances with 25 video frames,
batch 8 — and prints ONE JSON line:

    {"metric": "train_utts_per_sec_per_chip", "value": N, "unit": "utt/s",
     "vs_baseline": R}

vs_baseline: the PyTorch reference publishes no numbers (BASELINE.md) and
cannot run here (its HF weights need network); R is measured against a
documented estimate of the reference stack on one A100: batch ~2, ~5
utt/s for this model mix (fp16, single GPU, per-sample host preprocessing).
See BASELINE.md; the estimate is fixed so rounds are comparable.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_PYTORCH_BASELINE_UTTS_PER_SEC = 5.0   # documented estimate, fixed
BATCH = 8
STEPS = 10
AUDIO_MEL_FRAMES = 1000     # 10 s
VIDEO_FRAMES = 25

# Section sizing — every knob the sections use lives here so that --smoke
# (tiny config, CPU, same code path through EVERY section) can rebind them.
# The smoke run exists because round 3 shipped a bench edit that was never
# executed (VERDICT r03 weak #1/#2); tests/test_bench_smoke.py runs it.
CONFIG = "avsr_tpu/configs/base.yaml"
CONFIG_OVERRIDES: dict = {}
MAX_NEW = 100               # ref protocol: decode.py:47-49 greedy, 100 tokens
LABEL_LEN = 48
SERVE_BATCH = 32            # serving-throughput decode point
ENGINE_REQS = 32
ENGINE_K = 32
# multilora matches the engine section's geometry (slots=BATCH, k=ENGINE_K,
# max_new=MAX_NEW) so the bank-less baseline engine REUSES every executable
# the engine section already compiled — the module-level engine jits key on
# static geometry, and a distinct (slots, k, max_new) cost ~300 s of extra
# compiles on the tunneled chip (measured r04: 609 s section at 4/16/60).
MLORA_REQS, MLORA_SLOTS, MLORA_MAX_NEW, MLORA_K = 16, 8, 100, 32
STREAM_CHUNKS = 56          # 0.5 s each
STREAM_BUCKETS = (64, 3000)
STREAM_MAX_NEW = 12
STREAM_WARM, STREAM_WIN = 6, 10   # latency windows past compile warmup
PIPE_BATCHES = 6
PIPE_SRC_PIXELS = 256       # stored video frame edge (decode+resize cost)
SMOKE = False
# Section budget: a partial JSON line (sections missing) beats a killed
# run with no line at all. Recalibrated for round 5 against the DRIVER's
# observed window: the r04 driver run was reaped at ~295 s wall (rc=124,
# VERDICT r04 weak #1). Skipping is PROJECTION-based, not just elapsed-
# based: each section carries a warm-cache time estimate (measured this
# session right after the persistent cache was populated — the r05 session
# discovered prior rounds never wrote the big axon executables to
# ~/.cache/avsr_tpu_xla, so every driver run recompiled everything), the
# observed-vs-expected ratio of the sections already run scales the
# estimates (a cold cache or a slow tunnel day inflates both alike), and a
# section is skipped when its PROJECTED end would overrun the budget. The
# default budget targets the DRIVER window: it deliberately fits only the
# core sections (train/mfu/decode/pipeline + whatever else projects in)
# and sheds the expensive tail by name; the estimates sum to ~18 min, so
# a FULL manual run needs AVSR_BENCH_BUDGET_S=2000 (what `make bench`
# sets). The JSON line also prints incrementally (_emit), so even a
# reaper kill keeps every finished section.
BUDGET_S = float(__import__("os").environ.get("AVSR_BENCH_BUDGET_S", 200))
# Per-section MEDIAN warm seconds across the r05 session's runs — medians,
# not worst cases: the BUDGET provides the safety margin, and worst-case
# estimates proved over-conservative (a 1.3x-slow decode moment projected
# pipeline's 115s worst case over budget and shed a headline section that
# actually costs 33-116 s). "Warm" on this tunnel still pays 35-60 s per
# big executable load, swinging ~3x with tunnel load (decode compile 13 s
# one hour, 59 s the next) — the projection ratio absorbs that.
# multilora's bank-variant compiles never hit the cache (352/372 s across
# runs) — priced honestly so projection always sheds it in a driver
# window.
SECTION_EST = {
    "mfu": 1, "decode": 50, "pipeline": 80, "decode_quant": 145,
    "engine": 190, "beam": 60, "streaming": 45, "multilora": 350,
    "speculative": 60, "d128": 100,
}
# Targeted reruns: AVSR_BENCH_SECTIONS="mfu,decode" runs only those
# sections; AVSR_BENCH_OVERRIDES='{"model.llm.head_dim": 128}' merges
# dotted-key config overrides (used for the D=128 MFU geometry experiment).
SECTIONS = __import__("os").environ.get("AVSR_BENCH_SECTIONS", "")
ENV_OVERRIDES = json.loads(
    __import__("os").environ.get("AVSR_BENCH_OVERRIDES", "{}"))


def _apply_smoke() -> None:
    """Rebind sizing for a minutes-scale CPU run of every section."""
    global SMOKE, CONFIG, CONFIG_OVERRIDES, BATCH, STEPS, BUDGET_S
    global AUDIO_MEL_FRAMES, VIDEO_FRAMES, MAX_NEW, LABEL_LEN, SERVE_BATCH
    global ENGINE_REQS, ENGINE_K, MLORA_REQS, MLORA_SLOTS, MLORA_MAX_NEW
    global MLORA_K, STREAM_CHUNKS, STREAM_BUCKETS, STREAM_MAX_NEW
    global STREAM_WARM, STREAM_WIN, PIPE_BATCHES, PIPE_SRC_PIXELS
    SMOKE = True
    CONFIG = "avsr_tpu/configs/tiny_cpu.yaml"
    # 2 layers so the layer-skip speculative draft (needs 1 <= k < L) runs;
    # modality both + a longer LLM window so fusion + streaming fit.
    CONFIG_OVERRIDES = {"model.modality": "both", "model.llm.n_layers": 2,
                        "model.llm.max_seq_len": 1024}
    BATCH, STEPS = 2, 2
    AUDIO_MEL_FRAMES, VIDEO_FRAMES = 100, 4      # 1 s audio, 4 frames
    MAX_NEW, LABEL_LEN = 8, 12
    SERVE_BATCH = 4
    ENGINE_REQS, ENGINE_K = 4, 4
    MLORA_REQS, MLORA_SLOTS, MLORA_MAX_NEW, MLORA_K = 4, 2, 8, 4
    STREAM_CHUNKS, STREAM_BUCKETS, STREAM_MAX_NEW = 8, (64, 200), 4
    STREAM_WARM, STREAM_WIN = 2, 3
    PIPE_BATCHES, PIPE_SRC_PIXELS = 2, 24
    BUDGET_S = 1e9


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(smoke: bool = False) -> int:
    if smoke:
        _apply_smoke()
        # tiny sizes, no MXU to win on — run on host CPU regardless of any
        # ambient tunneled-TPU platform selection
        jax.config.update("jax_platforms", "cpu")

    from avsr_tpu.core.config import load_config
    from avsr_tpu.core.runtime import setup_runtime
    from avsr_tpu.models.avsr import Batch, init_avsr_model
    from avsr_tpu.train.state import create_train_state
    from avsr_tpu.train.step import make_train_step, microbatch

    base_overrides = {
        **CONFIG_OVERRIDES,
        "data.audio_buckets": (AUDIO_MEL_FRAMES,),
        "data.video_buckets": (VIDEO_FRAMES,),
        "data.batch_size": BATCH,
        "mesh.remat": False,   # frozen encoders are primal-only; activations fit
        "mesh.donate": True,
        **ENV_OVERRIDES,
    }
    cfg = load_config(CONFIG, base_overrides)
    setup_runtime(cfg.runtime)
    log(f"devices: {jax.devices()}")

    from avsr_tpu.train.state import cast_frozen

    t0 = time.perf_counter()
    params = jax.jit(
        lambda k: cast_frozen(init_avsr_model(k, cfg.model), cfg.model))(
            jax.random.key(0))
    jax.block_until_ready(params)
    log(f"init: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    state, tx = create_train_state(params, cfg, total_steps=10_000)
    jax.block_until_ready(state.opt_state)
    log(f"opt init: {time.perf_counter() - t0:.1f}s")
    step_fn = make_train_step(cfg, tx)

    rng = np.random.default_rng(0)
    B = BATCH
    img = cfg.model.clip.image_size
    vmax = min(1000, cfg.model.llm.vocab_size - 2)
    batch = Batch(
        mel=jnp.asarray(rng.standard_normal((B, 80, AUDIO_MEL_FRAMES)),
                        jnp.float32),
        mel_lens=jnp.full((B,), AUDIO_MEL_FRAMES, jnp.int32),
        frames=jnp.asarray(
            rng.standard_normal((B, VIDEO_FRAMES, 3, img, img)), jnp.bfloat16),
        frame_lens=jnp.full((B,), VIDEO_FRAMES, jnp.int32),
        prompt_tokens=jnp.asarray(rng.integers(0, vmax, (B, 8)), jnp.int32),
        labels=jnp.asarray(rng.integers(0, vmax, (B, LABEL_LEN)), jnp.int32),
        label_lens=jnp.full((B,), LABEL_LEN, jnp.int32),
    )
    mb = microbatch(batch, 1)

    t0 = time.perf_counter()
    state, metrics = step_fn(state, mb, jax.random.key(1))
    jax.block_until_ready(metrics["loss"])
    log(f"compile+first step: {time.perf_counter() - t0:.1f}s "
        f"loss={float(metrics['loss']):.4f}")

    t0 = time.perf_counter()
    for i in range(STEPS):
        state, metrics = step_fn(state, mb, jax.random.key(2 + i))
    # value fetch (not block_until_ready) — the only completion signal the
    # tunneled TPU honors reliably; the state chain serializes all steps
    assert np.isfinite(float(metrics["loss"]))
    dt = time.perf_counter() - t0

    utts_per_sec = BATCH * STEPS / dt
    log(f"{STEPS} steps in {dt:.2f}s -> {utts_per_sec:.2f} utt/s "
        f"({dt / STEPS * 1e3:.0f} ms/step)")

    t_start = time.perf_counter()
    metrics_out = {
        "metric": "train_utts_per_sec_per_chip",
        "value": round(utts_per_sec, 3),
        "unit": "utt/s",
        "vs_baseline": round(utts_per_sec / A100_PYTORCH_BASELINE_UTTS_PER_SEC, 3),
    }

    def _emit():
        # The driver reads the LAST stdout line. Re-printing the cumulative
        # line after every section means a run killed mid-section still
        # delivers every section that finished (VERDICT r04 weak #1: the
        # single end-of-run print yielded `parsed: null` twice running).
        print(json.dumps(metrics_out), flush=True)

    # Reaper insurance: the driver kills with SIGTERM (timeout) — dump the
    # cumulative line before dying so nothing measured is ever lost. The
    # handler only fires between Python bytecodes, so a kill inside a long
    # C++ compile won't see it — the incremental _emit above is the real
    # guarantee; this just catches kills that land in host-loop sections.
    import signal

    def _dump_and_exit(signum, frame):  # noqa: ARG001
        log(f"[signal {signum}: emitting cumulative metrics and exiting]")
        # leading newline: the signal may land mid-print inside _emit —
        # terminate any partial stdout line first so the LAST line (what
        # the driver parses) is always complete JSON
        print(flush=True)
        _emit()
        sys.stdout.flush()
        __import__("os")._exit(0)

    if not SMOKE:
        signal.signal(signal.SIGTERM, _dump_and_exit)

    _emit()  # the standing train metric survives even a pre-section kill

    only = {s.strip() for s in SECTIONS.split(",") if s.strip()}
    # environment-speed calibration for the projection skip: ratio of
    # measured to estimated time over the sections run so far (>=1 — a
    # fast day never projects sections CHEAPER than their warm estimate).
    # The ratio only engages once >=30s of estimate has accumulated: a
    # one-time hiccup in a tiny early section (mfu est 1s taking 10s)
    # must not read as a 10x-slow environment and shed everything.
    est_done = [0.0]

    def section(name, fn, *a):
        if only and name not in only:
            log(f"[section {name}: skipped by AVSR_BENCH_SECTIONS]")
            return {}
        # skip-don't-die: projection-based — a partial metrics line still
        # reaches the driver if a cold-cache run approaches the reaper
        elapsed = time.perf_counter() - t_start
        ratio = (max(1.0, elapsed / est_done[0])
                 if est_done[0] >= 30.0 else 1.0)
        projected = elapsed + SECTION_EST.get(name, 60) * ratio
        if not SMOKE and projected > BUDGET_S:
            log(f"[section {name}: SKIPPED, projected end {projected:.0f}s "
                f"(speed ratio {ratio:.1f}) over {BUDGET_S:.0f}s budget]")
            metrics_out.setdefault("skipped_sections", []).append(name)
            _emit()
            return {}
        est_done[0] += SECTION_EST.get(name, 60)
        t0 = time.perf_counter()
        try:
            out = fn(*a)
        except Exception:  # noqa: BLE001 — crash-don't-die, same rationale
            # A section that raises only on the real chip (the CPU smoke
            # can't see Mosaic/runtime failures) must cost its own keys,
            # not the whole run: rc stays 0 and the final JSON still
            # prints. The smoke guard test still fails on missing keys,
            # so code bugs can't hide behind this. failed != skipped in
            # the output (ADVICE r04): a crash names itself.
            import traceback
            log(f"[section {name}: FAILED after "
                f"{time.perf_counter() - t0:.0f}s]")
            traceback.print_exc(file=sys.stderr)
            metrics_out.setdefault("failed_sections", []).append(name)
            _emit()
            return {}
        log(f"[section {name}: {time.perf_counter() - t0:.0f}s, "
            f"total {time.perf_counter() - t_start:.0f}s]")
        metrics_out.update(out)
        _emit()
        return out

    # ordered by evidence value per second under the 180 s driver window:
    # standing headline metrics first (mfu is ~free; decode is the ref
    # protocol; pipeline is the honest from-disk number), serving tiers
    # next, experiments last. `speculative` left out of the default run —
    # its verdict has been stable-negative for three rounds (0.49x at
    # batch 8; docs/serving.md "Measured honesty") and it costs ~50 s;
    # rerun any round via AVSR_BENCH_SECTIONS=speculative. The in-suite
    # distilled-draft experiment (tests/test_speculative.py) keeps the
    # win-regime measured where a draft can actually accept.
    section("mfu", bench_mfu, step_fn, state, mb, dt / STEPS)
    dec = section("decode", bench_decode, cfg, state.params, batch)
    # pipeline runs donating train steps; it threads the live state back
    # through this box so later sections never touch donated buffers
    state_box = [state]
    section("pipeline", bench_pipeline, cfg, state_box, step_fn,
            utts_per_sec)
    state = state_box[0]
    section("decode_quant", bench_decode_quantized, cfg, state.params, batch)
    section("engine", bench_engine, cfg, state.params, batch)
    section("beam", bench_beam, cfg, state.params, batch,
            dec.get("decode_new_tokens_per_sec"))
    section("streaming", bench_streaming, state.params)
    section("multilora", bench_multilora, cfg, state.params)
    if SMOKE or (only and "speculative" in only):
        # smoke always runs it (code-path guard, ~free on the tiny CPU
        # model); the TPU default drops it (stable-negative verdict)
        section("speculative", bench_speculative, cfg, state.params,
                batch, dec.get("decode_new_tokens_per_sec"))
    # terminal section: a second full-model compile at the halved-head
    # (D=128) geometry — dropped first on budget overrun
    section("d128", bench_d128, base_overrides, batch)

    _emit()
    return 0


# Peak dense matmul throughput per chip, bf16 (vendor specs). The bench
# formula: mfu = (XLA-counted FLOPs per train step) / (measured s/step)
# / (peak FLOP/s) — model FLOPs utilization per round-1 VERDICT next-step #9.
_PEAK_BF16_FLOPS = {
    "v4": 275e12, "v5e": 197e12, "v5 lite": 197e12, "v5litepod": 197e12,
    "v5p": 459e12, "v6e": 918e12, "trillium": 918e12,
}


def _chip_peak_flops() -> float | None:
    kind = jax.devices()[0].device_kind.lower()
    for key, peak in _PEAK_BF16_FLOPS.items():
        if key in kind:
            return peak
    return None


def bench_mfu(step_fn, state, mb, sec_per_step: float) -> dict:
    """Model-FLOPs utilization of the train step: the compiler's own FLOP
    count for the compiled executable (cost analysis — counts every fused
    matmul/conv at the precision it runs at) over measured step time and
    chip peak. Reported so rounds optimize efficiency, not just the ratio
    to a fixed A100 estimate."""
    try:
        ca = step_fn.lower(state, mb, jax.random.key(0)).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca["flops"])
    except Exception as e:  # noqa: BLE001 — cost analysis is backend-optional
        log(f"mfu: cost_analysis unavailable ({e})")
        return {}
    peak = _chip_peak_flops()
    if peak is None:
        log(f"mfu: unknown chip {jax.devices()[0].device_kind!r}; "
            f"step flops={flops:.3e}")
        return {"train_step_flops": flops}
    mfu = flops / sec_per_step / peak
    log(f"mfu: {flops:.3e} FLOPs/step / {sec_per_step * 1e3:.0f} ms "
        f"/ {peak:.0f} peak = {mfu:.3f}")
    return {"train_step_flops": flops, "mfu": round(mfu, 4)}


def bench_d128(base_overrides: dict, batch) -> dict:
    """Train throughput at the D=128 head geometry: every head count halved
    at constant width so head_dim doubles (total attention FLOPs unchanged —
    H*D and Hkv*D constant). The round-4 experiment of record
    (docs/performance.md): +15.7% utt/s / +9 MFU points over the flagship
    D=64 shape, because a head's slice fills full (8,128) lane tiles in the
    flash custom calls (less `%copy` layout tax) and the attention einsums
    tile better. The flagship number of record stays D=64 (head counts are
    pinned by pretrained-weight parity); this section keeps the measured
    from-scratch recommendation driver-verified. Runs LAST — budget overrun
    drops it before any standing metric."""
    from avsr_tpu.core.config import load_config
    from avsr_tpu.models.avsr import init_avsr_model
    from avsr_tpu.train.state import cast_frozen, create_train_state
    from avsr_tpu.train.step import make_train_step, microbatch

    # guard (ADVICE r04): if the caller already overrode head counts via
    # AVSR_BENCH_OVERRIDES, halving again would silently measure a
    # quarter-head geometry under the d128_* keys — skip instead.
    clash = [k for k in ENV_OVERRIDES
             if k.endswith((".n_heads", ".n_kv_heads"))]
    if clash:
        log(f"d128: head counts already overridden via env ({clash}) — "
            f"skipped to avoid double-halving")
        return {}

    cfg0 = load_config(CONFIG, base_overrides)
    halved: dict = {}
    for name in ("llm", "whisper", "clip"):
        sub = getattr(cfg0.model, name, None)
        for field in ("n_heads", "n_kv_heads"):
            v = getattr(sub, field, 0) if sub is not None else 0
            if v and v % 2 == 0:
                halved[f"model.{name}.{field}"] = v // 2
    if not halved:
        log("d128: no even head counts to halve — skipped")
        return {}
    cfg = load_config(CONFIG, {**base_overrides, **halved})

    params = jax.jit(
        lambda k: cast_frozen(init_avsr_model(k, cfg.model), cfg.model))(
            jax.random.key(0))
    state, tx = create_train_state(params, cfg, total_steps=10_000)
    step_fn = make_train_step(cfg, tx)
    mb = microbatch(batch, 1)

    t0 = time.perf_counter()
    state, metrics = step_fn(state, mb, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    log(f"d128 compile+first step: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    for i in range(STEPS):
        state, metrics = step_fn(state, mb, jax.random.key(2 + i))
    assert np.isfinite(float(metrics["loss"]))   # value fetch = completion
    dt = time.perf_counter() - t0
    utts = BATCH * STEPS / dt
    out = {"d128_train_utts_per_sec": round(utts, 3)}
    log(f"d128: {STEPS} steps in {dt:.2f}s -> {utts:.2f} utt/s "
        f"({dt / STEPS * 1e3:.0f} ms/step)")
    mfu = bench_mfu(step_fn, state, mb, dt / STEPS)
    if "mfu" in mfu:
        out["d128_mfu"] = mfu["mfu"]
    return out


def bench_pipeline(cfg, state_box, step_fn, device_utts_per_sec: float) -> dict:
    """Train throughput THROUGH the input pipeline: synthetic 10 s WAVs +
    25-frame videos on disk, decoded (native C++ tier), resized, collated,
    log-mel'd and fed by the real DataLoader while the TPU trains —
    pipeline efficiency = loader-fed utt/s / device-only utt/s. The
    north-star "preprocessing never stalls the TPU" as a measured number
    (round-1 VERDICT next-step #7)."""
    import dataclasses
    import shutil
    import tempfile
    from pathlib import Path

    state = state_box[0]

    from avsr_tpu.data.audio_io import write_wav
    from avsr_tpu.data.dataset import _WORDS, ManifestAVSRDataset
    from avsr_tpu.data.loader import DataLoader
    from avsr_tpu.data.manifest import ManifestEntry, write_manifest
    from avsr_tpu.data.tokenizer import load_tokenizer
    from avsr_tpu.train.step import microbatch

    n_utts = PIPE_BATCHES * BATCH
    audio_s = AUDIO_MEL_FRAMES // 100
    tmp = Path(tempfile.mkdtemp(prefix="avsr_bench_pipe_"))
    try:
        media = tmp / "media"
        media.mkdir()
        rng = np.random.default_rng(0)
        entries, labels = [], []
        t = np.arange(16000 * audio_s, dtype=np.float32) / 16000.0
        for i in range(n_utts):
            audio = (0.3 * np.sin(2 * np.pi * float(rng.uniform(80, 300)) * t)
                     + 0.05 * rng.standard_normal(t.shape[0])).astype(np.float32)
            write_wav(media / f"u{i:03d}.wav", audio)
            # stored larger than the model input edge: the host pays a real
            # decode+resize per frame, like LRS3 source video would cost
            np.save(media / f"u{i:03d}.npy",
                    rng.integers(0, 256,
                                 (VIDEO_FRAMES, PIPE_SRC_PIXELS,
                                  PIPE_SRC_PIXELS, 3),
                                 dtype=np.uint8))
            entries.append(ManifestEntry(
                utt_id=f"u{i:03d}", video_path=f"u{i:03d}.npy",
                audio_path=f"u{i:03d}.wav", num_frames=VIDEO_FRAMES,
                num_samples=t.shape[0]))
            labels.append(" ".join(rng.choice(_WORDS, 6)))
        write_manifest(tmp / "train.tsv", media, entries)
        (tmp / "train.wrd").write_text("\n".join(labels) + "\n")

        dcfg = dataclasses.replace(
            cfg.data, path=str(tmp), synthetic=False, batch_size=BATCH,
            audio_buckets=(AUDIO_MEL_FRAMES,), video_buckets=(VIDEO_FRAMES,))
        # production link format: int16 audio + planar YUV420 frames
        # (data.compact_transfer — ~2.3x fewer bytes per AV batch); the raw
        # f32/RGB format is measured alongside for the format's own win.
        dcfg_c = dataclasses.replace(dcfg, compact_transfer=True)
        tok = load_tokenizer(cfg.model.llm_path or None)
        ds = ManifestAVSRDataset(dcfg, tok, split="train", modality="both",
                                 image_size=cfg.model.clip.image_size)

        def run_loader(d):
            nonlocal state
            loader = DataLoader(ds, d, tok, model_cfg=cfg.model,
                                shuffle=False, drop_last=True,
                                compute_dtype=cfg.runtime.compute_dtype)
            # epoch 1: compile the loader-shaped step + warm the page cache
            # for EVERY batch's media (step donates its input state, so
            # always rethread it). The r01-r04 warmup broke after ONE
            # batch, so 5/6 of the timed epoch paid first-touch disk reads
            # — measured 1.8x under the steady state (r05 session:
            # 9.4 -> 15-17 utt/s with a full warm epoch). Real training
            # re-reads the same media every epoch; warm page cache IS the
            # steady state this section claims to measure.
            for _, b in loader:
                state, metrics = step_fn(state, microbatch(b, 1),
                                         jax.random.key(0))
            assert np.isfinite(float(metrics["loss"]))
            t0 = time.perf_counter()
            n = 0
            for _, b in loader:
                state, metrics = step_fn(state, microbatch(b, 1),
                                         jax.random.key(3 + n))
                n += 1
            assert np.isfinite(float(metrics["loss"]))  # serializes the chain
            return loader, n, time.perf_counter() - t0

        # The raw-f32/RGB comparison epoch costs ~35 s on the chip for a
        # number whose verdict is settled (compact won 1.58x r04; the r05
        # session run measured the two within noise on a slow-host day) —
        # smoke keeps the code path guarded, AVSR_BENCH_PIPELINE_RAW=1
        # remeasures it on demand.
        measure_raw = SMOKE or bool(
            __import__("os").environ.get("AVSR_BENCH_PIPELINE_RAW"))
        if measure_raw:
            loader_raw, n_raw, dt_raw = run_loader(dcfg)
            loader_raw.close()
        loader, n, dt = run_loader(dcfg_c)

        # attribution: host-side batch prep alone (media decode + resize +
        # YUV packing + collate, no device transfer/step) — this is what
        # the FRAMEWORK controls. The loader-fed number above additionally
        # pays the host->device link, which on this tunneled chip is
        # ~16-97 MB/s (measured below) vs PCIe's GB/s on a real TPU VM.
        t0 = time.perf_counter()
        nh = 0
        for hb in loader._host_batches():
            nh += 1
        host_dt = time.perf_counter() - t0
        loader.close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    img = cfg.model.clip.image_size
    frames = np.zeros((BATCH, VIDEO_FRAMES, img, img, 3), np.uint8)
    d = jax.device_put(frames)
    _ = float(jnp.asarray(d)[0, 0, 0, 0, 0])
    t0 = time.perf_counter()
    d = jax.device_put(frames)
    _ = float(jnp.asarray(d)[0, 0, 0, 0, 0])
    link_mbs = frames.nbytes / (time.perf_counter() - t0) / 1e6

    utts = n * BATCH / dt
    eff = utts / device_utts_per_sec
    utts_raw = (n_raw * BATCH / dt_raw) if measure_raw else None
    host_utts = nh * BATCH / host_dt
    host_eff = min(host_utts / device_utts_per_sec, 1.0)
    # what the LOADER ships per batch (compact: int16 audio + planar
    # YUV420 frames) — the link-bound throughput ceiling on this host.
    # The adjusted efficiency divides by min(compute ceiling, link
    # ceiling), so the tunneled link's share (16-97 MB/s here vs PCIe's
    # GB/s on a real TPU VM) stops hiding the framework's overlap quality.
    batch_mb = (BATCH * (16000 * audio_s * 2                 # wav i16
                         + VIDEO_FRAMES * img * img * 3 // 2)  # yuv420 u8
                ) / 1e6
    link_utts = link_mbs / batch_mb * BATCH
    # Two ceilings: min(compute, link) assumes the H2D copy overlaps
    # device execution (true of PCIe DMA on a real TPU VM host); this
    # tunneled link SERIALIZES transfers with execution (measured —
    # docs/performance.md round-3 log), so the ceiling it actually
    # permits is 1/(transfer + compute) per batch. The framework's
    # overlap quality is loader-fed vs the serialized ceiling; the
    # overlap-assuming ratio quantifies what a DMA-capable host recovers.
    ceiling = min(device_utts_per_sec, link_utts)
    eff_adj = utts / ceiling
    ceil_serial = BATCH / (batch_mb / link_mbs
                           + BATCH / device_utts_per_sec)
    eff_serial = utts / ceil_serial
    log(f"pipeline: {n} loader-fed steps in {dt:.2f}s -> {utts:.2f} utt/s "
        f"compact link format (raw f32/RGB: "
        f"{f'{utts_raw:.2f}' if utts_raw is not None else 'not measured'}) "
        f"(efficiency {eff:.2f} vs device-only, {eff_adj:.2f} vs "
        f"min(compute, link={link_utts:.1f} utt/s) overlap ceiling, "
        f"{eff_serial:.2f} vs this link's serialized ceiling "
        f"{ceil_serial:.1f} utt/s); host-only "
        f"prep {host_utts:.1f} utt/s (headroom {host_eff:.2f}); "
        f"link {link_mbs:.0f} MB/s at {batch_mb:.0f} MB/batch")
    state_box[0] = state
    return {"pipeline_utts_per_sec": round(utts, 3),
            **({"pipeline_raw_rgb_utts_per_sec": round(utts_raw, 3)}
               if utts_raw is not None else {}),
            "pipeline_efficiency": round(eff, 3),
            "pipeline_efficiency_link_adjusted": round(eff_adj, 3),
            "pipeline_efficiency_vs_serialized_link": round(eff_serial, 3),
            "pipeline_link_ceiling_utts_per_sec": round(link_utts, 3),
            "pipeline_serialized_ceiling_utts_per_sec": round(ceil_serial, 3),
            "pipeline_host_prep_utts_per_sec": round(host_utts, 3),
            "pipeline_host_headroom": round(host_eff, 3),
            "pipeline_link_mb_per_s": round(link_mbs, 1)}


def _time_decode(cfg, params, batch, label: str,
                 kv_cache_dtype: str = "bfloat16",
                 batch_size: int | None = None) -> tuple[float, float]:
    """Shared greedy-decode timing harness (ref protocol: greedy,
    max_new_tokens=100 — /root/reference/scripts/clip_whisper/decode.py:
    47-49, 544-549): one compile batch, then 3 timed batches.
    Returns (utt/s, new tok/s)."""
    from avsr_tpu.infer.generate import generate_tokens

    max_new = MAX_NEW

    def run():
        return generate_tokens(
            params, cfg.model, batch, max_new_tokens=max_new,
            eos_id=-1,  # no EOS in random-init vocab: full 100 tokens
            compute_dtype="bfloat16", use_pallas=cfg.runtime.use_pallas,
            kv_cache_dtype=kv_cache_dtype)

    t0 = time.perf_counter()
    jax.block_until_ready(run().tokens)
    log(f"{label} compile+first batch: {time.perf_counter() - t0:.1f}s")

    bsz = batch_size or BATCH

    def timed(n_batches: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(n_batches):
            out = run()
        jax.block_until_ready(out.tokens)
        return time.perf_counter() - t0

    # slope timing (round-1 VERDICT weak #7): N vs 2N batches cancels the
    # one-time sync/fetch overhead of a measurement on the tunneled TPU;
    # per-call dispatch stays in — it is real serving cost. A discard run
    # first absorbs any still-queued earlier work, which would otherwise
    # land in t3 and bias the slope optimistic.
    timed(1)
    t3, t6 = timed(3), timed(6)
    dt = t6 - t3
    log(f"{label}: 3 batches {t3:.2f}s, 6 batches {t6:.2f}s "
        f"(slope {dt / 3:.2f}s/batch)")
    return bsz * 3 / dt, bsz * 3 * max_new / dt


def bench_decode(cfg, params, batch) -> dict:
    """bf16 decode throughput, batch 8. Reported alongside the train metric
    so inference perf is tracked per round (round-1 VERDICT weak #3)."""
    from avsr_tpu.infer.generate import prepare_params_for_decode

    params = prepare_params_for_decode(params, cfg.model)
    utts, toks = _time_decode(cfg, params, batch, "decode")
    log(f"decode: {utts:.2f} utt/s, {toks:.0f} new tok/s "
        f"(greedy, {MAX_NEW} tokens, batch {BATCH})")
    return {"decode_utts_per_sec": round(utts, 3),
            "decode_new_tokens_per_sec": round(toks, 1)}


def bench_decode_quantized(cfg, params, batch) -> dict:
    """Serving-mode decode: int4 LLM base + int8 lm_head through the fused
    ops.qmatmul Pallas kernel (weight bytes stream packed through VMEM —
    the TPU-native use_4bit, SURVEY.md §7 hard parts) + int8 KV cache."""
    from avsr_tpu.infer.generate import prepare_params_for_decode
    from avsr_tpu.ops.quant import quantize_llm

    qparams = dict(params)
    qparams["llm"] = jax.jit(
        lambda p: quantize_llm(p, 4, lm_head_bits=8))(params["llm"])
    jax.block_until_ready(qparams["llm"])
    qparams = prepare_params_for_decode(qparams, cfg.model)
    _, toks = _time_decode(cfg, qparams, batch, "serving decode",
                           kv_cache_dtype="int8")
    log(f"int4+head8+kv8 decode: {toks:.0f} new tok/s (greedy, batch {BATCH})")

    # serving-batch throughput: decode is weight-bandwidth bound, so
    # tokens/s keeps scaling with batch until the (int8) cache stream
    # catches up — report the B=SERVE_BATCH point as the serving headline
    big = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * (SERVE_BATCH // BATCH), axis=0),
        batch)
    _, toksb = _time_decode(cfg, qparams, big,
                            f"serving decode b{SERVE_BATCH}",
                            kv_cache_dtype="int8", batch_size=SERVE_BATCH)
    log(f"int4+head8+kv8 decode @ batch {SERVE_BATCH}: {toksb:.0f} new tok/s")
    return {"decode_int4_new_tokens_per_sec": round(toks, 1),
            f"decode_serving_b{SERVE_BATCH}_new_tokens_per_sec":
                round(toksb, 1)}


def bench_beam(cfg, params, batch, greedy_toks_per_sec) -> dict:
    """Beam-search cost per sample-token vs greedy (round-1 VERDICT
    next-step #8 done-criterion: <= 1.3x at W=5). The shared-prefix split
    cache keeps the prefill prefix un-duplicated and beam-reindexes only
    the generated-token suffix."""
    from avsr_tpu.infer.generate import beam_search, prepare_params_for_decode

    params = prepare_params_for_decode(params, cfg.model)
    W, max_new = 5, MAX_NEW

    def run(prev=None):
        # chain on the previous output and END with a value fetch —
        # redispatching one executable with IDENTICAL buffers reports
        # impossible times on this link (observed 0.001 ms/sample-token)
        b = batch if prev is None else batch._replace(
            prompt_tokens=batch.prompt_tokens + prev * 0)
        return beam_search(
            params, cfg.model, b, max_new_tokens=max_new, num_beams=W,
            eos_id=-1,  # no EOS in random-init vocab: full 100 tokens
            compute_dtype="bfloat16", use_pallas=cfg.runtime.use_pallas)

    t0 = time.perf_counter()
    jax.block_until_ready(run().tokens)
    log(f"beam W={W} compile+first batch: {time.perf_counter() - t0:.1f}s")

    def timed(n_batches: int) -> float:
        prev = jnp.zeros((), jnp.int32)
        t0 = time.perf_counter()
        for _ in range(n_batches):
            # GenOut.tokens is 2-D [B, max_new] (infer/generate.py:37)
            prev = run(prev).tokens[0, 0]
        assert int(prev) >= 0
        return time.perf_counter() - t0

    timed(1)                            # absorb queued stragglers
    dt = timed(6) - timed(3)            # slope: N vs 2N batches
    beam_ms_tok = dt / (BATCH * 3 * max_new) * 1e3
    res = {"beam_w5_ms_per_sample_token": round(beam_ms_tok, 4)}
    if greedy_toks_per_sec:
        # greedy_toks_per_sec already counts all BATCH rows, so greedy
        # ms/sample-token = 1e3 / rate — no extra batch factor
        ratio = beam_ms_tok * greedy_toks_per_sec / 1e3
        log(f"beam W={W}: {beam_ms_tok:.3f} ms/sample-token "
            f"({ratio:.2f}x greedy)")
        res["beam_w5_vs_greedy_cost_per_token"] = round(ratio, 3)
    return res


def bench_speculative(cfg, params, batch, greedy_toks_per_sec,
                      sweep=None) -> dict:
    """Speculative decoding (infer.speculative), swept over the shipped
    draft configurations: (draft bits, gamma, layer-skip depth). Output is
    token-identical to greedy in every configuration by construction
    (tests/test_speculative); only tokens/s moves. The sweep exists
    because the economics are sharp: a draft proposal costs ~bits/16 +
    L_draft/L of a target step, so profit needs
    gamma * cost_ratio + 1 < E[tokens/pass] — round 2 shipped only
    (int8, gamma=4, full depth), which measures ~0.5x greedy. NOTE the
    acceptance rate on this RANDOM-INIT model is a floor, not a ceiling:
    random logits have near-zero argmax margins, so quantization noise
    flips proposals far more often than on trained weights — and the
    layer-skip draft accepts ~nothing here (its calibration is a
    training-time property; the config exists for LayerSkip-style
    checkpoints and is measured honestly as such)."""
    from avsr_tpu.infer.speculative import (
        make_draft_params,
        make_layerskip_draft,
        speculative_generate,
    )

    max_new = MAX_NEW
    # (label, bits, gamma, skip_layers): the default run measures only the
    # shipped recommendation config — each extra config costs ~150 s of
    # compile on the tunneled chip and the verdicts are stable across
    # rounds. Trimmed-but-measured configs (2026-08, identical loss
    # verdict): layer-skip L/4 int8_g4 716 tok/s at 1.00 tok/pass (random
    # init accepts nothing through a skip draft), int4_g2 485 tok/s,
    # int4_g3 411 tok/s. The sweep table and its economics live in
    # docs/serving.md "Measured honesty"; pass `sweep` to rerun any of it.
    if sweep is None:
        sweep = [("int8_g4", 8, 4, 0)]
        if SMOKE:
            # smoke keeps the layer-skip draft code path guarded (free on
            # the tiny CPU model; trimmed from the TPU run, see above)
            skip_n = max(1, cfg.model.llm.n_layers // 4)
            sweep.append((f"skip{skip_n}_int8_g4", 8, 4, skip_n))
    res: dict = {}
    best = (None, -1.0)
    for label, bits, gamma, skip in sweep:
        if skip > 0:
            d_raw, dcfg = make_layerskip_draft(params, cfg.model, skip)
            draft = jax.jit(
                lambda p, c=dcfg: make_draft_params(p, c, bits=bits))(d_raw)
        else:
            dcfg = None
            draft = jax.jit(
                lambda p: make_draft_params(p, cfg.model, bits=bits))(params)
        jax.block_until_ready(draft["llm"])

        def run(b, stats=False):
            return speculative_generate(
                params, draft, cfg.model, b, gamma=gamma,
                max_new_tokens=max_new, eos_id=-1, compute_dtype="bfloat16",
                use_pallas=cfg.runtime.use_pallas, return_stats=stats,
                draft_model_cfg=dcfg)

        t0 = time.perf_counter()
        out, stats = run(batch, stats=True)
        jax.block_until_ready(out.tokens)
        tpp = float(stats["tokens_per_pass"])
        log(f"spec[{label}] compile+first batch: "
            f"{time.perf_counter() - t0:.1f}s "
            f"(verify passes {int(stats['verify_passes'])}, "
            f"{tpp:.2f} tok/pass of max {gamma + 1})")

        def chain(n_batches: int) -> float:
            prev = jnp.zeros((), jnp.int32)
            t0 = time.perf_counter()
            for _ in range(n_batches):
                b = batch._replace(
                    prompt_tokens=batch.prompt_tokens + prev * 0)
                o = run(b)
                prev = o.tokens[0, 0]
            assert int(prev) >= 0
            return time.perf_counter() - t0

        chain(1)                          # absorb stragglers
        t2, t6 = chain(2), chain(6)
        toks = BATCH * 4 * max_new / (t6 - t2)
        log(f"spec[{label}]: 2-chain {t2:.2f}s, 6-chain {t6:.2f}s -> "
            f"{toks:.0f} new tok/s ({tpp:.2f} tok/pass, batch {BATCH})")
        res[f"spec_{label}_new_tokens_per_sec"] = round(toks, 1)
        res[f"spec_{label}_tokens_per_pass"] = round(tpp, 3)
        if toks > best[1]:
            best = (label, toks)

    res["spec_new_tokens_per_sec"] = round(best[1], 1)
    res["spec_best_config"] = best[0]
    if greedy_toks_per_sec:
        res["spec_vs_greedy_speedup"] = round(best[1] / greedy_toks_per_sec,
                                              3)
        log(f"spec best: {best[0]} at {best[1]:.0f} tok/s "
            f"({best[1] / greedy_toks_per_sec:.2f}x greedy)")
    return res


def bench_engine(cfg, params, batch) -> dict:
    """Continuous batching (infer.engine) vs the static-batch decode
    protocol on ragged transcript lengths. Real speech transcripts end at
    different tokens; a static batch decodes until its LAST row finishes
    (the reference protocol — and our generate_tokens early-exit is
    all-rows-done too), while the engine refills finished slots
    mid-flight. Random-init models never emit EOS, so raggedness is
    simulated with per-request token budgets ~ U(10, 100) (a plausible
    transcript-length spread at max_new=100); the static side pays the
    full 100 — which is what it pays on real data whenever one row in the
    batch runs long."""
    from avsr_tpu.data.dataset import Sample
    from avsr_tpu.data.tokenizer import load_tokenizer
    from avsr_tpu.infer.engine import ServingEngine
    from avsr_tpu.infer.generate import (
        generate_tokens,
        prepare_params_for_decode,
    )

    params = prepare_params_for_decode(params, cfg.model)
    tok = load_tokenizer(cfg.model.llm_path or None)
    rng = np.random.default_rng(7)
    n_req = ENGINE_REQS
    budgets = [int(b) for b in
               rng.integers(max(2, MAX_NEW // 10), MAX_NEW + 1, n_req)]
    t = np.arange(16000 * (AUDIO_MEL_FRAMES // 100),
                  dtype=np.float32) / 16000.0
    samples = [
        Sample(f"u{i:02d}",
               (0.3 * np.sin(2 * np.pi * float(rng.uniform(80, 300)) * t))
               .astype(np.float32), None, "", [tok.eos_id])
        for i in range(n_req)
    ]

    # static baseline: batches of BATCH, full MAX_NEW tokens each. Timing rules on
    # this tunneled chip (see .claude/skills/verify): repeated dispatch of
    # one executable with identical buffers reports fake times, so calls
    # CHAIN on the previous output (prompt_tokens + 0*prev) and end with a
    # value fetch; and the first measurement after a chain can absorb
    # unrelated queued work, so the number of record is the SLOPE between
    # a 2-batch and a 6-batch chain.
    def static_run(b):
        return generate_tokens(
            params, cfg.model, b, max_new_tokens=MAX_NEW, eos_id=-1,
            compute_dtype="bfloat16", use_pallas=cfg.runtime.use_pallas)

    jax.block_until_ready(static_run(batch).tokens)

    def chain(n_batches: int) -> float:
        prev = jnp.zeros((), jnp.int32)
        t0 = time.perf_counter()
        for _ in range(n_batches):
            b = batch._replace(prompt_tokens=batch.prompt_tokens + prev * 0)
            out = static_run(b)
            prev = out.tokens[0, 0]
        assert int(prev) >= 0
        return time.perf_counter() - t0

    chain(2)                     # absorb stragglers from earlier sections
    # even a post-discard chain can absorb stray queued work on this link
    # (observed 2x swings in the 2-chain); sample the slope twice, keep min
    slopes = []
    for _ in range(2):
        t2, t6 = chain(2), chain(6)
        slopes.append((t6 - t2) / 4)
        log(f"engine static baseline: 2-chain {t2:.2f}s, 6-chain {t6:.2f}s "
            f"-> {(t6 - t2) / 4:.2f}s/batch")
    static_dt = min(slopes) * (n_req // BATCH)

    import dataclasses
    ecfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, modality="audio"))
    eng = ServingEngine(params, ecfg, tok, num_slots=BATCH,
                        max_new_tokens=MAX_NEW, k_steps=ENGINE_K)
    eng.warmup(samples[0])   # compile every stage/install size + the chunk
    # four timed passes, keep the best — the first can absorb stray
    # queued work on this link just like the static chains do, and the
    # ~2 s pass is short enough that scheduler-thread jitter on this
    # 1-core host swings single passes by ~15% (r04: 1.74 vs 2.00 s
    # between whole runs); each extra pass is ~2 s
    eng_dt = float("inf")
    for _ in range(4):
        eng.reset_stats()
        t0 = time.perf_counter()
        res = eng.transcribe(samples, max_new_per_request=budgets)
        dt = time.perf_counter() - t0
        assert len(res) == n_req
        log(f"engine pass: {dt:.2f}s")
        eng_dt = min(eng_dt, dt)

    # hardware-independent win: batch-wide decode-loop iterations run.
    # Static pays max_new per batch regardless of raggedness; the engine
    # pays only the steps its adaptive chunks actually execute. Wall-clock
    # additionally reflects the pipelined dispatch (chunk N+1 queued
    # before chunk N is fetched — the chip never idles on the host).
    st = eng.stats()
    eng_steps = st["decode_steps"]
    static_steps = (n_req // BATCH) * MAX_NEW
    speedup = static_dt / eng_dt
    log(f"engine stats: {st}")
    log(f"engine: {n_req} ragged requests (mean budget "
        f"{np.mean(budgets):.0f} tok) in {eng_dt:.2f}s vs static batches "
        f"{static_dt:.2f}s -> {speedup:.2f}x wall; decode steps "
        f"{eng_steps} vs {static_steps} "
        f"({static_steps / max(eng_steps, 1):.2f}x fewer)")
    return {"engine_requests_per_sec": round(n_req / eng_dt, 3),
            "engine_vs_static_speedup": round(speedup, 3),
            "engine_chunk_utilization": st["chunk_utilization"],
            "engine_vs_static_decode_steps": round(
                static_steps / max(eng_steps, 1), 3)}


def bench_multilora(cfg, params) -> dict:
    """Multi-tenant LoRA serving overhead: the same ragged workload
    through two engines over the same RAW base tree — one bank-less, one
    with a 4-adapter bank and tenants striped across requests. The bank
    path adds one gather per lora leaf per stage/chunk plus the
    row-batched low-rank einsums; overhead should be a few percent (the
    adapter bytes are ~2dr/d^2 = 2r/d of the base stream)."""
    import dataclasses

    from avsr_tpu.data.dataset import Sample
    from avsr_tpu.data.tokenizer import load_tokenizer
    from avsr_tpu.infer.adapters import (
        extract_lora,
        random_adapter_like,
        stack_lora_bank,
    )
    from avsr_tpu.infer.engine import ServingEngine

    tok = load_tokenizer(cfg.model.llm_path or None)
    skel = extract_lora(params["llm"])
    bank = stack_lora_bank([
        random_adapter_like(skel, jax.random.key(100 + i))
        for i in range(4)
    ])
    rng = np.random.default_rng(11)
    n_req, slots, max_new = MLORA_REQS, MLORA_SLOTS, MLORA_MAX_NEW
    budgets = [int(b) for b in
               rng.integers(max(2, max_new // 6), max_new + 1, n_req)]
    t = np.arange(16000 * (AUDIO_MEL_FRAMES // 100),
                  dtype=np.float32) / 16000.0
    samples = [
        Sample(f"m{i:02d}",
               (0.3 * np.sin(2 * np.pi * float(rng.uniform(80, 300)) * t))
               .astype(np.float32), None, "", [tok.eos_id])
        for i in range(n_req)
    ]
    ecfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, modality="audio"))

    def timed(bank_arg, aids):
        eng = ServingEngine(params, ecfg, tok, num_slots=slots,
                            max_new_tokens=max_new, k_steps=MLORA_K,
                            adapter_bank=bank_arg)
        eng.warmup(samples[0])
        best = float("inf")
        for _ in range(2):       # first pass can absorb queued work
            t0 = time.perf_counter()
            res = eng.transcribe(samples, max_new_per_request=budgets,
                                 adapter_per_request=aids)
            assert len(res) == n_req
            best = min(best, time.perf_counter() - t0)
        return best

    base_dt = timed(None, None)
    bank_dt = timed(bank, [i % 4 for i in range(n_req)])
    log(f"multilora: bank-less {base_dt:.2f}s vs 4-tenant bank "
        f"{bank_dt:.2f}s -> {bank_dt / base_dt:.3f}x")
    return {"multilora_overhead": round(bank_dt / base_dt, 3)}


def bench_streaming(params) -> dict:
    """Blockwise streaming chunk latency across a ~30 s window (round-1
    VERDICT next-step #8 done-criterion: flat, not growing with the
    buffer). Feeds 0.5 s chunks through StreamingTranscriber with
    decode.stream_block_s=0.5 and compares late-window vs early-window
    mean chunk latency — the exact mode re-encodes and re-prefills the
    whole buffer per chunk, so only KV/prefix reuse keeps this ratio ~1."""
    from avsr_tpu.core.config import load_config
    from avsr_tpu.data.tokenizer import load_tokenizer
    from avsr_tpu.infer.streaming import StreamingTranscriber

    cfg = load_config(CONFIG, {
        **CONFIG_OVERRIDES,
        "model.modality": "audio",
        # small buckets so a 0.5 s block encodes at block cost
        "data.audio_buckets": STREAM_BUCKETS,
        "decode.stream_block_s": 0.5,
        "decode.max_new_tokens": STREAM_MAX_NEW,
    })
    tok = load_tokenizer(cfg.model.llm_path or None)
    st = StreamingTranscriber(params, cfg, tok, agree_n=2)

    rng = np.random.default_rng(0)
    n_chunks, chunk = STREAM_CHUNKS, 8000            # 0.5 s each
    t = np.arange(n_chunks * chunk, dtype=np.float32) / 16000.0
    audio = (0.3 * np.sin(2 * np.pi * 220.0 * t)
             + 0.05 * rng.standard_normal(t.shape[0])).astype(np.float32)

    lat = []
    for i in range(n_chunks):
        t0 = time.perf_counter()
        st.feed(audio=audio[i * chunk:(i + 1) * chunk])
        lat.append(time.perf_counter() - t0)
    w, win = STREAM_WARM, STREAM_WIN                 # past compile warmup
    early = float(np.mean(lat[w:w + win]))
    late = float(np.mean(lat[-win:]))
    ratio = late / early
    log(f"stream: {np.median(lat[w:]) * 1e3:.0f} ms median chunk, "
        f"early {early * 1e3:.0f} ms vs late {late * 1e3:.0f} ms "
        f"({ratio:.2f}x across the window)")
    return {"stream_chunk_ms_median": round(float(np.median(lat[w:])) * 1e3, 1),
            "stream_late_vs_early_chunk_latency": round(ratio, 3)}


if __name__ == "__main__":
    raise SystemExit(main(smoke="--smoke" in sys.argv[1:]))
