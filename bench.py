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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    from avsr_tpu.core.config import load_config
    from avsr_tpu.core.runtime import setup_runtime
    from avsr_tpu.models.avsr import Batch, init_avsr_model
    from avsr_tpu.train.state import create_train_state
    from avsr_tpu.train.step import make_train_step, microbatch

    cfg = load_config("avsr_tpu/configs/base.yaml", {
        "data.audio_buckets": (AUDIO_MEL_FRAMES,),
        "data.video_buckets": (VIDEO_FRAMES,),
        "data.batch_size": BATCH,
        "mesh.remat": False,   # frozen encoders are primal-only; activations fit
        "mesh.donate": True,
    })
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
    batch = Batch(
        mel=jnp.asarray(rng.standard_normal((B, 80, AUDIO_MEL_FRAMES)),
                        jnp.float32),
        mel_lens=jnp.full((B,), AUDIO_MEL_FRAMES, jnp.int32),
        frames=jnp.asarray(
            rng.standard_normal((B, VIDEO_FRAMES, 3, 224, 224)), jnp.bfloat16),
        frame_lens=jnp.full((B,), VIDEO_FRAMES, jnp.int32),
        prompt_tokens=jnp.asarray(rng.integers(0, 1000, (B, 8)), jnp.int32),
        labels=jnp.asarray(rng.integers(0, 1000, (B, 48)), jnp.int32),
        label_lens=jnp.full((B,), 48, jnp.int32),
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
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    utts_per_sec = BATCH * STEPS / dt
    log(f"{STEPS} steps in {dt:.2f}s -> {utts_per_sec:.2f} utt/s "
        f"({dt / STEPS * 1e3:.0f} ms/step)")

    dec = bench_decode(cfg, state.params, batch)
    qdec = bench_decode_quantized(cfg, state.params, batch)

    print(json.dumps({
        "metric": "train_utts_per_sec_per_chip",
        "value": round(utts_per_sec, 3),
        "unit": "utt/s",
        "vs_baseline": round(utts_per_sec / A100_PYTORCH_BASELINE_UTTS_PER_SEC, 3),
        **dec, **qdec,
    }))
    return 0


def _time_decode(cfg, params, batch, label: str,
                 kv_cache_dtype: str = "bfloat16",
                 batch_size: int | None = None) -> tuple[float, float]:
    """Shared greedy-decode timing harness (ref protocol: greedy,
    max_new_tokens=100 — /root/reference/scripts/clip_whisper/decode.py:
    47-49, 544-549): one compile batch, then 3 timed batches.
    Returns (utt/s, new tok/s)."""
    from avsr_tpu.infer.generate import generate_tokens

    max_new = 100

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
    n_batches = 3
    t0 = time.perf_counter()
    for _ in range(n_batches):
        out = run()
    jax.block_until_ready(out.tokens)
    dt = time.perf_counter() - t0
    return bsz * n_batches / dt, bsz * n_batches * max_new / dt


def bench_decode(cfg, params, batch) -> dict:
    """bf16 decode throughput, batch 8. Reported alongside the train metric
    so inference perf is tracked per round (round-1 VERDICT weak #3)."""
    from avsr_tpu.infer.generate import prepare_params_for_decode

    params = prepare_params_for_decode(params, cfg.model)
    utts, toks = _time_decode(cfg, params, batch, "decode")
    log(f"decode: {utts:.2f} utt/s, {toks:.0f} new tok/s "
        f"(greedy, 100 tokens, batch {BATCH})")
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
    # catches up — report the B=32 point as the serving headline
    big = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * (32 // BATCH), axis=0), batch)
    _, toks32 = _time_decode(cfg, qparams, big, "serving decode b32",
                             kv_cache_dtype="int8", batch_size=32)
    log(f"int4+head8+kv8 decode @ batch 32: {toks32:.0f} new tok/s")
    return {"decode_int4_new_tokens_per_sec": round(toks, 1),
            "decode_serving_b32_new_tokens_per_sec": round(toks32, 1)}


if __name__ == "__main__":
    raise SystemExit(main())
