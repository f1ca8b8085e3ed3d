"""Continuous-batching serving engine (infer.engine).

The engine's contract: every request's transcript is token-exact vs a
standalone generate_tokens call — slots are just rows, and per-row
numerics are independent of what else is resident. The reference decodes
whole static batches (decode.py:405-440) and has no mid-flight refill.
"""

import numpy as np
import pytest

import jax

from avsr_tpu.core.config import load_config
from avsr_tpu.data.dataset import Sample
from avsr_tpu.data.loader import (
    audio_frontend_for,
    collate,
    featurize,
    image_stats_for,
)
from avsr_tpu.data.tokenizer import load_tokenizer
from avsr_tpu.infer.engine import ServingEngine
from avsr_tpu.infer.generate import generate_tokens
from avsr_tpu.models.avsr import init_avsr_model

CFG = "avsr_tpu/configs/tiny_cpu.yaml"


def _setup():
    cfg = load_config(CFG)
    tok = load_tokenizer(cfg.model.llm_path or None)
    params = init_avsr_model(jax.random.key(0), cfg.model)
    return cfg, tok, params


def _reference_decode(cfg, tok, params, sample: Sample, max_new: int):
    """Standalone single-request decode through the standard path."""
    prompt_ids = tok.encode(cfg.model.prompt, add_bos=True)
    hb = collate([sample], cfg.data, prompt_ids, tok.pad_id)
    batch = featurize(hb, cfg.runtime.compute_dtype,
                      audio_frontend_for(cfg.model),
                      image_stats_for(cfg.model))
    out = generate_tokens(params, cfg.model, batch, max_new_tokens=max_new,
                          eos_id=tok.eos_id,
                          compute_dtype=cfg.runtime.compute_dtype,
                          use_pallas=cfg.runtime.use_pallas)
    n = int(out.lengths[0])
    return [int(t) for t in np.asarray(out.tokens)[0, :n]]


def test_engine_token_exact_with_refill(rng):
    """More requests than slots, ragged audio lengths (both length
    buckets), 2 slots, small chunk size: every transcript must equal the
    standalone generate_tokens result for that request."""
    cfg, tok, params = _setup()
    max_new = 8
    lengths = [4800, 16000, 8000, 12000, 6400]   # mixes the 100/200 buckets
    samples = [
        Sample(f"u{i}", (0.3 * rng.standard_normal(n)).astype(np.float32),
               None, "", [tok.eos_id])
        for i, n in enumerate(lengths)
    ]

    eng = ServingEngine(params, cfg, tok, num_slots=2,
                        max_new_tokens=max_new, k_steps=3)
    got = eng.transcribe(samples)

    assert len(got) == len(samples)
    for i, sample in enumerate(samples):
        want = _reference_decode(cfg, tok, params, sample, max_new)
        assert got[i] == want, (i, got[i], want)


def test_engine_single_slot_serializes(rng):
    """num_slots=1 degenerates to sequential decoding — still exact, and
    the slot is reused across every request (readmission overwrites the
    stale row completely)."""
    cfg, tok, params = _setup()
    samples = [
        Sample(f"u{i}", (0.3 * rng.standard_normal(8000)).astype(np.float32),
               None, "", [tok.eos_id])
        for i in range(3)
    ]
    eng = ServingEngine(params, cfg, tok, num_slots=1, max_new_tokens=6,
                        k_steps=4)
    got = eng.transcribe(samples)
    for i, sample in enumerate(samples):
        assert got[i] == _reference_decode(cfg, tok, params, sample, 6)


def test_cli_decode_engine_matches_static(tmp_path):
    """cli.decode with decode.engine_slots produces the same HYP stream as
    the static-batch path (same seed-deterministic params, greedy)."""
    import re

    from avsr_tpu.cli import decode as cli_decode

    def run(out_dir, extra):
        rc = cli_decode.main([
            "--config", CFG, "--split", "train",
            f"decode.output_dir={out_dir}",
            "decode.max_new_tokens=6",
            *extra,
        ])
        assert rc == 0
        res = sorted(out_dir.glob("results_*.txt"))[-1].read_text()
        return dict(re.findall(r"UTT: (\S+)\nREF: .*\nHYP: (.*)\n", res))

    static = run(tmp_path / "static", [])
    engine = run(tmp_path / "engine", ["decode.engine_slots=3"])
    assert static and engine
    assert engine == static


def test_engine_config_validation():
    import pytest

    from avsr_tpu.core.config import load_config
    with pytest.raises(ValueError, match="num_beams"):
        load_config(CFG, ["decode.engine_slots=2", "decode.num_beams=5"])
    # engine + int8 KV is a SUPPORTED combination (install-time row
    # quantization) — must validate cleanly
    cfg = load_config(CFG, ["decode.engine_slots=2",
                            "decode.kv_cache_dtype=int8"])
    assert cfg.decode.kv_cache_dtype == "int8"


def test_engine_int8_kv_matches_static_int8(rng):
    """decode.kv_cache_dtype=int8 with the engine: staged rows quantize at
    install with per-slot scales — the same per-row math as generate's
    post-prefill quantize_cache — so transcripts are token-exact vs the
    standalone int8 static path."""
    import dataclasses

    from avsr_tpu.data.loader import (
        audio_frontend_for,
        collate,
        featurize,
        image_stats_for,
    )

    cfg, tok, params = _setup()
    cfg = dataclasses.replace(
        cfg, decode=dataclasses.replace(cfg.decode, kv_cache_dtype="int8"))
    samples = [
        Sample(f"u{i}", (0.3 * rng.standard_normal(n)).astype(np.float32),
               None, "", [tok.eos_id])
        for i, n in enumerate([8000, 12000, 6400])
    ]

    def ref_int8(sample, max_new):
        prompt_ids = tok.encode(cfg.model.prompt, add_bos=True)
        hb = collate([sample], cfg.data, prompt_ids, tok.pad_id)
        batch = featurize(hb, cfg.runtime.compute_dtype,
                          audio_frontend_for(cfg.model),
                          image_stats_for(cfg.model))
        out = generate_tokens(params, cfg.model, batch,
                              max_new_tokens=max_new, eos_id=tok.eos_id,
                              compute_dtype=cfg.runtime.compute_dtype,
                              use_pallas=cfg.runtime.use_pallas,
                              kv_cache_dtype="int8")
        n = int(out.lengths[0])
        return [int(t) for t in np.asarray(out.tokens)[0, :n]]

    eng = ServingEngine(params, cfg, tok, num_slots=2, max_new_tokens=6,
                        k_steps=3)
    got = eng.transcribe(samples)
    for i, sample in enumerate(samples):
        assert got[i] == ref_int8(sample, 6), i


def test_engine_per_request_sampling(rng):
    """Mixed workload: greedy rows inside a sampling-trace chunk stay
    token-exact vs standalone greedy decode, sampled rows are reproducible
    for a fixed engine seed, and temperature actually changes the sampled
    row's transcript at high temperature (tiny random-init model => near-
    uniform logits)."""
    cfg, tok, params = _setup()
    samples = [
        Sample(f"u{i}", (0.3 * rng.standard_normal(8000)).astype(np.float32),
               None, "", [tok.eos_id])
        for i in range(4)
    ]
    temps = [0.0, 5.0, 0.0, 5.0]
    tops = [1.0, 0.95, 1.0, 0.95]

    def run(seed):
        eng = ServingEngine(params, cfg, tok, num_slots=2, max_new_tokens=8,
                            k_steps=3, seed=seed)
        return eng.transcribe(samples, temperature_per_request=temps,
                              top_p_per_request=tops)

    got = run(0)
    # greedy rows: exact vs the standalone greedy path
    for i in (0, 2):
        assert got[i] == _reference_decode(cfg, tok, params, samples[i], 8)
    # sampled rows: deterministic given the engine seed
    assert run(0) == got
    # ... and actually sampled: some seed must differ from greedy at T=5
    greedy1 = _reference_decode(cfg, tok, params, samples[1], 8)
    assert any(run(s)[1] != greedy1 for s in range(1, 6))


def test_engine_online_submit_step(rng):
    """Online serving API: requests submitted MID-DECODE (after earlier
    ones already ran chunks) still come back token-exact vs standalone
    decode; step() returns finishes incrementally and collect() pops."""
    cfg, tok, params = _setup()
    mk = lambda i, n: Sample(
        f"u{i}", (0.3 * rng.standard_normal(n)).astype(np.float32),
        None, "", [tok.eos_id])
    first = [mk(0, 8000), mk(1, 12000)]
    late = [mk(2, 6400), mk(3, 16000), mk(4, 8000)]

    eng = ServingEngine(params, cfg, tok, num_slots=2, max_new_tokens=7,
                        k_steps=2)
    ids = [eng.submit(s) for s in first]
    eng.step()                                   # first chunk in flight
    ids += [eng.submit(s) for s in late]         # arrive mid-decode
    finished = {}
    while eng.outstanding():
        finished.update(eng.step())
    assert set(finished) == set(ids)
    for i, sample in zip(ids, first + late):
        assert finished[i] == _reference_decode(cfg, tok, params, sample, 7)
        assert eng.collect(i) == finished[i]
        assert eng.collect(i) is None            # popped


def test_engine_stats_telemetry(rng):
    """stats() accounting: every request completes, token counts match the
    returned transcripts, chunk utilization is in (0, 1], and warmup work
    is excluded."""
    cfg, tok, params = _setup()
    samples = [
        Sample(f"u{i}", (0.3 * rng.standard_normal(8000)).astype(np.float32),
               None, "", [tok.eos_id])
        for i in range(5)
    ]
    eng = ServingEngine(params, cfg, tok, num_slots=2, max_new_tokens=6,
                        k_steps=3)
    eng.warmup(samples[0])
    assert eng.stats()["chunks_run"] == 0          # warmup excluded
    got = eng.transcribe(samples)
    st = eng.stats()
    assert st["requests_done"] == 5
    assert st["tokens_emitted"] == sum(len(g) for g in got)
    assert st["stages_run"] >= 3                   # 5 reqs at width <= 2
    assert st["installs_run"] >= st["stages_run"]
    assert 0.0 < st["chunk_utilization"] <= 1.0


def test_engine_with_tp_sharded_params(rng):
    """Distributed serving: the engine with megatron-TP/fsdp-sharded
    params on the virtual mesh produces the same transcripts as with
    unsharded params — NamedShardings propagate through stage/install/
    decode_chunk while the slot pool stays replicated (what cli.decode
    promises for decode.engine_slots under a mesh)."""
    from avsr_tpu.core.config import MeshConfig
    from avsr_tpu.mesh.sharding import build_mesh, shard_params

    cfg, tok, params = _setup()
    samples = [
        Sample(f"u{i}", (0.3 * rng.standard_normal(8000)).astype(np.float32),
               None, "", [tok.eos_id])
        for i in range(3)
    ]

    eng = ServingEngine(params, cfg, tok, num_slots=2, max_new_tokens=6,
                        k_steps=3)
    ref = eng.transcribe(samples)

    mesh = build_mesh(MeshConfig(dp=2, fsdp=2, sp=1, tp=2))
    sharded = shard_params(params, mesh)
    eng2 = ServingEngine(sharded, cfg, tok, num_slots=2, max_new_tokens=6,
                         k_steps=3)
    assert eng2.transcribe(samples) == ref


def test_engine_av_modality(rng):
    """Engine admits audio+video requests too (encode handles modality from
    the config; slots are modality-agnostic rows)."""
    import dataclasses

    cfg, tok, params = _setup()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, modality="both"))
    params = init_avsr_model(jax.random.key(0), cfg.model)
    samples = [
        Sample(f"u{i}", (0.3 * rng.standard_normal(8000)).astype(np.float32),
               rng.integers(0, 256, (4, 16, 16, 3)).astype(np.uint8),
               "", [tok.eos_id])
        for i in range(3)
    ]
    eng = ServingEngine(params, cfg, tok, num_slots=2, max_new_tokens=5,
                        k_steps=2)
    got = eng.transcribe(samples)
    for i, sample in enumerate(samples):
        assert got[i] == _reference_decode(cfg, tok, params, sample, 5)


def test_engine_reset_recovers(rng):
    """reset() is the server's fault-recovery hatch: mid-flight work is
    abandoned (ids never finish), every slot returns to idle, and the
    pool then serves fresh requests token-exact — stale cache columns
    must not leak into post-reset decodes."""
    cfg, tok, params = _setup()
    max_new = 6
    samples = [
        Sample(f"r{i}", (0.3 * rng.standard_normal(n)).astype(np.float32),
               None, "", [tok.eos_id])
        for i, n in enumerate([4800, 8000, 6400])
    ]
    eng = ServingEngine(params, cfg, tok, num_slots=2,
                        max_new_tokens=max_new, k_steps=2)
    ids = [eng.submit(s) for s in samples]
    eng.step()                                   # work genuinely in flight
    assert eng.outstanding() > 0
    eng.reset()
    assert eng.outstanding() == 0
    assert eng.done.all()
    assert all(eng.collect(i) is None for i in ids)   # abandoned, not stale
    got = eng.transcribe(samples)                     # pool fully usable
    for i, sample in enumerate(samples):
        assert got[i] == _reference_decode(cfg, tok, params, sample,
                                           max_new), i


def test_engine_cancel_reclaims_capacity(rng):
    """cancel() across the request lifecycle: resident (row masked from
    the next chunk, slot freed now), staged/queued (swept at the next
    install), unknown and already-finished (False). Cancelled ids never
    appear in step() results and the survivors stay token-exact."""
    cfg, tok, params = _setup()
    max_new = 6
    samples = [
        Sample(f"c{i}", (0.3 * rng.standard_normal(n)).astype(np.float32),
               None, "", [tok.eos_id])
        for i, n in enumerate([4800, 8000, 6400, 12000])
    ]
    eng = ServingEngine(params, cfg, tok, num_slots=2,
                        max_new_tokens=max_new, k_steps=2)
    ids = [eng.submit(s) for s in samples]
    eng.step()                        # 0/1 resident; 2/3 staged ahead
    assert eng.cancel(ids[0])         # resident
    assert eng.cancel(ids[3])         # staged
    assert not eng.cancel(9999)       # unknown
    finished = {}
    while eng.outstanding():
        finished.update(eng.step())
    assert ids[0] not in finished and ids[3] not in finished
    for rid, s in ((ids[1], samples[1]), (ids[2], samples[2])):
        assert finished[rid] == _reference_decode(cfg, tok, params, s,
                                                  max_new)
    assert not eng.cancel(ids[1])     # finished: collect, don't cancel
    assert eng.requests_cancelled == 2
    assert eng.stats()["requests_cancelled"] == 2


def test_engine_multi_adapter_token_exact(rng):
    """Multi-tenant LoRA serving: one base model + a 2-adapter bank,
    tenants interleaved in one pool. Each request must be token-exact vs
    a standalone generate_tokens call with ITS adapter grafted onto the
    base tree — per-row adapter gather must not leak across slots. The
    adapters have random (nonzero) B matrices, so if the engine ignored
    the bank entirely every comparison would fail."""
    from avsr_tpu.infer.adapters import (
        extract_lora,
        inject_lora,
        random_adapter_like,
        stack_lora_bank,
    )

    cfg, tok, params = _setup()        # tiny_cpu: lora r=2 on the LLM
    skel = extract_lora(params["llm"])
    a1 = random_adapter_like(skel, jax.random.key(11), std=0.5)
    a2 = random_adapter_like(skel, jax.random.key(22), std=0.5)
    bank = stack_lora_bank([a1, a2])

    max_new = 6
    samples = [
        Sample(f"m{i}", (0.3 * rng.standard_normal(n)).astype(np.float32),
               None, "", [tok.eos_id])
        for i, n in enumerate([4800, 8000, 6400, 12000, 4800])
    ]
    aids = [0, 1, 1, 0, 1]
    eng = ServingEngine(params, cfg, tok, num_slots=2,
                        max_new_tokens=max_new, k_steps=2,
                        adapter_bank=bank)
    got = eng.transcribe(samples, adapter_per_request=aids)

    refs = {}
    for aid, adapter in ((0, a1), (1, a2)):
        p = dict(params)
        p["llm"] = inject_lora(params["llm"], adapter)
        refs[aid] = p
    for i, (s, aid) in enumerate(zip(samples, aids)):
        want = _reference_decode(cfg, tok, refs[aid], s, max_new)
        assert got[i] == want, (i, aid, got[i], want)
    # teeth: the two tenants really decode differently on this input
    assert (_reference_decode(cfg, tok, refs[0], samples[0], max_new)
            != _reference_decode(cfg, tok, refs[1], samples[0], max_new))

    import pytest as _pytest
    with _pytest.raises(ValueError):
        eng.submit(samples[0], adapter=2)        # out of range


def test_engine_multi_adapter_quantized_base(rng):
    """QLoRA-style multi-tenant serving: int8 weight-only base + bf16
    per-tenant adapters. The quantized base streams ~half the bytes;
    adapters still apply row-batched on top — each request token-exact vs
    generate_tokens on the same quantized base with its adapter."""
    from avsr_tpu.infer.adapters import (
        extract_lora,
        inject_lora,
        random_adapter_like,
        stack_lora_bank,
    )
    from avsr_tpu.ops.quant import quantize_llm

    cfg, tok, params = _setup()
    qparams = dict(params)
    qparams["llm"] = quantize_llm(params["llm"], 8)
    skel = extract_lora(qparams["llm"])
    a1 = random_adapter_like(skel, jax.random.key(5), std=0.5)
    a2 = random_adapter_like(skel, jax.random.key(6), std=0.5)
    bank = stack_lora_bank([a1, a2])

    max_new = 5
    samples = [
        Sample(f"q{i}", (0.3 * rng.standard_normal(n)).astype(np.float32),
               None, "", [tok.eos_id])
        for i, n in enumerate([4800, 8000, 6400])
    ]
    aids = [1, 0, 1]
    eng = ServingEngine(qparams, cfg, tok, num_slots=2,
                        max_new_tokens=max_new, k_steps=2,
                        adapter_bank=bank)
    got = eng.transcribe(samples, adapter_per_request=aids)
    for i, (s, aid) in enumerate(zip(samples, aids)):
        p = dict(qparams)
        p["llm"] = inject_lora(qparams["llm"], (a1, a2)[aid])
        want = _reference_decode(cfg, tok, p, s, max_new)
        assert got[i] == want, (i, aid, got[i], want)


def test_load_multilora_from_export(tmp_path):
    """CLI bank loading: base + adapter checkpoints (params exports) ->
    (raw base, stacked bank) that constructs a multi-tenant engine."""
    from avsr_tpu.cli.common import load_multilora
    from avsr_tpu.infer.adapters import bank_size
    from avsr_tpu.train.checkpoint import export_params

    cfg, tok, params = _setup()
    export_params(params, tmp_path / "base")
    base, bank = load_multilora(cfg, str(tmp_path / "base"),
                                [str(tmp_path / "base")] * 2)
    assert bank_size(bank) == 2
    eng = ServingEngine(base, cfg, tok, num_slots=2, adapter_bank=bank)
    assert eng._n_adapters == 2


def test_engine_add_adapter_hot_onboard(rng):
    """Runtime tenant onboarding on a bank-less engine: the first
    add_adapter creates the bank with row 0 = zeros base (id-0 requests
    stay token-exact vs the bank-less engine), tenants land at 1 and 2
    (the second forces a capacity doubling), and each decodes token-exact
    vs generate_tokens with its adapter injected."""
    from avsr_tpu.infer.adapters import (
        extract_lora,
        inject_lora,
        random_adapter_like,
    )

    cfg, tok, params = _setup()
    skel = extract_lora(params["llm"])
    a1 = random_adapter_like(skel, jax.random.key(31), std=0.5)
    a2 = random_adapter_like(skel, jax.random.key(32), std=0.5)
    max_new = 5
    samples = [
        Sample(f"h{i}", (0.3 * rng.standard_normal(n)).astype(np.float32),
               None, "", [tok.eos_id])
        for i, n in enumerate([4800, 8000, 6400])
    ]

    eng = ServingEngine(params, cfg, tok, num_slots=2,
                        max_new_tokens=max_new, k_steps=2)
    assert eng.add_adapter(a1) == 1
    assert eng.add_adapter(a2) == 2        # capacity doubles 2 -> 4
    got = eng.transcribe(samples, adapter_per_request=[0, 1, 2])

    assert got[0] == _reference_decode(cfg, tok, params, samples[0],
                                       max_new)      # zeros row == base
    for i, a in ((1, a1), (2, a2)):
        p = dict(params)
        p["llm"] = inject_lora(params["llm"], a)
        assert got[i] == _reference_decode(cfg, tok, p, samples[i],
                                           max_new), i


def test_engine_moe_token_exact(rng):
    """MoE connector AND MoE LLM through the engine under a squeezing
    capacity factor: staged (batched) encode+prefill + chunked decode
    must match standalone generate_tokens per request. Inference routes
    MoE per-sequence (moe_rowwise at every inference encode/prefill
    site) — with the flattened training capacity, batch composition at
    the staging width would drop tokens and break this.

    The sample list deliberately MIXES length buckets (tiny config
    buckets are 100/200 mel frames; samples 0+1 stage together with
    num_slots=2): the engine pads that group to bucket 200 while the
    standalone reference pads sample 0 to its own bucket 100, so a
    rowwise capacity derived from the PADDED width (instead of
    ops.moe.capacity_dyn on the valid length) diverges here."""
    cfg = load_config(CFG, {"model.connector_type": "moe",
                            "model.moe_experts": 4,
                            "model.moe_topk": 2,
                            "model.moe_capacity_factor": 0.25,
                            "model.llm.moe_experts": 4,
                            "model.llm.moe_topk": 2,
                            "model.llm.moe_capacity_factor": 0.25})
    tok = load_tokenizer(cfg.model.llm_path or None)
    params = init_avsr_model(jax.random.key(0), cfg.model)
    max_new = 5
    samples = [
        Sample(f"e{i}", (0.3 * rng.standard_normal(n)).astype(np.float32),
               None, "", [tok.eos_id])
        for i, n in enumerate([4800, 24000, 8000, 6400])
    ]
    eng = ServingEngine(params, cfg, tok, num_slots=2,
                        max_new_tokens=max_new, k_steps=2)
    got = eng.transcribe(samples)
    for i, s in enumerate(samples):
        assert got[i] == _reference_decode(cfg, tok, params, s, max_new), i


# ---------------------------------------------------------------------------
# Speculative serving: slot-granular draft/verify inside the engine
# ---------------------------------------------------------------------------

def _spec_engine(params, cfg, tok, *, gamma=3, rounds=2, slots=2,
                 max_new=8, draft_bits=8):
    from avsr_tpu.infer.speculative import make_draft_params

    draft = make_draft_params(params, cfg.model, bits=draft_bits)
    return ServingEngine(params, cfg, tok, num_slots=slots,
                         max_new_tokens=max_new, k_steps=3,
                         draft_params=draft, spec_gamma=gamma,
                         spec_rounds=rounds)


def test_engine_spec_token_exact_with_refill(rng):
    """Speculative serving keeps the engine contract: with a quantized
    self-draft proposing per slot and one [S, gamma+1] verify pass per
    round, every transcript equals the standalone GREEDY generate_tokens
    result — across mixed length buckets, more requests than slots, and
    mid-flight refills (acceptance varies per slot per round)."""
    cfg, tok, params = _setup()
    max_new = 8
    lengths = [4800, 16000, 8000, 12000, 6400]
    samples = [
        Sample(f"u{i}", (0.3 * rng.standard_normal(n)).astype(np.float32),
               None, "", [tok.eos_id])
        for i, n in enumerate(lengths)
    ]
    eng = _spec_engine(params, cfg, tok, gamma=3, rounds=2, slots=2,
                       max_new=max_new)
    got = eng.transcribe(samples)
    assert len(got) == len(samples)
    for i, sample in enumerate(samples):
        want = _reference_decode(cfg, tok, params, sample, max_new)
        assert got[i] == want, (i, got[i], want)


def test_engine_spec_layerskip_draft_token_exact(rng):
    """Layer-skip serving (decode.spec_draft_layers): the engine carries
    a SECOND, shallower slot-cache geometry for the early-exit draft.
    Acceptance on a random-init model is near zero — the worst case for
    the catch-up/rewind logic — and every transcript must still equal
    standalone greedy generate_tokens."""
    import dataclasses

    from avsr_tpu.infer.speculative import (
        make_draft_params,
        make_layerskip_draft,
    )

    cfg, tok, params = _setup()
    # tiny_cpu is 1 LLM layer — layer-skip needs depth to skip
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, llm=dataclasses.replace(cfg.model.llm, n_layers=2)))
    params = init_avsr_model(jax.random.key(0), cfg.model)
    d_raw, dcfg = make_layerskip_draft(params, cfg.model, 1)
    draft = make_draft_params(d_raw, dcfg, bits=8)
    max_new = 7
    samples = [
        Sample(f"u{i}", (0.3 * rng.standard_normal(n)).astype(np.float32),
               None, "", [tok.eos_id])
        for i, n in enumerate([4800, 16000, 8000, 6400])
    ]
    eng = ServingEngine(params, cfg, tok, num_slots=2,
                        max_new_tokens=max_new, k_steps=3,
                        draft_params=draft, draft_model_cfg=dcfg,
                        spec_gamma=2, spec_rounds=2)
    assert eng.d_cache.k.shape[0] == 1      # draft cache depth = 1 layer
    got = eng.transcribe(samples)
    for i, sample in enumerate(samples):
        want = _reference_decode(cfg, tok, params, sample, max_new)
        assert got[i] == want, (i, got[i], want)


def test_engine_spec_identical_draft_token_exact(rng):
    """Degenerate oracle: the TARGET ITSELF as draft (acceptance ~100%,
    exercising the full-accept gap==2 catch-up path every round) must
    still be token-exact, including the online submit/step interface with
    a mid-flight second wave."""
    from avsr_tpu.models.llama import fuse_decode_layout

    cfg, tok, params = _setup()
    draft = dict(params)
    draft["llm"] = fuse_decode_layout(params["llm"], cfg.model.llm)
    max_new = 10
    samples = [
        Sample(f"u{i}", (0.3 * rng.standard_normal(n)).astype(np.float32),
               None, "", [tok.eos_id])
        for i, n in enumerate([8000, 16000, 4800])
    ]
    eng = ServingEngine(params, cfg, tok, num_slots=2,
                        max_new_tokens=max_new, k_steps=3,
                        draft_params=draft, spec_gamma=2, spec_rounds=3)
    first = [eng.submit(s) for s in samples[:2]]
    eng.step()
    late = eng.submit(samples[2])        # mid-flight submission
    done = {}
    for _ in range(60):
        done.update(eng.step())
        if len(done) == 3:
            break
    for rid, s in zip(first + [late], samples):
        want = _reference_decode(cfg, tok, params, s, max_new)
        assert done[rid][: len(want)] == want[: len(done[rid])]
        assert done[rid] == want, (rid, done[rid], want)


def test_engine_spec_validation():
    cfg, tok, params = _setup()
    import dataclasses

    import pytest

    from avsr_tpu.infer.speculative import make_draft_params

    with pytest.raises(ValueError, match="draft_params"):
        ServingEngine(params, cfg, tok, num_slots=2, spec_gamma=2)
    draft = make_draft_params(params, cfg.model, bits=8)
    int8cfg = dataclasses.replace(
        cfg, decode=dataclasses.replace(cfg.decode, kv_cache_dtype="int8"))
    with pytest.raises(ValueError, match="full-precision slot cache"):
        ServingEngine(params, int8cfg, tok, num_slots=2,
                      draft_params=draft, spec_gamma=2)
    eng = ServingEngine(params, cfg, tok, num_slots=2,
                        draft_params=draft, spec_gamma=2)
    s = Sample("u", np.zeros(4800, np.float32), None, "", [tok.eos_id])
    with pytest.raises(ValueError, match="greedy-only"):
        eng.submit(s, temperature=0.7)


@pytest.mark.slow   # 12.2s measured r05 — fast-tier budget policy
def test_cli_decode_engine_spec_matches_static(tmp_path):
    """cli.decode with engine_slots + speculative: same HYP stream as the
    plain greedy static path (spec never changes tokens, the engine never
    changes per-request numerics — composed, still exact)."""
    import re

    from avsr_tpu.cli import decode as cli_decode

    def run(out_dir, extra):
        rc = cli_decode.main([
            "--config", CFG, "--split", "train",
            f"decode.output_dir={out_dir}",
            "decode.max_new_tokens=6",
            *extra,
        ])
        assert rc == 0
        res = sorted(out_dir.glob("results_*.txt"))[-1].read_text()
        return dict(re.findall(r"UTT: (\S+)\nREF: .*\nHYP: (.*)\n", res))

    static = run(tmp_path / "static", [])
    spec = run(tmp_path / "spec", [
        "decode.engine_slots=3", "decode.speculative=true",
        "decode.spec_gamma=2"])
    assert static and spec
    assert spec == static
    # layer-skip draft through the CLI knob (decode.spec_draft_layers):
    # needs >= 2 LLM layers, so both runs override the depth consistently
    static2 = run(tmp_path / "static2", ["model.llm.n_layers=2"])
    skip = run(tmp_path / "skip", [
        "model.llm.n_layers=2", "decode.engine_slots=3",
        "decode.speculative=true", "decode.spec_gamma=2",
        "decode.spec_draft_layers=1"])
    assert static2 and skip == static2
    # greedy-only composition is a config-time error with temperature
    import pytest

    from avsr_tpu.core.config import load_config
    with pytest.raises(ValueError, match="greedy-only"):
        load_config(CFG, ["decode.engine_slots=2", "decode.speculative=true",
                          "decode.temperature=0.8"])


def test_engine_spec_rejects_mismatched_depth_draft():
    """A draft whose depth disagrees with its declared config cannot size
    the engine's draft slot-cache — rejected loudly (a silent mismatch
    would scatter prefill rows into the wrong geometry)."""
    cfg, tok, params = _setup()
    import pytest

    draft = dict(params)
    draft["llm"] = dict(params["llm"])
    draft["llm"]["layers"] = (list(params["llm"]["layers"])
                              + [params["llm"]["layers"][0]])
    with pytest.raises(ValueError, match="draft_model_cfg"):
        ServingEngine(params, cfg, tok, num_slots=2,
                      draft_params=draft, spec_gamma=2)


def test_engine_compact_transfer_token_exact(rng):
    """data.compact_transfer (int16 PCM staging transfers) composes with
    the engine: featurize reconstructs identically on the engine's staging
    path and the standalone path, so transcripts stay token-exact."""
    cfg = load_config(CFG, {"data.compact_transfer": True})
    tok = load_tokenizer(cfg.model.llm_path or None)
    params = init_avsr_model(jax.random.key(0), cfg.model)
    max_new = 6
    samples = [
        Sample(f"u{i}", (0.3 * rng.standard_normal(n)).astype(np.float32),
               None, "", [tok.eos_id])
        for i, n in enumerate([4800, 16000, 8000])
    ]
    eng = ServingEngine(params, cfg, tok, num_slots=2,
                        max_new_tokens=max_new, k_steps=3)
    got = eng.transcribe(samples)
    for i, sample in enumerate(samples):
        want = _reference_decode(cfg, tok, params, sample, max_new)
        assert got[i] == want, f"request {i} diverged"
