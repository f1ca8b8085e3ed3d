"""Weight-only int8/int4 quantization (the TPU-native use_4bit/use_8bit)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.core.config import LLMConfig
from avsr_tpu.models import llama as L
from avsr_tpu.ops.quant import (
    dequantize,
    is_quantized,
    qdot,
    quant_bytes,
    quantize_llm,
    quantize_tensor,
)

CFG = LLMConfig(vocab_size=64, d_model=32, n_layers=2, n_heads=4,
                n_kv_heads=2, ffn_dim=64, tie_embeddings=True)


def test_int8_roundtrip_error(rng):
    w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    qp = quantize_tensor(w, 8)
    assert qp["qw"].dtype == jnp.int8
    err = np.abs(np.asarray(dequantize(qp) - w))
    # per-channel int8: max error <= scale/2
    assert (err <= np.asarray(qp["scale"])[None, :] * 0.5 + 1e-6).all()


def test_int4_pack_unpack_exact(rng):
    w = jnp.asarray(rng.standard_normal((64, 16)), jnp.float32)
    q8 = quantize_tensor(w, 8)
    q4 = quantize_tensor(w, 4)
    assert q4["qw4h"].shape == (32, 16)
    # unpacked nibbles must be the clipped/rounded int4 grid values
    deq = np.asarray(dequantize(q4))
    scale = np.asarray(q4["scale"])
    grid = deq / scale[None, :]
    assert np.abs(grid - np.round(grid)).max() < 1e-4
    assert np.abs(grid).max() <= 7 + 1e-4   # fp division round-off


def test_qdot_matches_dequant_matmul(rng):
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    for bits in (8, 4):
        qp = quantize_tensor(w, bits)
        np.testing.assert_allclose(
            np.asarray(qdot(x, qp)),
            np.asarray(x @ dequantize(qp)), rtol=1e-5, atol=1e-5)


def test_quantized_llama_close_to_fp(rng):
    params = L.init_llama(jax.random.key(0), CFG)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 6)))
    embeds = L.embed_tokens(params, tokens)
    base, _ = L.llama_apply(params, CFG, inputs_embeds=embeds,
                            use_pallas="never")
    q8 = quantize_llm(params, 8)
    assert is_quantized(q8["layers"][0]["q"])
    out8, _ = L.llama_apply(q8, CFG, inputs_embeds=embeds, use_pallas="never")
    # int8 weight-only should track fp closely at this scale
    base_n = np.asarray(base)
    rel = np.abs(np.asarray(out8) - base_n).max() / (np.abs(base_n).max() + 1e-9)
    assert rel < 0.05, rel

    q4 = quantize_llm(params, 4)
    out4, _ = L.llama_apply(q4, CFG, inputs_embeds=embeds, use_pallas="never")
    rel4 = np.abs(np.asarray(out4) - base_n).max() / (np.abs(base_n).max() + 1e-9)
    assert rel4 < 0.35, rel4
    # int4 memory must be < int8 must be < fp32 for the layer stack
    def layer_bytes(t):
        return quant_bytes({"layers": t["layers"]})
    assert layer_bytes(q4) < layer_bytes(q8) < layer_bytes(params)


def test_quantized_decode_step_runs(rng):
    params = quantize_llm(L.init_llama(jax.random.key(0), CFG), 8)
    cache = L.init_cache(CFG, batch=2, max_len=8, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 1, CFG.d_model)), jnp.float32)
    logits, cache = L.llama_decode_step(params, CFG, x=x, cache=cache,
                                        cur_lens=jnp.array([0, 0]))
    assert logits.shape == (2, CFG.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_quantized_cli_train_and_decode(tmp_path):
    """use_4bit end to end through the real CLIs: quantized frozen LLM base
    (QLoRA-style — adapters stay full precision) trains and decodes
    (ref 4-bit BnB mode, clip_whisper_model.py:913-928)."""
    from avsr_tpu.cli import decode as cli_decode
    from avsr_tpu.cli import train as cli_train

    overrides = [
        "data.synthetic=true", "data.synthetic_size=4", "data.batch_size=8",
        "data.max_label_length=24", "data.audio_buckets=[100]",
        "data.video_buckets=[4]",
        "model.modality=audio",
        "model.use_4bit=true",
        "model.whisper={d_model: 32, n_heads: 2, n_layers: 1, max_frames: 100}",
        "model.llm={vocab_size: 260, d_model: 64, n_layers: 1, n_heads: 4, "
        "n_kv_heads: 2, ffn_dim: 128, max_seq_len: 256, "
        "tie_embeddings: true}",
        "model.lora={use_lora: true, r: 2, alpha: 4}",
        "training.max_steps=3", "training.warmup_steps=1",
        "training.log_interval=1", "training.save_every_steps=0",
        f"training.checkpoint_dir={tmp_path / 'run'}",
        "mesh.remat=false", "mesh.donate=false",
        "runtime.compute_dtype=float32",
        "decode.max_new_tokens=4", "decode.batch_size=8",
        f"decode.output_dir={tmp_path / 'dec'}",
    ]
    assert cli_train.main(overrides) == 0
    assert cli_decode.main(["--checkpoint", str(tmp_path / "run" / "ckpt"),
                            "--split", "train", *overrides]) == 0
    assert list((tmp_path / "dec").glob("wer_*.txt"))


def test_fp_export_loads_with_quantization(tmp_path):
    """A full-precision params export (convert_hf output) must load under
    use_4bit: restore the fp tree, then quantize (the reference's
    load-then-BnB recipe, clip_whisper_model.py:913-928)."""
    import dataclasses

    from avsr_tpu.cli.common import init_or_load_params
    from avsr_tpu.core.config import AVSRConfig, DataConfig, RuntimeConfig
    from avsr_tpu.models.avsr import init_avsr_model
    from avsr_tpu.train.checkpoint import export_params

    import sys
    sys.path.insert(0, "tests")
    from test_models_avsr import tiny_model_cfg

    model = tiny_model_cfg(modality="audio")
    cfg = AVSRConfig(
        data=DataConfig(synthetic=True, audio_buckets=(40,),
                        video_buckets=(4,)),
        model=model, runtime=RuntimeConfig(compute_dtype="float32"))
    fp = init_avsr_model(jax.random.key(1), model)
    export_params(fp, tmp_path / "export")

    qcfg = dataclasses.replace(
        cfg, model=dataclasses.replace(model, use_4bit=True))
    params = init_or_load_params(qcfg, str(tmp_path / "export"))
    layer = params["llm"]["layers"][0]["q"]
    assert "qw4h" in layer or "qw" in layer       # base got quantized
    # and the restored fp values actually flowed in (embed matches export)
    np.testing.assert_array_equal(np.asarray(params["llm"]["embed"]),
                                  np.asarray(fp["llm"]["embed"]))


def test_qmatmul_kernel_parity(rng):
    """The fused decode kernel (interpret mode) matches dequant-matmul for
    int8 and half-split-packed int4, including M not on the sublane tile."""
    from avsr_tpu.ops.qmatmul import qmatmul

    for bits, K, N, M in [(8, 512, 256, 8), (8, 1024, 384, 3),
                          (4, 512, 256, 8), (4, 2048, 128, 5)]:
        w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
        qp = quantize_tensor(w, bits)
        ref = np.asarray(x @ dequantize(qp))
        got = np.asarray(qmatmul(x, qp, interpret=True))
        assert got.shape == (M, N)
        # kernel rounds activations to bf16 for the MXU (weights are int
        # grid values, exact in bf16) — tolerance covers that rounding
        scale = np.abs(ref).max() + 1e-9
        assert np.abs(got - ref).max() / scale < 5e-3


def test_qmatmul_blocks_cover_llama_shapes():
    """Every projection shape of the flagship llama geometry (and the
    128256 vocab head) must be tileable, or decode silently loses the
    kernel and its bandwidth win."""
    from avsr_tpu.ops.qmatmul import _blocks

    for rows, n in [(2048, 2048), (2048, 512), (2048, 8192), (8192, 2048),
                    (1024, 2048), (4096, 2048), (2048, 128256)]:
        picked = _blocks(rows, n, 1.0)
        assert picked is not None, (rows, n)
        bk, bn = picked
        assert rows % bk == 0 and n % bn == 0


def test_lm_head_quantization(rng):
    """quantize_llm(lm_head_bits=...) quantizes the hidden->vocab matmul
    (the largest per-token decode read) while the fp embedding still
    serves token gathers; logits stay close to fp."""
    params = L.init_llama(jax.random.key(0), CFG)
    x = jnp.asarray(rng.standard_normal((2, 3, CFG.d_model)), jnp.float32)
    base = np.asarray(L.compute_logits(params, CFG, x))

    q = quantize_llm(params, 8, lm_head_bits=8)
    assert is_quantized(q["lm_head"])
    np.testing.assert_array_equal(np.asarray(q["embed"]),
                                  np.asarray(params["embed"]))
    got = np.asarray(L.compute_logits(q, CFG, x))
    assert got.dtype == np.float32
    rel = np.abs(got - base).max() / (np.abs(base).max() + 1e-9)
    assert rel < 0.05, rel

    # decode step end to end with quantized layers + head
    cache = L.init_cache(CFG, batch=2, max_len=8, dtype=jnp.float32)
    logits, _ = L.llama_decode_step(q, CFG, x=x[:, :1], cache=cache,
                                    cur_lens=jnp.array([0, 0]))
    assert np.isfinite(np.asarray(logits)).all()


def test_fused_decode_layout_parity(rng):
    """fuse_decode_layout (q|k|v, gate|up concatenation + block-routed
    LoRA b) is exact: fused and unfused trees produce identical prefill
    hidden states and decode-step logits, fp and quantized."""
    from avsr_tpu.core.config import LoRAConfig

    lora = LoRAConfig(use_lora=True, r=2, alpha=4,
                      target_modules=("q_proj", "v_proj"))  # partial on purpose
    params = L.add_lora(jax.random.key(1),
                        L.init_llama(jax.random.key(0), CFG), CFG, lora)
    # give LoRA b nonzero values so fusion errors would show
    def bump(node):
        if isinstance(node, dict) and "lora" in node:
            node = dict(node)
            node["lora"] = {"a": node["lora"]["a"],
                            "b": jnp.ones_like(node["lora"]["b"]) * 0.1}
        return node
    params["layers"] = [{k: bump(v) for k, v in layer.items()}
                        for layer in params["layers"]]

    embeds = jnp.asarray(rng.standard_normal((2, 5, CFG.d_model)), jnp.float32)
    lens = jnp.array([5, 3], jnp.int32)

    for tree in (params, quantize_llm(params, 8, lm_head_bits=8)):
        fused = L.fuse_decode_layout(tree, CFG)
        layer0 = fused["layers"][0]
        assert "qkv" in layer0 and "q" not in layer0
        assert "gateup" in layer0 and "gate" not in layer0

        base, cache_b = L.llama_apply(
            tree, CFG, inputs_embeds=embeds, lengths=lens, lora=lora,
            use_pallas="never", return_cache=True, cache_len=8,
            output="hidden")
        got, cache_f = L.llama_apply(
            fused, CFG, inputs_embeds=embeds, lengths=lens, lora=lora,
            use_pallas="never", return_cache=True, cache_len=8,
            output="hidden")
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   rtol=1e-5, atol=1e-5)

        x = jnp.asarray(rng.standard_normal((2, 1, CFG.d_model)), jnp.float32)
        lb, _ = L.llama_decode_step(tree, CFG, x=x, cache=cache_b,
                                    cur_lens=lens, lora=lora)
        lf, _ = L.llama_decode_step(fused, CFG, x=x, cache=cache_f,
                                    cur_lens=lens, lora=lora)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lb),
                                   rtol=1e-4, atol=1e-4)


def test_prepare_params_for_decode_generates(rng):
    """generate_tokens through the fused layout returns the same tokens."""
    import sys
    sys.path.insert(0, "tests")
    from test_models_avsr import tiny_model_cfg

    from avsr_tpu.models.avsr import Batch, init_avsr_model
    from avsr_tpu.infer.generate import (
        generate_tokens, prepare_params_for_decode)

    mc = tiny_model_cfg(modality="audio")
    params = init_avsr_model(jax.random.key(0), mc)
    B = 2
    batch = Batch(
        mel=jnp.asarray(rng.standard_normal((B, 80, 40)), jnp.float32),
        mel_lens=jnp.array([40, 24], jnp.int32),
        frames=jnp.zeros((B, 1, 3, 16, 16), jnp.float32),
        frame_lens=jnp.ones((B,), jnp.int32),
        prompt_tokens=jnp.asarray(rng.integers(0, 100, (B, 3)), jnp.int32),
        labels=jnp.zeros((B, 4), jnp.int32),
        label_lens=jnp.zeros((B,), jnp.int32),
    )
    base = generate_tokens(params, mc, batch, max_new_tokens=6, eos_id=-1,
                           use_pallas="never")
    fused = prepare_params_for_decode(params, mc)
    got = generate_tokens(fused, mc, batch, max_new_tokens=6, eos_id=-1,
                          use_pallas="never")
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(base.tokens))


def test_legacy_qw4_read_path(rng):
    """Pre-layout-change int4 checkpoints (interleaved "qw4") keep
    dequantizing, and upgrade_legacy_int4 repacks them bit-exactly to the
    current half-split "qw4h" layout (round-1 advisor medium finding)."""
    from avsr_tpu.ops.quant import upgrade_legacy_int4

    w = jnp.asarray(rng.standard_normal((64, 16)), jnp.float32)
    q4 = quantize_tensor(w, 4)
    # Reconstruct the legacy interleaved packing from the logical values.
    logical = np.asarray(dequantize(q4)) / np.asarray(q4["scale"])[None, :]
    q = np.round(logical).astype(np.int8)
    lo = q[0::2] & 0x0F
    hi = (q[1::2] & 0x0F) << 4
    legacy = {"qw4": jnp.asarray((lo | hi).astype(np.int8)),
              "scale": q4["scale"]}
    assert is_quantized(legacy)
    np.testing.assert_array_equal(np.asarray(dequantize(legacy)),
                                  np.asarray(dequantize(q4)))
    # qdot must route legacy trees through the XLA dequant path, not the
    # half-split kernel.
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    np.testing.assert_allclose(np.asarray(qdot(x, legacy)),
                               np.asarray(x @ dequantize(q4)),
                               rtol=1e-5, atol=1e-5)
    upgraded = upgrade_legacy_int4({"layers": [{"down": legacy}]})
    node = upgraded["layers"][0]["down"]
    assert "qw4h" in node and "qw4" not in node
    np.testing.assert_array_equal(np.asarray(node["qw4h"]),
                                  np.asarray(q4["qw4h"]))


def test_legacy_int4_template_structure(rng):
    """legacy_int4_template renames qw4h->qw4 everywhere (same shapes), so
    orbax can restore an old checkpoint into it."""
    from avsr_tpu.ops.quant import legacy_int4_template

    params = L.init_llama(jax.random.key(0), CFG)
    qparams = quantize_llm(params, 4)
    tmpl = legacy_int4_template(qparams)
    n4h = sum("qw4h" == k for k in _all_keys(qparams))
    assert n4h > 0
    assert sum("qw4" == k for k in _all_keys(tmpl)) == n4h
    assert sum("qw4h" == k for k in _all_keys(tmpl)) == 0


def _all_keys(tree):
    out = []

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                out.append(k)
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(tree)
    return out


def test_qdot_explicit_kernel_dispatch(rng):
    """use_kernel threads an explicit dispatch decision into qdot/eligible
    (a static arg at the jitted entry point) instead of reading mutable
    global mesh state at trace time (round-1 advisor low finding)."""
    from avsr_tpu.ops import qmatmul as qm

    w = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)
    qp = quantize_tensor(w, 8)
    # False forces the XLA path regardless of backend/mesh
    assert qm.eligible(4, 256, qp, use_kernel=False) is False
    # numerics are identical either way
    x = jnp.asarray(rng.standard_normal((4, 256)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(qdot(x, qp, use_kernel=False)),
        np.asarray(x @ dequantize(qp)), rtol=1e-5, atol=1e-5)
