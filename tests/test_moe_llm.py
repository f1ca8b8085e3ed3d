"""Sparse MoE FFN layers inside the LLM (llm.moe_experts, ops.moe).

TPU-native scaling extension: every moe_every-th Llama block swaps its
SwiGLU MLP for capacity-routed SwiGLU experts sharded over mesh.ep.
Tests: single-expert degenerate exactness vs dense, decode-path
consistency (KV-cache steps == teacher forcing), train-step aux + grads,
speculative decode compatibility (exercises prefill_continue + decode
steps + full apply in one contract), ep2 equivalence on the virtual mesh,
and config validation.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.core.config import LLMConfig
from avsr_tpu.models import llama as L
from avsr_tpu.models.avsr import forward, init_avsr_model
from avsr_tpu.models.llama import is_moe_layer

from test_models_avsr import tiny_batch, tiny_model_cfg
from test_train import tiny_avsr_cfg

MOE_LLM = LLMConfig(vocab_size=64, d_model=32, n_layers=2, n_heads=4,
                    n_kv_heads=2, ffn_dim=64, max_seq_len=128,
                    moe_experts=4, moe_topk=2)


def _moe_model_cfg(**kw):
    llm_kw = kw.pop("llm_kw", {})
    return tiny_model_cfg(
        modality="audio",
        llm=dataclasses.replace(MOE_LLM, **llm_kw), **kw)


def test_single_expert_matches_dense(rng):
    """E=1, topk=1, generous capacity: the MoE block must equal a dense
    block built from expert 0's weights."""
    dense_cfg = dataclasses.replace(MOE_LLM, moe_experts=0)
    moe_cfg = dataclasses.replace(MOE_LLM, moe_experts=1, moe_topk=1,
                                  moe_capacity_factor=4.0)
    dense = L.init_llama(jax.random.key(0), dense_cfg)
    moe = jax.tree_util.tree_map(lambda x: x, dense)
    layers = []
    for layer in dense["layers"]:
        nl = {k: v for k, v in layer.items()
              if k not in ("gate", "up", "down")}
        nl["router"] = {"w": jnp.zeros((dense_cfg.d_model, 1))}
        nl["experts"] = {
            "w_gate": layer["gate"]["w"][None],
            "w_up": layer["up"]["w"][None],
            "w_down": layer["down"]["w"][None],
        }
        layers.append(nl)
    moe["layers"] = layers

    B, T = 2, 12
    tokens = jnp.asarray(rng.integers(0, dense_cfg.vocab_size, (B, T)))
    embeds = L.embed_tokens(dense, tokens)
    lens = jnp.array([12, 7], jnp.int32)
    ref, _ = L.llama_apply(dense, dense_cfg, inputs_embeds=embeds,
                           lengths=lens, use_pallas="never")
    got, _, aux = L.llama_apply(moe, moe_cfg, inputs_embeds=embeds,
                                lengths=lens, use_pallas="never",
                                return_aux=True)
    np.testing.assert_allclose(np.asarray(got)[0, :12],
                               np.asarray(ref)[0, :12],
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(got)[1, :7],
                               np.asarray(ref)[1, :7],
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(float(aux["moe_lb"]), 1.0, rtol=1e-5)


@pytest.mark.slow   # 16.4s measured r05 — fast-tier budget policy
def test_moe_decode_step_matches_full_forward(rng):
    """KV-cache decode through MoE layers == teacher-forced logits."""
    params = L.init_llama(jax.random.key(1), MOE_LLM)
    B, T = 2, 8
    tokens = jnp.asarray(rng.integers(0, MOE_LLM.vocab_size, (B, T)))
    embeds = L.embed_tokens(params, tokens)
    _, cache = L.llama_apply(params, MOE_LLM, inputs_embeds=embeds,
                             return_cache=True, cache_len=16,
                             use_pallas="never")
    nxt = jnp.asarray(rng.integers(0, MOE_LLM.vocab_size, (B, 1)))
    step_logits, _ = L.llama_decode_step(
        params, MOE_LLM, x=L.embed_tokens(params, nxt), cache=cache,
        cur_lens=jnp.full((B,), T))
    ext = jnp.concatenate([tokens, nxt], axis=1)
    ref_logits, _ = L.llama_apply(params, MOE_LLM,
                                  inputs_embeds=L.embed_tokens(params, ext),
                                  use_pallas="never")
    np.testing.assert_allclose(np.asarray(step_logits),
                               np.asarray(ref_logits)[:, -1], atol=3e-4,
                               rtol=3e-3)


@pytest.mark.slow   # 9.1s measured r05 — fast-tier budget policy
def test_moe_interleave_and_train_metrics(rng):
    """moe_every=2 on 2 layers: layer 0 dense, layer 1 MoE; the train
    forward surfaces aux metrics and routes gradients into experts."""
    cfg = _moe_model_cfg(llm_kw={"moe_every": 2})
    assert not is_moe_layer(cfg.llm, 0) and is_moe_layer(cfg.llm, 1)
    cfg = dataclasses.replace(cfg, freeze_llm=False)
    params = init_avsr_model(jax.random.key(0), cfg)
    assert "experts" not in params["llm"]["layers"][0]
    assert "experts" in params["llm"]["layers"][1]

    batch = tiny_batch(rng, "audio")
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: forward(p, cfg, batch, use_pallas="never"),
        has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert float(metrics["moe_lb"]) > 0.0
    blk = grads["llm"]["layers"][1]
    assert float(jnp.sum(blk["router"]["w"] ** 2)) > 0.0
    assert float(jnp.sum(blk["experts"]["w_gate"] ** 2)) > 0.0


@pytest.mark.slow   # 7.4s measured r05 — fast-tier budget policy
def test_moe_llm_speculative_lossless(rng):
    """Speculative decode over a MoE target: exercises llama_apply,
    llama_prefill_continue (verify) and llama_decode_step (draft) with
    expert layers in one token-exactness contract."""
    from avsr_tpu.infer.generate import generate_tokens
    from avsr_tpu.infer.speculative import speculative_generate

    cfg = _moe_model_cfg()
    params = init_avsr_model(jax.random.key(0), cfg)
    draft = init_avsr_model(jax.random.key(9), cfg)
    batch = tiny_batch(rng, "audio")
    ref = generate_tokens(params, cfg, batch, max_new_tokens=10,
                          temperature=0.0, eos_id=2, use_pallas="never")
    spec = speculative_generate(params, draft, cfg, batch, gamma=3,
                                max_new_tokens=10, eos_id=2,
                                use_pallas="never")
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(spec.tokens))


def test_moe_llm_beam_and_quantize_smoke(rng):
    """Beam search runs over MoE layers; quantize_llm quantizes the dense
    projections and leaves expert stacks untouched."""
    from avsr_tpu.infer.generate import beam_search
    from avsr_tpu.ops.quant import is_quantized, quantize_llm

    cfg = _moe_model_cfg()
    params = init_avsr_model(jax.random.key(0), cfg)
    out = beam_search(params, cfg, tiny_batch(rng, "audio"),
                      max_new_tokens=6, num_beams=2, eos_id=2,
                      use_pallas="never")
    assert np.asarray(out.tokens).shape[-1] == 6

    qllm = quantize_llm(params["llm"], 8)
    assert is_quantized(qllm["layers"][0]["q"])
    assert "w_gate" in qllm["layers"][0]["experts"]      # untouched
    assert qllm["layers"][0]["experts"]["w_gate"].dtype != jnp.int8


def test_moe_llm_config_validation():
    cfg = tiny_avsr_cfg()
    moe_llm = dataclasses.replace(cfg.model.llm, moe_experts=4)
    pp_bad = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, llm=moe_llm),
        mesh=dataclasses.replace(cfg.mesh, pp=2))
    with pytest.raises(ValueError, match="pp"):
        pp_bad.validate()
    topk_bad = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model,
            llm=dataclasses.replace(cfg.model.llm, moe_experts=2,
                                    moe_topk=5)))
    with pytest.raises(ValueError, match="moe_topk"):
        topk_bad.validate()
    # ep>1 is satisfied by LLM MoE even with a dense connector
    ep_ok = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, llm=moe_llm),
        mesh=dataclasses.replace(cfg.mesh, ep=2))
    ep_ok.validate()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow   # 7.5s measured r05 — fast-tier budget policy
def test_moe_llm_ep_train_step_matches_single_device(rng):
    """dp2 x ep2 x tp2 with LLM expert layers: sharded == unsharded."""
    from avsr_tpu.mesh.sharding import batch_sharder, build_mesh, shard_state
    from avsr_tpu.train.state import create_train_state
    from avsr_tpu.train.step import make_train_step, microbatch
    from jax.sharding import PartitionSpec as P

    cfg = tiny_avsr_cfg()
    mesh_cfg = dataclasses.replace(cfg.mesh, dp=2, fsdp=1, ep=2, tp=2)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, freeze_llm=False,
            llm=dataclasses.replace(cfg.model.llm, moe_experts=4,
                                    moe_topk=2)),
        mesh=mesh_cfg).validate()
    params = init_avsr_model(jax.random.key(0), cfg.model)
    batch = tiny_batch(rng, "audio", B=4)

    s1, tx1 = create_train_state(params, cfg, total_steps=10)
    s1, m1 = make_train_step(cfg, tx1)(s1, microbatch(batch, 1),
                                       jax.random.key(0))

    mesh = build_mesh(mesh_cfg)
    s2, tx2 = create_train_state(params, cfg, total_steps=10)
    s2 = shard_state(s2, mesh)
    wg = s2.params["llm"]["layers"][0]["experts"]["w_gate"]
    assert wg.sharding.spec == P("ep", "fsdp", "tp")
    s2, m2 = make_train_step(cfg, tx2, mesh)(
        s2, batch_sharder(mesh)(microbatch(batch, 1)), jax.random.key(0))

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
    np.testing.assert_allclose(float(m1["moe_lb"]), float(m2["moe_lb"]),
                               rtol=1e-4)
    a = np.asarray(s1.params["llm"]["layers"][0]["experts"]["w_gate"])
    b = np.asarray(s2.params["llm"]["layers"][0]["experts"]["w_gate"])
    np.testing.assert_allclose(a, b, atol=2e-5)


@pytest.mark.slow   # 7.6s measured r05 — fast-tier budget policy
def test_moe_dropless_composition_independent(rng):
    """The dropless inference capacity (C >= topk*N) makes a token's MoE
    output independent of what else shares the call — the property every
    engine/speculative/prefill-continue exactness contract rests on.
    moe_capacity_factor=0.25 makes the bounded training capacity
    guaranteed-overflowing at this size (64 assignments over 4 experts vs
    C=8 per expert), so the dropless path is exercised distinctly."""
    cfg = dataclasses.replace(MOE_LLM, moe_capacity_factor=0.25)
    params = L.init_llama(jax.random.key(1), cfg)
    layer = next(l for l in params["layers"] if "experts" in l)
    h = jnp.asarray(rng.standard_normal((4, 8, cfg.d_model)),
                    jnp.float32)

    solo, _, _ = L._moe_mlp(layer, h[:1], cfg, dropless=True)
    batched, _, _ = L._moe_mlp(layer, h, cfg, dropless=True)
    np.testing.assert_allclose(np.asarray(batched[:1]), np.asarray(solo),
                               atol=1e-6, rtol=1e-6)
    # teeth: the bounded training capacity DOES drop tokens under this
    # configuration — if it ever stops dropping, the dropless assertion
    # above is vacuous and this test must tighten the squeeze
    capped, _, _ = L._moe_mlp(layer, h, cfg, dropless=False)
    assert not np.allclose(np.asarray(capped), np.asarray(batched),
                           atol=1e-5)


@pytest.mark.slow   # 15.8s measured r05 — fast-tier budget policy
def test_moe_rowwise_padding_independent(rng):
    """Rowwise routing must drop the same tokens no matter how far the
    row is right-padded: the engine stages a group at the max member
    bucket while standalone generate pads a request to its OWN bucket,
    so under a squeezed capacity a padded-width-derived cutoff would
    route valid tokens differently (review finding vs llama.py rowwise
    C). capacity_dyn keys the cutoff on the valid length instead."""
    cfg = dataclasses.replace(MOE_LLM, moe_capacity_factor=0.25)
    params = L.init_llama(jax.random.key(1), cfg)
    layer = next(l for l in params["layers"] if "experts" in l)
    nv = 24
    h = jnp.asarray(rng.standard_normal((1, nv, cfg.d_model)), jnp.float32)

    def padded(T):
        hp = jnp.zeros((1, T, cfg.d_model), jnp.float32).at[:, :nv].set(h)
        vp = (jnp.arange(T)[None, :] < nv)
        y, _, _ = L._moe_mlp(layer, hp, cfg, valid=vp, rowwise=True)
        return np.asarray(y[:, :nv])

    short, long = padded(32), padded(96)
    np.testing.assert_allclose(long, short, atol=1e-6, rtol=1e-6)
    # teeth: the squeeze really drops tokens for this row — a dropless
    # result must differ, else the equality above is vacuous.
    free, _, _ = L._moe_mlp(
        layer, h, dataclasses.replace(cfg, moe_capacity_factor=4.0),
        valid=jnp.ones((1, nv), bool), rowwise=True)
    assert not np.allclose(np.asarray(free), short, atol=1e-5)
