"""Speculative decoding: losslessness, self-draft acceptance, edge cases.

The contract under test is the strong one: for ANY draft params, the output
token stream is identical to plain greedy ``generate_tokens`` — the draft
only changes how many target passes the tokens cost.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.infer.generate import generate_tokens
from avsr_tpu.infer.speculative import make_draft_params, speculative_generate
from avsr_tpu.models.avsr import init_avsr_model

from test_models_avsr import tiny_batch, tiny_model_cfg


def _gen_pair(rng, cfg, params, draft_params, *, gamma=3, max_new=12,
              modality="audio"):
    batch = tiny_batch(rng, modality)
    ref = generate_tokens(params, cfg, batch, max_new_tokens=max_new,
                          temperature=0.0, eos_id=2, use_pallas="never")
    spec = speculative_generate(params, draft_params, cfg, batch,
                                gamma=gamma, max_new_tokens=max_new,
                                eos_id=2, use_pallas="never")
    return ref, spec


def test_spec_identical_draft_matches_greedy(rng):
    """Draft == target: every proposal accepted; output must equal greedy."""
    cfg = tiny_model_cfg(modality="audio")
    params = init_avsr_model(jax.random.key(0), cfg)
    ref, spec = _gen_pair(rng, cfg, params, params)
    np.testing.assert_array_equal(np.asarray(ref.lengths),
                                  np.asarray(spec.lengths))
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(spec.tokens))


def test_spec_random_draft_still_lossless(rng):
    """A draft with completely different random weights proposes garbage —
    the verify pass must still reproduce the greedy stream exactly."""
    cfg = tiny_model_cfg(modality="audio")
    params = init_avsr_model(jax.random.key(0), cfg)
    draft = init_avsr_model(jax.random.key(99), cfg)
    ref, spec = _gen_pair(rng, cfg, params, draft, gamma=4)
    np.testing.assert_array_equal(np.asarray(ref.lengths),
                                  np.asarray(spec.lengths))
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(spec.tokens))


def test_spec_quantized_self_draft(rng):
    """The default production draft: same LLM, int8 weight-only. Lossless
    by construction; acceptance is typically high but unasserted."""
    cfg = tiny_model_cfg(modality="audio")
    params = init_avsr_model(jax.random.key(0), cfg)
    draft = make_draft_params(params, cfg, bits=8)
    ref, spec = _gen_pair(rng, cfg, params, draft, gamma=2)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(spec.tokens))


@pytest.mark.parametrize("gamma", [1, 5])
def test_spec_gamma_extremes(rng, gamma):
    cfg = tiny_model_cfg(modality="audio")
    params = init_avsr_model(jax.random.key(0), cfg)
    ref, spec = _gen_pair(rng, cfg, params, params, gamma=gamma)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(spec.tokens))


def test_spec_max_new_one(rng):
    cfg = tiny_model_cfg(modality="audio")
    params = init_avsr_model(jax.random.key(0), cfg)
    ref, spec = _gen_pair(rng, cfg, params, params, max_new=1)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(spec.tokens))
    assert np.asarray(spec.lengths).max() <= 1


def test_rejection_step_is_exactly_target_distributed():
    """The speculative-sampling guarantee, tested statistically on the
    accept/replace kernel itself: for a FIXED arbitrary (p, q) pair over a
    small vocab, the first emitted token's empirical distribution must
    match p — the draft distribution q must leave no fingerprint."""
    import jax
    import jax.numpy as jnp

    from avsr_tpu.infer.speculative import _rejection_step

    V, G, N = 12, 3, 30_000
    kp, kq = jax.random.split(jax.random.key(7))
    p1 = jax.nn.softmax(2.0 * jax.random.normal(kp, (V,)))
    q1 = jax.nn.softmax(2.0 * jax.random.normal(kq, (V,)))
    # same marginal at every position (only position 0's output is read)
    p = jnp.broadcast_to(p1, (1, G + 1, V))
    q = jnp.broadcast_to(q1, (1, G, V))

    def one(key):
        kd, ka = jax.random.split(key)
        drafts = jax.random.categorical(
            kd, jnp.broadcast_to(jnp.log(q1), (1, G, V)).reshape(G, V)
        ).astype(jnp.int32)[None]                    # [1, G] ~ q
        m, cand = _rejection_step(drafts, q, p, ka)
        return cand[0, 0]                            # first emitted token

    toks = jax.vmap(one)(jax.random.split(jax.random.key(123), N))
    emp = np.bincount(np.asarray(toks), minlength=V) / N
    l1 = float(np.abs(emp - np.asarray(p1)).sum())
    assert l1 < 0.03, (l1, emp, np.asarray(p1))
    # and it must NOT match q (sanity that the test can fail)
    assert float(np.abs(emp - np.asarray(q1)).sum()) > 0.05


def test_spec_sampled_runs_and_is_reproducible(rng):
    """temperature>0 end-to-end: valid tokens, same rng => same stream,
    different rng => (almost surely) different stream."""
    import jax

    cfg = tiny_model_cfg(modality="audio")
    params = init_avsr_model(jax.random.key(0), cfg)
    draft = init_avsr_model(jax.random.key(99), cfg)
    batch = tiny_batch(rng, "audio")

    def run(seed):
        return speculative_generate(
            params, draft, cfg, batch, gamma=3, max_new_tokens=10,
            eos_id=2, use_pallas="never", temperature=0.8, top_p=0.9,
            rng=jax.random.key(seed))

    a, b, c = run(1), run(1), run(2)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    assert (np.asarray(a.tokens) != np.asarray(c.tokens)).any()
    V = cfg.llm.vocab_size
    assert (np.asarray(a.tokens) >= 0).all()
    assert (np.asarray(a.tokens) < V).all()


def test_spec_layerskip_draft_lossless(rng):
    """Early-exit self-draft (first k layers + shared head): zero extra
    memory, shares the target prefix, and stays token-exact vs greedy."""
    from avsr_tpu.infer.speculative import make_layerskip_draft

    cfg = tiny_model_cfg(
        modality="audio",
        llm=dataclasses.replace(tiny_model_cfg().llm, n_layers=2))
    params = init_avsr_model(jax.random.key(0), cfg)
    draft, dcfg = make_layerskip_draft(params, cfg, 1)
    assert dcfg.llm.n_layers == 1
    # shared buffers: the draft's layer 0 IS the target's layer 0
    assert draft["llm"]["layers"][0] is params["llm"]["layers"][0]

    batch = tiny_batch(rng, "audio")
    ref = generate_tokens(params, cfg, batch, max_new_tokens=12,
                          temperature=0.0, eos_id=2, use_pallas="never")
    spec = speculative_generate(params, draft, cfg, batch,
                                gamma=3, max_new_tokens=12, eos_id=2,
                                use_pallas="never", draft_model_cfg=dcfg)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(spec.tokens))


def test_spec_separate_small_draft_lossless(rng):
    """A genuinely different draft architecture (own d_model, own
    encoders, own prefix/positions) — still token-exact vs greedy."""
    cfg = tiny_model_cfg(modality="audio")
    dcfg = tiny_model_cfg(
        modality="audio",
        llm=dataclasses.replace(tiny_model_cfg().llm, d_model=16,
                                n_heads=2, n_kv_heads=1, ffn_dim=32),
        whisper=dataclasses.replace(tiny_model_cfg().whisper, d_model=16,
                                    n_heads=2))
    params = init_avsr_model(jax.random.key(0), cfg)
    draft = init_avsr_model(jax.random.key(5), dcfg)

    batch = tiny_batch(rng, "audio")
    ref = generate_tokens(params, cfg, batch, max_new_tokens=10,
                          temperature=0.0, eos_id=2, use_pallas="never")
    spec = speculative_generate(params, draft, cfg, batch,
                                gamma=3, max_new_tokens=10, eos_id=2,
                                use_pallas="never", draft_model_cfg=dcfg)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(spec.tokens))


def test_spec_av_modality(rng):
    """Both modalities through the fused prefix path."""
    cfg = tiny_model_cfg()
    params = init_avsr_model(jax.random.key(0), cfg)
    ref, spec = _gen_pair(rng, cfg, params, params, modality="both")
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(spec.tokens))


# ---------------------------------------------------------------- cost model


def test_break_even_cost_model():
    """break_even_tokens_per_pass encodes gamma*cost_ratio + 1 with
    cost_ratio = (bits/16) * (L_draft/L)."""
    from avsr_tpu.infer.speculative import break_even_tokens_per_pass

    cfg = tiny_model_cfg()          # tiny llm, n_layers known from cfg
    L = cfg.llm.n_layers
    # full-depth int8 draft: cost_ratio 0.5 -> gamma=4 needs > 3.0
    assert break_even_tokens_per_pass(cfg, bits=8, gamma=4) == pytest.approx(3.0)
    # int4 halves the draft bytes again
    assert break_even_tokens_per_pass(cfg, bits=4, gamma=4) == pytest.approx(2.0)
    # layer-skip scales by L_draft/L
    assert break_even_tokens_per_pass(
        cfg, bits=8, gamma=4, draft_layers=L) == pytest.approx(3.0)
    need = break_even_tokens_per_pass(cfg, bits=8, gamma=4, draft_layers=1)
    assert need == pytest.approx(4 * 0.5 * (1 / L) + 1.0)
    # a config whose break-even exceeds the gamma+1 ceiling can never win:
    # int8 full-depth at gamma 15 needs > 8.5 of max 16 (fine), but bits=16
    # would need gamma+1 exactly -> impossible
    assert break_even_tokens_per_pass(cfg, bits=16, gamma=4) == pytest.approx(5.0)


def test_decode_cli_warns_on_losing_speculative_regime(caplog):
    """decode.speculative in a measured-loss regime (batch >= 4) or a
    cost-model-impossible config must emit a loud warning (VERDICT r03
    next-step #4)."""
    import logging

    from avsr_tpu.cli.decode import _warn_if_speculative_loses
    from avsr_tpu.core.config import load_config

    base = "avsr_tpu/configs/tiny_cpu.yaml"
    # measured-loss regime: batch 8
    cfg = load_config(base, {"decode.speculative": True,
                             "decode.batch_size": 8})
    with caplog.at_level(logging.WARNING, logger="avsr.cli.decode"):
        _warn_if_speculative_loses(cfg)
    assert any("MEASURED LOSS" in r.message for r in caplog.records)
    caplog.clear()

    # batch 1: not the batch->=4 measured loss, but still a warning — the
    # measured B=1 verdict (docs/serving.md) is that only a trained draft
    # with >~4 tokens/pass acceptance profits
    cfg1 = load_config(base, {"decode.speculative": True,
                              "decode.batch_size": 1})
    with caplog.at_level(logging.WARNING, logger="avsr.cli.decode"):
        _warn_if_speculative_loses(cfg1)
    assert not any("MEASURED LOSS" in r.message for r in caplog.records)
    assert any("trained draft" in r.message for r in caplog.records)


# ------------------------------------------------------- distilled draft
@pytest.mark.slow
def test_distilled_draft_reaches_profitable_acceptance():
    """The regime speculative decoding exists for, measured in-suite
    (VERDICT r04 next-step #5): every on-chip sweep used untrained or
    identity drafts, whose near-zero argmax margins floor the acceptance
    rate. Here a 1-layer draft is TRAINED on the same 4-utterance
    synthetic task as its 2-layer target (distillation-by-task: both
    overfit the same transcripts, so their greedy streams agree), and

      * the trained draft's measured tokens/pass must clear the
        bandwidth-model break-even for its (bits=8, gamma, L_draft/L)
        config — i.e. a config that PROFITS in the model underlying
        docs/serving.md's economics tables;
      * an architecturally identical UNTRAINED draft (the control —
        what every previous measurement used) must stay near the
        1 token/pass floor;
      * both outputs stay token-identical to plain greedy (the standing
        losslessness contract).
    """
    from avsr_tpu.core.config import (
        AVSRConfig,
        DataConfig,
        MeshConfig,
        RuntimeConfig,
        TrainingConfig,
    )
    from avsr_tpu.data.dataset import SyntheticAVSRDataset
    from avsr_tpu.data.loader import DataLoader
    from avsr_tpu.data.tokenizer import load_tokenizer
    from avsr_tpu.infer.speculative import break_even_tokens_per_pass
    from avsr_tpu.train.state import create_train_state
    from avsr_tpu.train.step import make_train_step, microbatch

    def task_cfg(n_layers: int) -> AVSRConfig:
        model = tiny_model_cfg(modality="audio")
        model = dataclasses.replace(
            model,
            freeze_llm=False,
            lora=dataclasses.replace(model.lora, use_lora=False),
            llm=dataclasses.replace(model.llm, vocab_size=260,
                                    max_seq_len=256, n_layers=n_layers),
            whisper=dataclasses.replace(model.whisper, max_frames=200))
        return AVSRConfig(
            data=DataConfig(synthetic=True, synthetic_size=4, batch_size=4,
                            max_audio_length=48000, max_video_length=8,
                            max_label_length=24, audio_buckets=(100, 200),
                            video_buckets=(4,)),
            model=model,
            training=TrainingConfig(num_epochs=1, learning_rate=2e-3,
                                    warmup_steps=10, grad_accum_steps=1,
                                    log_interval=100, save_every_steps=0),
            mesh=MeshConfig(remat=False, donate=False),
            runtime=RuntimeConfig(compute_dtype="float32"),
        ).validate()

    tcfg, dcfg_full = task_cfg(2), task_cfg(1)
    tok = load_tokenizer(None)
    ds = SyntheticAVSRDataset(tcfg.data, tok, modality="audio",
                              image_size=16)
    loader = DataLoader(ds, tcfg.data, tok, model_cfg=tcfg.model,
                        shuffle=False, drop_last=False)
    batches = [b for _, b in loader]
    loader.close()

    def train(cfg, seed, steps=300):
        params = init_avsr_model(jax.random.key(seed), cfg.model)
        state, tx = create_train_state(params, cfg, total_steps=steps)
        step = make_train_step(cfg, tx)
        for i in range(steps):
            b = batches[i % len(batches)]
            state, m = step(state, microbatch(b, 1), jax.random.key(i))
        assert float(m["loss"]) < 0.5, float(m["loss"])  # memorized
        return state.params

    target = train(tcfg, seed=0)
    draft_trained = train(dcfg_full, seed=1)
    draft_untrained = init_avsr_model(jax.random.key(2), dcfg_full.model)

    batch = batches[0]
    gamma, max_new = 4, 20
    ref = generate_tokens(target, tcfg.model, batch,
                          max_new_tokens=max_new, temperature=0.0,
                          eos_id=tok.eos_id, use_pallas="never")

    def run(draft_tree):
        dq = make_draft_params(draft_tree, dcfg_full.model, bits=8)
        out, stats = speculative_generate(
            target, dq, tcfg.model, batch, gamma=gamma,
            max_new_tokens=max_new, eos_id=tok.eos_id, use_pallas="never",
            draft_model_cfg=dcfg_full.model, draft_shares_prefix=False,
            return_stats=True)
        np.testing.assert_array_equal(np.asarray(out.tokens),
                                      np.asarray(ref.tokens))
        return float(stats["tokens_per_pass"])

    tpp_trained = run(draft_trained)
    tpp_untrained = run(draft_untrained)

    be = break_even_tokens_per_pass(tcfg.model, bits=8, gamma=gamma,
                                    draft_layers=1)
    # numbers of record for docs/serving.md (visible under pytest -s)
    print(f"\ndistilled-draft acceptance: trained {tpp_trained:.2f} tok/pass "
          f"vs untrained {tpp_untrained:.2f}, break-even {be:.2f} "
          f"(gamma={gamma}, int8, 1/2 layers) -> bandwidth-model speedup "
          f"{tpp_trained / be:.2f}x")
    assert be == pytest.approx(2.0)
    # the distilled draft is in the PROFITABLE regime of the cost model...
    assert tpp_trained > be + 0.4, (tpp_trained, be)
    # ...and the acceptance is a property of draft QUALITY, not mechanics:
    # the untrained control stays near the floor, far below the trained one
    assert tpp_untrained < tpp_trained - 1.0, (tpp_untrained, tpp_trained)
