"""Pipeline parallelism (pp axis, ops.pipeline) on the virtual CPU mesh:
GPipe-scheduled stage execution must match serial layer execution exactly,
forward and through a full train step (SURVEY.md §2.4/§7 "optional PP")."""

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")

from avsr_tpu.core.config import MeshConfig
from avsr_tpu.mesh.sharding import build_mesh
from avsr_tpu.ops.pipeline import pipeline_apply, stack_stages


@pytest.mark.slow
def test_pipeline_matches_serial(rng):
    """Generic stage pipeline == serial application, fwd + grads."""
    mesh = build_mesh(MeshConfig(dp=2, fsdp=1, sp=1, tp=1, pp=4))
    S, Lps, d = 4, 2, 16
    B, T = 8, 6
    layers = [{"w": jnp.asarray(rng.standard_normal((d, d)) * 0.2,
                                jnp.float32)} for _ in range(S * Lps)]
    x = jnp.asarray(rng.standard_normal((B, T, d)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((B,)), jnp.float32)

    def one_layer(lp, xx):
        return jnp.tanh(xx @ lp["w"]) + xx

    def stage_fn(lp_stack, x_mb, scale_mb):
        def body(xx, lp):
            return one_layer(lp, xx), None
        out, _ = jax.lax.scan(body, x_mb, lp_stack)
        return out * scale_mb[:, None, None]

    def serial(layers, x, scale):
        for i in range(0, S * Lps, Lps):
            for lp in layers[i:i + Lps]:
                x = one_layer(lp, x)
            x = x * scale[:, None, None]
        return x

    stages = stack_stages(layers, S)
    out_pp = pipeline_apply(stage_fn, stages, x, scale, mesh=mesh)
    out_ser = serial(layers, x, scale)
    np.testing.assert_allclose(np.asarray(out_pp), np.asarray(out_ser),
                               atol=1e-5)

    # gradients flow through the ppermute schedule correctly
    def loss_pp(layers, x):
        stages = stack_stages(layers, S)
        return (pipeline_apply(stage_fn, stages, x, scale,
                               mesh=mesh) ** 2).sum()

    def loss_ser(layers, x):
        return (serial(layers, x, scale) ** 2).sum()

    g_pp = jax.grad(loss_pp)(layers, x)
    g_ser = jax.grad(loss_ser)(layers, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_ser)):
        # grads reach hundreds in magnitude; fp32 reduction-order noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=1e-4)


@pytest.mark.slow
def test_pp_train_step_matches_pp1(rng):
    """Full AVSR train step with mesh.pp=4 == the unsharded step."""
    from test_models_avsr import tiny_batch
    from test_train import tiny_avsr_cfg

    from avsr_tpu.models.avsr import Batch, init_avsr_model
    from avsr_tpu.train.state import create_train_state
    from avsr_tpu.train.step import make_train_step, microbatch

    cfg = tiny_avsr_cfg()
    # 4 llm layers so pp=4 has one layer per stage; dropout off so the
    # serial path (which applies LoRA dropout) matches the pp path.
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model,
            llm=dataclasses.replace(cfg.model.llm, n_layers=4),
            lora=dataclasses.replace(cfg.model.lora, dropout=0.0)))
    params = init_avsr_model(jax.random.key(0), cfg.model)
    B = 4   # microbatches = pp = 4 -> 1 sample per microbatch
    mel = jnp.asarray(rng.standard_normal((B, 80, 44)), jnp.float32)
    batch = Batch(
        mel=mel, mel_lens=jnp.array([44, 30, 44, 36]),
        prompt_tokens=jnp.array([1, 7, 9]),
        labels=jnp.asarray(rng.integers(0, 64, (B, 7))),
        label_lens=jnp.array([7, 4, 6, 5]),
    )
    mb = microbatch(batch, 1)

    state1, tx1 = create_train_state(params, cfg, total_steps=10)
    s1, m1 = make_train_step(cfg, tx1)(state1, mb, jax.random.key(0))

    pp_cfg = dataclasses.replace(
        cfg, mesh=dataclasses.replace(cfg.mesh, dp=2, fsdp=1, sp=1, tp=1,
                                      pp=4))
    mesh = build_mesh(pp_cfg.mesh)
    state2, tx2 = create_train_state(params, pp_cfg, total_steps=10)
    s2, m2 = make_train_step(pp_cfg, tx2, mesh)(state2, mb, jax.random.key(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]),
                               rtol=1e-4)
    lora1 = np.asarray(s1.params["llm"]["layers"][2]["q"]["lora"]["b"])
    lora2 = np.asarray(s2.params["llm"]["layers"][2]["q"]["lora"]["b"])
    np.testing.assert_allclose(lora1, lora2, atol=1e-6)


@pytest.mark.slow
def test_pp_composes_with_tp_fsdp(rng):
    """pp2 x tp2 x fsdp2 on the 8-device mesh: a fully sharded train step
    (megatron tp + zero fsdp param sharding + GPipe stages) matches the
    unsharded step — pp as a first-class axis composed with the others,
    not a standalone demo (round-1 VERDICT next-step #3)."""
    from test_train import tiny_avsr_cfg

    from avsr_tpu.mesh.sharding import batch_sharder, shard_state
    from avsr_tpu.models.avsr import Batch, init_avsr_model
    from avsr_tpu.train.state import create_train_state
    from avsr_tpu.train.step import make_train_step, microbatch

    cfg = tiny_avsr_cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model,
            llm=dataclasses.replace(cfg.model.llm, n_layers=2, n_heads=4,
                                    n_kv_heads=2, d_model=64, ffn_dim=128),
            lora=dataclasses.replace(cfg.model.lora, dropout=0.0)))
    params = init_avsr_model(jax.random.key(0), cfg.model)
    B = 4   # divisible by fsdp=2; 2 pp microbatches of 2 per stage
    mel = jnp.asarray(rng.standard_normal((B, 80, 44)), jnp.float32)
    batch = Batch(
        mel=mel, mel_lens=jnp.array([44, 30, 44, 36]),
        prompt_tokens=jnp.array([1, 7, 9]),
        labels=jnp.asarray(rng.integers(0, 64, (B, 7))),
        label_lens=jnp.array([7, 4, 6, 5]),
    )
    mb = microbatch(batch, 1)

    state1, tx1 = create_train_state(params, cfg, total_steps=10)
    s1, m1 = make_train_step(cfg, tx1)(state1, mb, jax.random.key(0))

    pp_cfg = dataclasses.replace(
        cfg, mesh=dataclasses.replace(cfg.mesh, dp=1, fsdp=2, sp=1, tp=2,
                                      pp=2))
    mesh = build_mesh(pp_cfg.mesh)
    state2, tx2 = create_train_state(params, pp_cfg, total_steps=10)
    state2 = shard_state(state2, mesh)
    mb2 = batch_sharder(mesh)(mb)
    s2, m2 = make_train_step(pp_cfg, tx2, mesh)(state2, mb2, jax.random.key(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]),
                               rtol=1e-4)
    lora1 = np.asarray(s1.params["llm"]["layers"][1]["q"]["lora"]["b"])
    lora2 = np.asarray(s2.params["llm"]["layers"][1]["q"]["lora"]["b"])
    np.testing.assert_allclose(lora1, lora2, atol=1e-6)
