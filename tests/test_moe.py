"""MoE connector + expert-parallel (ep) mesh axis.

TPU-native extension beyond the reference's 8 connector types: GShard-style
capacity-routed mixture-of-experts as a connector, with the stacked expert
weights sharded over the mesh "ep" axis. Tests cover exactness against a
dense FFN (single-expert degenerate case), padding invariance of the
capacity router, gradient flow into router+experts, aux-loss behavior,
config validation, and an ep2 train-step numerics equivalence on the
virtual 8-device mesh (same rigor as dp/fsdp/tp/sp/pp/dcn in test_mesh.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.core.config import AVSRConfig, MeshConfig
from avsr_tpu.models.avsr import forward, init_avsr_model
from avsr_tpu.models.connectors import moe_apply, moe_init
from avsr_tpu.models.layers import dense, gelu, layer_norm

from test_models_avsr import tiny_batch, tiny_model_cfg
from test_train import tiny_avsr_cfg


def _moe_cfg(**kw):
    base = dict(connector_type="moe", moe_experts=4, moe_topk=2)
    base.update(kw)
    return tiny_model_cfg(**base)


def test_moe_single_expert_matches_dense_ffn(rng):
    """E=1, topk=1, generous capacity: every token routes to the only expert
    with gate 1.0, so the MoE block must equal a plain dense FFN."""
    cfg = _moe_cfg(modality="audio", moe_experts=1, moe_topk=1,
                   moe_capacity_factor=4.0)
    d_in, d_out = 48, 32
    p = moe_init(jax.random.key(3), d_in, d_out, cfg)
    x = jnp.asarray(rng.standard_normal((2, 10, d_in)), jnp.float32)
    lens = jnp.array([10, 10], jnp.int32)

    y, out_lens, aux = moe_apply(p, x, lens, model_cfg=cfg)

    h = dense(p["inp"], x)
    for blk in p["blocks"]:
        hn = layer_norm(blk["ln"], h)
        ff = (gelu(hn @ blk["experts"]["w1"][0] + blk["experts"]["b1"][0])
              @ blk["experts"]["w2"][0] + blk["experts"]["b2"][0])
        h = h + ff
    np.testing.assert_allclose(np.asarray(y), np.asarray(h),
                               rtol=1e-4, atol=1e-4)
    assert (np.asarray(out_lens) == np.asarray(lens)).all()
    # single expert: perfectly "balanced" by definition -> lb == 1.0
    np.testing.assert_allclose(float(aux["moe_lb"]), 1.0, rtol=1e-5)


def test_moe_padding_invariance(rng):
    """Padding tokens are masked out of routing, so garbage past `lengths`
    must not perturb valid rows (capacity positions included)."""
    cfg = _moe_cfg(modality="audio")
    d_in, d_out = 24, 32
    p = moe_init(jax.random.key(0), d_in, d_out, cfg)
    x1 = jnp.asarray(rng.standard_normal((2, 12, d_in)), jnp.float32)
    lens = jnp.array([7, 12], jnp.int32)
    x2 = x1.at[0, 7:].set(jnp.asarray(
        100.0 * rng.standard_normal((5, d_in)), jnp.float32))

    y1, _, aux1 = moe_apply(p, x1, lens, model_cfg=cfg)
    y2, _, aux2 = moe_apply(p, x2, lens, model_cfg=cfg)
    np.testing.assert_allclose(np.asarray(y1[0, :7]), np.asarray(y2[0, :7]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y1[1]), np.asarray(y2[1]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(aux1["moe_lb"]), float(aux2["moe_lb"]),
                               rtol=1e-5)


@pytest.mark.slow   # 12.0s measured r05 — fast-tier budget policy
def test_moe_forward_grads_and_aux(rng):
    """Full AVSR forward with the moe connector: finite loss, aux metrics
    present, and nonzero gradients on both the router and the experts."""
    cfg = _moe_cfg(modality="audio")
    params = init_avsr_model(jax.random.key(0), cfg)
    batch = tiny_batch(rng, "audio")

    (loss, metrics), grads = jax.value_and_grad(
        lambda p: forward(p, cfg, batch, use_pallas="never"),
        has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert "moe_lb" in metrics and "moe_z" in metrics
    assert float(metrics["moe_lb"]) > 0.0
    blk = grads["audio_connector"]["blocks"][0]
    assert float(jnp.sum(blk["router"]["w"] ** 2)) > 0.0
    assert float(jnp.sum(blk["experts"]["w1"] ** 2)) > 0.0


def test_moe_tiny_capacity_still_finite(rng):
    """Capacity overflow drops tokens to the residual path — outputs stay
    finite and shapes static with a pathologically small capacity factor."""
    cfg = _moe_cfg(modality="audio", moe_capacity_factor=1e-6)
    d_in, d_out = 24, 32
    p = moe_init(jax.random.key(1), d_in, d_out, cfg)
    x = jnp.asarray(rng.standard_normal((2, 40, d_in)), jnp.float32)
    y, _, _ = moe_apply(p, x, None, model_cfg=cfg)
    assert np.isfinite(np.asarray(y)).all()


def test_moe_config_validation():
    cfg = tiny_avsr_cfg()
    bad_topk = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, connector_type="moe", moe_experts=2, moe_topk=3))
    with pytest.raises(ValueError, match="moe_topk"):
        bad_topk.validate()
    ep_dense = dataclasses.replace(
        cfg, mesh=dataclasses.replace(cfg.mesh, ep=2))
    with pytest.raises(ValueError, match="ep"):
        ep_dense.validate()
    ep_indivisible = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, connector_type="moe",
                                  moe_experts=3),
        mesh=dataclasses.replace(cfg.mesh, ep=2))
    with pytest.raises(ValueError, match="moe_experts"):
        ep_indivisible.validate()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ep_train_step_matches_single_device(rng):
    """dp2 x ep2 x tp2 (8 devices): experts sharded over ep, batch sharded
    over (dp, ep), tp megatron in the LLM — one train step must match the
    unsharded step (same rigor as the other six axes)."""
    from avsr_tpu.mesh.sharding import batch_sharder, build_mesh, shard_state
    from avsr_tpu.train.state import create_train_state
    from avsr_tpu.train.step import make_train_step, microbatch

    cfg = tiny_avsr_cfg()
    mesh_cfg = dataclasses.replace(cfg.mesh, dp=2, fsdp=1, ep=2, tp=2)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, connector_type="moe",
                                  moe_experts=4, moe_topk=2),
        mesh=mesh_cfg).validate()
    params = init_avsr_model(jax.random.key(0), cfg.model)
    batch = tiny_batch(rng, "audio", B=4)   # micro dim divisible by dp*ep

    s1, tx1 = create_train_state(params, cfg, total_steps=10)
    s1, m1 = make_train_step(cfg, tx1)(s1, microbatch(batch, 1),
                                       jax.random.key(0))

    mesh = build_mesh(mesh_cfg)
    s2, tx2 = create_train_state(params, cfg, total_steps=10)
    s2 = shard_state(s2, mesh)
    # expert leaves really shard over ep
    w1 = s2.params["audio_connector"]["blocks"][0]["experts"]["w1"]
    from jax.sharding import PartitionSpec as P
    assert w1.sharding.spec == P("ep", None, "fsdp")
    s2, m2 = make_train_step(cfg, tx2, mesh)(
        s2, batch_sharder(mesh)(microbatch(batch, 1)), jax.random.key(0))

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
    np.testing.assert_allclose(float(m1["moe_lb"]), float(m2["moe_lb"]),
                               rtol=1e-4)
    a = np.asarray(s1.params["audio_connector"]["blocks"][0]["experts"]["w1"])
    b = np.asarray(s2.params["audio_connector"]["blocks"][0]["experts"]["w1"])
    np.testing.assert_allclose(a, b, atol=2e-5)
