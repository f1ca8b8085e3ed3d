"""Mesh/sharding: dp+fsdp+tp over the virtual 8-device CPU mesh.

The TPU-native answer to "test multi-node without a cluster" (SURVEY.md §4):
XLA_FLAGS=--xla_force_host_platform_device_count=8 in conftest gives 8 real
XLA devices backed by host threads; pjit inserts the same collectives it
would on ICI.
"""

import dataclasses

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from avsr_tpu.core.config import MeshConfig
from avsr_tpu.mesh.sharding import (
    batch_sharder,
    build_mesh,
    param_spec,
    shard_params,
    shard_state,
)
from avsr_tpu.models.avsr import init_avsr_model
from avsr_tpu.train.state import create_train_state
from avsr_tpu.train.step import make_train_step, microbatch

from test_models_avsr import tiny_batch, tiny_model_cfg
from test_train import tiny_avsr_cfg

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_build_mesh_infers_dp():
    mesh = build_mesh(MeshConfig(dp=-1, fsdp=2, tp=2))
    assert dict(mesh.shape) == {"dcn": 1, "dp": 2, "fsdp": 2, "ep": 1,
                                "sp": 1, "tp": 2, "pp": 1}
    with pytest.raises(ValueError):
        build_mesh(MeshConfig(dp=3, fsdp=2, tp=2))


def test_param_rules():
    import jax.numpy as jnp

    w = jnp.zeros((64, 64))
    class _K:  # fake DictKey
        def __init__(self, k): self.key = k
    assert param_spec([_K("llm"), _K("layers"), _K("0"), _K("q"), _K("w")], w) \
        == P("fsdp", "tp")
    assert param_spec([_K("llm"), _K("layers"), _K("0"), _K("down"), _K("w")], w) \
        == P("tp", "fsdp")
    assert param_spec([_K("llm"), _K("layers"), _K("0"), _K("q"),
                       _K("lora"), _K("a")], w) == P(None, None)
    assert param_spec([_K("llm"), _K("ln_f"), _K("scale")], w[0]) == P()


@pytest.mark.slow   # 10.8s measured r05 — fast-tier budget policy
def test_sharded_train_step_matches_single_device(rng):
    """The mesh-sharded step must be numerically equivalent to single-device."""
    cfg = tiny_avsr_cfg()
    cfg = dataclasses.replace(cfg, mesh=dataclasses.replace(
        cfg.mesh, dp=2, fsdp=2, tp=2))
    params = init_avsr_model(jax.random.key(0), cfg.model)
    batch = tiny_batch(rng, "audio", B=4)   # micro dim divisible by dp*fsdp

    # single device
    s1, tx1 = create_train_state(params, cfg, total_steps=10)
    step1 = make_train_step(cfg, tx1)
    s1, m1 = step1(s1, microbatch(batch, 1), jax.random.key(0))

    # sharded
    mesh = build_mesh(dataclasses.replace(cfg.mesh, dp=2, fsdp=2, tp=2))
    s2, tx2 = create_train_state(params, cfg, total_steps=10)
    s2 = shard_state(s2, mesh)
    shard_b = batch_sharder(mesh)
    step2 = make_train_step(cfg, tx2)
    s2, m2 = step2(s2, shard_b(microbatch(batch, 1)), jax.random.key(0))

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
    a = np.asarray(s1.params["llm"]["layers"][0]["q"]["lora"]["b"])
    b = np.asarray(s2.params["llm"]["layers"][0]["q"]["lora"]["b"])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_shard_params_places_leaves():
    cfg = tiny_model_cfg(modality="audio")
    params = init_avsr_model(jax.random.key(0), cfg)
    mesh = build_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    sharded = shard_params(params, mesh)
    q = sharded["llm"]["layers"][0]["q"]["w"]
    assert q.sharding.spec == P("fsdp", "tp")
    scale = sharded["llm"]["ln_f"]["scale"]
    assert scale.sharding.spec == P()


def test_build_mesh_dcn_axis():
    """Multi-slice DCN data parallel: outermost mesh axis; batch shards over
    it, params replicate (SURVEY.md §2.4/§5.8 commitment)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    mesh = build_mesh(MeshConfig(dp=2, fsdp=1, sp=1, tp=2, dcn_dp=2))
    assert dict(mesh.shape) == {"dcn": 2, "dp": 2, "fsdp": 1, "ep": 1,
                                "sp": 1, "tp": 2, "pp": 1}
    # a dcn+dp-sharded reduction still matches the unsharded value
    from avsr_tpu.mesh.sharding import batch_sharder
    x = jnp.arange(8 * 3, dtype=jnp.float32).reshape(1, 8, 3)
    sharded = batch_sharder(mesh)({"x": x})["x"]
    assert float(jnp.sum(sharded)) == float(jnp.sum(x))


def test_dcn_train_step_matches_single_device(rng):
    """dcn_dp=2 x dp2 x tp2 (8 devices): a full train step over a hybrid
    ICI+DCN mesh — batch sharded over (dcn, dp), params replicated across
    dcn slices, tp megatron inside each slice — must match the unsharded
    step (round-1 VERDICT next-step #4: same rigor as the other axes)."""
    cfg = tiny_avsr_cfg()
    dcn_mesh_cfg = dataclasses.replace(
        cfg.mesh, dp=2, fsdp=1, sp=1, tp=2, dcn_dp=2)
    cfg = dataclasses.replace(cfg, mesh=dcn_mesh_cfg)
    params = init_avsr_model(jax.random.key(0), cfg.model)
    batch = tiny_batch(rng, "audio", B=4)   # micro dim divisible by dcn*dp

    s1, tx1 = create_train_state(params, cfg, total_steps=10)
    s1, m1 = make_train_step(cfg, tx1)(s1, microbatch(batch, 1),
                                       jax.random.key(0))

    mesh = build_mesh(dcn_mesh_cfg)
    s2, tx2 = create_train_state(params, cfg, total_steps=10)
    s2 = shard_state(s2, mesh)
    s2, m2 = make_train_step(cfg, tx2)(
        s2, batch_sharder(mesh)(microbatch(batch, 1)), jax.random.key(0))

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=1e-4)
    a = np.asarray(s1.params["llm"]["layers"][0]["q"]["lora"]["b"])
    b = np.asarray(s2.params["llm"]["layers"][0]["q"]["lora"]["b"])
    np.testing.assert_allclose(a, b, atol=1e-5)
