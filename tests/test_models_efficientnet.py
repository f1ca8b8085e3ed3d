"""EfficientNet video-encoder numeric parity vs randomly-initialized HF model.

The reference declares video_encoder efficientnet (src/utils/config.py:53-56)
without implementing it; avsr_tpu wires it as a per-frame MBConv trunk with
the same [B, T, d] contract as CLIP/ResNet.
"""

import numpy as np
import pytest

from avsr_tpu.core.config import EfficientNetConfig
from avsr_tpu.models.efficientnet import (
    block_plan,
    convert_hf_efficientnet,
    efficientnet_apply,
    init_efficientnet,
    round_filters,
)

TINY = EfficientNetConfig(
    image_size=32, width_coefficient=1.0, depth_coefficient=1.0,
    in_channels=(32, 16), out_channels=(16, 24), kernel_sizes=(3, 5),
    strides=(1, 2), num_block_repeats=(1, 2), expand_ratios=(1, 6),
    hidden_dim=1280)
# depth-scaled variant: exercises round_filters + round_repeats arithmetic
SCALED = EfficientNetConfig(
    image_size=32, width_coefficient=0.5, depth_coefficient=1.5,
    in_channels=(32, 16), out_channels=(16, 24), kernel_sizes=(3, 5),
    strides=(1, 2), num_block_repeats=(1, 2), expand_ratios=(1, 6),
    hidden_dim=640)


def _hf_model(cfg: EfficientNetConfig, seed: int):
    torch = pytest.importorskip("torch")
    from transformers import EfficientNetConfig as HFConfig
    from transformers import EfficientNetModel

    torch.manual_seed(seed)
    hf_cfg = HFConfig(
        num_channels=3, image_size=cfg.image_size,
        width_coefficient=cfg.width_coefficient,
        depth_coefficient=cfg.depth_coefficient,
        depth_divisor=cfg.depth_divisor,
        in_channels=list(cfg.in_channels),
        out_channels=list(cfg.out_channels),
        kernel_sizes=list(cfg.kernel_sizes),
        strides=list(cfg.strides),
        num_block_repeats=list(cfg.num_block_repeats),
        expand_ratios=list(cfg.expand_ratios),
        depthwise_padding=list(cfg.depthwise_padding),
        squeeze_expansion_ratio=cfg.squeeze_expansion_ratio,
        hidden_dim=cfg.hidden_dim,
        hidden_act="swish", pooling_type="mean",
        drop_connect_rate=0.0, dropout_rate=0.0)
    return EfficientNetModel(hf_cfg).eval()


def test_block_plan_arithmetic():
    """round_repeats/round_filters mirror HF's encoder construction."""
    assert len(block_plan(TINY)) == 3                  # 1 + 2 repeats
    assert len(block_plan(SCALED)) == 5                # ceil(1.5*1)+ceil(1.5*2)
    # width 0.5 with divisor 8: 8*0.5=4 -> rounds up to the divisor floor 8
    assert round_filters(SCALED, 32) == 16
    assert round_filters(TINY, 32) == 32
    p0 = block_plan(TINY)[0]
    assert p0.id_skip and p0.expand_ratio == 1
    p2 = block_plan(TINY)[2]
    assert not p2.id_skip and p2.stride == 1           # repeat block: residual


@pytest.mark.parametrize("cfg,seed", [(TINY, 0)], ids=["b0-tiny"])
@pytest.mark.slow   # 8.2s measured r05 — fast-tier budget policy
def test_parity(cfg, seed, rng):
    import torch

    model = _hf_model(cfg, seed)
    params = convert_hf_efficientnet(model.state_dict(), cfg)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).pooler_output.numpy()
    out = efficientnet_apply(params, x, cfg)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=2e-3)


def test_parity_odd_input(rng):
    """Odd spatial size exercises the TF-style asymmetric stride-2 padding."""
    import torch

    model = _hf_model(TINY, 2)
    params = convert_hf_efficientnet(model.state_dict(), TINY)
    x = rng.standard_normal((1, 3, 33, 33)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).pooler_output.numpy()
    out = efficientnet_apply(params, x, TINY)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=2e-3)


@pytest.mark.slow   # 11.9s measured r05 — fast-tier budget policy
def test_video_contract(rng):
    import jax

    params = init_efficientnet(jax.random.key(0), TINY)
    frames = rng.standard_normal((2, 3, 3, 32, 32)).astype(np.float32)
    out = efficientnet_apply(params, frames, TINY)
    assert out.shape == (2, 3, TINY.hidden_dim)  # 1280
    single = efficientnet_apply(params, frames[:, 1], TINY)
    np.testing.assert_allclose(np.asarray(out[:, 1]), np.asarray(single),
                               atol=1e-5, rtol=1e-4)


def test_avsr_forward_with_efficientnet(rng):
    import jax
    import jax.numpy as jnp

    from avsr_tpu.core.config import LLMConfig, LoRAConfig, ModelConfig
    from avsr_tpu.models.avsr import Batch, forward, init_avsr_model

    cfg = ModelConfig(
        modality="video", video_encoder="efficientnet", efficientnet=TINY,
        llm=LLMConfig(vocab_size=64, d_model=32, n_layers=1, n_heads=4,
                      n_kv_heads=2, ffn_dim=64),
        lora=LoRAConfig(use_lora=True, r=2, alpha=4))
    params = init_avsr_model(jax.random.key(0), cfg)
    assert "efficientnet" in params and "clip" not in params
    batch = Batch(
        frames=jnp.asarray(rng.standard_normal((2, 4, 3, 32, 32)),
                           jnp.float32),
        frame_lens=jnp.array([4, 2]),
        prompt_tokens=jnp.array([1, 7, 9]),
        labels=jnp.asarray(rng.integers(0, 64, (2, 6))),
        label_lens=jnp.array([6, 3]),
    )
    loss, _ = forward(params, cfg, batch)
    assert np.isfinite(float(loss))
