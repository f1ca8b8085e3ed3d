"""ResNet video-encoder numeric parity vs randomly-initialized HF models.

The reference declares video_encoder resnet (src/utils/config.py:53-56)
without implementing it; avsr_tpu wires it as a per-frame trunk with the
same [B, T, d] contract as CLIP.
"""

import numpy as np
import pytest

from avsr_tpu.core.config import ResNetConfig
from avsr_tpu.models.resnet import convert_hf_resnet, init_resnet, resnet_apply

BOTTLENECK = ResNetConfig(image_size=32, embedding_size=16,
                          hidden_sizes=(32, 64), depths=(1, 2),
                          layer_type="bottleneck")
BASIC = ResNetConfig(image_size=32, embedding_size=16,
                     hidden_sizes=(32, 64), depths=(2, 1),
                     layer_type="basic")


def _hf_model(cfg: ResNetConfig, seed: int):
    torch = pytest.importorskip("torch")
    from transformers import ResNetConfig as HFConfig
    from transformers import ResNetModel

    torch.manual_seed(seed)
    hf_cfg = HFConfig(
        num_channels=3, embedding_size=cfg.embedding_size,
        hidden_sizes=list(cfg.hidden_sizes), depths=list(cfg.depths),
        layer_type=cfg.layer_type,
        downsample_in_first_stage=cfg.downsample_in_first_stage)
    return ResNetModel(hf_cfg).eval()


@pytest.mark.parametrize("cfg,seed", [(BOTTLENECK, 0), (BASIC, 1)],
                         ids=["bottleneck", "basic"])
def test_parity(cfg, seed, rng):
    import torch

    model = _hf_model(cfg, seed)
    params = convert_hf_resnet(model.state_dict(), cfg)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).pooler_output.numpy().reshape(2, -1)
    out = resnet_apply(params, x, cfg)    # [N,3,S,S] -> [N, d]
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=2e-3)


def test_video_contract(rng):
    """[B, T, 3, S, S] -> [B, T, d], matching per-frame application."""
    import jax

    params = init_resnet(jax.random.key(0), BOTTLENECK)
    frames = rng.standard_normal((2, 3, 3, 32, 32)).astype(np.float32)
    out = resnet_apply(params, frames, BOTTLENECK)
    assert out.shape == (2, 3, BOTTLENECK.hidden_sizes[-1])
    single = resnet_apply(params, frames[:, 1], BOTTLENECK)
    np.testing.assert_allclose(np.asarray(out[:, 1]), np.asarray(single),
                               atol=1e-5, rtol=1e-4)


def test_bn_stats_never_trainable(rng):
    import jax

    from avsr_tpu.core.config import LLMConfig, LoRAConfig, ModelConfig
    from avsr_tpu.models.avsr import init_avsr_model
    from avsr_tpu.train.state import trainable_mask

    cfg = ModelConfig(
        modality="video", video_encoder="resnet", resnet=BOTTLENECK,
        freeze_encoders=False,
        llm=LLMConfig(vocab_size=64, d_model=32, n_layers=1, n_heads=4,
                      n_kv_heads=2, ffn_dim=64),
        lora=LoRAConfig(use_lora=True, r=2, alpha=4))
    params = init_avsr_model(jax.random.key(0), cfg)
    mask = trainable_mask(params, cfg)
    stem = mask["resnet"]["stem"]
    assert stem["conv"]["w"] and stem["bn"]["scale"]       # unfrozen weights
    assert not stem["bn"]["mean"] and not stem["bn"]["var"]  # stats stay put


def test_avsr_forward_with_resnet(rng):
    import jax
    import jax.numpy as jnp

    from avsr_tpu.core.config import LLMConfig, LoRAConfig, ModelConfig
    from avsr_tpu.models.avsr import Batch, forward, init_avsr_model

    cfg = ModelConfig(
        modality="video", video_encoder="resnet", resnet=BOTTLENECK,
        llm=LLMConfig(vocab_size=64, d_model=32, n_layers=1, n_heads=4,
                      n_kv_heads=2, ffn_dim=64),
        lora=LoRAConfig(use_lora=True, r=2, alpha=4))
    params = init_avsr_model(jax.random.key(0), cfg)
    assert "resnet" in params and "clip" not in params
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
