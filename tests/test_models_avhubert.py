"""AV-HuBERT video-branch encoder: shape/grad/freeze/layer-tap contracts.

The reference declares video_encoder avhubert + avhubert_layer /
finetune_avhubert_layers (src/utils/config.py:55, 72-74) without
implementing them. There is no HF AV-HuBERT (weights live in fairseq, not
in this environment), so unlike the other encoder families this one is
contract-tested rather than weight-parity-tested.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.core.config import AVHubertConfig, LLMConfig, LoRAConfig, ModelConfig
from avsr_tpu.models.avhubert import avhubert_apply, init_avhubert

TINY = AVHubertConfig(
    image_size=32, frontend_channels=8, trunk_widths=(8, 16),
    trunk_depths=(1, 1), d_model=32, n_heads=2, n_layers=2, ffn_mult=2,
    pos_conv_kernel=8, pos_conv_groups=2)


@pytest.mark.slow   # 9.2s measured r05 — fast-tier budget policy
def test_shapes_and_finite(rng):
    params = init_avhubert(jax.random.key(0), TINY)
    frames = rng.standard_normal((2, 5, 3, 32, 32)).astype(np.float32)
    out = avhubert_apply(params, frames, TINY,
                         frame_lengths=np.array([5, 3]), use_pallas="never")
    assert out.shape == (2, 5, TINY.d_model)
    assert np.isfinite(np.asarray(out)).all()


def test_layer_tap(rng):
    """avhubert_layer taps intermediate transformer outputs (ref :72)."""
    import dataclasses

    params = init_avhubert(jax.random.key(0), TINY)
    frames = rng.standard_normal((1, 4, 3, 32, 32)).astype(np.float32)

    cfg0 = dataclasses.replace(TINY, avhubert_layer=0)   # front-end only
    out0 = avhubert_apply(params, frames, cfg0, use_pallas="never")
    assert out0.shape == (1, 4, TINY.d_model)

    cfg1 = dataclasses.replace(TINY, avhubert_layer=1)
    out1 = avhubert_apply(params, frames, cfg1, use_pallas="never")
    out_full = avhubert_apply(params, frames, TINY, use_pallas="never")
    # Different taps, different features.
    assert not np.allclose(np.asarray(out1), np.asarray(out_full), atol=1e-5)
    assert not np.allclose(np.asarray(out0), np.asarray(out1), atol=1e-5)


@pytest.mark.slow   # 13.2s measured r05 — fast-tier budget policy
def test_time_resolution_preserved(rng):
    """One feature per input frame (stride-1 time axis throughout)."""
    params = init_avhubert(jax.random.key(0), TINY)
    for T in (2, 7):
        frames = rng.standard_normal((1, T, 3, 32, 32)).astype(np.float32)
        out = avhubert_apply(params, frames, TINY, use_pallas="never")
        assert out.shape[1] == T


def _model_cfg(**kw) -> ModelConfig:
    base = dict(
        modality="video", video_encoder="avhubert", avhubert=TINY,
        llm=LLMConfig(vocab_size=64, d_model=32, n_layers=1, n_heads=4,
                      n_kv_heads=2, ffn_dim=64),
        lora=LoRAConfig(use_lora=True, r=2, alpha=4))
    base.update(kw)
    return ModelConfig(**base)


@pytest.mark.slow   # 19.7s measured r05 — >20s fast-tier policy
def test_avsr_forward_with_avhubert(rng):
    from avsr_tpu.models.avsr import Batch, forward, init_avsr_model

    cfg = _model_cfg()
    params = init_avsr_model(jax.random.key(0), cfg)
    assert "avhubert" in params and "clip" not in params
    batch = Batch(
        frames=jnp.asarray(rng.standard_normal((2, 4, 3, 32, 32)),
                           jnp.float32),
        frame_lens=jnp.array([4, 2]),
        prompt_tokens=jnp.array([1, 7, 9]),
        labels=jnp.asarray(rng.integers(0, 64, (2, 6))),
        label_lens=jnp.array([6, 3]),
    )
    loss, _ = forward(params, cfg, batch, use_pallas="never")
    assert np.isfinite(float(loss))


def test_finetune_avhubert_layers(rng):
    """Selected transformer layers unfreeze inside a frozen encoder
    (ref finetune_avhubert_layers :73-74)."""
    from avsr_tpu.models.avsr import init_avsr_model
    from avsr_tpu.train.state import trainable_mask

    cfg = _model_cfg(finetune_avhubert_layers=(1,))
    params = init_avsr_model(jax.random.key(0), cfg)
    mask = trainable_mask(params, cfg)
    av = mask["avhubert"]
    assert not av["stem"]["conv"]["w"]
    assert not any(jax.tree_util.tree_leaves(av["blocks"][0]))
    assert all(jax.tree_util.tree_leaves(av["blocks"][1]))


@pytest.mark.slow   # 25.2s measured r05 — >20s fast-tier policy
def test_finetune_avhubert_layers_grad_flow(rng):
    """The unfrozen AV-HuBERT blocks receive NONZERO gradients: the
    freeze_encoders stop_gradient short-circuit must stay off when
    finetune_avhubert_layers is set (round-1 advisor high finding: the
    mask marked layers trainable but encode() zeroed their grads)."""
    from avsr_tpu.models.avsr import Batch, forward, init_avsr_model
    from avsr_tpu.train.state import combine_trainable, partition_trainable

    cfg = _model_cfg(finetune_avhubert_layers=(1,))
    assert cfg.freeze_encoders
    params = init_avsr_model(jax.random.key(0), cfg)
    train_p, frozen_p = partition_trainable(params, cfg)
    batch = Batch(
        frames=jnp.asarray(rng.standard_normal((2, 4, 3, 32, 32)),
                           jnp.float32),
        frame_lens=jnp.array([4, 2]),
        prompt_tokens=jnp.array([1, 7, 9]),
        labels=jnp.asarray(rng.integers(0, 64, (2, 6))),
        label_lens=jnp.array([6, 3]),
    )

    def loss_fn(tp):
        loss, _ = forward(combine_trainable(tp, frozen_p), cfg, batch,
                          use_pallas="never")
        return loss

    grads = jax.grad(loss_fn)(train_p)
    g_block = [np.abs(np.asarray(g)).max()
               for g in jax.tree_util.tree_leaves(grads["avhubert"])]
    assert g_block and max(g_block) > 0.0, "unfrozen avhubert blocks got zero grad"
