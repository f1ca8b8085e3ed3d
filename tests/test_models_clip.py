"""CLIP ViT numeric parity vs a randomly-initialized HF torch model."""

import numpy as np
import pytest

from avsr_tpu.core.config import ClipConfig
from avsr_tpu.models.clip_vit import (
    clip_vit_apply,
    convert_hf_clip_vision,
    init_clip_vit,
)

CFG = ClipConfig(image_size=32, patch_size=8, d_model=64, n_heads=2,
                 n_layers=2, ffn_mult=4)


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(0)
    hf_cfg = CLIPVisionConfig(
        hidden_size=CFG.d_model, num_hidden_layers=CFG.n_layers,
        num_attention_heads=CFG.n_heads,
        intermediate_size=CFG.d_model * CFG.ffn_mult,
        image_size=CFG.image_size, patch_size=CFG.patch_size,
    )
    model = CLIPVisionModel(hf_cfg).eval()
    params = convert_hf_clip_vision(model.state_dict(), CFG)
    return model, params


def test_cls_parity(hf_pair, rng):
    import torch

    model, params = hf_pair
    imgs = rng.standard_normal((3, 3, CFG.image_size, CFG.image_size)).astype(np.float32)
    with torch.no_grad():
        hf_out = model(torch.from_numpy(imgs))
    ref_cls = hf_out.last_hidden_state[:, 0].numpy()   # ref model behavior
    ref_pooled = hf_out.pooler_output.numpy()

    out_cls = clip_vit_apply(params, imgs.reshape(1, 3, 3, CFG.image_size,
                                                  CFG.image_size),
                             CFG, use_pallas="never", pool="cls")[0]
    out_pooled = clip_vit_apply(params, imgs.reshape(1, 3, 3, CFG.image_size,
                                                     CFG.image_size),
                                CFG, use_pallas="never", pool="pooled")[0]
    np.testing.assert_allclose(np.asarray(out_cls), ref_cls, atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(out_pooled), ref_pooled, atol=2e-4,
                               rtol=2e-3)


@pytest.mark.slow   # 9.4s measured r05 — fast-tier budget policy
def test_video_batch_shape(rng):
    import jax

    params = init_clip_vit(jax.random.key(0), CFG)
    frames = rng.standard_normal((2, 5, 3, CFG.image_size, CFG.image_size)).astype(np.float32)
    out = clip_vit_apply(params, frames, CFG, use_pallas="never")
    assert out.shape == (2, 5, CFG.d_model)
    assert np.isfinite(np.asarray(out)).all()
