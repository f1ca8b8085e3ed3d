"""HuBERT / Wav2Vec2 encoder numeric parity vs randomly-initialized HF models.

The reference declares audio_encoder hubert|wav2vec2 in its config
(src/utils/config.py:53-56) without implementing them; avsr_tpu makes them
first-class. Both families share the encoder forward, so one module is
verified against both HF classes plus the *-large "stable layer norm"
variant.
"""

import numpy as np
import pytest

from avsr_tpu.core.config import SpeechSSLConfig
from avsr_tpu.models.hubert import (
    convert_hf_speech_ssl,
    feat_extract_output_lengths,
    init_speech_ssl,
    speech_ssl_apply,
)

BASE = SpeechSSLConfig(
    d_model=64, n_heads=2, n_layers=2, ffn_mult=4,
    conv_dims=(32, 32, 32), conv_kernels=(10, 3, 3), conv_strides=(5, 2, 2),
    conv_bias=False, feat_extract_norm="group", do_stable_layer_norm=False,
    pos_conv_kernel=16, pos_conv_groups=2, normalize_input=False,
)
LARGE = SpeechSSLConfig(
    d_model=64, n_heads=2, n_layers=2, ffn_mult=4,
    conv_dims=(32, 32, 32), conv_kernels=(10, 3, 3), conv_strides=(5, 2, 2),
    conv_bias=True, feat_extract_norm="layer", do_stable_layer_norm=True,
    pos_conv_kernel=16, pos_conv_groups=2, normalize_input=False,
)
T_WAVE = 2000


def _hf_kwargs(cfg: SpeechSSLConfig) -> dict:
    return dict(
        hidden_size=cfg.d_model,
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.n_heads,
        intermediate_size=cfg.d_model * cfg.ffn_mult,
        conv_dim=list(cfg.conv_dims),
        conv_kernel=list(cfg.conv_kernels),
        conv_stride=list(cfg.conv_strides),
        conv_bias=cfg.conv_bias,
        feat_extract_norm=cfg.feat_extract_norm,
        do_stable_layer_norm=cfg.do_stable_layer_norm,
        num_conv_pos_embeddings=cfg.pos_conv_kernel,
        num_conv_pos_embedding_groups=cfg.pos_conv_groups,
        num_feat_extract_layers=len(cfg.conv_dims),
        layerdrop=0.0, hidden_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, activation_dropout=0.0,
        vocab_size=32,
    )


def _parity(hf_model, cfg: SpeechSSLConfig, rng, atol=2e-4):
    import torch

    params = convert_hf_speech_ssl(hf_model.state_dict(), cfg)
    wave = rng.standard_normal((2, T_WAVE)).astype(np.float32)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(wave)).last_hidden_state.numpy()
    out, lens = speech_ssl_apply(params, wave, cfg, use_pallas="never")
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=atol, rtol=2e-3)
    exp = T_WAVE
    for k, s in zip(cfg.conv_kernels, cfg.conv_strides):
        exp = (exp - k) // s + 1
    assert (np.asarray(lens) == exp).all()


@pytest.mark.slow   # 8.2s measured r05 — fast-tier budget policy
def test_parity_wav2vec2_base(rng):
    torch = pytest.importorskip("torch")
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    torch.manual_seed(0)
    model = Wav2Vec2Model(Wav2Vec2Config(**_hf_kwargs(BASE))).eval()
    _parity(model, BASE, rng)


def test_parity_hubert_base(rng):
    torch = pytest.importorskip("torch")
    from transformers import HubertConfig, HubertModel

    torch.manual_seed(1)
    kw = _hf_kwargs(BASE)
    model = HubertModel(HubertConfig(**kw)).eval()
    _parity(model, BASE, rng)


def test_parity_wav2vec2_stable_layer_norm(rng):
    """*-large geometry: layer-norm feature extractor + pre-LN blocks."""
    torch = pytest.importorskip("torch")
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    torch.manual_seed(2)
    model = Wav2Vec2Model(Wav2Vec2Config(**_hf_kwargs(LARGE))).eval()
    _parity(model, LARGE, rng)


@pytest.mark.slow   # 19.2s measured r05 — >20s fast-tier policy
def test_padded_matches_trimmed(rng):
    """wave_lengths masking must reproduce the shorter-clip result.

    Holds for the layer-norm feature extractor (per-frame stats). The
    group-norm variant normalizes each channel over the whole (padded)
    time axis, so padded != trimmed by construction — HF has the same
    property, which is why wav2vec2-base ships with
    return_attention_mask=False. The HF-masked parity test below pins our
    group-norm behavior to HF's instead."""
    import jax

    params = init_speech_ssl(jax.random.key(0), LARGE)
    t_short = 1200
    w_short = rng.standard_normal((1, t_short)).astype(np.float32)
    w_pad = np.zeros((1, T_WAVE), np.float32)
    w_pad[:, :t_short] = w_short

    out_s, lens_s = speech_ssl_apply(params, w_short, LARGE, use_pallas="never")
    out_p, lens_p = speech_ssl_apply(
        params, w_pad, LARGE, wave_lengths=np.array([t_short]),
        use_pallas="never")
    n = int(lens_s[0])
    assert int(lens_p[0]) == n
    np.testing.assert_allclose(np.asarray(out_p)[0, :n],
                               np.asarray(out_s)[0, :n], atol=1e-4, rtol=1e-3)


def test_padded_matches_hf_masked(rng):
    """Our lengths path must match HF's attention_mask path on valid frames."""
    torch = pytest.importorskip("torch")
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    torch.manual_seed(3)
    model = Wav2Vec2Model(Wav2Vec2Config(**_hf_kwargs(BASE))).eval()
    params = convert_hf_speech_ssl(model.state_dict(), BASE)

    t_short = 1200
    wave = np.zeros((1, T_WAVE), np.float32)
    wave[:, :t_short] = rng.standard_normal((1, t_short))
    mask = np.zeros((1, T_WAVE), np.int64)
    mask[:, :t_short] = 1
    with torch.no_grad():
        ref = model(torch.from_numpy(wave),
                    attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    out, lens = speech_ssl_apply(params, wave, BASE,
                                 wave_lengths=np.array([t_short]),
                                 use_pallas="never")
    n = int(lens[0])
    np.testing.assert_allclose(np.asarray(out)[0, :n], ref[0, :n],
                               atol=2e-4, rtol=2e-3)


def test_normalize_input_matches_hf_feature_extractor(rng):
    """normalize_input reproduces Wav2Vec2FeatureExtractor(do_normalize=True)."""
    import jax

    cfg = SpeechSSLConfig(
        d_model=64, n_heads=2, n_layers=1, conv_dims=(32,), conv_kernels=(10,),
        conv_strides=(5,), pos_conv_kernel=16, pos_conv_groups=2,
        normalize_input=True)
    params = init_speech_ssl(jax.random.key(0), cfg)
    wave = (rng.standard_normal((2, 500)) * 7 + 3).astype(np.float32)
    norm = (wave - wave.mean(-1, keepdims=True)) / np.sqrt(
        wave.var(-1, keepdims=True) + 1e-7)

    out_a, _ = speech_ssl_apply(params, wave, cfg, use_pallas="never")
    cfg_off = SpeechSSLConfig(**{**cfg.__dict__, "normalize_input": False})
    out_b, _ = speech_ssl_apply(params, norm, cfg_off, use_pallas="never")
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=1e-5, rtol=1e-4)


def test_output_lengths_match_hf():
    pytest.importorskip("torch")
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    model = Wav2Vec2Model(Wav2Vec2Config(**_hf_kwargs(BASE)))
    import torch

    lens = np.array([37, 160, 999, 2000])
    ref = model._get_feat_extract_output_lengths(
        torch.from_numpy(lens)).numpy()
    ours = np.asarray(feat_extract_output_lengths(BASE, lens))
    np.testing.assert_array_equal(ours, ref)
