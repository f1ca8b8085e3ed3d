"""Whisper encoder numeric parity vs a randomly-initialized HF torch model."""

import numpy as np
import pytest

from avsr_tpu.core.config import WhisperConfig
from avsr_tpu.models.whisper_encoder import (
    convert_hf_whisper_encoder,
    init_whisper_encoder,
    whisper_encoder_apply,
)

CFG = WhisperConfig(n_mels=80, d_model=64, n_heads=2, n_layers=2,
                    ffn_mult=4, max_frames=100)


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        num_mel_bins=CFG.n_mels, d_model=CFG.d_model,
        encoder_layers=CFG.n_layers, encoder_attention_heads=CFG.n_heads,
        decoder_layers=1, decoder_attention_heads=CFG.n_heads,
        encoder_ffn_dim=CFG.d_model * CFG.ffn_mult,
        decoder_ffn_dim=CFG.d_model * CFG.ffn_mult,
        max_source_positions=CFG.max_source_positions,
        vocab_size=100, pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1,
    )
    model = WhisperModel(hf_cfg).eval()
    params = convert_hf_whisper_encoder(model.state_dict(), CFG)
    return model, params


def test_parity_full_length(hf_pair, rng):
    import torch

    model, params = hf_pair
    mel = rng.standard_normal((2, CFG.n_mels, CFG.max_frames)).astype(np.float32)
    with torch.no_grad():
        ref = model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    out, lens = whisper_encoder_apply(params, mel, CFG, use_pallas="never")
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-3)
    assert (np.asarray(lens) == CFG.max_source_positions).all()


@pytest.mark.slow   # 8.3s measured r05 — fast-tier budget policy
def test_padded_matches_trimmed(hf_pair, rng):
    """Padding masked via mel_lengths must reproduce the shorter-clip result."""
    _, params = hf_pair
    T_short = 60
    mel_short = rng.standard_normal((1, CFG.n_mels, T_short)).astype(np.float32)
    mel_pad = np.zeros((1, CFG.n_mels, CFG.max_frames), np.float32)
    mel_pad[:, :, :T_short] = mel_short

    out_s, lens_s = whisper_encoder_apply(params, mel_short, CFG,
                                          use_pallas="never")
    out_p, lens_p = whisper_encoder_apply(
        params, mel_pad, CFG, mel_lengths=np.array([T_short]),
        use_pallas="never")
    n = int(lens_s[0])
    assert int(lens_p[0]) == n
    np.testing.assert_allclose(np.asarray(out_p)[0, :n],
                               np.asarray(out_s)[0, :n], atol=1e-4, rtol=1e-3)


def test_random_init_runs(rng):
    import jax

    params = init_whisper_encoder(jax.random.key(0), CFG)
    mel = rng.standard_normal((1, CFG.n_mels, CFG.max_frames)).astype(np.float32)
    out, _ = whisper_encoder_apply(params, mel, CFG, use_pallas="never")
    assert np.isfinite(np.asarray(out)).all()
