"""Reference trainer-checkpoint (.pt) conversion: the migration path for a
user arriving with a trained ``model_best.pt`` (clip_whisper_trainer.py:752-763).

A faithful checkpoint is constructed with the same libraries the reference
uses (HF modules + a real peft LoraModel wrap), saved with torch.save, and
converted; the transferable payload (whisper/clip/llm base, trained LoRA,
simple connectors) must match the torch forwards exactly.
"""

import re

import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.core.config import (
    AVSRConfig,
    ClipConfig,
    DataConfig,
    LLMConfig,
    LoRAConfig,
    ModelConfig,
    RuntimeConfig,
    WhisperConfig,
)

torch = pytest.importorskip("torch")
peft = pytest.importorskip("peft")

LLM = LLMConfig(vocab_size=128, d_model=64, n_layers=2, n_heads=4,
                n_kv_heads=2, ffn_dim=128, rope_theta=10000.0,
                tie_embeddings=False, max_seq_len=64)
LORA = LoRAConfig(use_lora=True, r=2, alpha=4, dropout=0.0)
D_AUDIO, D_VIDEO = 48, 40


class _RefConnector(torch.nn.Module):
    """State-dict twin of the reference SimpleModalityConnector
    (modality_connector.py:25-44): a single trained nn.Linear."""

    def __init__(self, d_in, d_out):
        super().__init__()
        self.linear = torch.nn.Linear(d_in, d_out)


class _RefModel(torch.nn.Module):
    """State-dict twin of ClipWhisperModel: the trainer checkpoints
    ``self.model.state_dict()`` whose top-level attribute names are
    whisper / clip / llm / audio_connector / video_connector."""

    def __init__(self, whisper, clip, llm, a_conn, v_conn):
        super().__init__()
        self.whisper = whisper
        self.clip = clip
        self.llm = llm
        self.audio_connector = a_conn
        self.video_connector = v_conn


@pytest.fixture(scope="module")
def ref_ckpt(tmp_path_factory):
    from transformers import (
        CLIPVisionConfig,
        CLIPVisionModel,
        LlamaConfig,
        LlamaForCausalLM,
        WhisperConfig as HFWhisperConfig,
        WhisperModel,
    )

    torch.manual_seed(0)
    whisper = WhisperModel(HFWhisperConfig(
        num_mel_bins=80, d_model=D_AUDIO, encoder_layers=2,
        encoder_attention_heads=2, decoder_layers=1,
        decoder_attention_heads=2, encoder_ffn_dim=192, decoder_ffn_dim=192,
        max_source_positions=50, vocab_size=100, pad_token_id=0,
        bos_token_id=1, eos_token_id=2, decoder_start_token_id=1)).eval()
    clip = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=D_VIDEO, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=160, image_size=32, patch_size=8)).eval()
    llm = LlamaForCausalLM(LlamaConfig(
        vocab_size=LLM.vocab_size, hidden_size=LLM.d_model,
        num_hidden_layers=LLM.n_layers, num_attention_heads=LLM.n_heads,
        num_key_value_heads=LLM.n_kv_heads, intermediate_size=LLM.ffn_dim,
        rope_theta=LLM.rope_theta, rms_norm_eps=LLM.rms_eps,
        tie_word_embeddings=False,
        attention_bias=False, mlp_bias=False)).eval()
    # the reference's exact peft wrap (clip_whisper_model.py:973-986)
    llm = peft.get_peft_model(llm, peft.LoraConfig(
        r=LORA.r, lora_alpha=LORA.alpha, lora_dropout=0.0, bias="none",
        task_type="CAUSAL_LM",
        target_modules=["q_proj", "k_proj", "v_proj", "o_proj"],
        init_lora_weights="gaussian", fan_in_fan_out=False)).eval()
    # a trained checkpoint has nonzero B — zero-B would hide scale bugs
    with torch.no_grad():
        for n, p in llm.named_parameters():
            if "lora_B" in n:
                p.normal_(std=0.1)

    model = _RefModel(whisper, clip, llm,
                      _RefConnector(D_AUDIO, LLM.d_model),
                      _RefConnector(D_VIDEO, LLM.d_model)).eval()
    path = tmp_path_factory.mktemp("ref") / "model_best.pt"
    torch.save({"epoch": 3, "model_state_dict": model.state_dict(),
                "train_losses": [2.0, 1.5], "val_losses": [1.8]}, path)
    return path, model


def _cfg(connector_type="simple") -> AVSRConfig:
    model = ModelConfig(
        modality="both", connector_type=connector_type,
        whisper=WhisperConfig(d_model=D_AUDIO, n_heads=2, n_layers=2,
                              max_frames=100),
        clip=ClipConfig(image_size=32, patch_size=8, d_model=D_VIDEO,
                        n_heads=2, n_layers=2),
        llm=LLM, lora=LORA)
    return AVSRConfig(
        data=DataConfig(synthetic=True, synthetic_size=4, batch_size=2,
                        max_audio_length=16000, max_video_length=4,
                        max_label_length=16, audio_buckets=(100,),
                        video_buckets=(4,)),
        model=model, runtime=RuntimeConfig(compute_dtype="float32"))


@pytest.mark.slow   # 12.0s measured r05 — fast-tier budget policy
def test_ref_ckpt_transfers_payload(ref_ckpt, rng):
    from avsr_tpu.cli.convert_ref_ckpt import build_ref_converted_params
    from avsr_tpu.models import llama as L
    from avsr_tpu.models.connectors import get_connector
    from avsr_tpu.models.whisper_encoder import whisper_encoder_apply

    path, model = ref_ckpt
    cfg = _cfg()
    params, notes = build_ref_converted_params(cfg, str(path))
    assert set(notes) == {"whisper", "clip", "llm+lora(8)",
                          "audio_connector", "video_connector"}

    # whisper encoder parity
    mel = rng.standard_normal((1, 80, 100)).astype(np.float32)
    with torch.no_grad():
        ref = model.whisper.encoder(
            torch.from_numpy(mel)).last_hidden_state.numpy()
    got, _ = whisper_encoder_apply(params["whisper"], mel, cfg.model.whisper,
                                   use_pallas="never")
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)

    # LLM base + TRAINED LoRA parity: peft applies (alpha/r)*B(A(x)) with
    # the adapters active; our lora_scale must land on the same logits
    tokens = rng.integers(0, LLM.vocab_size, (2, 10))
    with torch.no_grad():
        ref_logits = model.llm(torch.from_numpy(tokens)).logits.numpy()
    embeds = L.embed_tokens(params["llm"], jnp.asarray(tokens))
    logits, _ = L.llama_apply(params["llm"], LLM, inputs_embeds=embeds,
                              lora=LORA, use_pallas="never")
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               atol=3e-4, rtol=3e-3)
    # and it actually differs from the base (nonzero-B transferred)
    base, _ = L.llama_apply(params["llm"], LLM, inputs_embeds=embeds,
                            use_pallas="never")
    assert float(jnp.max(jnp.abs(logits - base))) > 1e-3

    # simple-connector parity
    conn = get_connector("simple")
    x = rng.standard_normal((2, 7, D_AUDIO)).astype(np.float32)
    with torch.no_grad():
        ref_c = model.audio_connector.linear(torch.from_numpy(x)).numpy()
    got_c, _ = conn.apply(params["audio_connector"], jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_c), ref_c, atol=1e-5,
                               rtol=1e-5)


@pytest.mark.slow   # 16.6s measured r05 — fast-tier budget policy
def test_ref_ckpt_cli_end_to_end(ref_ckpt, tmp_path, rng):
    """Through the CLI: convert -> load via --checkpoint -> composed forward."""
    import jax

    from avsr_tpu.cli import convert_ref_ckpt
    from avsr_tpu.cli.common import init_or_load_params
    from avsr_tpu.models.avsr import forward
    from test_models_avsr import tiny_batch

    path, _ = ref_ckpt
    out = tmp_path / "export"
    rc = convert_ref_ckpt.main([
        "--checkpoint", str(path), "--out", str(out),
        "data.audio_buckets=[100]", "model.modality=both",
        f"model.whisper={{d_model: {D_AUDIO}, n_heads: 2, n_layers: 2, "
        "max_frames: 100}",
        f"model.clip={{image_size: 32, patch_size: 8, d_model: {D_VIDEO}, "
        "n_heads: 2, n_layers: 2}",
        "model.llm={vocab_size: 128, d_model: 64, n_layers: 2, n_heads: 4, "
        "n_kv_heads: 2, ffn_dim: 128, tie_embeddings: false, "
        "rope_theta: 10000.0, max_seq_len: 64}",
        "model.lora={use_lora: true, r: 2, alpha: 4, dropout: 0.0}",
    ])
    assert rc == 0
    cfg = _cfg()
    params = init_or_load_params(cfg, str(out))
    batch = tiny_batch(np.random.default_rng(0), "both")._replace(
        frames=jax.numpy.asarray(rng.standard_normal((2, 4, 3, 32, 32)),
                                 jax.numpy.float32))
    loss, _ = forward(params, cfg.model, batch)
    assert np.isfinite(float(loss))


def test_ref_ckpt_nontransferable_connector_warns(ref_ckpt, caplog):
    from avsr_tpu.cli.convert_ref_ckpt import build_ref_converted_params

    path, _ = ref_ckpt
    with caplog.at_level("WARNING", logger="avsr.cli.convert_ref"):
        _, notes = build_ref_converted_params(_cfg("deep"), str(path))
    assert "audio_connector" not in notes
    assert any("NOT transferable" in r.message for r in caplog.records)


def test_ref_ckpt_rank_mismatch_rejected(ref_ckpt):
    from avsr_tpu.cli.convert_ref_ckpt import build_ref_converted_params

    path, _ = ref_ckpt
    cfg = _cfg()
    bad = AVSRConfig(
        data=cfg.data, runtime=cfg.runtime,
        model=ModelConfig(
            modality="both", whisper=cfg.model.whisper, clip=cfg.model.clip,
            llm=LLM, lora=LoRAConfig(use_lora=True, r=4, alpha=8)))
    with pytest.raises(ValueError, match=re.escape("LoRA rank 2")):
        build_ref_converted_params(bad, str(path))


def test_ref_ckpt_rejects_foreign_file(tmp_path):
    from avsr_tpu.cli.convert_ref_ckpt import build_ref_converted_params

    p = tmp_path / "other.pt"
    torch.save({"foo": torch.zeros(3)}, p)
    with pytest.raises(ValueError, match="reference trainer checkpoint"):
        build_ref_converted_params(_cfg(), str(p))
