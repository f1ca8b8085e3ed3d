"""Generate a fresh tiny HF checkpoint set + demo manifest for the
parity runbook rehearsal (``make parity-demo``; docs/parity_runbook.md).

Mirrors the fixtures tests/test_parity_manifest.py builds in-suite: real
``save_pretrained`` checkpoints (random-init, tiny) and a real on-disk
manifest, so every phase of ``avsr-parity --manifest`` — HF load ->
state-dict conversion -> dataset -> batched greedy decode -> corpus WER
artifacts — runs exactly as it will with real weights; only the sizes
differ."""

from __future__ import annotations

import shutil
from pathlib import Path


def build_tiny_hf_pair(hf_root) -> None:
    """Write the canonical tiny Whisper + Llama ``save_pretrained`` pair
    (the sizes the parity-demo Makefile overrides and the in-suite
    manifest test both assume — one builder so they cannot drift)."""
    import torch
    from transformers import (
        LlamaConfig,
        LlamaForCausalLM,
        WhisperConfig,
        WhisperModel,
    )

    hf_root = Path(hf_root)
    hf_root.mkdir(parents=True, exist_ok=True)
    torch.manual_seed(0)
    WhisperModel(WhisperConfig(
        num_mel_bins=80, d_model=64, encoder_layers=2,
        encoder_attention_heads=2, decoder_layers=1,
        decoder_attention_heads=2, encoder_ffn_dim=256, decoder_ffn_dim=256,
        max_source_positions=50, vocab_size=100, pad_token_id=0,
        bos_token_id=1, eos_token_id=2, decoder_start_token_id=1,
    )).eval().save_pretrained(hf_root / "whisper")
    LlamaForCausalLM(LlamaConfig(
        vocab_size=260, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, tie_word_embeddings=False,
        attention_bias=False, mlp_bias=False,
    )).eval().save_pretrained(hf_root / "llm")


def main(out: str) -> None:
    from avsr_tpu.cli import prepare_data

    root = Path(out)
    shutil.rmtree(root, ignore_errors=True)
    build_tiny_hf_pair(root / "hf")

    rc = prepare_data.main(["--demo", "8", "--out", str(root / "data"),
                            "--splits", "0.5,0.25,0.25", "--seed", "3"])
    if rc != 0:
        raise SystemExit(f"prepare_data failed rc={rc}")
    print(f"demo checkpoint set at {root}")


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/avsr_parity_demo")
