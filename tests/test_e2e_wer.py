"""End-to-end learning proof: train -> checkpoint -> decode -> WER.

Round-1 VERDICT weak #8: parity tests cover layouts but nothing proved the
full train->generate->WER loop *learns*. Here the tiny model overfits a
4-utterance synthetic set through the real CLI entry points (cli.train,
cli.decode — the reference eval contract, decode.py:30-37, 656-686) and the
decoded WER on the training utterances must collapse.
"""

import re

import pytest

from avsr_tpu.cli import decode as cli_decode
from avsr_tpu.cli import train as cli_train


@pytest.mark.slow
def test_train_then_decode_wer_collapses(tmp_path):
    ckpt_dir = tmp_path / "run"
    dec_dir = tmp_path / "dec"
    overrides = [
        "data.synthetic=true",
        "data.synthetic_size=4",
        "data.batch_size=8",  # dp=8 virtual mesh (conftest)
        "data.max_label_length=56",
        "data.audio_buckets=[100,200]",
        "data.video_buckets=[4]",
        "model.modality=audio",
        # tiny but trainable enough to memorize 4 transcripts
        "model.whisper={d_model: 32, n_heads: 2, n_layers: 1, max_frames: 200}",
        "model.llm={vocab_size: 260, d_model: 64, n_layers: 2, n_heads: 4, "
        "n_kv_heads: 2, ffn_dim: 128, max_seq_len: 256}",
        "model.freeze_llm=false",
        "model.lora.use_lora=false",
        "model.prompt=transcribe:",
        "training.max_steps=400",
        "training.learning_rate=2e-3",
        "training.warmup_steps=10",
        "training.log_interval=100",
        "training.save_every_steps=0",
        f"training.checkpoint_dir={ckpt_dir}",
        "mesh.remat=false",
        "mesh.donate=false",
        "runtime.compute_dtype=float32",
        "decode.max_new_tokens=64",
        "decode.batch_size=8",
        f"decode.output_dir={dec_dir}",
    ]
    rc = cli_train.main(overrides)
    assert rc == 0
    assert (ckpt_dir / "ckpt").exists()

    rc = cli_decode.main(
        ["--checkpoint", str(ckpt_dir / "ckpt"), "--split", "train",
         *overrides])
    assert rc == 0

    wer_files = sorted(dec_dir.glob("wer_*.txt"))
    assert wer_files, "decode wrote no wer_ file"
    summary = wer_files[-1].read_text()
    m = re.search(r"WER: ([0-9.]+)", summary)
    assert m, summary
    wer = float(m.group(1))
    assert wer < 0.1, f"model failed to overfit: WER={wer}\n{summary}"
    # the HYP/REF stream artifact exists too (ref results_{ts}.txt)
    assert sorted(dec_dir.glob("results_*.txt"))
