"""Streaming transcription (infer.streaming + cli.stream) — a capability
the reference lacks entirely (decode.py is whole-utterance batch only).

Properties under test:
  * finalize() reproduces the offline greedy transcript of everything fed
    (greedy decoding is deterministic, so this is exact);
  * committed text is monotonic — once emitted it never changes;
  * the CLI drives a real WAV end to end in chunks.
"""

import numpy as np

from avsr_tpu.cli import stream as cli_stream
from avsr_tpu.core.config import load_config
from avsr_tpu.data.audio_io import write_wav
from avsr_tpu.data.tokenizer import load_tokenizer
from avsr_tpu.infer.streaming import StreamingTranscriber
from avsr_tpu.models.avsr import init_avsr_model

import jax

CFG = "avsr_tpu/configs/tiny_cpu.yaml"


def _setup():
    cfg = load_config(CFG)
    tok = load_tokenizer(cfg.model.llm_path or None)
    params = init_avsr_model(jax.random.key(0), cfg.model)
    return cfg, tok, params


def test_finalize_matches_offline(rng):
    cfg, tok, params = _setup()
    st = StreamingTranscriber(params, cfg, tok, agree_n=2)
    audio = (0.3 * rng.standard_normal(12800)).astype(np.float32)
    for i in range(4):
        st.feed(audio=audio[i * 3200:(i + 1) * 3200])
    st.finalize()

    offline = StreamingTranscriber(params, cfg, tok, agree_n=2)
    offline.feed(audio=audio)
    offline.finalize()
    assert st.committed_text == offline.committed_text


def test_commits_are_monotonic(rng):
    cfg, tok, params = _setup()
    st = StreamingTranscriber(params, cfg, tok, agree_n=2)
    audio = (0.3 * rng.standard_normal(16000)).astype(np.float32)
    seen = ""
    emitted = []
    for i in range(5):
        new = st.feed(audio=audio[i * 3200:(i + 1) * 3200])
        emitted.append(new)
        assert st.committed_text.startswith(seen)   # never rewrites
        assert st.committed_text == seen + new      # feed returns the delta
        seen = st.committed_text
    tail = st.finalize()
    assert st.committed_text == seen + tail
    assert "".join(emitted) + tail == st.committed_text


def test_cli_stream_audio(tmp_path, capsys):
    wav = tmp_path / "u.wav"
    x = (0.3 * np.sin(np.linspace(0, 500, 16000))).astype(np.float32)
    write_wav(wav, x)
    rc = cli_stream.main([
        "--config", CFG,
        "--audio", str(wav),
        "--chunk-s", "0.25",
        "decode.max_new_tokens=6",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.endswith("\n")   # final transcript line printed
