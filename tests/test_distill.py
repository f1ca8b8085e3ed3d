"""avsr-distill: train a speculative-decode draft from a teacher checkpoint.

The product path for the round-5 acceptance result (docs/serving.md): a
task-trained draft clears the speculative break-even that every
random-init draft misses. Covered here:

  * warm_start copies the teacher's encoders/embeddings and FIRST k LLM
    blocks into a shallower student (LayerSkip-style init);
  * the CLI distills a 1-layer draft from a trained 2-layer teacher on
    the synthetic overfit task, reports rising teacher-agreement, and
    exports a params dir + config.yaml;
  * avsr-decode consumes the export (decode.spec_draft_checkpoint) and
    its speculative output is token-identical to plain greedy decode —
    same WER artifacts, same transcripts (the standing losslessness
    contract, now through the trained-draft path).
"""

import jax
import numpy as np
import pytest

TRAIN_OVERRIDES = [
    "data.synthetic=true",
    "data.synthetic_size=4",
    "data.batch_size=8",  # dp=8 virtual mesh (conftest)
    "data.max_label_length=32",
    "data.audio_buckets=[100]",
    "data.video_buckets=[4]",
    "model.modality=audio",
    "model.whisper={d_model: 32, n_heads: 2, n_layers: 1, max_frames: 200}",
    "model.llm={vocab_size: 260, d_model: 64, n_layers: 2, n_heads: 4, "
    "n_kv_heads: 2, ffn_dim: 128, max_seq_len: 256}",
    "model.freeze_llm=false",
    "model.lora.use_lora=false",
    "training.learning_rate=2e-3",
    "training.warmup_steps=10",
    "training.log_interval=100",
    "training.save_every_steps=0",
    "mesh.remat=false",
    "mesh.donate=false",
    "runtime.compute_dtype=float32",
]


def test_warm_start_copies_prefix_layers():
    from avsr_tpu.cli.distill import warm_start

    teacher = {"llm": {"layers": [{"w": jax.numpy.ones((2, 2)) * i}
                                  for i in range(4)],
                       "embed": jax.numpy.ones((3, 2))},
               "extra": {"only_teacher": jax.numpy.ones((1,))}}
    student = {"llm": {"layers": [{"w": jax.numpy.zeros((2, 2))}],
                       "embed": jax.numpy.zeros((3, 2)),
                       "student_only": jax.numpy.zeros((5,))}}
    out, n = warm_start(student, teacher)
    # layer 0 and embed copied; student_only untouched; no teacher-only keys
    np.testing.assert_array_equal(np.asarray(out["llm"]["layers"][0]["w"]),
                                  np.zeros((2, 2)))  # teacher layer 0 is 0*1
    np.testing.assert_array_equal(np.asarray(out["llm"]["embed"]),
                                  np.ones((3, 2)))
    np.testing.assert_array_equal(np.asarray(out["llm"]["student_only"]),
                                  np.zeros((5,)))
    assert set(out) == {"llm"}          # teacher-only subtrees never leak in
    assert n == 2


def test_spec_draft_checkpoint_config_validation():
    from avsr_tpu.core.config import load_config

    base = "avsr_tpu/configs/tiny_cpu.yaml"
    with pytest.raises(ValueError, match="silently ignored"):
        load_config(base, {"decode.spec_draft_checkpoint": "/x",
                           "decode.spec_draft_config": "/x/config.yaml"})
    with pytest.raises(ValueError, match="come as a pair"):
        load_config(base, {"decode.speculative": True,
                           "decode.spec_draft_checkpoint": "/x"})
    with pytest.raises(ValueError, match="mutually exclusive"):
        load_config(base, {"decode.speculative": True,
                           "model.llm.n_layers": 2,
                           "decode.spec_draft_checkpoint": "/x",
                           "decode.spec_draft_config": "/x/config.yaml",
                           "decode.spec_draft_layers": 1})
    with pytest.raises(ValueError, match="standalone-decode only"):
        load_config(base, {"decode.speculative": True,
                           "decode.spec_draft_checkpoint": "/x",
                           "decode.spec_draft_config": "/x/config.yaml",
                           "decode.engine_slots": 2})


@pytest.mark.slow
def test_distill_cli_end_to_end(tmp_path):
    import json

    from avsr_tpu.cli import decode as cli_decode
    from avsr_tpu.cli import distill as cli_distill
    from avsr_tpu.cli import train as cli_train

    ckpt = tmp_path / "teacher"
    rc = cli_train.main([
        *TRAIN_OVERRIDES,
        "training.max_steps=350",
        f"training.checkpoint_dir={ckpt}",
    ])
    assert rc == 0

    # teacher config yaml for --teacher-config
    tcfg_yaml = tmp_path / "teacher.yaml"
    from avsr_tpu.core.config import load_config, save_config
    save_config(load_config(None, TRAIN_OVERRIDES), tcfg_yaml)

    draft_out = tmp_path / "draft_export"
    rc = cli_distill.main([
        "--teacher-config", str(tcfg_yaml),
        "--teacher-checkpoint", str(ckpt / "ckpt"),
        "--out", str(draft_out),
        "--tau", "1.5",
        *TRAIN_OVERRIDES,
        "model.llm.n_layers=1",
        "training.max_steps=150",
        "training.learning_rate=1e-3",
    ])
    assert rc == 0
    assert (draft_out / "config.yaml").exists()
    report = json.loads((draft_out / "distill_report.json").read_text())
    assert report["student_llm_layers"] == 1
    # the draft learned to agree with its teacher — the acceptance proxy
    assert report["teacher_agree"] > 0.5, report

    # decode twice — plain greedy vs speculative-with-trained-draft — and
    # the transcripts must be identical (losslessness through the CLI)
    def run_decode(out_dir, extra):
        rc = cli_decode.main([
            "--checkpoint", str(ckpt / "ckpt"), "--split", "train",
            *TRAIN_OVERRIDES,
            "decode.max_new_tokens=24", "decode.batch_size=8",
            f"decode.output_dir={out_dir}", *extra])
        assert rc == 0
        res = sorted(out_dir.glob("results_*.txt"))[-1].read_text()
        return sorted(l for l in res.splitlines() if l.startswith("HYP"))

    greedy = run_decode(tmp_path / "dec_greedy", [])
    spec = run_decode(tmp_path / "dec_spec", [
        "decode.speculative=true",
        f"decode.spec_draft_checkpoint={draft_out}",
        f"decode.spec_draft_config={draft_out / 'config.yaml'}",
    ])
    assert greedy == spec
